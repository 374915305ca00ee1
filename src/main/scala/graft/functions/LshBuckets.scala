package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native hyperplane-LSH bucketing: all `numTables` bucket ids of one
  * embedding in a single generated pass — the codegen'd replacement for
  * the posexplode -> broadcast-join-planes -> two-hash-aggregate
  * pipeline, whose exploded intermediate (|corpus| x dims x planes
  * rows) dominated the ANN queries at the 10x corpus.
  *
  * Determinism IMPROVES over the aggregate spelling: each projection is
  * a strict fold over dimension order (the aggregate summed doubles in
  * arbitrary partition order — sign decisions were stable only because
  * projections sit far from zero). The hyperplane tensor rides the
  * expression as a codegen reference object; eval and codegen share one
  * static kernel (the ParsePoint discipline). A null element or a
  * dimension mismatch yields NULL.
  */
case class LshBuckets(child: Expression,
    planes: Array[Array[Array[Double]]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects ARRAY<FLOAT>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = LshBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][][]")
    val result = ctx.freshName("buckets")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $result =
         |  $helper.compute($c, $planesRef);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"

  // Array equals/hashCode are reference-based, so the synthesized case-
  // class equality never matched two separately-constructed but
  // identical plane tensors — defeating Catalyst canonicalization and
  // subexpression elimination (ADVICE r9). Compare the tensor by
  // CONTENT.
  @transient private lazy val planesHash: Int =
    java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override def equals(other: Any): Boolean = other match {
    case LshBuckets(c, p) => child == c && java.util.Arrays.deepEquals(
      planes.asInstanceOf[Array[AnyRef]], p.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int = 31 * child.hashCode + planesHash
}

object LshBuckets {

  /** Shared eval/codegen kernel: per table, bucket = sign bits of the
    * per-bit hyperplane projections, each projection a strict fold over
    * dimension order.
    */
  def compute(a: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val numTables = planes.length
    val dim = planes(0)(0).length
    if (a.numElements() != dim) return null
    val xs = new Array[Double](dim)
    var p = 0
    while (p < dim) {
      if (a.isNullAt(p)) return null
      xs(p) = a.getFloat(p).toDouble
      p += 1
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      val bits = planes(t)
      var bucket = 0L
      var b = 0
      while (b < bits.length) {
        val w = bits(b)
        var proj = 0.0
        var i = 0
        while (i < dim) { proj += xs(i) * w(i); i += 1 }
        if (proj > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
