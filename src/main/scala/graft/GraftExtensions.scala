package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BpeCountRewrite, BpeTokenCount, DotD, DotL, LongVec, NfcNormalize, ParsePoint, SqDistL}

/** SparkSessionExtensions entry point: makes the library's native
  * expressions first-class SQL functions in any session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), so SQL users get
  * `parse_point(...)` / `bpe_token_count(...)` without calling the
  * registrars from code, plus the [[BpeCountRewrite]] optimizer rule
  * that turns the naive count spelling into the native expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("parse_point"),
      new ExpressionInfo(classOf[ParsePoint].getName, "parse_point"),
      (children: Seq[Expression]) => ParsePoint(children.head)))
    extensions.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (children: Seq[Expression]) => BpeTokenCount(children.head)))
    extensions.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotD].getName, "dot_d"),
      DotD.builder _))
    extensions.injectFunction((
      FunctionIdentifier("dot_l"),
      new ExpressionInfo(classOf[DotL].getName, "dot_l"),
      LongVec.dotBuilder))
    extensions.injectFunction((
      FunctionIdentifier("sqdist_l"),
      new ExpressionInfo(classOf[SqDistL].getName, "sqdist_l"),
      LongVec.sqDistBuilder))
    extensions.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    extensions.injectOptimizerRule(_ => BpeCountRewrite)
    // the (c) extension tier: a custom physical operator's strategy plus
    // the rule that rewrites the window top-k idiom onto it
    extensions.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
