package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Table profiling — the data-quality pass a pipeline runs before
  * trusting a new load: per column, row count, non-null count, null
  * count and distinct count, computed in ONE scan (a wide aggregate
  * melted back to one row per column with `stack`). At 100 TB the single
  * pass matters: a per-column loop would re-read the table N times;
  * this reads it once and lets the aggregate do map-side partials
  * (the distinct counts expand internally — swap them for
  * approx_count_distinct when exactness isn't required, see
  * `ops/Sketches.scala`).
  */
object Profile {

  /** One row per profiled column: (column_name, n_rows, n_nonnull,
    * n_nulls, n_distinct).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_nonnull, n_distinct)"))
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"), col("n_distinct"))
      .orderBy(col("column_name"))
  }

  private val OrdersCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  /** Pairwise Pearson correlations over lineitem's money/quantity
    * columns — the multicollinearity screen a feature pipeline runs.
    * Cross-engine exactness discipline (the q56/q63 pattern at pair
    * grain): values are QUANTIZED to exact integers (×100 — the data
    * has 2 decimal places), every sum runs in DECIMAL(38,0) (an exact
    * BIGINT sum of squares would overflow at ~6e5 rows of 1e7-scale
    * prices under ANSI mode), and the correlation is one identical
    * double expression over those exact sums on both engines — so even
    * a statistic that is classically float-fragile hash-gates. One
    * single-pass wide aggregate, map-side combinable.
    */
  def correlationMatrix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val colsQ = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def q(c: String) = round(col(c) * 100).cast(LongType)
    val base = Tables(s, dir, "lineitem")
      .select(colsQ.map(c => q(c).as(c.stripPrefix("l_"))): _*)
    val names = colsQ.map(_.stripPrefix("l_"))
    val dec = DecimalType(38, 0)
    val sums =
      Seq(count(lit(1)).cast(dec).as("n")) ++
      names.map(c => sum(col(c).cast(dec)).as(s"s_$c")) ++
      names.map(c => sum((col(c) * col(c)).cast(dec)).as(s"ss_$c")) ++
      names.combinations(2).map { case Seq(a, b) =>
        sum((col(a) * col(b)).cast(dec)).as(s"sp_${a}_$b")
      }.toSeq
    val agg = base.agg(sums.head, sums.tail: _*)
    def d(c: String) = col(c).cast("double")
    val corrs = names.combinations(2).map { case Seq(a, b) =>
      ((d("n") * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b"))
        / sqrt((d("n") * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a"))
          * (d("n") * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b"))))
        .as(s"corr_${a}_$b")
    }.toSeq
    agg.select(col("n").cast(LongType).as("n_rows") +: corrs: _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x95_correlation_matrix" -> (correlationMatrix _),
    "q34_profile" -> ((s: SparkSession, dir: String) =>
      profile(Tables(s, dir, "orders"), OrdersCols)))

  /** The twin built from the same column list and pair ordering as the
    * Spark side, so the expression trees are structurally identical.
    */
  private def correlationOracle: String = {
    val names = Seq("quantity", "extendedprice", "discount", "tax")
    val qCols = names.map(c =>
      s"CAST(round(l_$c * 100) AS BIGINT) AS $c").mkString(",\n        |    ")
    val sumCols = (
      names.map(c => s"sum($c) AS s_$c") ++
      names.map(c => s"sum($c * $c) AS ss_$c") ++
      names.combinations(2).map { case Seq(a, b) =>
        s"sum($a * $b) AS sp_${a}_$b"
      }).mkString(",\n        |    ")
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val corrCols = names.combinations(2).map { case Seq(a, b) =>
      s"""(${d("n")} * ${d(s"sp_${a}_$b")} - ${d(s"s_$a")} * ${d(s"s_$b")})
         |    / sqrt((${d("n")} * ${d(s"ss_$a")} - ${d(s"s_$a")} * ${d(s"s_$a")})
         |      * (${d("n")} * ${d(s"ss_$b")} - ${d(s"s_$b")} * ${d(s"s_$b")})) AS corr_${a}_$b""".stripMargin
    }.mkString(",\n        |  ")
    s"""WITH b AS (
       |  SELECT $qCols
       |  FROM lineitem),
       |a AS (
       |  SELECT count(*) AS n,
       |    $sumCols
       |  FROM b)
       |SELECT CAST(n AS BIGINT) AS n_rows,
       |  $corrCols
       |FROM a""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "x95_correlation_matrix" -> correlationOracle,
    "q34_profile" -> OrdersCols.map(c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows, count($c) AS n_nonnull,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct
         |FROM orders""".stripMargin).mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))
}
