package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module registries; every entry that is
  * ANSI-SQL-expressible has a DuckDB twin in `oracleSql` (column names and
  * types deliberately aligned — the driver sorts columns by name and
  * hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the star join (facts shuffle-joined, dims broadcast).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.joinStar(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Scalars.queries ++ ops.Skew.queries ++
      ops.Sketches.queries ++ ops.Profile.queries ++ ops.BucketedStar.queries ++
      ops.AsofJoin.queries ++ ops.RangeJoin.queries ++ ops.Sampling.queries ++
      ops.DataQuality.queries ++ ops.ZOrder.queries ++ ops.BloomJoin.queries ++
      ops.Graph.queries ++ ops.Privacy.queries ++
      ext.TextAnalysis.queries ++ ext.Dedup.queries ++ ext.SuffixDedup.queries ++
      ext.Similarity.queries ++
      ext.Multimodal.queries ++ ext.Corpus.queries ++ ext.Retrieval.queries ++
      ext.Clustering.queries ++ ext.UnigramLm.queries ++ ext.NnGraph.queries ++ ext.Linkage.queries ++
      sources.VecShardQueries.queries ++ plans.TopKPerKey.queries ++ plans.MvQueries.queries ++ engine.Cdc.queries ++ engine.SnapshotSet.queries ++
      flights.StarSchema.queries ++ streaming.EventStream.queries ++
      streaming.CorpusIngest.queries ++ streaming.RetrievalIngest.queries ++
      streaming.TrendingTokens.queries ++ streaming.SuffixScrubIngest.queries ++
      streaming.GraphIngest.queries ++ streaming.ViewIngest.queries ++ streaming.CdcIngest.queries ++ streaming.ContaminationIngest.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Scalars.oracles ++ ops.Skew.oracles ++
      ops.Sketches.oracles ++ ops.Profile.oracles ++ ops.BucketedStar.oracles ++
      ops.AsofJoin.oracles ++ ops.RangeJoin.oracles ++ ops.Sampling.oracles ++
      ops.DataQuality.oracles ++ ops.ZOrder.oracles ++ ops.BloomJoin.oracles ++
      ops.Graph.oracles ++ ops.Privacy.oracles ++
      ext.TextAnalysis.oracles ++ ext.Dedup.oracles ++ ext.SuffixDedup.oracles ++
      ext.Similarity.oracles ++
      ext.Corpus.oracles ++ ext.Multimodal.oracles ++ ext.Retrieval.oracles ++
      ext.Clustering.oracles ++ ext.UnigramLm.oracles ++ ext.NnGraph.oracles ++ ext.Linkage.oracles ++
      sources.VecShardQueries.oracles ++ plans.TopKPerKey.oracles ++ plans.MvQueries.oracles ++ engine.Cdc.oracles ++ engine.SnapshotSet.oracles ++
      flights.StarSchema.oracles ++ streaming.EventStream.oracles ++
      streaming.CorpusIngest.oracles ++ streaming.RetrievalIngest.oracles ++
      streaming.TrendingTokens.oracles ++ streaming.SuffixScrubIngest.oracles ++
      streaming.GraphIngest.oracles ++ streaming.ViewIngest.oracles ++ streaming.CdcIngest.oracles ++ streaming.ContaminationIngest.oracles
}
