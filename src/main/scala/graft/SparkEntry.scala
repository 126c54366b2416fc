package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end data-prep composite V2 is the engine's identity piece:
    * quality gate + language ID + keep-BEST near-dup dedup + eval-set
    * decontamination + per-source trim + LEARNED-BPE token accounting +
    * water-filling mix allocation, fused into one Catalyst plan over three
    * documents scans plus two fingerprint-versioned artifact reads.
    */
  def entry(spark: SparkSession): DataFrame =
    CorpusClean.corpusPrepareV2(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Analytics.queries ++ TpchMore.queries ++ Graph.queries ++ BeamParity.queries ++ TextAnalysis.queries ++
      CorpusClean.queries ++ CorpusSpans.queries ++ Signals.queries ++ Bucketed.queries ++ SetSketch.queries ++ BpeTrain.queries ++ QualityTrain.queries ++ UlmTrain.queries ++ ScaleCurve.queries ++
      graft.dedup.Dedup.queries ++ graft.similarity.Ann.queries ++ graft.similarity.Pca.queries ++
      graft.multimodal.Multimodal.queries ++ graft.streaming.Streams.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Analytics.oracles ++ TpchMore.oracles ++ Graph.oracles ++ BeamParity.oracles ++ TextAnalysis.oracles ++
      CorpusClean.oracles ++ CorpusSpans.oracles ++ Signals.oracles ++ Bucketed.oracles ++ SetSketch.oracles ++ BpeTrain.oracles ++ QualityTrain.oracles ++ UlmTrain.oracles ++ ScaleCurve.oracles ++
      graft.dedup.Dedup.oracles ++ graft.similarity.Ann.oracles ++ graft.similarity.Pca.oracles ++
      graft.multimodal.Multimodal.oracles ++ graft.streaming.Streams.oracles
}
