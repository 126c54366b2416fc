package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the star schema + LLM-pipeline tables.
  *
  * Plain `spark.read.parquet` so Catalyst owns column pruning and filter
  * pushdown — every query's scan should show `PushedFilters`/`ReadSchema`
  * limited to what the plan needs.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")

  /** Physical-type probe for `events.ts`, cached per path (one parquet
    * footer read). Generations of the testdata have shipped `ts` as either
    * parquet TIMESTAMP(NANOS) — which Spark 4 only reads as raw int64 via
    * the legacy `nanosAsLong` conf — or plain timestamp[us] (TIMESTAMP_NTZ
    * on read). A source layer hardcoding one encoding breaks every events
    * consumer when the file flips (round 6: 21 operators), so the reader
    * probes and branches instead.
    */
  private val tsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()

  def eventsTsType(s: SparkSession, d: String): DataType =
    tsTypeCache.computeIfAbsent(s"$d/events.parquet", { path =>
      try s.read.parquet(path).schema("ts").dataType
      catch {
        // TIMESTAMP(NANOS) without the legacy conf fails schema inference
        case _: Exception =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          s.read.parquet(path).schema("ts").dataType
      }
    })

  /** events with `ts` normalized to TimestampType (UTC instants — every
    * entry point pins `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast
    * is wall-clock-identical to DuckDB's naive read of the same file).
    * For int64-nanos files, truncate to microseconds with integer division —
    * `DIV`, not `/`, because a double round-trip at ~1.7e18 ns loses
    * precision; matches DuckDB's own ns→µs truncation.
    */
  def events(s: SparkSession, d: String): DataFrame = eventsTsType(s, d) match {
    case TimestampType    => t(s, d, "events")
    case TimestampNTZType => t(s, d, "events")
      .withColumn("ts", col("ts").cast(TimestampType))
    case LongType =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      t(s, d, "events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case other => throw new IllegalStateException(
      s"events.ts has unsupported physical type $other — expected " +
        "timestamp[us/ms], int64 nanos, or TIMESTAMP(NANOS)")
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
