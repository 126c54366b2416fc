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
    *
    * Cached per path with the metadata fingerprint as the staleness token
    * ([[graft.Artifacts.cachedValue]]): regenerating the file in place
    * (even with a different ts encoding) takes a fresh probe instead of the
    * stale branch, a moved fingerprint REPLACES the old entry (no
    * unbounded growth), and [[events]] computes the fingerprint once per
    * call and shares it with the era probe — one listing per events() call.
    */
  private val tsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, DataType)]()

  def eventsTsType(s: SparkSession, d: String): DataType =
    eventsTsTypeFp(s, d, graft.Artifacts.fingerprint(s, s"$d/events.parquet"))

  private def eventsTsTypeFp(s: SparkSession, d: String, fp: String): DataType = {
    val path = s"$d/events.parquet"
    graft.Artifacts.cachedValue(tsTypeCache, path, fp) {
      try s.read.parquet(path).schema("ts").dataType
      catch {
        // Only the specific TIMESTAMP(NANOS) schema-inference failure
        // ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))") selects the
        // legacy-nanos branch; any other failure (missing file, corrupt
        // footer, permissions) propagates untouched instead of flipping the
        // session-wide legacy conf as a side effect.
        case e: Exception if {
          val m = String.valueOf(e.getMessage)
          m.contains("TIMESTAMP(NANOS") || m.contains("Illegal Parquet type")
        } =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          s.read.parquet(path).schema("ts").dataType
      }
    }
  }

  /** Data-era sanity gate, cached per path (one column-pruned scan per JVM):
    * after normalization, min(ts) must be a plausible event time. A
    * timestamp-unit mistake on read (µs read as ns, or ns as µs) lands
    * decades away — near 1970 after a 1000× shrink, past year 5000 after a
    * 1000× stretch — and silently passes row-count smoke checks while every
    * window/session/join answer is garbage (the round-6/7 failure class).
    * This makes the unit mistake CRASH at the source instead. Every events
    * consumer (batch and streaming) runs through it.
    */
  private val eraChecked =
    new java.util.concurrent.ConcurrentHashMap[String, (String, java.lang.Boolean)]()
  private val EraMin = java.sql.Timestamp.valueOf("1990-01-01 00:00:00")
  private val EraMax = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")

  def assertEventsEra(s: SparkSession, d: String): Unit =
    assertEventsEraFp(s, d, graft.Artifacts.fingerprint(s, s"$d/events.parquet"))

  private def assertEventsEraFp(s: SparkSession, d: String, fp: String): Unit = {
    val p = s"$d/events.parquet"
    // fingerprint as the staleness token: a regenerated file is re-checked,
    // so a bad overwrite cannot hide behind a pass recorded for the old data
    graft.Artifacts.cachedValue(eraChecked, p, fp) {
      val mn = eventsNormalizedFp(s, d, fp)
        .agg(org.apache.spark.sql.functions.min(col("ts"))).head.getTimestamp(0)
      if (mn != null && (mn.before(EraMin) || mn.after(EraMax)))
        throw new IllegalStateException(
          s"events.ts era check failed for $p: min(ts)=$mn outside " +
            "[1990, 2100] — timestamp unit mismatch (ns/µs confusion) on read")
      java.lang.Boolean.TRUE
    }
    ()
  }

  /** events with `ts` normalized to TimestampType (UTC instants — every
    * entry point pins `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast
    * is wall-clock-identical to DuckDB's naive read of the same file).
    * For int64-nanos files, truncate to microseconds with integer division —
    * `DIV`, not `/`, because a double round-trip at ~1.7e18 ns loses
    * precision; matches DuckDB's own ns→µs truncation.
    */
  private def eventsNormalizedFp(s: SparkSession, d: String, fp: String): DataFrame =
    eventsTsTypeFp(s, d, fp) match {
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

  def events(s: SparkSession, d: String): DataFrame = {
    // ONE metadata listing per call, shared by the ts-type and era probes
    val fp = graft.Artifacts.fingerprint(s, s"$d/events.parquet")
    val df = eventsNormalizedFp(s, d, fp)
    assertEventsEraFp(s, d, fp)
    df
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
