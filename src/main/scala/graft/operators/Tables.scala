package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map to
    * TimestampType. Read it as raw nanos (legacy conf) and truncate to
    * microseconds with integer division — `DIV`, not `/`, because a double
    * round-trip at ~1.7e18 ns loses precision. Matches DuckDB's own ns→µs
    * truncation, so oracle timestamps are identical.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
