package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Exact._

/** Relational query block (SURVEY §2 B): the "same query capabilities"
  * surface, expressed declaratively so Catalyst plans pushdown, partial
  * aggregation, and join strategy.
  */
object Relational {

  /** B1 — TPC-H Q1-style pricing summary. Scan-heavy: one shuffle on the
    * two group keys, partial aggregation map-side, filter pushed to parquet.
    */
  def q1Pricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < expr("timestamp'1995-06-01 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${sqlDavg("l_quantity")} AS avg_qty,
      ${sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> q1Pricing _
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql
  )
}
