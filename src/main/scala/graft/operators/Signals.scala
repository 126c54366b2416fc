package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Exact._

/** Time-series signal operators over the events stream (SURVEY §2 C11+):
  * forward-fill on the densified timeline and self-calibrating rate alerts.
  * Same contract as [[Relational]]: declarative plans, unsorted outputs,
  * exact sums.
  */
object Signals {

  /** C11 — gap-fill + LOCF (last observation carried forward): the densified
    * hourly series from C1c, with missing hours carrying the most recent
    * hour's aggregate value forward instead of zero — the standard
    * downsample-then-ffill resampling of every metrics pipeline. The fill is
    * one IGNORE-NULLS running `last` over the per-type timeline: work
    * partitions by event_type, and the window runs over the DENSIFIED rows
    * (|types| × |hours|), not the raw events — at 100 TB the fill cost
    * tracks the output timeline. Leading missing hours (before the first
    * observation) surface as 0.0.
    */
  def eventsGapFillLocf(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("hour_start")).as("lo"), max(col("hour_start")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour_start"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hour_start"), "left")
      .withColumn("filled", col("n").isNull)
      .withColumn("sum_value_ff",
        coalesce(last(col("sum_value"), ignoreNulls = true).over(w), lit(0.0)))
      .select(col("hour_start"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"), col("filled"), col("sum_value_ff"))
  }

  val eventsGapFillLocfSql: String = s"""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
        COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT event_type, MIN(hour_start) AS lo, MAX(hour_start) AS hi
      FROM hourly GROUP BY 1),
    spine AS (
      SELECT event_type,
        unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour_start
      FROM bounds)
    SELECT s.hour_start, s.event_type, COALESCE(h.n, 0) AS n,
      h.n IS NULL AS filled,
      COALESCE(LAST_VALUE(h.sum_value IGNORE NULLS) OVER (
        PARTITION BY s.event_type ORDER BY s.hour_start
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS sum_value_ff
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hour_start = h.hour_start
    ORDER BY 1, 2"""

  /** C12 — self-calibrating rate alert: hours whose event count exceeds that
    * type's own mean + 2σ over the observed timeline — the anomaly primitive
    * behind every ops dashboard. Two aggregates: hourly counts (one shuffle
    * of the raw events), then per-type moments over the TINY hourly table,
    * broadcast back. Counts are integers, so Σn and Σn² are exact in
    * doubles; z runs in IEEE doubles with the identical expression shape on
    * both engines (the [[Analytics.statsOutliers]] determinism argument).
    */
  val AlertZ = 2.0

  def eventsRateAlert(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(sum(col("n").cast("double")).as("sx"),
        sum((col("n") * col("n")).cast("double")).as("sxx"),
        count(lit(1)).as("cnt"))
      .select(col("event_type"),
        (col("sx") / col("cnt")).as("mean"),
        (col("sxx") / col("cnt") - (col("sx") / col("cnt")) * (col("sx") / col("cnt")))
          .as("varp"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("z", (col("n") - col("mean")) / sqrt(col("varp")))
      .filter(col("z") > AlertZ)
      .select(col("event_type"), col("hour_start"), col("n"),
        round(col("z"), 6).as("z_score"))
  }

  val eventsRateAlertSql: String = s"""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
        COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    st AS (SELECT event_type,
        SUM(CAST(n AS DOUBLE)) AS sx, SUM(CAST(n * n AS DOUBLE)) AS sxx,
        COUNT(*) AS cnt
      FROM hourly GROUP BY 1),
    m AS (SELECT event_type, sx / cnt AS mean,
        sxx / cnt - (sx / cnt) * (sx / cnt) AS varp FROM st)
    SELECT event_type, hour_start, n,
      ROUND((n - mean) / SQRT(varp), 6) AS z_score
    FROM hourly JOIN m USING (event_type)
    WHERE (n - mean) / SQRT(varp) > $AlertZ
    ORDER BY 1, 2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_gap_fill_locf" -> eventsGapFillLocf _,
    "events_rate_alert" -> eventsRateAlert _
  )

  val oracles: Map[String, String] = Map(
    "events_gap_fill_locf" -> eventsGapFillLocfSql,
    "events_rate_alert" -> eventsRateAlertSql
  )
}
