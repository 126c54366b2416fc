package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Exact._

/** Relational query block (SURVEY §2 B + C1/C2): the engine's query surface,
  * expressed declaratively so Catalyst plans pushdown, partial aggregation,
  * and join strategy. Dim joins are explicitly broadcast; fact-fact joins
  * shuffle on their keys and AQE re-plans skew at runtime.
  */
object Relational {

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** B1 — TPC-H Q1-style pricing summary: one shuffle on the group keys,
    * map-side partial aggregation, filter pushed to parquet.
    */
  def q1Pricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < expr("timestamp'1999-06-01 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(revenue).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** B2 — Q3-style: broadcast the filtered dim side, shuffle-agg the fact,
    * decimal-exact revenue so top-k ordering matches the oracle exactly.
    */
  def q3Shipping(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** B3 — Q5-style star join: all dims broadcast, facts shuffle once. */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val asia = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(revenue).as("revenue"))
  }

  /** B4 — broadcast hash join: small dim to every executor, zero shuffle of
    * the fact side.
    */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** B5 — large×large join: shuffles on the join key; AQE picks the physical
    * strategy and splits skewed partitions at runtime.
    */
  def joinShuffle(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).hint("shuffle_merge")
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), dsum(revenue).as("revenue"))

  /** B6 — EXISTS as left-semi (no row multiplication, no dedup pass). */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))

  /** B7 — NOT EXISTS as left-anti. The orders side is restricted to URGENT
    * orders so the anti join has survivors (every customer has SOME order, so
    * the unrestricted form returned 0 rows and its oracle check was vacuous).
    */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))

  /** B8 — outer join with unmatched-side preservation. */
  def joinOuter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))

  /** B9 — ranked window: top-3 orders per customer. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
  }

  /** B10 — running aggregate per key (int128-exact cumulative sum; the
    * running frame updates the two-long accumulator incrementally, no
    * BigDecimal per row-in-frame).
    */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("running_value", dsumOver(col("value"), w))
      .select(col("event_id"), col("user_id"), col("running_value"))
  }

  /** B11 — distinct via partial-aggregate (no global collect). */
  def distinctOp(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()

  /** B12 — global top-k: TakeOrdered (per-partition heaps), not a full sort. */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(20)

  /** B13 — rollup: hierarchical aggregates in one pass. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** B13b — CUBE: all 2^k grouping-set combinations in one pass. Spark
    * expands the sets BEFORE the partial aggregate, so map-side combine
    * still applies and the single shuffle carries only (set, key) partial
    * rows — the same one-shuffle shape as rollup at any scale.
    */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** B9b — distribution window functions: percent_rank / cume_dist per
    * status partition. Both are rank-based (tie order can't change the
    * result), so the output is deterministic and float-safe after 6dp
    * rounding on both sides.
    */
  def windowPercentRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cum_dist"))
  }

  /** B28 — INTERSECT / EXCEPT set semantics in one result: customers who
    * ordered in both 1995 and 1996 (intersect, tagged `both`) and in 1995
    * only (except, tagged `1995_only`). Spark plans both as LEFT SEMI /
    * LEFT ANTI hash joins over pre-deduplicated sides — each leg dedups
    * BEFORE the join shuffle, so the exchange carries distinct key sets,
    * not raw fact rows. Final union is partition concatenation; no sort.
    */
  def setIntersectExcept(s: SparkSession, d: String): DataFrame = {
    def buyers(year: Int) = Tables.orders(s, d)
      .filter(col("o_orderdate") >= expr(s"timestamp'$year-01-01 00:00:00'") &&
        col("o_orderdate") < expr(s"timestamp'${year + 1}-01-01 00:00:00'"))
      .select(col("o_custkey"))
    val a = buyers(1995)
    val b = buyers(1996)
    a.intersect(b).withColumn("tag", lit("both"))
      .union(a.except(b).withColumn("tag", lit("1995_only")))
  }

  /** B29 — lead/lag event sequencing: per user, each event's gap to the
    * previous event (integer microseconds — exact, no float drift) and the
    * type of the next event — the building block for funnel/inter-arrival
    * analysis. One shuffle on user_id; deterministic tie-break on
    * (ts, event_id) within a user.
    */
  def windowLeadLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
  }

  /** B14 — as-of join via the union+window algorithm: tag both sides, union,
    * one shuffle on the key, running max over prior right-side rows. No
    * range-condition row explosion, so it survives 100× data (a naive
    * `o2.date < o1.date` theta-join is quadratic per key).
    *
    * Demonstrated as a strict self as-of: each order → customer's most
    * recent PRIOR order date.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    // null literal takes o_orderdate's own type (TIMESTAMP_NTZ from this
    // parquet) — a hardcoded cast("timestamp") would silently retype the
    // whole union
    val dateType = o.schema("o_orderdate").dataType.sql
    val left = o.select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
      col("o_orderkey"), lit(0).as("side"), lit(null).cast(dateType).as("rdate"))
    val right = o.select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(null).cast("long").as("o_orderkey"), lit(1).as("side"),
      col("o_orderdate").as("rdate"))
    // left rows sort before right rows at equal t => strict "<" semantics
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("prev_date", max(col("rdate")).over(w))
      .filter(col("side") === 0)
      .select(col("o_orderkey"), col("prev_date"))
  }

  /** B14c — FORWARD as-of join (round-13; B14 mirrored): each order ← the
    * EARLIEST strictly-later order date of the same customer — the
    * "time-to-next-event" primitive behind churn/repeat-purchase features
    * (B14 looks back; real feature pipelines need both directions). Same
    * union-window device, reflected: rights sort BEFORE lefts at equal t,
    * so the current-row→following frame excludes same-instant rights —
    * strict ">" without a second pass. One shuffle on the key.
    */
  def asofJoinForward(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val dateType = o.schema("o_orderdate").dataType.sql
    val left = o.select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
      col("o_orderkey"), lit(1).as("side"), lit(null).cast(dateType).as("rdate"))
    val right = o.select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(null).cast("long").as("o_orderkey"), lit(0).as("side"),
      col("o_orderdate").as("rdate"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    left.unionByName(right)
      .withColumn("next_date", min(col("rdate")).over(w))
      .filter(col("side") === 1)
      .select(col("o_orderkey"), col("next_date"))
  }

  /** B14b — the same as-of semantics through the custom operator stack
    * (AsOfJoinPlan -> AsOfJoinStrategy -> AsOfJoinExec, a co-partitioned
    * sort-merge as-of). Shares `asof_join`'s oracle: both paths must produce
    * identical results.
    */
  def asofJoinExec(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val left = o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val right = o.select(col("o_custkey").as("r_custkey"), col("o_orderdate").as("r_orderdate"))
    graft.plans.AsOf.join(left, right,
        leftKey = "o_custkey", rightKey = "r_custkey",
        leftTime = "o_orderdate", rightTime = "r_orderdate", strict = true)
      .select(col("o_orderkey"), col("r_orderdate").as("prev_date"))
  }

  /** B15 — JSON extraction with codegen'd path evaluation. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))

  /** B17 — exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`, verified bit-equal at 6 dp).
    */
  def aggPercentiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"))

  /** B27 — join-key skew report: the diagnostic a pipeline runs BEFORE
    * committing a 100 TB shuffle join to a key. Per-key counts (a
    * partial-agg shuffle — data rows never sort) reduce to one row of
    * distribution stats: key cardinality, max, percentiles, mean, max/mean
    * skew factor. A skew factor >> 1 routes the join to the salted path
    * (B18/Skew.saltedJoin). Scale note: the exact-percentile buffer holds
    * one count per DISTINCT key; at extreme key cardinality run the same
    * report on a key sample or swap p50/p90/p99 for fixed-bin histogram
    * quantiles — max/avg/n_keys (the skew signal itself) are constant-size
    * regardless.
    */
  def skewReport(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"),
        round(expr("percentile(n, 0.5)"), 6).as("p50"),
        round(expr("percentile(n, 0.9)"), 6).as("p90"),
        round(expr("percentile(n, 0.99)"), 6).as("p99"),
        round(avg(col("n")), 6).as("avg_n"),
        round(max(col("n")) / avg(col("n")), 6).as("skew"))

  /** B18 — the salted-join path (SURVEY §5 skew design): result must be
    * IDENTICAL to the plain join, so it shares a plain-SQL oracle.
    */
  def saltedJoinAgg(s: SparkSession, d: String): DataFrame = {
    val joined = Skew.saltedJoin(
      Tables.events(s, d), Tables.customer(s, d),
      keyL = "user_id", keyR = "c_custkey", discriminator = "event_id", factor = 8)
    joined.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  /** B18b — AQE skew-join demonstration (round-10 verdict item 7),
    * complementing B18's MANUAL salting: a large-large shuffle join with a
    * PLANTED hot key — half of all events remapped onto customer 1, so one
    * join partition carries ~50% of the probe side. The operator itself is
    * the PLAIN declarative join (no salting, no hints): at real scale this
    * is exactly the query AQE's skew-join handles by splitting the
    * oversized partition at runtime, and PlanSpec proves that machinery
    * fires (skew thresholds lowered to match test data volume, plan
    * inspected post-execution for the skew=true split). WHEN EACH APPLIES:
    * AQE skew-split needs no code change and composes with any join, but
    * only balances the PROBE side of a sort-merge join; B18's explicit
    * salting also spreads a hot BUILD side and works with broadcast-free
    * hash joins — the belt when AQE's runtime stats can't see the skew.
    * Results are AQE-invariant by construction, so the gate keys the plain
    * oracle.
    */
  def joinAqeSkew(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("uid",
        when(pmod(col("event_id"), lit(2L)) === 0, lit(1L))
          .otherwise(col("user_id")))
    ev.join(Tables.orders(s, d), col("uid") === col("o_custkey"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
  }

  /** B19 — Q12-style conditional aggregation: CASE counts inside one agg
    * pass (no second scan, no join).
    */
  def q12Priority(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("low_line_count"))

  /** B20 — Q14-style conditional-revenue ratio: two int128-exact sums, one
    * final division.
    */
  def q14Promo(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * dsum(when(col("p_type").startsWith("PROMO"), revenue)
            .otherwise(lit(0.0)))
          / dsum(revenue)).as("promo_ratio"))
      .select(round(col("promo_ratio"), 6).as("promo_ratio"))

  /** B21 — Q10-style returned-item ranking: join + agg + top 20 customers. */
  def q10Returns(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(dsum(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** B24 — pivot: event-type counts to columns. Explicit value list keeps
    * the schema static (no extra distinct-collection job) and matches the
    * oracle's CASE-sum formulation.
    */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)

  /** B25 — unpivot/melt: quality metrics wide -> long. */
  def unpivotQuality(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions._
    Tables.documents(s, d)
      .select(col("doc_id"),
        alphaRatio(col("text")).as("alpha_ratio"),
        spaceRatio(col("text")).as("space_ratio"))
      .unpivot(Array(col("doc_id")),
        Array(col("alpha_ratio"), col("space_ratio")), "metric", "value")
  }

  /** C1 — tumbling-window aggregation (epoch-aligned 1h buckets). */
  def eventsWindowAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** C1b — hopping (sliding) window aggregation: 1h windows every 30min,
    * so each event lands in exactly 2 overlapping windows. Spark's
    * `window(ts, width, slide)` explodes each row into its windows before
    * the partial agg — the fan-out is width/slide (a constant), partial
    * aggregation still combines map-side, and the single shuffle carries
    * only (window, type) partial rows. The oracle expresses the same
    * semantics as a UNION ALL of the two shifted 30-min bucketings.
    */
  def eventsHoppingAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** C1c — gap-filled hourly resample: the aggregated timeline densified so
    * EVERY hour in each type's [min, max] range has a row (zeros where no
    * events landed) — what any downstream time-series model or dashboard
    * needs, and a classic SQL blind spot (GROUP BY can't emit groups that
    * have no rows). Shape: the raw scan pays ONE shuffle into the hourly
    * aggregate; the hour spine is then generated per type from the
    * aggregate's own min/max — post-aggregation data, cardinality
    * |types| × |hours|, broadcast back against the hourly rows. The dense
    * spine never touches the raw events, so at 100 TB the densification
    * cost tracks the output timeline, not the input.
    */
  def eventsGapFill(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("hour_start")).as("lo"), max(col("hour_start")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour_start"))
    spine.join(hourly, Seq("event_type", "hour_start"), "left")
      .select(col("hour_start"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** C2 — sessionization (30-min inactivity gap) as lag/cumsum windows: one
    * shuffle on the user key, no driver state. The streaming equivalent
    * (flatMapGroupsWithState) lives in graft.streaming.
    */
  def eventsSession(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // gap test in exact microseconds: cast-to-long truncates to whole
    // seconds and disagrees with both the oracle and the streaming twin at
    // the 30-minute boundary when gaps carry sub-second parts
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
  }

  /** B26 — range (interval) join WITHOUT a nested-loop plan: for every
    * purchase event, the count/sum of the same user's other events inside
    * the following hour (a conversion-window report). Spark plans a raw
    * `BETWEEN` theta join as BroadcastNestedLoop — O(n·m) and a scale
    * killer — so the interval is rewritten as the standard BINNED equi-join:
    * both sides get a coarse time bin the width of the window, the anchor
    * side expands to the (≤2) bins its window overlaps, the join runs on
    * `(user_id, bin)` as a plain shuffled hash/SMJ with the exact range
    * predicate as a residual condition. Each follower event lives in
    * exactly one bin, so no dedup pass is needed. Left semantics keep
    * zero-follower anchors; microsecond-long arithmetic keeps both engines
    * bit-identical.
    */
  val FollowWindowUs: Long = 3600L * 1000000L

  def rangeJoinFollow(s: SparkSession, d: String): DataFrame = {
    val w = FollowWindowUs
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("eu"), col("value"))
    val anchors = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("eu").as("pu"))
      .withColumn("bin", explode(sequence(expr(s"pu DIV $w"), expr(s"(pu + ${w - 1}) DIV $w"))))
    val followers = ev
      .select(col("event_id").as("f_id"), col("user_id").as("f_user"),
        col("eu").as("fu"), col("value"))
      .withColumn("bin", expr(s"fu DIV $w"))
    anchors.join(followers,
        col("p_user") === col("f_user") && anchors("bin") === followers("bin") &&
          col("fu") >= col("pu") && col("fu") < col("pu") + w &&
          col("f_id") =!= col("p_id"),
        "left")
      .groupBy(col("p_id"))
      .agg(count(col("f_id")).as("n_follow"), dsum(col("value")).as("sum_value"))
      .select(col("p_id"), col("n_follow"), col("sum_value"))
  }

  /** B16b — DETERMINISTIC approximate distinct count (HyperLogLog, p=8,
    * m=256 registers) with a bit-exact DuckDB replay: where
    * `approx_count_distinct` (B16, spec-checked within 5%) uses Spark's
    * internal HLL++ and can only be range-asserted, this sketch is built
    * from the library's oracle-replicable [[graft.plans.MixHash]] family so
    * the driver gate hash-checks it like any exact query.
    *
    * Shape: one codegen'd splitmix64 per row, register = max(rho) per
    * 256-way bucket (partial-agg before one 256-key shuffle), then a
    * single-row reduce — the same constant-size-sketch scaling story as
    * E3/E4. The harmonic sum is computed in exact DECIMAL(38,0) scaled by
    * 2^57 (every 2^-rho term becomes the integer 2^(57-rho)), so the only
    * floating-point steps are one decimal→double conversion, one division,
    * and one round — each correctly rounded identically in the JVM and
    * DuckDB. Estimator: raw alpha_m * m^2 / S (no low-range linear-counting
    * branch: it needs ln(), whose last-ulp behavior differs across libm
    * implementations; the raw estimate is within ~3% for n >= m, and B16's
    * spec separately pins accuracy).
    */
  val HllM = 256
  val HllK: Double = 0.7213 / (1 + 1.079 / HllM) * 65536.0 * 144115188075855872.0

  def hllDistinct(s: SparkSession, d: String): DataFrame =
    hllEstimate(Tables.lineitem(s, d), "l_partkey")

  /** The sketch over any long key column (see [[hllDistinct]]). Accuracy
    * contract is the raw-estimator regime n >= m; below that the estimate
    * biases high (the linear-counting branch is deliberately omitted for
    * oracle determinism).
    */
  def hllEstimate(src: DataFrame, key: String): DataFrame =
    hllFromRegs(hllBucketRho(src, key)
      .groupBy(col("bucket")).agg(max(col("rho")).as("reg")))

  /** Per-row (bucket, rho) derivation — the stateless front half of the
    * sketch, shared with the C17 streaming twin (whose register state is
    * the groupBy-max over exactly these rows).
    */
  def hllBucketRho(src: DataFrame, key: String): DataFrame =
    src
      .select(graft.plans.MixHash.splitmix64Col(col(key)).as("h"))
      .select(expr("shiftrightunsigned(h, 56)").as("bucket"),
        col("h").bitwiseAND(lit((1L << 56) - 1)).as("lower"))
      .select(col("bucket"),
        when(col("lower") === 0, lit(57))
          .otherwise(lit(57) - length(bin(col("lower")))).as("rho"))

  /** Harmonic estimate from a drained register table (bucket, reg). */
  def hllFromRegs(regs: DataFrame): DataFrame =
    regs
      .agg(
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 57 - reg) AS DECIMAL(38,0))")).as("s_present"),
        count(lit(1)).as("cnt"))
      .select(
        round(lit(HllK) /
          (col("s_present") +
            (lit(HllM.toLong) - col("cnt")).cast(DecimalType(38, 0)) * lit(1L << 57))
            .cast("double"), 4).as("approx_distinct"),
        (lit(HllM.toLong) - col("cnt")).as("zero_registers"))

  /** The HLL oracle over any (table, key) — shared by B16b and the C17
    * streaming twin so the register replay lives in one place. */
  def hllSql(table: String, key: String): String = {
    import graft.plans.MixHash._
    s"""
    WITH ${sqlSplitmixCtes(table, s"CAST($key AS HUGEINT)", Nil, "hx")},
    parts AS (SELECT h // 72057594037927936::HUGEINT AS bucket,
                     h % 72057594037927936::HUGEINT AS lower FROM hx),
    rhos AS (SELECT bucket,
        CASE WHEN lower = 0 THEN 57
             ELSE 57 - length(bin(CAST(lower AS BIGINT))) END AS rho FROM parts),
    regs AS (SELECT bucket, MAX(rho) AS reg FROM rhos GROUP BY bucket),
    agg AS (SELECT SUM(1::HUGEINT << (57 - reg)) AS s_present, COUNT(*) AS cnt FROM regs)
    SELECT ROUND(CAST('$HllK' AS DOUBLE) /
             CAST(s_present + ($HllM - cnt) * (1::HUGEINT << 57) AS DOUBLE), 4)
             AS approx_distinct,
           $HllM - cnt AS zero_registers
    FROM agg"""
  }

  val hllDistinctSql: String = hllSql("lineitem", "l_partkey")

  val q1PricingSql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${sqlDavg("l_quantity")} AS avg_qty,
      ${sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1999-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** B66 — FUZZY (edit-distance) self-join over the part-name catalog
    * (round-12): the entity-resolution primitive behind "merge these two
    * catalog entries / these two author spellings" — all unordered
    * distinct-name pairs within Levenshtein distance [[FuzzyK]], WITHOUT
    * an all-pairs plan. Candidate generation is the standard q-gram COUNT
    * FILTER (Gravano et al. 2001): ed(a,b) ≤ K forces the q-gram
    * multisets to share ≥ max(|a|,|b|) − q + 1 − K·q grams, so candidates
    * come from an inverted q-gram index (grams tagged by occurrence index
    * — multiset semantics, the theorem's requirement) with a per-pair
    * count cut, then exact `levenshtein` verifies only those. The filter
    * is powerless PER PAIR, not per name: a pair is unprunable iff
    * max(|a|,|b|) ≤ K·q + q − 1 (its count threshold is ≤ 0, and the two
    * names may share zero grams). So EVERY name with |n| ≥ q is indexed
    * — a short name can still pair with a long one through shared grams
    * (e.g. 'abcd' × 'abcdef', threshold 1) — and only the unprunable
    * pairs (both names short) take the tiny cross join among short
    * names, excluded from the gram path to avoid double emission. Names
    * with |n| < q produce no grams, but any partner long enough to need
    * the gram path is already > K away by the length bound ed ≥ ||a|−|b||.
    * Scale: postings explode → hash-partition on gram → pair counts, the
    * E2 inverted-index discipline on names.
    */
  val FuzzyK = 2
  val FuzzyQ = 2

  def joinFuzzyNames(s: SparkSession, d: String): DataFrame = {
    val maxUnprunable = FuzzyK * FuzzyQ + FuzzyQ - 1 // filter powerless below this
    val nm = Tables.part(s, d).select(col("p_name").as("n")).distinct()
      .withColumn("len", length(col("n")))
    // tagged q-grams over EVERY gram-able name (k-th occurrence of a gram
    // becomes (gram, k) — the multiset intersection the theorem needs)
    val grams = nm.filter(col("len") >= FuzzyQ)
      .select(col("n"), col("len"), posexplode(expr(
        s"transform(sequence(1, len - ${FuzzyQ - 1}), i -> substring(n, i, $FuzzyQ))"))
        .as(Seq("pos", "g")))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("n"), col("g")).orderBy(col("pos"))))
      .select(col("n"), col("len"), col("g"), col("k"))
    val candLong = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.k") === col("b.k") &&
          col("a.n") < col("b.n"))
      .groupBy(col("a.n").as("name_a"), col("b.n").as("name_b"),
        col("a.len").as("la"), col("b.len").as("lb"))
      // prunable pairs only — the unprunable ones (both short) go through
      // the cross join below; keeping them out here prevents duplicates
      .agg(count(lit(1)).as("shared"))
      .filter(greatest(col("la"), col("lb")) > maxUnprunable)
      .filter(col("shared") >=
        greatest(col("la"), col("lb")) - (FuzzyQ - 1) - FuzzyK * FuzzyQ)
      .select(col("name_a"), col("name_b"))
    val short = nm.filter(col("len") <= maxUnprunable)
    val candShort = short.as("a").join(short.as("b"), col("a.n") < col("b.n"))
      .select(col("a.n").as("name_a"), col("b.n").as("name_b"))
    candLong.unionByName(candShort)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= FuzzyK)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  val joinFuzzyNamesSql: String = s"""
    WITH nm AS (SELECT DISTINCT p_name AS n FROM part)
    SELECT a.n AS name_a, b.n AS name_b,
      CAST(levenshtein(a.n, b.n) AS INTEGER) AS dist
    FROM nm a JOIN nm b ON a.n < b.n
    WHERE levenshtein(a.n, b.n) <= $FuzzyK
    ORDER BY 1, 2"""

  /** B68 — RECORD LINKAGE (round-12 verdict item 10): B66's q-gram device
    * generalized to the two-field entity-resolution shape users actually
    * run — records link iff they agree EXACTLY on a blocking field
    * (p_brand) and their name field is within Levenshtein [[FuzzyK]].
    * Blocking is the standard linkage device (Fellegi-Sunter practice):
    * the gram inverted index is keyed on (block, gram, occurrence), so
    * candidate generation never crosses blocks, and a per-block LENGTH
    * BAND (ed ≥ \|la−lb\| ⇒ band ≤ K) prunes the postings join before the
    * count filter runs. The per-pair routing fix from B66 carries over:
    * every gram-able name is indexed; only pairs with both names short
    * take the in-block cross join. Scale: block × gram partitioning — the
    * worst key is (hottest block × hottest gram), strictly finer than
    * B66's gram-only keys.
    */
  def joinRecordLinkage(s: SparkSession, d: String): DataFrame = {
    val maxUnprunable = FuzzyK * FuzzyQ + FuzzyQ - 1
    val nm = Tables.part(s, d)
      .select(col("p_brand").as("blk"), col("p_name").as("n")).distinct()
      .withColumn("len", length(col("n")))
    val grams = nm.filter(col("len") >= FuzzyQ)
      .select(col("blk"), col("n"), col("len"), posexplode(expr(
        s"transform(sequence(1, len - ${FuzzyQ - 1}), i -> substring(n, i, $FuzzyQ))"))
        .as(Seq("pos", "g")))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("blk"), col("n"), col("g")).orderBy(col("pos"))))
      .select(col("blk"), col("n"), col("len"), col("g"), col("k"))
    val candLong = grams.as("a").join(grams.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.g") === col("b.g") && col("a.k") === col("b.k") &&
          col("a.n") < col("b.n") &&
          abs(col("a.len") - col("b.len")) <= FuzzyK)
      .groupBy(col("a.blk").as("brand"), col("a.n").as("name_a"),
        col("b.n").as("name_b"), col("a.len").as("la"), col("b.len").as("lb"))
      .agg(count(lit(1)).as("shared"))
      .filter(greatest(col("la"), col("lb")) > maxUnprunable)
      .filter(col("shared") >=
        greatest(col("la"), col("lb")) - (FuzzyQ - 1) - FuzzyK * FuzzyQ)
      .select(col("brand"), col("name_a"), col("name_b"))
    val short = nm.filter(col("len") <= maxUnprunable)
    val candShort = short.as("a").join(short.as("b"),
        col("a.blk") === col("b.blk") && col("a.n") < col("b.n") &&
          abs(col("a.len") - col("b.len")) <= FuzzyK)
      .select(col("a.blk").as("brand"), col("a.n").as("name_a"), col("b.n").as("name_b"))
    candLong.unionByName(candShort)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= FuzzyK)
      .select(col("brand"), col("name_a"), col("name_b"), col("dist"))
  }

  val joinRecordLinkageSql: String = s"""
    WITH nm AS (SELECT DISTINCT p_brand AS brand, p_name AS n FROM part)
    SELECT a.brand, a.n AS name_a, b.n AS name_b,
      CAST(levenshtein(a.n, b.n) AS INTEGER) AS dist
    FROM nm a JOIN nm b ON a.brand = b.brand AND a.n < b.n
    WHERE levenshtein(a.n, b.n) <= $FuzzyK
    ORDER BY 1, 2, 3"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_fuzzy_names" -> joinFuzzyNames _,
    "join_record_linkage" -> joinRecordLinkage _,
    "q1_pricing" -> q1Pricing _,
    "q3_shipping" -> q3Shipping _,
    "q5_local_supplier" -> q5LocalSupplier _,
    "join_broadcast" -> joinBroadcast _,
    "join_shuffle" -> joinShuffle _,
    "join_semi" -> joinSemi _,
    "join_anti" -> joinAnti _,
    "join_outer" -> joinOuter _,
    "window_rank" -> windowRank _,
    "window_percent_rank" -> windowPercentRank _,
    "window_running" -> windowRunning _,
    "distinct_op" -> distinctOp _,
    "topk_orders" -> topkOrders _,
    "rollup_agg" -> rollupAgg _,
    "cube_agg" -> cubeAgg _,
    "asof_join" -> asofJoin _,
    "asof_join_forward" -> asofJoinForward _,
    "asof_join_exec" -> asofJoinExec _,
    "json_extract" -> jsonExtract _,
    "agg_percentiles" -> aggPercentiles _,
    "q12_priority" -> q12Priority _,
    "pivot_events" -> pivotEvents _,
    "unpivot_quality" -> unpivotQuality _,
    "q14_promo" -> q14Promo _,
    "q10_returns" -> q10Returns _,
    "salted_join_agg" -> saltedJoinAgg _,
    "join_aqe_skew" -> joinAqeSkew _,
    "events_window_agg" -> eventsWindowAgg _,
    "events_hopping_agg" -> eventsHoppingAgg _,
    "events_gap_fill" -> eventsGapFill _,
    "events_session" -> eventsSession _,
    "set_intersect_except" -> setIntersectExcept _,
    "window_lead_lag" -> windowLeadLag _,
    "range_join_follow" -> rangeJoinFollow _,
    "skew_report" -> skewReport _,
    "hll_distinct" -> hllDistinct _
  )

  val oracles: Map[String, String] = Map(
    "join_fuzzy_names" -> joinFuzzyNamesSql,
    "join_record_linkage" -> joinRecordLinkageSql,
    "q1_pricing" -> q1PricingSql,
    "hll_distinct" -> hllDistinctSql,
    "q3_shipping" -> s"""
      SELECT l_orderkey, o_orderdate,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_local_supplier" -> s"""
      SELECT n_name, ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name""",
    "join_broadcast" -> s"""
      SELECT p_brand, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",
    "join_shuffle" -> s"""
      SELECT o_orderpriority, COUNT(*) AS n_items,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "join_semi" -> """
      SELECT c_mktsegment, COUNT(*) AS n FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_anti" -> """
      SELECT c_mktsegment, COUNT(*) AS n FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_outer" -> """
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",
    "window_rank" -> """
      SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "window_running" -> s"""
      SELECT event_id, user_id,
        ${Exact.sqlDsumOver("value", """OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")} AS running_value
      FROM events ORDER BY event_id""",
    "distinct_op" -> """
      SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      ORDER BY c_mktsegment, c_nationkey""",
    "topk_orders" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "rollup_agg" -> s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "cube_agg" -> s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "window_percent_rank" -> """
      SELECT o_orderkey, o_orderstatus,
        ROUND(percent_rank() OVER w, 6) AS pct_rank,
        ROUND(cume_dist() OVER w, 6) AS cum_dist
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
      ORDER BY o_orderkey""",
    "asof_join" -> """
      SELECT o1.o_orderkey,
        (SELECT max(o2.o_orderdate) FROM orders o2
         WHERE o2.o_custkey = o1.o_custkey AND o2.o_orderdate < o1.o_orderdate) AS prev_date
      FROM orders o1 ORDER BY o1.o_orderkey""",
    "asof_join_forward" -> """
      SELECT o1.o_orderkey,
        (SELECT min(o2.o_orderdate) FROM orders o2
         WHERE o2.o_custkey = o1.o_custkey AND o2.o_orderdate > o1.o_orderdate) AS next_date
      FROM orders o1 ORDER BY o1.o_orderkey""",
    "asof_join_exec" -> """
      SELECT o1.o_orderkey,
        (SELECT max(o2.o_orderdate) FROM orders o2
         WHERE o2.o_custkey = o1.o_custkey AND o2.o_orderdate < o1.o_orderdate) AS prev_date
      FROM orders o1 ORDER BY o1.o_orderkey""",
    // NOTE: DuckDB SUM(integer) returns HUGEINT (int128); the driver's pandas
    // hash renders that differently from Spark's int64 even when values are
    // equal, so every integer SUM below is CAST back to BIGINT (round-1
    // hash-fail root cause for json_extract / pivot_events / q12_priority).
    "json_extract" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      FROM events GROUP BY event_type ORDER BY event_type""",
    "pivot_events" -> """
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY user_id ORDER BY user_id""",
    "unpivot_quality" -> s"""
      SELECT doc_id, 'alpha_ratio' AS metric, ${graft.functions.TextFunctions.alphaRatioSql("text")} AS value FROM documents
      UNION ALL
      SELECT doc_id, 'space_ratio', ${graft.functions.TextFunctions.spaceRatioSql("text")} FROM documents
      ORDER BY doc_id, metric""",
    "q12_priority" -> """
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q14_promo" -> s"""
      SELECT ROUND(
        100.0 * ${Exact.sqlDsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
        / ${Exact.sqlDsum("l_extendedprice * (1 - l_discount)")}, 6) AS promo_ratio
      FROM lineitem JOIN part ON l_partkey = p_partkey""",
    "q10_returns" -> s"""
      SELECT c_custkey, c_name, ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name
      ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "skew_report" -> """
      WITH c AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey)
      SELECT COUNT(*) AS n_keys, MAX(n) AS max_n,
        ROUND(quantile_cont(n, 0.5), 6) AS p50,
        ROUND(quantile_cont(n, 0.9), 6) AS p90,
        ROUND(quantile_cont(n, 0.99), 6) AS p99,
        ROUND(AVG(n), 6) AS avg_n,
        ROUND(MAX(n) / AVG(n), 6) AS skew
      FROM c""",
    "agg_percentiles" -> """
      SELECT o_orderpriority, COUNT(*) AS n,
        ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "salted_join_agg" -> s"""
      SELECT c_mktsegment, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_aqe_skew" -> s"""
      SELECT event_type, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
      FROM (SELECT event_type,
              CASE WHEN event_id % 2 = 0 THEN 1 ELSE user_id END AS uid
            FROM events) e
      JOIN orders ON uid = o_custkey
      GROUP BY event_type ORDER BY event_type""",
    "events_window_agg" -> s"""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
        COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_hopping_agg" -> s"""
      WITH both_hops AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
               event_type, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
               AS window_start, event_type, value FROM events)
      SELECT window_start, event_type,
        COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM both_hops GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_gap_fill" -> s"""
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
      SELECT s.hour_start, s.event_type,
        COALESCE(h.n, 0) AS n, COALESCE(h.sum_value, 0.0) AS sum_value
      FROM spine s LEFT JOIN hourly h
        ON s.event_type = h.event_type AND s.hour_start = h.hour_start
      ORDER BY 1, 2""",
    "set_intersect_except" -> """
      WITH a AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                   AND o_orderdate < TIMESTAMP '1996-01-01'),
           b AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01')
      SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      UNION ALL
      SELECT o_custkey, '1995_only' AS tag FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      ORDER BY tag, o_custkey""",
    "window_lead_lag" -> """
      SELECT event_id, user_id, event_type,
        epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        lead(event_type) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id""",
    "range_join_follow" -> s"""
      WITH p AS (
        SELECT event_id AS p_id, user_id, epoch_us(ts) AS pu
        FROM events WHERE event_type = 'purchase'),
      e AS (
        SELECT event_id, user_id, epoch_us(ts) AS eu, value FROM events)
      SELECT p.p_id, COUNT(e.event_id) AS n_follow,
        ${sqlDsum("e.value")} AS sum_value
      FROM p LEFT JOIN e ON e.user_id = p.user_id
        AND e.eu >= p.pu AND e.eu < p.pu + ${FollowWindowUs}
        AND e.event_id <> p.p_id
      GROUP BY p.p_id ORDER BY p.p_id""",
    "events_session" -> s"""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      numbered AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged)
      SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, session_seq
      ORDER BY user_id, session_start"""
  )
}
