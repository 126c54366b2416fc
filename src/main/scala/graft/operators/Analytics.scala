package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Exact._

/** Second analytics block (SURVEY §2 B30+): aggregate-then-join, grouping
  * sets, funnel analysis, histogramming, CDC merge, and runtime bloom-filter
  * join pruning. Same contract as [[Relational]]: declarative plans, outputs
  * unsorted (the gate row-sorts), decimal-exact money math.
  */
object Analytics {

  /** B30 — TPC-H Q18-style large-volume orders: aggregate the fact table
    * FIRST (having-filter on the grouped sum), then join the surviving keys
    * to orders/customer. At 100 TB the pre-aggregation is the whole game:
    * the join input shrinks from every lineitem row to one row per
    * qualifying order before any wide join runs. Customer is broadcast.
    */
  def q18LargeVolume(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** B13c — GROUPING SETS beyond rollup/cube: per-returnflag totals,
    * per-linestatus totals, and the grand total in one pass. Catalyst
    * expands the sets map-side; still a single shuffle on the expanded keys.
    */
  def groupingSetsAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** C8 — event funnel: signup -> first view after signup -> first purchase
    * within 24h of that view. Every stage keys by user_id and the join
    * strategy is left to Catalyst: at small SF the per-user stage aggregates
    * sit under the broadcast threshold and plan as broadcast joins; at scale
    * their size estimate grows with the user count and the same query falls
    * back to shuffle joins co-partitioned on user_id (one shared hash
    * partitioning across all three stages). Nothing in the operator pins the
    * small-data plan. Each stage's headline count is a global aggregate —
    * a whitelisted 1-row single-partition reduce.
    */
  val FunnelPurchaseWindowUs: Long = 86400L * 1000000L

  def eventFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_signup"))
    val vw = ev.filter(col("event_type") === "view")
      .join(su, "user_id")
      .filter(col("ts") > col("ts_signup"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_view"))
    val pu = ev.filter(col("event_type") === "purchase")
      .join(vw, "user_id")
      .filter(col("ts") > col("ts_view") &&
        unix_micros(col("ts")) - unix_micros(col("ts_view")) <= FunnelPurchaseWindowUs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_purchase"))
    def stage(df: DataFrame, step: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(name).as("stage"), col("n_users"))
    stage(su, 1, "signup")
      .unionByName(stage(vw, 2, "view"))
      .unionByName(stage(pu, 3, "purchase"))
  }

  /** B31 — fixed-width histogram: bin key computed in the scan's codegen
    * stage, one shuffle into ~10 bins. The no-surprises building block for
    * distribution profiling at any scale.
    */
  val HistBinWidth = 50000.0

  def histBins(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("bin", floor(col("o_totalprice") / lit(HistBinWidth)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  /** B32 — CDC merge/upsert: a base snapshot (orders before the cutoff,
    * pre-aggregated per customer) merged with a delta batch (orders after)
    * via one full-outer join on the key. The merged snapshot must equal a
    * direct recompute over the union — that recompute IS the oracle, so the
    * gate proves the merge arithmetic, not just the join shape. Partial sums
    * stay DECIMAL until after the merge add: summing exact decimals then
    * casting once matches the oracle's single decimal sum bit-for-bit
    * (double(a)+double(b) would not).
    */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val cut = expr("timestamp'1998-01-01 00:00:00'")
    val dec = DecimalType(18, 4)
    val orders = Tables.orders(s, d)
    val base = orders.filter(col("o_orderdate") < cut).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("b_n"), max(col("o_orderdate")).as("b_last"),
        sum(col("o_totalprice").cast(dec)).as("b_sum"))
    val delta = orders.filter(col("o_orderdate") >= cut).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("d_n"), max(col("o_orderdate")).as("d_last"),
        sum(col("o_totalprice").cast(dec)).as("d_sum"))
    base.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_orders"),
        greatest(col("b_last"), col("d_last")).as("last_odate"),
        (coalesce(col("b_sum"), lit(0).cast(dec)) +
          coalesce(col("d_sum"), lit(0).cast(dec))).cast("double").as("sum_price"))
  }

  /** B33 — bloom-pruned semi-join (see [[Skew.bloomPrunedSemiJoin]]): events
    * whose user bought in the BUILDING segment, aggregated per event type.
    * The oracle is the plain EXISTS form — bloom false positives must be
    * invisible in the result.
    */
  def joinBloomPrune(s: SparkSession, d: String): DataFrame = {
    implicit val ss: SparkSession = s
    val dim = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    Skew.bloomPrunedSemiJoin(Tables.events(s, d), dim, "user_id", "c_custkey")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  /** B9c — NTILE quantile binning WITHIN partitions: quartiles of order
    * value per priority class. The window partitions by o_orderpriority, so
    * work distributes across the partition key — the scalable form of
    * quantile binning (a GLOBAL ntile would be a single-partition sort; for
    * global quantiles use approx boundaries + bin assignment instead).
    * Unique (price, orderkey) sort keys make bucket edges deterministic.
    */
  def windowNtile(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
  }

  /** B34 — Q17-style aggregate-subquery predicate: lineitems below 20% of
    * their part's average quantity. The per-part average is a grouped
    * aggregate joined back to the fact — both sides shuffle on l_partkey
    * (the agg side is one row per part, far smaller). The 6dp-rounded
    * decimal-exact average makes the 0.2×avg threshold bit-identical on
    * both engines, so boundary rows cannot flip the filter.
    */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val aq = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(davg(col("l_quantity")).as("aq"))
    Tables.lineitem(s, d).join(aq, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg(round(dsum(col("l_extendedprice")) / 7.0, 6).as("avg_yearly"))
  }

  /** B35 — Z-order layout key: Morton interleave of (customer, order-day)
    * into one clustering key. Range-partitioning + sorting by `zvalue` at
    * write time co-locates rows that are close in BOTH dimensions, so
    * parquet row-group min/max stats prune scans filtered on EITHER column —
    * the standard multi-dimensional data-skipping layout at 100 TB. The
    * bit-spread runs as plain integer arithmetic (codegen, no UDF) and the
    * oracle replays the identical shift/mask pipeline in DuckDB.
    */
  val ZorderEpoch = "1995-01-01"

  private def spread16(c: Column): Column = {
    // spread the low 16 bits of c so consecutive bits land 2 apart
    val a = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val e = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (e.bitwiseOR(shiftleft(e, 1))).bitwiseAND(lit(0x55555555L))
  }

  def layoutZorder(s: SparkSession, d: String): DataFrame = {
    val xb = pmod(col("o_custkey"), lit(65536L))
    val yb = datediff(col("o_orderdate"), lit(ZorderEpoch).cast("date"))
      .cast("long").bitwiseAND(lit(65535L))
    Tables.orders(s, d)
      .select(col("o_orderkey"), xb.as("xb"), yb.as("yb"))
      .select(col("o_orderkey"),
        spread16(col("xb")).bitwiseOR(shiftleft(spread16(col("yb")), 1)).as("zvalue"))
  }

  /** B36 — approximate quantiles from a fixed histogram: one pass folds the
    * data into (group, bin) partial counts — k×bins rows of state, the
    * mergeable-summary shape that scales to 100 TB — then a tiny window
    * cumsum picks the first bin whose cumulative count crosses the target
    * rank. Estimates are bin upper edges (error ≤ bin width). Contrast B17
    * `agg_percentiles`, whose exact buffers hold every value per group.
    * Everything is integer counts + one double multiply, so the oracle
    * replays it exactly.
    */
  val AqBinWidth = 5000.0

  def approxQuantileHist(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderpriority"))
    Tables.orders(s, d)
      .withColumn("bin", floor(col("o_totalprice") / lit(AqBinWidth)).cast("long"))
      .groupBy(col("o_orderpriority"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("o_orderpriority"))
      .agg(
        min(when(col("cum") >= lit(0.5) * col("n"), (col("bin") + 1) * AqBinWidth)).as("p50_est"),
        min(when(col("cum") >= lit(0.9) * col("n"), (col("bin") + 1) * AqBinWidth)).as("p90_est"))
  }

  /** B37 — referential-integrity audit: orphan counts for each FK edge of
    * the schema in one result. Anti-joins leave Catalyst free to broadcast
    * the key side; each check is a count of survivors. The first query a
    * pipeline runs after ingesting 100 TB of upstream-supplied data.
    */
  def qualityFkOrphans(s: SparkSession, d: String): DataFrame = {
    def orphans(fact: DataFrame, dim: DataFrame, fk: String, pk: String,
        label: String): DataFrame =
      fact.join(dim, col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(label).as("fk_edge"), col("n_orphans"))
    orphans(Tables.lineitem(s, d), Tables.orders(s, d),
        "l_orderkey", "o_orderkey", "lineitem->orders")
      .unionByName(orphans(Tables.orders(s, d), Tables.customer(s, d),
        "o_custkey", "c_custkey", "orders->customer"))
      .unionByName(orphans(Tables.events(s, d), Tables.customer(s, d),
        "user_id", "c_custkey", "events->customer"))
  }

  /** B38 — column profile: null count and exact distinct cardinality per
    * audited column, long format. Each column is one aggregate over the
    * same scan; COUNT(DISTINCT) shuffles the distinct values (bounded by
    * the column's cardinality). The schema-health snapshot that gates a
    * pipeline run.
    */
  def qualityProfile(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    def prof(c: String): DataFrame =
      o.agg(count(lit(1)).as("n_rows"),
          count(when(col(c).isNull, lit(1))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"), col("n_distinct"))
    prof("o_orderstatus").unionByName(prof("o_orderpriority")).unionByName(prof("o_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_large_volume" -> q18LargeVolume _,
    "grouping_sets_agg" -> groupingSetsAgg _,
    "event_funnel" -> eventFunnel _,
    "hist_bins" -> histBins _,
    "merge_upsert" -> mergeUpsert _,
    "join_bloom_prune" -> joinBloomPrune _,
    "window_ntile" -> windowNtile _,
    "q17_small_qty" -> q17SmallQty _,
    "layout_zorder" -> layoutZorder _,
    "approx_quantile_hist" -> approxQuantileHist _,
    "quality_fk_orphans" -> qualityFkOrphans _,
    "quality_profile" -> qualityProfile _
  )

  val oracles: Map[String, String] = Map(
    "q18_large_volume" -> s"""
      SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM (SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY 1
            HAVING ${sqlDsum("l_quantity")} > 300) s
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "grouping_sets_agg" -> s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "event_funnel" -> s"""
      WITH s AS (SELECT user_id, MIN(ts) AS ts_signup FROM events
                 WHERE event_type = 'signup' GROUP BY 1),
      v AS (SELECT e.user_id, MIN(e.ts) AS ts_view FROM events e
            JOIN s ON e.user_id = s.user_id
              AND epoch_us(e.ts) > epoch_us(s.ts_signup)
            WHERE e.event_type = 'view' GROUP BY 1),
      p AS (SELECT e.user_id, MIN(e.ts) AS ts_purchase FROM events e
            JOIN v ON e.user_id = v.user_id
              AND epoch_us(e.ts) > epoch_us(v.ts_view)
              AND epoch_us(e.ts) - epoch_us(v.ts_view) <= $FunnelPurchaseWindowUs
            WHERE e.event_type = 'purchase' GROUP BY 1)
      SELECT 1 AS step, 'signup' AS stage, COUNT(*) AS n_users FROM s
      UNION ALL SELECT 2, 'view', COUNT(*) FROM v
      UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p
      ORDER BY step""",
    "hist_bins" -> s"""
      SELECT CAST(FLOOR(o_totalprice / $HistBinWidth) AS BIGINT) AS bin,
        COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1 ORDER BY 1""",
    "merge_upsert" -> s"""
      SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_orderdate) AS last_odate,
        ${sqlDsum("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1 ORDER BY 1""",
    "join_bloom_prune" -> s"""
      SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM events
      WHERE EXISTS (SELECT 1 FROM customer
                    WHERE c_custkey = user_id AND c_mktsegment = 'BUILDING')
      GROUP BY 1 ORDER BY 1""",
    "window_ntile" -> s"""
      SELECT o_orderpriority, quartile, COUNT(*) AS n,
        ${sqlDsum("o_totalprice")} AS sum_price
      FROM (SELECT o_orderpriority, o_totalprice,
              CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
            FROM orders)
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "q17_small_qty" -> s"""
      WITH aq AS (SELECT l_partkey, ${sqlDavg("l_quantity")} AS aq
                  FROM lineitem GROUP BY 1)
      SELECT ROUND(${sqlDsum("l_extendedprice")} / 7.0, 6) AS avg_yearly
      FROM lineitem JOIN aq USING (l_partkey)
      WHERE l_quantity < 0.2 * aq""",
    "layout_zorder" -> s"""
      WITH b AS (SELECT o_orderkey,
          o_custkey % 65536 AS xb,
          date_diff('day', TIMESTAMP '$ZorderEpoch 00:00:00', o_orderdate) & 65535 AS yb
        FROM orders),
      s1 AS (SELECT o_orderkey, ((xb | (xb << 8)) & 16711935) AS x,
               ((yb | (yb << 8)) & 16711935) AS y FROM b),
      s2 AS (SELECT o_orderkey, ((x | (x << 4)) & 252645135) AS x,
               ((y | (y << 4)) & 252645135) AS y FROM s1),
      s3 AS (SELECT o_orderkey, ((x | (x << 2)) & 858993459) AS x,
               ((y | (y << 2)) & 858993459) AS y FROM s2),
      s4 AS (SELECT o_orderkey, ((x | (x << 1)) & 1431655765) AS x,
               ((y | (y << 1)) & 1431655765) AS y FROM s3)
      SELECT o_orderkey, (x | (y << 1)) AS zvalue FROM s4 ORDER BY o_orderkey""",
    "approx_quantile_hist" -> s"""
      WITH h AS (SELECT o_orderpriority,
          CAST(FLOOR(o_totalprice / $AqBinWidth) AS BIGINT) AS bin, COUNT(*) AS c
        FROM orders GROUP BY 1, 2),
      cw AS (SELECT o_orderpriority, bin, c,
          SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          SUM(c) OVER (PARTITION BY o_orderpriority) AS n
        FROM h)
      SELECT o_orderpriority,
        MIN(CASE WHEN cum >= 0.5 * n THEN (bin + 1) * $AqBinWidth END) AS p50_est,
        MIN(CASE WHEN cum >= 0.9 * n THEN (bin + 1) * $AqBinWidth END) AS p90_est
      FROM cw GROUP BY 1 ORDER BY 1""",
    "quality_fk_orphans" -> """
      SELECT 'lineitem->orders' AS fk_edge, COUNT(*) AS n_orphans FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      UNION ALL
      SELECT 'orders->customer', COUNT(*) FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      UNION ALL
      SELECT 'events->customer', COUNT(*) FROM events
        WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = user_id)
      ORDER BY fk_edge""",
    "quality_profile" -> """
      SELECT 'o_orderstatus' AS column_name, COUNT(*) AS n_rows,
        COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS n_null,
        COUNT(DISTINCT o_orderstatus) AS n_distinct FROM orders
      UNION ALL
      SELECT 'o_orderpriority', COUNT(*),
        COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
        COUNT(DISTINCT o_orderpriority) FROM orders
      UNION ALL
      SELECT 'o_custkey', COUNT(*),
        COUNT(CASE WHEN o_custkey IS NULL THEN 1 END),
        COUNT(DISTINCT o_custkey) FROM orders
      ORDER BY column_name"""
  )
}
