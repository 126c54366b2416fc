package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Tables}
import graft.plans.AsOf

class AsOfSpec extends SparkSpec {
  import SparkSpecBase.spark.implicits._

  test("custom exec equals the union+window formulation") {
    val a = Relational.asofJoinExec(spark, sf).collect().toSeq
    val b = Relational.asofJoin(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("forward as-of: strictly later, brackets with backward, last order unmatched") {
    // NTZ dates compare as epoch micros (getTimestamp throws on NTZ rows)
    val fwd = Relational.asofJoinForward(spark, sf)
      .select(col("o_orderkey"), unix_micros(col("next_date").cast("timestamp")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val bwd = Relational.asofJoin(spark, sf)
      .select(col("o_orderkey"), unix_micros(col("prev_date").cast("timestamp")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val ordersUs = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dates = ordersUs.map(r => r._2 -> r._3).toMap
    assert(fwd.size == dates.size && fwd.keySet == bwd.keySet)
    fwd.foreach { case (k, nx) =>
      nx.foreach(t => assert(t > dates(k), s"order $k next not after own date"))
      bwd(k).foreach(p => assert(p < dates(k), s"order $k prev not before"))
    }
    // every customer's last order has no next (and someone's does exist)
    assert(fwd.values.exists(_.isEmpty) && fwd.values.exists(_.nonEmpty))
    // exact duality against the per-customer sorted timeline (sample)
    ordersUs.groupBy(_._1).values.take(50).foreach { rows =>
      val tl = rows.map(r => (r._2, r._3))
      tl.foreach { case (k, t) =>
        val later = tl.map(_._2).filter(_ > t)
        val expect = if (later.isEmpty) None else Some(later.min)
        assert(fwd(k) == expect, s"order $k forward mismatch")
      }
    }
  }

  test("non-strict as-of matches equal timestamps; null when no prior row") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r1"), (1L, 15L, "r2"), (3L, 1L, "r3"))
      .toDF("rk", "rt", "rtag")
    val nonStrict = AsOf.join(left, right, "k", "rk", "t", "rt", strict = false)
      .select(col("tag"), col("rtag")).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(nonStrict == Map("l1" -> "r1", "l2" -> "r2", "l3" -> null))
    val strict = AsOf.join(left, right, "k", "rk", "t", "rt", strict = true)
      .select(col("tag"), col("rtag")).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(strict == Map("l1" -> null, "l2" -> "r2", "l3" -> null))
  }

  test("the physical plan is the custom exec with one exchange per side") {
    val df = Relational.asofJoinExec(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // simpleString renders the exec node as "AsOfJoin <keys>: <types>"
    assert(p.contains("AsOfJoin "), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("left-only filters push through the as-of join into the scan") {
    val o = Tables.orders(spark, sf)
    val left = o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val right = o.select(col("o_custkey").as("r_custkey"), col("o_orderdate").as("r_orderdate"))
    val df = AsOf.join(left, right, "o_custkey", "r_custkey",
        "o_orderdate", "r_orderdate", strict = true)
      .filter(col("o_orderkey") < 100)
    val p = df.queryExecution.executedPlan.toString
    // the filter must reach the LEFT scan's pushed filters, below the join
    assert(p.contains("LessThan(o_orderkey,100)"), p)
    val r = df.select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(r.nonEmpty && r.forall(_ < 100))
  }

  test("events to latest order per user (cross-table as-of)") {
    val ord = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val dateType = ord.schema("o_orderdate").dataType.sql
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts").cast(dateType).as("ts"))
    val joined = AsOf.join(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate")
    val got = joined.select(col("event_id"), col("o_orderdate")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap
    // all orders predate all events, so the match is each user's max orderdate
    val want = ev.join(
        ord.groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("md")),
        col("user_id") === col("o_custkey"), "left")
      .select(col("event_id"), col("md")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap
    assert(got == want && got.nonEmpty)
  }
}
