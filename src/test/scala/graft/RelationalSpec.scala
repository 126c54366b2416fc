package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  test("q1_pricing returns grouped rows with expected columns") {
    val df = Relational.q1Pricing(spark, sf)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc", "count_order"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(7)).sum > 0)
  }

  test("q1_pricing plan pushes filter and prunes columns") {
    val plan = Relational.q1Pricing(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), plan)
  }

  test("events_gap_fill emits a dense hour spine and preserves event counts") {
    import org.apache.spark.sql.functions._
    val df = Relational.eventsGapFill(spark, sf).cache()
    try {
      // every type's timeline is contiguous: rows == (max-min)/1h + 1
      val spans = df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("rows"),
          (expr("(unix_micros(max(hour_start)) - unix_micros(min(hour_start))) DIV 3600000000") + 1).as("hours"))
        .collect()
      assert(spans.nonEmpty)
      spans.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
      // zero-filled rows add no phantom events
      val total = df.agg(sum(col("n"))).head.getLong(0)
      assert(total == graft.operators.Tables.events(spark, sf).count())
      assert(df.filter(col("n") === 0).count() > 0 ||
        spans.map(_.getLong(1)).sum == total)
    } finally df.unpersist()
  }

  test("set ops: intersect and except legs are disjoint and cover 1995 buyers") {
    import org.apache.spark.sql.functions._
    val df = Relational.setIntersectExcept(spark, sf)
    val byTag = df.groupBy(col("tag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val buyers95 = graft.operators.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= expr("timestamp'1995-01-01 00:00:00'") &&
        col("o_orderdate") < expr("timestamp'1996-01-01 00:00:00'"))
      .select(col("o_custkey")).distinct().count()
    assert(byTag.values.sum > 0, "legs must be non-vacuous at spec SF")
    assert(byTag.getOrElse("both", 0L) + byTag.getOrElse("1995_only", 0L) == buyers95)
    // a customer can't be in both legs
    assert(df.groupBy(col("o_custkey")).count().filter(col("count") > 1).count() == 0)
  }

  test("range_join_follow plans as an equi-join, never a nested loop") {
    val plan = Relational.rangeJoinFollow(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("range_join_follow binned join equals the naive theta join") {
    import org.apache.spark.sql.functions._
    val ev = graft.operators.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("eu"), col("value"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("eu").as("pu"))
    val naive = p.join(ev,
        col("p_user") === col("user_id") &&
          col("eu") >= col("pu") && col("eu") < col("pu") + Relational.FollowWindowUs &&
          col("event_id") =!= col("p_id"), "left")
      .groupBy(col("p_id"))
      .agg(count(col("event_id")).as("n_follow"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = Relational.rangeJoinFollow(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binned == naive && naive.nonEmpty)
  }
}
