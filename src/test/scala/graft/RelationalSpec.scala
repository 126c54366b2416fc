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
