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
}
