package graft

import org.apache.spark.sql.functions._
import graft.plans.SketchAggs

/** Unit behavior of BoundedPostingsAgg, the df-capped posting-list collector
  * behind E2/E6 (see plans/SketchAggs.scala): exact df always; complete list
  * iff df <= cap; EMPTY list (not truncated) when over cap, so a hot key can
  * never emit a partial index entry.
  */
class BoundedPostingsSpec extends SparkSpec {
  import SparkSpecBase.spark.implicits._

  test("df exact; list complete under cap; empty over cap") {
    val rows = (1 to 50).map(i => ("hot", i.toLong, i)) ++
      (1 to 5).map(i => ("cold", i.toLong, i))
    val got = rows.toDF("sh", "doc_id", "sz")
      .groupBy(col("sh"))
      .agg(SketchAggs.boundedPostings(col("doc_id"), col("sz"), 10).as("dps"))
      .select(col("sh"), col("dps.df").as("df"), size(col("dps.ps")).as("m"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got("hot") == ((50L, 0)))   // overflow: exact df, dropped list
    assert(got("cold") == ((5L, 5)))   // under cap: full list
  }

  test("merge across many partitions keeps exact df and complete sub-cap lists") {
    val rows = (1 to 200).map(i => (s"k${i % 7}", i.toLong, 1))
    val got = rows.toDF("sh", "doc_id", "sz")
      .repartition(13)
      .groupBy(col("sh"))
      .agg(SketchAggs.boundedPostings(col("doc_id"), col("sz"), 1000).as("dps"))
      .select(col("sh"), col("dps.df").as("df"),
        expr("transform(dps.ps, p -> p.doc_id)").as("ids"))
      .collect()
    assert(got.length == 7)
    got.foreach { r =>
      val expected = (1 to 200).filter(i => s"k${i % 7}" == r.getString(0)).map(_.toLong).toSet
      assert(r.getLong(1) == expected.size)
      assert(r.getSeq[Long](2).toSet == expected)  // complete, no truncation
    }
  }
}
