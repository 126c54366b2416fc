package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusClean, Relational, Tables}

class CorpusSpec extends SparkSpec {
  test("corpus_split is a shuffle-free total partition with ~90/5/5 mass") {
    val df = CorpusClean.trainSplit(spark, sf)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "split must be a pure per-row map — no shuffle")
    val total = Tables.documents(spark, sf).count()
    val bys = df.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys.values.sum == total, "every doc gets exactly one split")
    // binomial noise at sf0.001 (~50 docs) is wide; just pin the order
    assert(bys.getOrElse("train", 0L) > bys.getOrElse("val", 0L))
    assert(bys.keySet.subsetOf(Set("train", "val", "test")))
    // determinism: a doc's assignment never changes between runs
    val a = df.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = CorpusClean.trainSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
  }

  test("events_hopping_agg counts every event in exactly width/slide windows") {
    val df = Relational.eventsHoppingAgg(spark, sf)
    val rows = df.collect()
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == 2 * nEvents,
      "1h windows every 30min => each event in exactly 2 windows")
    // window starts are 30-min aligned
    val aligned = df.filter(
      (minute(col("window_start")) % 30 === 0) && second(col("window_start")) === 0)
    assert(aligned.count() == rows.length)
  }
}
