package graft.similarity

import org.apache.spark.sql.functions._

/** Round-18 pins for the fused recall sweeps (r17 verdict items 1 and 6).
  *
  * 1. The stride hazard: the fused F17/F20b sweeps encode (dims, qid) as
  *    `dims·stride + qid` synthetic query ids. heapShortlist's built-in
  *    `nid != qid` guard compared CORPUS ids against those ENCODED ids, so a
  *    corpus vector whose vec_id happened to equal `dims·stride + qid` was
  *    silently dropped from that (dims, qid) heap — a results change only a
  *    >stride corpus could expose, which no sf-scale oracle reaches. The
  *    sweeps now pass selfExclude=false and express exclusion solely through
  *    `admit`; this spec crafts exactly the colliding corpus and proves the
  *    collider is scored (and that the old guard would have dropped it).
  *
  * 2. The repartition guard: the pre-kernel spread to the session shuffle
  *    width must NOT fire when the input is already at least that wide (at
  *    100 TB the scan has thousands of splits and the round-robin exchange
  *    would move the whole corpus for nothing).
  */
class FusedSweepSpec extends graft.SparkSpec {

  test("fused-sweep encoding: colliding corpus vec_id is scored (stride fix)") {
    import graft.SparkSpecBase.spark.implicits._
    val stride = 1000000L
    val dims = 8
    val qid = 5L
    val collider = dims * stride + qid // the vec_id the old guard dropped
    // corpus: the query vector itself, the collider (very close to q), and
    // one distant vector — all 8-dim for simplicity
    val qv = Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val cv = Array(0.9, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val fv = Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val corpus = Seq((qid, qv), (collider, cv), (7L, fv)).toDS()
    val queries = Array((dims * stride + qid, qv))
    def run(selfExclude: Boolean) = Ann.heapShortlist[
        (Long, Array[Double]), (Long, Array[Double])](
        corpus, queries, _._1, _._1,
        (q, c) => {
          var acc = 0.0; var i = 0
          while (i < dims) { acc += q._2(i) * c._2(i); i += 1 }
          acc
        },
        r = 2, desc = true,
        admit = (q, c) => c._1 != q._1 % stride, selfExclude = selfExclude)
      .collect().map(r => r.getLong(1)).toSet
    // fixed path (what matryoshkaRecall/pcaRecall now do): the collider is
    // a legitimate neighbor, the true query vector is excluded via admit
    val got = run(selfExclude = false)
    assert(got == Set(collider, 7L),
      s"collider $collider must be scored and qid $qid excluded, got $got")
    // the old built-in guard demonstrably DROPPED the collider — this is
    // the at-scale results change the fix closes
    val old = run(selfExclude = true)
    assert(!old.contains(collider),
      "built-in guard no longer collides — update this pin")
  }

  test("fused-sweep repartition guard: no round-robin exchange when input is already wide") {
    val width = spark.conf.get("spark.sql.shuffle.partitions")
    // default test width (4) > the sf0.001 scan's single split: guard fires
    val firing = Ann.matryoshkaRecall(spark, sf)
    assert(firing.queryExecution.executedPlan.toString
        .contains("RoundRobinPartitioning"),
      "narrow input must still be spread to the session width")
    val expected = firing.collect().map(_.toString).sorted
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      // input (>=1 partition) is already at the session width: no shuffle
      val guarded = Ann.matryoshkaRecall(spark, sf)
      assert(!guarded.queryExecution.executedPlan.toString
          .contains("RoundRobinPartitioning"),
        "guard must skip the spread when the input is already wide")
      assert(guarded.collect().map(_.toString).sorted.sameElements(expected),
        "guarded plan changed the sweep's results")
    } finally spark.conf.set("spark.sql.shuffle.partitions", width)
  }

  test("spreadScan returns its input untouched when already at the session width") {
    import graft.SparkSpecBase.spark.implicits._
    val wide = (0 until 64).toDF("x").repartition(8)
    assert(graft.multimodal.Multimodal.spreadScan(spark, wide) eq wide)
    val narrow = (0 until 64).toDF("x").coalesce(1)
    val spread = graft.multimodal.Multimodal.spreadScan(spark, narrow)
    assert(spread.rdd.getNumPartitions ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }
}
