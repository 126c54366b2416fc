package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("feature stub: histogram mass equals payload byte count") {
    val rows = Multimodal.featureStubRaw(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1).sum == r.getLong(2))
      assert(r.getSeq[Long](1).length == Multimodal.FakeDecoder.Bins)
    }
  }

  test("feature stub driver view: scalar fingerprint per doc, no array cols") {
    val df = Multimodal.featureStub(spark, sf)
    assert(df.schema.fields.forall(!_.dataType.typeName.startsWith("array")))
    assert(df.count() == Multimodal.featureStubRaw(spark, sf).count())
  }

  test("frame sampling keeps every 4th 256-char frame") {
    val df = Multimodal.frameSample(spark, sf)
    val perDoc = df.groupBy("doc_id").agg(count(lit(1)).as("n"),
        max(col("frame_idx")).as("max_idx")).collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r => assert(r.getLong(2) % 4 == 0) }
    // deterministic across runs
    assert(df.collect().toSeq == Multimodal.frameSample(spark, sf).collect().toSeq)
  }

  test("resize stub produces fixed-length output, deterministic") {
    val rows = Multimodal.resizeStub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) == 64))
    assert(rows.toSeq == Multimodal.resizeStub(spark, sf).collect().toSeq)
  }

  test("binary meta magic_hex is the first 4 bytes") {
    val r = Multimodal.binaryMeta(spark, sf).limit(1).collect().head
    assert(r.getString(3).length == 8)
  }

  test("phash near-dup pairs: canonical orientation, bounded hamming, nonempty") {
    val rows = Multimodal.phashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty, "no phash near-dups at test SF — operator vacuous")
    assert(rows.forall { case (a, b, h) =>
      a < b && h >= 0 && h <= Multimodal.PhashHamT })
    // multi-index banding must not emit duplicates after the distinct
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("phash mega-bucket cap: identical payloads degrade to a star, not all-pairs") {
    // m identical payloads share every band value; above the cap the bucket
    // must emit m-1 representative edges instead of C(m,2) — hamming 0, so
    // all survive verification and connectivity is preserved
    import SparkSpecBase.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phash-mega").toString
    val m = 300L
    val text = (1 to 30).map(_ => "same words here").mkString(" ") // >= 64 chars
    (0L until m).map(i => (i, text)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    spark.conf.set("graft.dedup.maxBandBucket", "50")
    try {
      val rows = Multimodal.phashDedup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(rows.length == (m - 1),
        s"expected star (${m - 1} edges), got ${rows.length}")
      assert(rows.forall { case (a, b, h) => a == 0L && b > 0L && h == 0 })
    } finally spark.conf.unset("graft.dedup.maxBandBucket")
  }
}
