package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Tables

/** G-block (SURVEY §2): multimodal payload plumbing.
  *
  * The testdata has no image/audio columns, so payloads are manufactured as
  * `binary` from the document text (`encode(text, 'UTF-8')`) — the POINT is
  * the Spark-side plumbing: opaque binary columns + typed metadata, batched
  * per-partition feature extraction, frame sampling. The actual media decode
  * is STUBBED (see [[FakeDecoder]]) because no codec libraries exist in this
  * environment; the stub is deterministic so results stay oracle-checkable.
  */
object Multimodal {

  /** Documents with a manufactured binary payload column. */
  def withPayload(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** G1 — binary payload + typed metadata, all codegen'd built-ins:
    * byte length, content hash, magic-prefix hex (what a real pipeline keys
    * format dispatch on).
    */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("content_md5"),
        // first 4 CHARACTERS then encode — DuckDB can't substring a BLOB, so
        // both sides use char semantics (byte-substring of the payload would
        // diverge on multi-byte UTF-8)
        lower(hex(encode(substring(col("text"), 1, 4), "UTF-8"))).as("magic_hex"))
      .orderBy(col("doc_id"))

  /** STUB decoder: stands in for the image/audio decode step (no codec libs
    * in this container). Deterministic fake "features": a 16-bin byte
    * histogram — shaped like a real embedding/feature vector (fixed-width
    * numeric array) so the downstream plumbing is exercised for real.
    */
  object FakeDecoder extends Serializable {
    val Bins = 16
    def decodeFeatures(payload: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](Bins)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xFF) * Bins / 256) += 1
        i += 1
      }
      hist
    }
  }

  /** G2 — batched per-partition feature extraction: the Scala analogue of a
    * pandas-batched UDF (mapInPandas). Rows stream through in fixed-size
    * batches — the shape a vectorized decoder needs — inside one partition
    * pass, no shuffle.
    */
  def featureStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val BatchSize = 64
    val ds: Dataset[(Long, Array[Byte])] =
      withPayload(s, d).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // a real decoder would run vectorized over the whole batch here
        batch.map { case (id, payload) =>
          (id, FakeDecoder.decodeFeatures(payload), payload.length.toLong)
        }
      }
    }.toDF("doc_id", "features", "n_bytes")
      .orderBy(col("doc_id"))
  }

  /** G4 — "resize" STUB: deterministic fixed-stride downsample of the
    * payload to `TargetLen` bytes (stands in for image resize — the real
    * pixel-domain op needs a codec; the Spark-side shape is identical: fixed
    * per-row output size, pure per-row compute, no shuffle).
    */
  def resizeStub(s: SparkSession, d: String): DataFrame = {
    val TargetLen = 64
    withPayload(s, d)
      .withColumn("n_bytes", octet_length(col("payload")))
      .filter(col("n_bytes") >= TargetLen)
      .select(col("doc_id"),
        expr(s"transform(sequence(0, $TargetLen - 1), " +
          s"i -> hex(substring(payload, cast(i * n_bytes / $TargetLen AS INT) + 1, 1)))")
          .as("resized"),
        col("n_bytes"))
      .select(col("doc_id"), size(col("resized")).as("resized_len"),
        md5(concat_ws(",", col("resized"))).as("resized_md5"))
      .orderBy(col("doc_id"))
  }

  /** G3 — frame sampling: chunk the payload into 256-byte frames, keep every
    * 4th, fingerprint each. posexplode keeps it one codegen'd pass.
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val FrameLen = 256
    val Every = 4
    withPayload(s, d)
      .withColumn("n_frames",
        ceil(octet_length(col("payload")).cast("double") / FrameLen).cast("int"))
      .select(col("doc_id"), col("payload"),
        // n_frames=0 guard: sequence(0,-1) counts DOWN in Spark and would
        // emit phantom frames for empty payloads
        posexplode(expr(
          s"CASE WHEN n_frames > 0 THEN transform(sequence(0, n_frames - 1), i -> i * $FrameLen) " +
            "ELSE array() END"))
          .as(Seq("frame_idx", "off")))
      .filter(col("frame_idx") % Every === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(payload, off + 1, $FrameLen)")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> binaryMeta _,
    "mm_feature_stub" -> featureStub _,
    "mm_frame_sample" -> frameSample _,
    "mm_resize_stub" -> resizeStub _
  )

  val oracles: Map[String, String] = Map(
    // DuckDB md5/hex operate on VARCHAR; the payload is exactly the UTF-8
    // bytes of `text`, so md5(text) == md5(encode(text)).
    // md5/hex operate on the same UTF-8 bytes both sides; magic prefix uses
    // char semantics (DuckDB can't substring a BLOB)
    "mm_binary_meta" -> """
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        md5(text) AS content_md5,
        lower(hex(encode(substring(text, 1, 4)))) AS magic_hex
      FROM documents ORDER BY doc_id"""
  )
}
