package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 scaling-curve measurement (not part of the library surface):
  * materialize derived corpora at 1×/3×/10× of a base sf dir under a
  * scratch root (salted ids; per-word rep salting for documents; 40-day
  * per-rep era shift for events; per-component perturbation for
  * embeddings; salted order/part keys for lineitem), then time the heavy
  * operator families on each scale.
  *
  * `runMain graft.tools.ScaleLab [baseSf] [scales] [reps] [root]`
  *
  * Per (key, scale): one UNTIMED build pass (stored artifacts — BPE table,
  * IVF/PQ indexes, PPJoin index — are corpus-generation costs, reported
  * separately as build_s) then `reps` timed full-materialization runs with
  * cache-clear + GC between them; min is the steady state. Output lines:
  * `SCALELAB <key> x<k> build_s=<s> min_s=<s> reps=[..]`.
  *
  * The derivation matches graft.operators.ScaleCurve's gated generator in
  * kind (the gated key pins count growth at sf0.01; this tool measures
  * wall-clock growth at sf0.1) — the two halves of verdict item 1.
  */
object ScaleLab {

  val IdStride = 10000000L

  private def materialize(s: SparkSession, base: String, k: Int, dir: String): Unit = {
    import graft.operators.Tables
    // resume only on a COMPLETED materialization: an interrupted run can
    // leave documents.parquet without the sibling tables (or with stale
    // ones), and timing against a partial corpus would publish wrong
    // exponents — the marker lands strictly after the last table
    val done = new java.io.File(s"$dir/_SCALELAB_DONE")
    if (done.exists()) return
    def reps = explode(expr(s"sequence(0, ${k - 1})"))
    Tables.documents(s, base)
      .withColumn("rep", reps)
      .select((col("rep") * IdStride + col("doc_id")).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat_ws(" ", transform(split(col("text"), " "),
            w => concat(w, col("rep").cast("string"))))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.events(s, base)
      .withColumn("rep", reps)
      .select((col("rep") * IdStride + col("event_id")).as("event_id"),
        (col("ts") + expr("make_dt_interval(CAST(rep * 40 AS INT), 0, 0, 0)")).as("ts"),
        (col("rep") * IdStride + col("user_id")).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.embeddings(s, base)
      .withColumn("rep", reps)
      .select((col("rep") * IdStride + col("vec_id")).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "CAST(x + rep * 0.001 * ((i * 7 + 3) % 11 - 5) AS FLOAT))").as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables.lineitem(s, base)
      .withColumn("rep", reps)
      .withColumn("l_orderkey", col("rep") * IdStride + col("l_orderkey"))
      .withColumn("l_partkey", col("rep") * IdStride + col("l_partkey"))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = new java.io.FileOutputStream(done)
    try out.write(s"base=$base k=$k\n".getBytes("UTF-8")) finally out.close()
    ()
  }

  def main(args: Array[String]): Unit = {
    val baseSf = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(2).getOrElse("2").toInt
    val root = args.lift(3).getOrElse("/tmp/graft_scale")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = Seq("dedup_minhash", "dedup_incremental", "ann_ivfpq_topk",
      "join_interval_overlap", "corpus_span_dedup_anchor", "graph_triangles",
      "corpus_prepare_v2")
    def run(key: String, dir: String): Unit =
      graft.SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    scales.foreach { k =>
      val dir = s"$root/x$k"
      val mt = timed(materialize(spark, baseSf, k, dir))
      println(f"SCALELAB materialize x$k ${mt}%.1f s")
      keys.foreach { key =>
        try {
          val build = timed(run(key, dir))
          val times = (1 to reps).map { _ =>
            spark.catalog.clearCache(); System.gc()
            timed(run(key, dir))
          }
          println(f"SCALELAB $key x$k build_s=${build}%.2f min_s=${times.min}%.2f reps=${times.map(t => f"$t%.2f").mkString("[", ",", "]")}")
        } catch {
          case e: Throwable =>
            println(s"SCALELAB $key x$k FAILED ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      }
    }
    spark.stop()
  }
}
