package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-time decomposition of the mm_prepare composite's stages (guide §1:
  * measure before touching). Times the audit-frame subplans the composite
  * itself runs: entity frame alone, banded pairs, then the full key.
  */
object MmProbe {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"MMPROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val frames = graft.multimodal.Multimodal.mmPrepareAuditFrames
    (1 to 2).foreach { rep =>
      frames.foreach { case (name, fn) =>
        t(s"$name#$rep")(fn(spark, d).count())
        spark.catalog.clearCache()
      }
      t(s"mm_prepare full#$rep") {
        graft.SparkEntry.queries("mm_prepare")(spark, d)
          .write.format("noop").mode("overwrite").save(); 0L
      }
      spark.catalog.clearCache()
    }
    // diagnostics: signature duplication + bucket-size distribution
    import org.apache.spark.sql.functions._
    val ent = frames.head._2(spark, d)
      .select(col("entity_id").as("doc_id"), col("ph"), col("bvs"))
    ent.persist()
    t("entities")(ent.count())
    t("unique (ph,bvs)")(ent.select(col("ph"), col("bvs")).distinct().count())
    val bands = ent.select(col("doc_id"), posexplode(col("bvs")).as(Seq("band", "bv")))
    val bstats = bands.groupBy(col("band"), col("bv")).agg(count(lit(1)).as("n"))
    bstats.agg(max(col("n")), avg(col("n")), count(lit(1))).show()
    t("candidate rows (entity-level)") {
      bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id")).count()
    }
    ent.unpersist()
    spark.stop()
  }
}
