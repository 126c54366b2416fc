package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timer for the S1 report (perf bisection, not library
  * surface): times each constituent of scaleCurveReportAt per scale. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALEPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import graft.operators.{ScaleCurve, Signals, Tables}
    import graft.functions.TextFunctions.wsTokens
    (1 to 2).foreach { rounds =>
      println(s"== round $rounds")
      ScaleCurve.Scales.foreach { k =>
        val sd = ScaleCurve.scaledDocs(spark, d, k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val se = ScaleCurve.scaledEvents(spark, d, k)
        t(s"docAgg@$k")(sd.agg(count(lit(1)), sum(length(col("text")).cast("long")),
          sum(wsTokens(col("text")).cast("long"))).head().getLong(0))
        t(s"dups@$k")(sd.groupBy(col("text")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(coalesce(sum(col("c") - 1), lit(0L))).head().getLong(0))
        t(s"minhash@$k")(graft.dedup.Dedup.minhashPairsOf(spark, sd).count())
        t(s"evCount@$k")(se.count())
        t(s"overlap@$k")(Signals.intervalOverlapPairsOf(spark, se).count())
        sd.unpersist(blocking = true)
      }
      t("nBase")(Tables.documents(spark, d).count())
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
