package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition of mm_phash_dedup wall time (round-9 perf hunt). */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // stage 1: the 64-sample phash projection alone
    val m = graft.multimodal.Multimodal
    val phm = m.getClass.getDeclaredMethod("phashFrame",
      classOf[SparkSession], classOf[String])
    phm.setAccessible(true)
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      val ph = phm.invoke(m, spark, d).asInstanceOf[org.apache.spark.sql.DataFrame]
      time(s"phashFrame rep$i")(ph.write.format("noop").mode("overwrite").save())
      time(s"full rep$i")(m.phashDedup(spark, d)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
