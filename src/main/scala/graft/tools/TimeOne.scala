package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off single-query timer for perf bisection (not part of the library
  * surface): `runMain graft.tools.TimeOne <query> <sfDir> [reps]` — fresh
  * session, warmup at sf0.001, then timed full-materialization reps.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(dir: String): Unit =
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    run("/root/testdata/sf0.001")
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      run(sfDir)
      println(f"TIMEONE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
