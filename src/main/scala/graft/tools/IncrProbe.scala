package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition of dedup_incremental steady-state wall time. */
object IncrProbe {
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
    // build the index (first run)
    time("full rep1 (index build)")(graft.dedup.Dedup.incrementalNew(spark, d)
      .write.format("noop").mode("overwrite").save())
    (2 to 3).foreach { i =>
      spark.catalog.clearCache()
      // steady state: index already in catalog
      time(s"full rep$i")(graft.dedup.Dedup.incrementalNew(spark, d)
        .write.format("noop").mode("overwrite").save())
    }
    // pieces: batch shingling alone (the SAME split the query uses)
    val batch = graft.dedup.Dedup.withShingles(
        graft.operators.Tables.documents(spark, d)
          .filter(graft.dedup.Dedup.incrementalBatchPredicate))
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
    time("batch shingles only")(batch.write.format("noop").mode("overwrite").save())
    // index scan alone — slug-exact names, never a prefix guess (another
    // corpus's index in the same warehouse must not be what gets timed)
    val slug = graft.dedup.Dedup.dirSlug(d)
    Seq(s"graft_incr_prefixh_$slug", s"graft_incr_dfh_$slug",
        s"graft_incr_arrh_$slug").foreach { tbl =>
      time(s"scan $tbl")(spark.table(tbl)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
