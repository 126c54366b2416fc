package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries to `<outDir>/<key>_<tag>.txt`
  * — the before/after plan evidence the optimization rounds commit under
  * `plans/rNN/`. Usage: `runMain graft.tools.ExplainDump <outDir> <tag> <k1,k2,...>`
  * (keys default to every declared query). Streaming keys run to completion
  * at DataFrame-build time by design; their dump is the drained sink's plan,
  * noted in the header line.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys =
      if (args.length > 2) args(2).split(',').toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      try {
        val df = graft.SparkEntry.queries(k)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val body = s"== $k ($tag, $sfDir) ==\n" + plan
        Files.write(Paths.get(outDir, s"${k}_$tag.txt"),
          body.getBytes(StandardCharsets.UTF_8))
        println(s"EXPLAIN $k ok")
      } catch {
        case e: Throwable => println(s"EXPLAIN $k FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
