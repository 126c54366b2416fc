package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The PolyHash SQL oracles (minhash/simhash/winnow) replay Java string
    // hashing in DuckDB, which is exact ONLY for pure-ASCII text: DuckDB
    // ord()/length()/substring() are code-point-based, Java charAt/length
    // UTF-16-unit-based, and they agree only below U+0080. A non-ASCII
    // document would make those oracles silently diverge — fail LOUDLY
    // instead (octet_length == length iff every char is single-byte ASCII).
    val nonAscii = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(org.apache.spark.sql.functions
        .expr("octet_length(text) <> length(text)"))
      .count()
    require(nonAscii == 0,
      s"$nonAscii non-ASCII document(s) in $sfDir: the MinHash/SimHash/Winnow " +
        "SQL oracles assume an ASCII corpus and would silently diverge")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // several queries persist intermediates; drop them so 56 queries
      // don't accumulate cached blocks in one JVM
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
