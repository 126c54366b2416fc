package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.Tables

object Prof {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"PROF $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    t("shingle+explode")(Dedup.withShingles(docs).select(col("doc_id"), explode(col("shingles")).as("sh")).count())
    val postings = Dedup.withShingles(docs).select(col("doc_id"), explode(col("shingles")).as("sh")).withColumn("h", xxhash64(col("sh")))
    t("simhash 64 bitsums") {
      val bitSums = (0 until 64).map { j => sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$j") }
      postings.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*).count()
    }
    t("minhash 64 mins") {
      val sigCols = (0 until 64).map { i => min(xxhash64(lit(i), col("h"))).as(s"m$i") }
      postings.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*).count()
    }
    t("full simhashPairs")(Dedup.simhashPairs(spark, d).count())
    t("full minhashPairs")(Dedup.minhashPairs(spark, d).count())
    t("full jaccardPairs")(Dedup.jaccardPairs(spark, d).count())
    spark.stop()
  }
}
