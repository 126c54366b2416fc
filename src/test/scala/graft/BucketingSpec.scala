package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Tables

/** Bucketing: pre-shuffling a table once at write time so repeated joins on
  * the bucket key run with NO exchange — the core co-location technique for
  * a fact table joined on the same key by every query at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-bucketed join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVM runs but their
    // warehouse directories persist — clear them or CTAS refuses the location
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    Seq("b_orders", "b_lineitem").foreach { t =>
      deleteRec(new java.io.File(s"spark-warehouse/$t"))
    }
    Tables.orders(spark, sf)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)

    // same result as the unbucketed join
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("gated bucketed_join query plans both scans exchange-free") {
    val df = graft.operators.Bucketed.bucketedJoin(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
    assert(df.collect().nonEmpty)
  }
}
