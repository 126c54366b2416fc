package graft

import org.apache.spark.sql.functions._

/** Pins the two properties [[CacheScope.scopedPersist]] exists for:
  * distinct cache identity across identical plans (so an async release of
  * one scope can never drop another scope's blocks), and intra-scope cache
  * hits for derived consumers.
  */
class CacheScopeSpec extends SparkSpec {

  test("scopedPersist: identical queries get DISTINCT cache entries") {
    def mk() = CacheScope.scopedPersist(
      spark.range(1000).toDF("x").withColumn("y", col("x") * 2))
    val a = mk()
    val b = mk()
    a.count(); b.count()
    assert(a.storageLevel.useMemory && b.storageLevel.useMemory)
    // the collision this guards against: releasing scope A must NOT drop
    // scope B's entry for the same logical plan
    a.unpersist(blocking = true)
    assert(b.storageLevel.useMemory,
      "unpersisting one scope dropped the other scope's cache entry")
    b.unpersist(blocking = true)
  }

  test("scopedPersist: consumers derived from the scope still hit the cache") {
    val base = CacheScope.scopedPersist(
      spark.range(1000).toDF("x").withColumn("y", col("x") * 3))
    val derived = base.filter(col("x") < 100).select(col("y"))
    derived.collect()
    // after materialization through the derived plan, the scope is cached
    // and the derived plan reads InMemoryRelation, not the source
    assert(base.storageLevel.useMemory)
    val plan = derived.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"derived consumer did not read the cached scope:\n$plan")
    base.unpersist(blocking = true)
  }

  test("plain persist collides across identical plans (why scopedPersist exists)") {
    def mk() = spark.range(1000).toDF("x").withColumn("z", col("x") + 1).persist()
    val a = mk()
    val b = mk()
    a.count(); b.count()
    a.unpersist(blocking = true)
    // same canonical plan -> one shared entry -> both released together
    assert(!b.storageLevel.useMemory,
      "expected plan-keyed collision; if this starts failing, Spark's " +
        "cache identity changed and scopedPersist may be droppable")
    b.unpersist(blocking = true)
  }
}
