package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY §5).
  *
  * A shuffle join on a skewed key funnels the hot key's rows into one
  * partition. Salting splits each left key into `factor` sub-keys and
  * replicates the right side across all salts: the hot key's work spreads
  * over `factor` partitions, and the join result is IDENTICAL to the
  * unsalted join (the salted query shares its oracle with the plain form).
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting is the portable fallback and works for aggregations too.
  */
object Skew {

  /** Deterministic salt in [0, factor): hash of an arbitrary discriminator
    * column (e.g. the row's own id) — no rand(), so plans stay reproducible
    * and retries/speculative tasks can't diverge.
    */
  def salt(discriminator: Column, factor: Int): Column =
    pmod(xxhash64(discriminator), lit(factor.toLong)).cast("int")

  /** Inner equi-join `left.keyL == right.keyR` with the left side salted by
    * `factor` and the right side replicated `factor` times.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      keyL: String, keyR: String, discriminator: String,
      factor: Int): DataFrame = {
    val salted = left.withColumn("__salt", salt(col(discriminator), factor))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") && col(keyL) === col(keyR))
      .drop("__salt")
  }

  /** Runtime bloom-filter join pruning (B33): build a bloom filter over the
    * dim side's join keys, pre-filter the fact side with it BEFORE the
    * shuffle, then run the exact semi-join on the survivors. The bloom is a
    * few MB even when the dim side itself is too big to broadcast as a hash
    * relation — that's the regime this pattern exists for: at 100 TB the
    * fact-side shuffle shrinks by the filter's selectivity while false
    * positives (deterministic, order-independent bit-OR) are removed by the
    * exact join, so results are identical to the unfiltered semi-join.
    */
  def bloomPrunedSemiJoin(fact: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame, factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01)(
      implicit s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = s.sparkContext.broadcast(bf)
    // native codegen probe (r17): the former Scala udf was a per-row boxed
    // closure that broke whole-stage-codegen fusion at the scan — the probe
    // now compiles into the scan→filter stage (same filter bits, same rows)
    fact.filter(col(factKey).isNotNull &&
        graft.plans.BloomProbe.mightContainLong(col(factKey), bc))
      .join(dim, col(factKey) === col(dimKey), "left_semi")
  }

  /** Skew-safe aggregation: two-phase groupBy — first on (key, salt) to
    * spread a hot key's partial aggregation, then on key to combine. Works
    * for any algebraic aggregate; results identical to the one-phase form.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: Column,
      discriminator: String, factor: Int): DataFrame = {
    import graft.operators.Exact._
    df.withColumn("__salt", salt(col(discriminator), factor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol.cast("decimal(18,4)")).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).cast("double").as("sum_value"))
  }
}
