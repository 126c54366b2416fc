package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Library-grade cache hygiene for query functions that persist big
  * intermediates for INTRA-query reuse (a self-join or verification join
  * reading the same expensive subtree twice).
  *
  * The returned plan stays fully lazy — composable, auditable via explain —
  * but the first completed action that consumes it (or any plan containing
  * it) unpersists the scoped datasets, so a long-lived session that runs many
  * queries accumulates no cached blocks. Persist-at-construction still works
  * as intended: during that one consuming action the first materialization of
  * a scoped dataset fills the cache and every other branch of the same plan
  * reads it.
  */
object CacheScope {

  private val nonceCtr = new java.util.concurrent.atomic.AtomicLong()

  /** Persist `df` under a logical plan made UNIQUE by a nonce projection
    * that the optimizer prunes away.
    *
    * `Dataset.unpersist` drops cache entries by canonical-plan equality, so
    * the ASYNC release in [[releaseAfterUse]] (listener-bus callback +
    * non-blocking unpersist) can collide with a later run of the SAME
    * query: run N's late release matches — and drops — run N+1's freshly
    * persisted entry for the identical plan, silently forcing full
    * recomputation on every read of the supposedly-cached subtree (a 4×
    * slowdown when four branches read it). Tagging each persist with a
    * unique literal — projected in and straight back out — keeps every
    * scope's canonical plan distinct: analysis retains the literal (so the
    * cache key differs), the optimizer prunes it (zero runtime cost), and
    * within one scope every consumer derives from the returned Dataset so
    * cache lookups still hit. CacheScopeSpec pins both properties.
    */
  def scopedPersist(df: DataFrame): DataFrame = {
    val nonce = "__cache_scope_nonce"
    val tagged = df
      .withColumn(nonce, org.apache.spark.sql.functions.lit(nonceCtr.incrementAndGet()))
      .drop(nonce)
    tagged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tagged
  }

  /** Wire `scoped` datasets (already persisted by the caller) for automatic
    * release after `out` is first consumed. Release also fires on action
    * failure, so an aborted query doesn't leak its cache.
    */
  def releaseAfterUse(out: DataFrame, scoped: Dataset[_]*): DataFrame = {
    val datasets = scoped.toIndexedSeq
    onFirstUse(out)(() => datasets.foreach(_.unpersist(blocking = false)))
  }

  /** Run `cleanup` once, after the first completed action that consumes
    * `out` (or any plan containing it). The general form of
    * [[releaseAfterUse]] — used to free resources Dataset.unpersist can't
    * reach, e.g. the block-manager storage behind a `localCheckpoint`.
    */
  def onFirstUse(out: DataFrame)(cleanup: () => Unit): DataFrame = {
    val session = out.sparkSession
    val target = out.queryExecution.analyzed
    val done = new AtomicBoolean(false)
    lazy val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case _: Throwable => true } // fail open: better to release
        if (hit && done.compareAndSet(false, true)) {
          cleanup()
          session.listenerManager.unregister(listener)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    session.listenerManager.register(listener)
    out
  }
}
