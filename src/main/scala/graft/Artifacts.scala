package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Content fingerprinting for the per-JVM stored-artifact caches (the F3/F5
  * ANN indexes, the B57 edge table, the E7/E8 dedup artifacts, the events
  * ts-type probe). Keying those caches on the dataset *path* alone serves
  * stale answers when the files at that path are regenerated inside one
  * JVM — a long-lived session would keep routing queries through an index
  * built from the old corpus. The fingerprint is METADATA-ONLY (one
  * recursive file listing: name, length, mtime per file — no data read, no
  * parquet footer parse), so checking it per lookup costs microseconds
  * locally and one namenode listing on a real cluster.
  */
object Artifacts {

  /** Metadata fingerprint of one or more dataset paths. Per-file hashes are
    * XOR-combined so the (filesystem-dependent) listing order cannot change
    * the result; a missing path contributes a distinct constant rather than
    * failing — the consumer's own read will surface the real error.
    */
  def fingerprint(s: SparkSession, paths: String*): String = {
    var acc = 0x9e3779b97f4a7c15L
    paths.foreach { ps =>
      val p = new Path(ps)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) {
        acc ^= graft.plans.MixHash.polyHash(s"absent:$ps")
      } else {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          acc ^= graft.plans.MixHash.polyHash(
            s"${f.getPath.toString}|${f.getLen}|${f.getModificationTime}")
        }
      }
    }
    java.lang.Long.toHexString(acc)
  }

  /** A built artifact location plus the input fingerprint it was built
    * from. */
  final case class Built(fingerprint: String, location: String)

  /** Build-once-per-(key, input-fingerprint): returns the cached location
    * while the inputs are unchanged, re-runs `build` the moment the
    * fingerprint moves. `compute` holds the map bucket during the build —
    * same single-build guarantee the old `computeIfAbsent` sites had.
    *
    * Builders should version their OUTPUT location by the fingerprint
    * (callers receive it as `build`'s argument): a rebuild that overwrote
    * the previous generation's files in place would yank them out from
    * under any lazily-held DataFrame still referencing the old location —
    * per-generation dirs keep in-flight readers valid, at the cost of one
    * small dir per in-JVM regeneration (rare by definition).
    */
  def cachedLocation(
      map: ConcurrentHashMap[String, Built], key: String, fp: String)(
      build: String => String): String =
    map.compute(key, (_, old) =>
      if (old != null && old.fingerprint == fp) old else Built(fp, build(fp))
    ).location

  /** Generic build-once-per-(key, fingerprint) value cache — the
    * [[cachedLocation]] pattern for non-path values (e.g. the events
    * ts-type probe). One entry per key: a moved fingerprint REPLACES the
    * stale entry instead of accumulating beside it.
    */
  def cachedValue[V](
      map: ConcurrentHashMap[String, (String, V)], key: String, fp: String)(
      build: => V): V =
    map.compute(key, (_, old) =>
      if (old != null && old._1 == fp) old else (fp, build)
    )._2

  /** Fingerprint ledger for warehouse-TABLE artifacts (E7's corpus index,
    * B22's bucketed facts): those sites gate the build on
    * `catalog.tableExists`, which a fresh JVM fails (→ rebuild, correct)
    * but a long-lived JVM passes even after the source dataset was
    * regenerated. `stale` adds the in-JVM fingerprint check; callers record
    * the build with `markBuilt`.
    */
  private val tableFps = new ConcurrentHashMap[String, String]()

  def tableStale(key: String, fp: String): Boolean =
    tableFps.get(key) != fp

  def markTableBuilt(key: String, fp: String): Unit = {
    tableFps.put(key, fp); ()
  }
}
