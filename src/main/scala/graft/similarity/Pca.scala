package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup.withNorm
import graft.operators.Tables

/** PCA / whitening over the embedding corpus (SURVEY §2 F-block; round-12
  * verdict item 2 — the consumer F18's exact Gram matrix was built for).
  *
  * Division of labor, the way every large deployment runs it: the
  * DISTRIBUTED step is the Gram reduction (F18 — one constant-size
  * mergeable buffer over the whole corpus, already hash-gated); the
  * eigensolve is dim×dim DRIVER work (cyclic Jacobi, fixed sweep order
  * and count — microseconds at dim=64) whose input is the exact
  * fixed-point Gram, so the rotation is a pure function of data both
  * engines agree on byte-for-byte. The rotation is stored as a
  * fingerprint-versioned artifact (the F3/H33 index discipline);
  * projection is then ONE corpus scan per consumer.
  *
  * Verification split (per the round-12 prescription): the ORACLE replays
  * the projection off the STORED rotation — its components are embedded
  * as shortest-round-trip double literals (the F2 hyperplane device), so
  * DuckDB applies bit-identical factors in the same summation order and
  * the 6 dp-rounded projections hash-gate. The EIGENSOLVE itself is
  * pinned by the spec, not the oracle: orthonormality, diagonalization of
  * the exact Gram, descending eigenvalues, and the payoff assertion —
  * recall@10 of d-dim EIGENBASIS prefixes strictly beats F17's raw
  * matryoshka prefixes at every d (the reason a pipeline whitens before
  * truncating).
  *
  * Scale shape: Gram pass is corpus-linear with a dim² buffer; driver
  * state is the dim×dim rotation; projection and the recall sweeps reuse
  * the bounded-heap shortlist device — no corpus-sized pair stream
  * anywhere.
  */
object Pca {

  /** Stored projection width for the gated per-vector projection. */
  val ProjDim = 16
  /** Truncation widths for the recall-after-rotation report — F17's
    * MatryoshkaDims minus the identity width (rotation at full dim is a
    * cosine-preserving isometry; the spec asserts that instead). */
  val RecallDims: Seq[Int] = Seq(8, 16, 32)
  /** Cyclic Jacobi sweeps. 12 fixed sweeps drive every off-diagonal of a
    * 64×64 symmetric matrix far below the 6 dp gate resolution (the spec
    * measures the residue explicitly). */
  val JacobiSweeps = 12

  // ------------------------------------------------------------------
  // driver-side eigensolve
  // ------------------------------------------------------------------

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed sweep
    * order (p asc, q asc), fixed sweep count — fully deterministic.
    * Returns (eigenvalues, eigenvectors as ROWS) sorted by eigenvalue
    * descending, each vector sign-fixed so its largest-|component| entry
    * is positive (first index wins ties) — the ambiguity a stored
    * artifact must not carry.
    */
  private[similarity] def jacobiEigen(
      g: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = g.length
    val a = g.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < JacobiSweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // A <- J^T A J (columns p,q then rows p,q), V <- V J
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      // deterministic sign: largest-|component| entry positive
      var best = 0
      var k = 1
      while (k < n) {
        if (math.abs(col(k)) > math.abs(col(best))) best = k
        k += 1
      }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (evals, evecs)
  }

  // ------------------------------------------------------------------
  // the stored rotation artifact
  // ------------------------------------------------------------------

  private val rotBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, graft.Artifacts.Built]()

  /** Last rotation served in this JVM — the oracle-literal source. The
    * oracle strings are generated AFTER the gated queries run (Verify
    * dumps oracle SQL last), so by construction the stash holds the
    * rotation of the dataset under verification. */
  @volatile private var stash: Option[(Array[Double], Array[Array[Double]])] = None

  private def rotLocation(s: SparkSession, d: String): String = {
    val fp = graft.Artifacts.fingerprint(s, s"$d/embeddings.parquet")
    graft.Artifacts.cachedLocation(rotBuilt, d, fp) { fpv =>
      val slug = d.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
      val dir = new org.apache.hadoop.fs.Path(
        graft.Artifacts.scratchBase(s), s"graft_pca_rot_${slug}_$fpv").toString
      // the exact integer Gram (F18's buffer) — dim² longs of driver state
      val units = Ann.embGramMatrix(s, d).collect()
      val n = Ann.GramDim
      val g = Array.ofDim[Double](n, n)
      units.foreach { r =>
        val i = r.getInt(0); val j = r.getInt(1)
        val x = r.getLong(2).toDouble // unit scale — eigenvectors are scale-free
        g(i)(j) = x; g(j)(i) = x
      }
      val (evals, evecs) = jacobiEigen(g)
      import s.implicits._
      evals.zip(evecs).zipWithIndex
        .map { case ((ev, vec), j) => (j, ev, vec.toSeq) }.toSeq
        .toDF("j", "eigval_units", "rv")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }
  }

  /** The learned rotation, read back from the stored artifact (and
    * stashed for oracle generation): eigenvalues + eigenvector rows,
    * eigenvalue-descending. */
  private[graft] def learnedRotation(
      s: SparkSession, d: String): (Array[Double], Array[Array[Double]]) = {
    val rows = s.read.parquet(rotLocation(s, d)).orderBy(col("j")).collect()
    val out = (rows.map(_.getAs[Double]("eigval_units")),
      rows.map(_.getAs[scala.collection.Seq[Double]]("rv").toArray))
    stash = Some(out)
    out
  }

  // ------------------------------------------------------------------
  // gated operators
  // ------------------------------------------------------------------

  /** `emb_pca_project` — every vector's top-[[ProjDim]] eigenbasis
    * coordinates (6 dp-rounded), exploded (vec_id, j, pc): the compact
    * representation a retrieval tier stores once the rotation exists.
    * One scan, zero shuffles. */
  def pcaProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rot = learnedRotation(s, d)._2
    val bc = s.sparkContext.broadcast(rot)
    val pd = ProjDim
    Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, vec) =>
        val r = bc.value
        (0 until pd).iterator.map { j =>
          val row = r(j)
          var acc = 0.0
          var i = 0
          while (i < vec.length) { acc += vec(i) * row(i); i += 1 }
          (id, j,
            BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF("vec_id", "j", "pc")
  }

  /** Gram unit scale: components are 2^20 fixed-point in F18's buffer, so
    * eigenvalue units carry 2^40. */
  private val GramUnitScale = 1048576.0 * 1048576.0

  /** `emb_whiten` — the WHITENED projection (PCA whitening, the standard
    * decorrelate-and-equalize preprocessing before quantization or a
    * downstream linear model): coordinate j is the eigenbasis projection
    * scaled by 1/√λ_j, so the corpus's second-moment matrix in the output
    * basis is the identity (the property the spec asserts — Σ wc_j² = 1
    * per coordinate, cross-moments ≈ 0). The inverse-root factors derive
    * from the STORED eigenvalues (one more column of the same rotation
    * artifact — no new distributed work), and the oracle multiplies the
    * same shortest-round-trip literals in the same order, so the 6 dp
    * projections hash-gate exactly like `emb_pca_project`. A rank-deficient
    * corpus (λ ≤ 0 inside the top-[[ProjDim]]) scores 0.0 — the F17 zero
    * guard discipline. One scan, zero shuffles. */
  def whiten(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (evals, rot) = learnedRotation(s, d)
    val inv = evals.take(ProjDim).map { ev =>
      val lam = ev / GramUnitScale
      if (lam > 0.0) 1.0 / math.sqrt(lam) else 0.0
    }
    val bc = s.sparkContext.broadcast((rot, inv))
    val pd = ProjDim
    Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, vec) =>
        val (r, w) = bc.value
        (0 until pd).iterator.map { j =>
          val row = r(j)
          var acc = 0.0
          var i = 0
          while (i < vec.length) { acc += vec(i) * row(i); i += 1 }
          (id, j,
            BigDecimal(acc * w(j)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF("vec_id", "j", "wc")
  }

  /** `ann_pca_recall` — recall@[[Ann.TopK]] of d-dim EIGENBASIS prefixes
    * against the full-dimension brute top-k, for d ∈ [[RecallDims]]: the
    * twin of F17's matryoshka report with the rotation applied first.
    * Same accounting, same schema — the spec joins the two and asserts
    * the rotation pays at every width. */
  def pcaRecall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rot = learnedRotation(s, d)._2
    val maxD = RecallDims.max
    val bc = s.sparkContext.broadcast(rot.take(maxD))
    val er = Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, vec) =>
        val r = bc.value
        val out = new Array[Double](r.length)
        var j = 0
        while (j < r.length) {
          val row = r(j)
          var acc = 0.0
          var i = 0
          while (i < vec.length) { acc += vec(i) * row(i); i += 1 }
          out(j) = acc
          j += 1
        }
        (id, out)
      }
    val qarr = er.filter(_._1 < Ann.NumQueries).collect().sortBy(_._1)
    val brute = graft.CacheScope.scopedPersist(
      Ann.bruteTopK(s, d).select(col("qid"), col("nid")))
    // ALL eigenbasis widths in ONE rotated-corpus pass (r17 — the F17
    // fusion applied to its eigenbasis twin): the three per-dims sweeps
    // each re-ran the full rotation kernel over the corpus; encoding the
    // width into the synthetic query id computes the identical per-(dims,
    // qid) bounded heaps against one pass. Self-exclusion lives ONLY in
    // `admit` (selfExclude=false — the built-in compare is off).
    // stride only needs to exceed every QUERY id (selfExclude=false below
    // keeps corpus vec_ids out of the encoded-id compare entirely — the
    // F17 fix, r17 verdict item 1)
    val stride = 1000000L
    require(Ann.NumQueries < stride, "pca stride must exceed every qid")
    val fused: Array[(Long, Array[Double])] = RecallDims.toArray.flatMap(
      dims => qarr.map { case (qid, v) => (dims * stride + qid, v) })
    def pdot(a: Array[Double], b: Array[Double], n: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // spread the rotated corpus across the session's shuffle width: the
    // fused single stage must carry the full compute width by itself.
    // Guarded (r17 verdict item 6): skip the shuffle when the input is
    // already at least that wide.
    val shufW = s.conf.get("spark.sql.shuffle.partitions").toInt
    val erWide = if (er.rdd.getNumPartitions < shufW) er.repartition(shufW) else er
    val partials = Ann.heapShortlist[(Long, Array[Double]), (Long, Array[Double])](
      erWide, fused, _._1, _._1,
      (q, c) => {
        val dims = (q._1 / stride).toInt
        // zero rotated prefixes have no defined cosine — score 0.0 (the
        // F17 guard; top eigendirections make this unreachable on real
        // fixtures, crafted inputs stay crash-free)
        val den = math.sqrt(pdot(q._2, q._2, dims)) *
          math.sqrt(pdot(c._2, c._2, dims))
        if (den == 0.0) 0.0
        else BigDecimal(pdot(q._2, c._2, dims) / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      },
      Ann.TopK, desc = true,
      admit = (q, c) => c._1 != q._1 % stride, selfExclude = false)
    val topd = partials
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid"))))
      .filter(col("rank") <= Ann.TopK)
      .select(expr(s"CAST(qid DIV ${stride}L AS INT)").as("n_dims"),
        expr(s"qid % ${stride}L").as("qid"), col("nid"))
    val hitCounts = brute.join(topd, Seq("qid", "nid"))
      .groupBy(col("n_dims")).agg(count(lit(1)).as("n_hits"))
    val out = RecallDims.map(_.toInt).toDF("n_dims")
      .join(hitCounts, Seq("n_dims"), "left")
      .select(col("n_dims"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(10000 * coalesce(n_hits, 0L)) DIV (${Ann.NumQueries}L * ${Ann.TopK})")
          .as("recall_bps"))
    graft.CacheScope.releaseAfterUse(out, brute)
  }

  // ------------------------------------------------------------------
  // oracles (defs — generated AFTER queries run, off the stashed rotation)
  // ------------------------------------------------------------------

  private def rotLiteral(row: Array[Double]): String =
    s"[${row.map(java.lang.Double.toString).mkString(",")}]::DOUBLE[]"

  private def stashedOrPlaceholder: Option[(Array[Double], Array[Array[Double]])] =
    stash

  private def pcaProjectSql: String = stashedOrPlaceholder match {
    case None =>
      // the key did not run in this process — emit a visibly-empty oracle
      // rather than crashing the whole dump (the compare only consumes it
      // when the key ran, in which case the stash is populated)
      "SELECT NULL AS vec_id, NULL AS j, NULL AS pc WHERE 1 = 0"
    case Some((_, rot)) =>
      val rows = (0 until ProjDim).map(j =>
        s"($j, ${rotLiteral(rot(j))})").mkString(",\n        ")
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      r(j, rv) AS (VALUES
        $rows)
      SELECT e.vec_id, CAST(r.j AS INTEGER) AS j,
        ROUND(list_dot_product(e.v, r.rv), 6) AS pc
      FROM e, r ORDER BY vec_id, j"""
  }

  private def whitenSql: String = stashedOrPlaceholder match {
    case None =>
      "SELECT NULL AS vec_id, NULL AS j, NULL AS wc WHERE 1 = 0"
    case Some((evals, rot)) =>
      val rows = (0 until ProjDim).map { j =>
        val lam = evals(j) / GramUnitScale
        val iw = if (lam > 0.0) 1.0 / math.sqrt(lam) else 0.0
        s"($j, ${rotLiteral(rot(j))}, ${java.lang.Double.toString(iw)})"
      }.mkString(",\n        ")
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      r(j, rv, iw) AS (VALUES
        $rows)
      SELECT e.vec_id, CAST(r.j AS INTEGER) AS j,
        ROUND(list_dot_product(e.v, r.rv) * r.iw, 6) AS wc
      FROM e, r ORDER BY vec_id, j"""
  }

  private def pcaRecallSql: String = stashedOrPlaceholder match {
    case None =>
      "SELECT NULL AS n_dims, NULL AS n_hits, NULL AS recall_bps WHERE 1 = 0"
    case Some((_, rot)) =>
      val maxD = RecallDims.max
      val rotated = (0 until maxD).map(j =>
        s"list_dot_product(v, ${rotLiteral(rot(j))})").mkString(",\n          ")
      val sweeps = RecallDims.map { dims =>
        s"""tp_$dims AS (
          SELECT q.vec_id AS qid, c.vec_id AS nid,
            ROUND(list_cosine_similarity(q.rv[1:$dims], c.rv[1:$dims]), 6) AS rc
          FROM er q JOIN er c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < ${Ann.NumQueries}),
        tk_$dims AS (
          SELECT qid, nid FROM (
            SELECT qid, nid,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rc DESC, nid) AS rank
            FROM tp_$dims) t WHERE rank <= ${Ann.TopK}),
        agg_$dims AS (
          SELECT CAST($dims AS INTEGER) AS n_dims,
            (SELECT CAST(COUNT(t.nid) AS BIGINT)
             FROM br b LEFT JOIN tk_$dims t
               ON t.qid = b.qid AND t.nid = b.nid) AS n_hits)"""
      }
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      er AS MATERIALIZED (
        SELECT vec_id, [
          $rotated] AS rv
        FROM e),
      bp AS (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
          ROUND(list_cosine_similarity(q.v, c.v), 6) AS rcos
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < ${Ann.NumQueries}),
      br AS (
        SELECT qid, nid FROM (
          SELECT qid, nid,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rcos DESC, nid) AS rank
          FROM bp) t WHERE rank <= ${Ann.TopK}),
      ${sweeps.mkString(",\n")}
      SELECT n_dims, n_hits,
        CAST((10000 * n_hits) // (${Ann.NumQueries} * ${Ann.TopK}) AS BIGINT)
          AS recall_bps
      FROM (${RecallDims.map(dm => s"SELECT * FROM agg_$dm").mkString(" UNION ALL ")})
      ORDER BY n_dims"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_pca_project" -> pcaProject _,
    "emb_whiten" -> whiten _,
    "ann_pca_recall" -> pcaRecall _
  )

  def oracles: Map[String, String] = Map(
    "emb_pca_project" -> pcaProjectSql,
    "emb_whiten" -> whitenSql,
    "ann_pca_recall" -> pcaRecallSql
  )
}
