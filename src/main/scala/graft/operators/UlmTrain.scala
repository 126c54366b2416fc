package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** H51/H52 (round-14, verdict item 6): in-engine UNIGRAM-LM tokenizer
  * training — the SentencePiece-family alternative to the BPE trainer
  * ([[BpeTrain]]): instead of greedily GROWING a merge table, seed a large
  * candidate-piece vocabulary and iteratively SHRINK it, re-estimating
  * piece usage between prunes (Kudo 2018's outer loop). Production stacks
  * ship both families; H30/H42 fertility now has a second learned
  * vocabulary to compare against.
  *
  * The loop follows the [[BpeTrain]]/[[QualityTrain]] discipline — per
  * round ONE distributed aggregation (usage counts over the segmented
  * corpus, map-side combined into ≤[[SeedN]] longs) plus ONE driver-side
  * vocabulary update (driver state = the ≤[[SeedN]]-row piece table):
  *   - SEED: the top-[[SeedN]] intra-word character n-grams (n ∈ 2..4,
  *     positional counts with overlaps — the H15-style corpus statistic)
  *     by (count DESC, piece ASC); segmentation PRIORITY (pid) re-ranks
  *     the selected set by (length DESC, count DESC, piece ASC) — maximal
  *     munch, the longest-match preference real tokenizers encode, and
  *     the ordering under which pruning a long piece demonstrably frees
  *     its text for shorter survivors;
  *   - E-STEP: segment the corpus under the live vocabulary and count how
  *     often each piece is actually used. Segmentation is PRIORITY-ORDERED
  *     NON-OVERLAPPING REWRITE — each live piece, in pid order, is
  *     globally replaced by its private-use-area symbol (U+E300+pid−1) —
  *     rather than Viterbi: the rewrite replays bit-exactly as a `replace`
  *     chain in BOTH engines (the H33 device), while Viterbi's
  *     max-likelihood DP would pin the gate to float log-prob ties. This
  *     is hard-EM with a deterministic segmenter — the honest trade, and
  *     the loop structure (estimate usage → re-weight → prune) is the
  *     unigram-LM one.
  *   - M-STEP: drop the [[Prune]] least-used live pieces (usage ASC,
  *     piece DESC — total order, piece is unique); survivors keep their
  *     seed priority.
  * A pruned piece FREES its occurrences for overlapping lower-priority
  * pieces, so usage genuinely shifts between rounds — the spec pins
  * round-for-round equality against an in-process reference trainer, plus
  * the usage-migration property itself.
  *
  * The learned trajectory is a stored artifact (fingerprint-versioned
  * parquet, the [[QualityTrain]] discipline); the fertility consumer
  * (`corpus_fertility_ulm`, H30 re-derived) segments under the FINAL
  * vocabulary with single-character fallback — a token is one piece
  * symbol or one unmatched character, so tokens = length of the segmented
  * string, exactly the BPE twin's accounting.
  *
  * Scale shape: seeding is one corpus scan into a vocabulary-sized
  * aggregate + TakeOrdered(SeedN); each round is one corpus scan through
  * a ≤SeedN-deep codegen'd replace chain and a ≤SeedN-column sum; rounds
  * never grow driver state past the piece table. At 100 TB the pair
  * statistics sample exactly like BPE's (one TABLESAMPLE away).
  */
object UlmTrain {

  /** Candidate vocabulary size (seeded, then shrunk). */
  val SeedN = 40
  /** EM rounds. 9 reaches past the starved-piece band (~23 of the 40
    * seeds are shadowed by higher-priority overlaps on this corpus) into
    * genuinely-used pieces, so the final rounds exhibit the usage
    * migration the spec pins. */
  val Rounds = 9
  /** Pieces dropped per round: 9 rounds × 4 = final vocabulary of 4. */
  val Prune = 4
  /** First piece symbol codepoint (own PUA block — clear of the fixed
    * U+E000-E04F table, H33's U+E100+, the U+E0FF pre-token marker and
    * H41's U+E200+, so all learned vocabularies coexist). */
  val PuaBase = 0xE300
  /** Never-occurring sentinel the oracle substitutes for a pruned piece's
    * pattern, making its replace a no-op. */
  val DeadCp = 0xE3FE

  private def puaStr(pid: Long): String =
    new String(Character.toChars((PuaBase + pid - 1).toInt))

  /** Intra-word character n-grams (n ∈ 2..4), every position, overlaps
    * included — shared text with the oracle's `ungr` CTE. */
  private def ngramsCol: Column = expr(
    "flatten(transform(sequence(2, 4), n -> " +
      "filter(transform(sequence(1, length(text)), i -> substring(text, i, n)), " +
      "p -> length(p) = n AND NOT contains(p, ' '))))")

  /** The seeded piece table: (pid, piece, cnt). SELECTION is the top
    * SeedN by (cnt DESC, piece ASC); pid (segmentation priority) re-ranks
    * the selected set by (length DESC, cnt DESC, piece ASC) — maximal
    * munch. ≤ SeedN rows — bounded by construction. Lengths are code
    * points (both engines' `length`), not UTF-16 units. */
  private def computeSeed(s: SparkSession, d: String): Seq[(Long, String, Long)] =
    Tables.documents(s, d)
      .select(explode(ngramsCol).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(SeedN)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortWith { case ((pa, ca), (pb, cb)) =>
        val la = pa.codePointCount(0, pa.length)
        val lb = pb.codePointCount(0, pb.length)
        if (la != lb) la > lb
        else if (ca != cb) ca > cb
        else u8Lt(pa, pb)
      }
      .zipWithIndex.map { case ((p, c), i) => (i + 1L, p, c) }
      .toSeq

  /** UTF-8 byte order — the collation Spark and DuckDB sort strings by
    * (Java String.compareTo differs above U+FFFF). */
  private[graft] def u8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val m = math.min(x.length, y.length)
    var i = 0
    while (i < m) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def segChain(base: Column, pieces: Seq[(Long, String)]): Column =
    pieces.foldLeft(base) { case (acc, (pid, piece)) =>
      call_function("replace", acc, lit(piece), lit(puaStr(pid)))
    }

  /** One training run: per round, every live piece's usage and whether it
    * survived the prune. Rows: (round, pid, piece, usage, kept). */
  private def trainTrajectory(
      s: SparkSession, d: String): Seq[(Int, Long, String, Long, Long)] = {
    val seed = computeSeed(s, d)
    val docs = Tables.documents(s, d).select(col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var alive = seed.map(_._1).toSet
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String, Long, Long)]
      var r = 1
      while (r <= Rounds) {
        val live = seed.filter(p => alive(p._1)) // pid (= priority) order
        val seg = segChain(col("text"), live.map(p => (p._1, p._2)))
        val aggs = live.map { p =>
          sum((length(col("s")) -
            length(call_function("replace", col("s"), lit(puaStr(p._1)), lit(""))))
            .cast("long")).as(s"u${p._1}")
        }
        val row = docs.select(seg.as("s")).agg(aggs.head, aggs.tail: _*).head()
        val usage = live.zipWithIndex.map { case (p, i) => p._1 -> row.getLong(i) }.toMap
        // M-step: drop the Prune least-used (usage ASC, piece DESC — total)
        val dropped = live.sortWith { (x, y) =>
          if (usage(x._1) != usage(y._1)) usage(x._1) < usage(y._1)
          else u8Lt(y._2, x._2)
        }.take(Prune).map(_._1).toSet
        live.foreach { p =>
          out += ((r, p._1, p._2, usage(p._1), if (dropped(p._1)) 0L else 1L))
        }
        alive = alive -- dropped
        r += 1
      }
      out.toSeq
    } finally { docs.unpersist(blocking = false); () }
  }

  private val trajBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, graft.Artifacts.Built]()

  private def trajLocation(s: SparkSession, d: String): String = {
    val fp = graft.Artifacts.fingerprint(s, s"$d/documents.parquet")
    graft.Artifacts.cachedLocation(trajBuilt, d, fp) { fpv =>
      val slug = d.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
      val dir = new org.apache.hadoop.fs.Path(
        graft.Artifacts.scratchBase(s), s"graft_ulm_traj_${slug}_$fpv").toString
      import s.implicits._
      trainTrajectory(s, d)
        .toDF("round", "pid", "piece", "usage", "kept")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }
  }

  /** The FINAL vocabulary (survivors of round [[Rounds]]), in priority
    * order — ≤ SeedN rows, bounded driver state. */
  private[graft] def learnedVocab(s: SparkSession, d: String): Seq[(Long, String)] =
    s.read.parquet(trajLocation(s, d))
      .filter(col("round") === Rounds && col("kept") === 1L)
      .orderBy(col("pid")).collect()
      .map(r => (r.getAs[Long]("pid"), r.getAs[String]("piece"))).toSeq

  // ------------------------------------------------------------------
  // gated operators
  // ------------------------------------------------------------------

  /** H51 — the learned EM trajectory: per round, every live piece's usage
    * count under that round's segmentation and whether it survived the
    * prune. The training replay IS the gate. */
  def ulmTrainVocab(s: SparkSession, d: String): DataFrame =
    s.read.parquet(trajLocation(s, d))
      .select(col("round"), col("pid"), col("piece"), col("usage"), col("kept"))

  /** H52 — H30's fertility report re-derived under the learned unigram-LM
    * vocabulary (the H42 shape for the second tokenizer family): tokens =
    * pieces + single-character fallback = length of the segmented text. */
  def fertilityUlm(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.wsTokens
    val vocab = learnedVocab(s, d)
    Tables.documents(s, d)
      .select(col("source"),
        wsTokens(col("text")).cast("long").as("nw"),
        length(col("text")).cast("long").as("nc"),
        length(segChain(col("text"), vocab)).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("words"),
        sum(col("nt")).as("ulm_tokens"), sum(col("nc")).as("chars"))
      .select(col("source"), col("n_docs"), col("words"), col("ulm_tokens"),
        col("chars"),
        expr("(1000 * ulm_tokens) DIV greatest(words, 1L)").as("fertility_milli"),
        expr("(1000 * chars) DIV greatest(ulm_tokens, 1L)").as("chars_per_tok_milli"))
  }

  // ------------------------------------------------------------------
  // oracles: the full EM replay
  // ------------------------------------------------------------------

  /** Seed CTEs: positional n-gram counts (`ungr`), the ranked top-SeedN
    * piece table (`useed`), and the initial live set (`ua0`). */
  private def seedCtes: String = s"""
    ungr AS MATERIALIZED (
      SELECT piece, COUNT(*) AS cnt FROM (
        SELECT substring(text, CAST(pos AS INT), CAST(n AS INT)) AS piece
        FROM (SELECT text, n, unnest(range(1, length(text) - n + 2)) AS pos
              FROM (SELECT text, unnest([2, 3, 4]) AS n FROM documents)))
      WHERE NOT contains(piece, ' ')
      GROUP BY 1),
    useed AS MATERIALIZED (
      SELECT piece, cnt,
        CAST(ROW_NUMBER() OVER (ORDER BY length(piece) DESC, cnt DESC, piece)
          AS BIGINT) AS pid
      FROM (
        SELECT piece, cnt FROM (
          SELECT piece, cnt,
            ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk
          FROM ungr) t
        WHERE rk <= $SeedN) sel),
    ua0 AS (SELECT pid FROM useed)"""

  /** The priority-ordered rewrite chain under live set `aliveCte`: pruned
    * pieces degrade to a never-occurring sentinel pattern (their replace
    * becomes the identity), keeping the chain STATIC while aliveness stays
    * data-dependent. */
  private def chainSql(aliveCte: String): String =
    (1 to SeedN).foldLeft("text") { (acc, i) =>
      s"""replace($acc, COALESCE((SELECT CASE WHEN EXISTS
        (SELECT 1 FROM $aliveCte WHERE pid = $i) THEN piece END
        FROM useed WHERE pid = $i), chr($DeadCp)), chr(${PuaBase + i - 1}))"""
    }

  private def roundCtes: String = {
    val parts = scala.collection.mutable.ArrayBuffer(seedCtes)
    (1 to Rounds).foreach { r =>
      parts += s"""useg$r AS MATERIALIZED (
        SELECT doc_id, ${chainSql(s"ua${r - 1}")} AS s FROM documents)"""
      parts += s"""uuse$r AS MATERIALIZED (
        SELECT sd.pid, sd.piece,
          CAST(COALESCE(SUM(length(g.s)
            - length(replace(g.s, chr(CAST($PuaBase + sd.pid - 1 AS INT)), ''))), 0)
            AS BIGINT) AS usage
        FROM useed sd JOIN ua${r - 1} al ON al.pid = sd.pid
        CROSS JOIN useg$r g
        GROUP BY sd.pid, sd.piece)"""
      parts += s"""ua$r AS MATERIALIZED (
        SELECT pid FROM (
          SELECT pid, ROW_NUMBER() OVER (ORDER BY usage ASC, piece DESC) AS rk
          FROM uuse$r) t
        WHERE rk > $Prune)"""
    }
    parts.mkString(",\n")
  }

  private def ulmTrainVocabSql: String = {
    val rows = (1 to Rounds).map { r =>
      s"""SELECT CAST($r AS INTEGER) AS round, u.pid, u.piece, u.usage,
        CAST(CASE WHEN a.pid IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM uuse$r u LEFT JOIN ua$r a ON a.pid = u.pid"""
    }.mkString(" UNION ALL ")
    s"WITH $roundCtes\nSELECT * FROM ($rows) t ORDER BY round, pid"
  }

  private def fertilityUlmSql: String = {
    import graft.functions.TextFunctions.wsTokensSql
    s"""WITH $roundCtes,
    usegf AS MATERIALIZED (
      SELECT doc_id, ${chainSql(s"ua$Rounds")} AS s FROM documents),
    f AS (
      SELECT d.source, CAST(${wsTokensSql("d.text")} AS BIGINT) AS nw,
        CAST(length(d.text) AS BIGINT) AS nc, CAST(length(g.s) AS BIGINT) AS nt
      FROM documents d JOIN usegf g ON g.doc_id = d.doc_id)
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(nw) AS BIGINT) AS words,
      CAST(SUM(nt) AS BIGINT) AS ulm_tokens, CAST(SUM(nc) AS BIGINT) AS chars,
      CAST((1000 * SUM(nt)) // greatest(SUM(nw), 1) AS BIGINT) AS fertility_milli,
      CAST((1000 * SUM(nc)) // greatest(SUM(nt), 1) AS BIGINT) AS chars_per_tok_milli
    FROM f GROUP BY 1 ORDER BY 1"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ulm_train_vocab" -> ulmTrainVocab _,
    "corpus_fertility_ulm" -> fertilityUlm _
  )

  val oracles: Map[String, String] = Map(
    "ulm_train_vocab" -> ulmTrainVocabSql,
    "corpus_fertility_ulm" -> fertilityUlmSql
  )
}
