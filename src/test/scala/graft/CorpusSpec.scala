package graft

// (mini-BPE parity spec added at the bottom of this file)

import org.apache.spark.sql.functions._
import graft.operators.{CorpusClean, Relational, Tables}

class CorpusSpec extends SparkSpec {

  test("H53: incremental flagship — every documents-text scan is batch-" +
      "predicated; corpus state arrives only through stored artifacts") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // audit the UNPERSISTED pipeline (the gated entry wraps it in a scoped
    // persist for the waterfill tail, which would hide the scans behind an
    // InMemoryTableScan)
    val df = CorpusClean.prepareIncrementalTok(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("graft_incr_prefix") && phys.contains("graft_incr_df")
      && phys.contains("graft_incr_arr"), "stored E7 index not in the plan")
    assert(phys.contains("graft_evalgrams_"),
      "stored eval-gram artifact not in the plan")
    // walk the optimized plan: every relation over documents.parquet must
    // sit beneath a Filter carrying the batch predicate (doc_id % 10 >= 8)
    def audit(p: LogicalPlan, under: Boolean): Seq[Boolean] = {
      val self = p match {
        case r: LogicalRelation => r.relation match {
          case h: HadoopFsRelation
              if h.location.rootPaths.exists(_.toString.contains("documents.parquet")) =>
            Seq(under)
          case _ => Seq.empty
        }
        case _ => Seq.empty
      }
      val u2 = p match {
        case f: Filter => under || f.condition.toString.contains("% 10")
        case _ => under
      }
      self ++ p.children.flatMap(c => audit(c, u2))
    }
    val scans = audit(df.queryExecution.optimizedPlan, under = false)
    assert(scans.nonEmpty && scans.forall(identity),
      s"unpredicated corpus-text scan ($scans):\n${df.queryExecution.optimizedPlan}")
    // mix-accounting invariants on the batch report (the gated entry)
    val rows = CorpusClean.corpusPrepareIncremental(spark, sf).collect()
    assert(rows.nonEmpty, "empty batch report")
    rows.foreach { r =>
      val (cap, alloc, satd) = (r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(alloc <= cap, s"${r.getString(0)}: allocation above capacity")
      assert(!satd || alloc == cap, s"${r.getString(0)}: saturated but capped short")
    }
  }

  test("H36 water-filling: budget exhausted up to remainder, fairness structure holds") {
    val rows = CorpusClean.budgetWaterfill(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("capacity"), r.getAs[Long]("allocation"),
        r.getAs[Boolean]("saturated")))
    assert(rows.nonEmpty)
    val budget = rows.map(_._2).sum * 3 / 2
    // every allocation within its capacity; saturated == allocation hits cap
    rows.foreach { case (src, _, cap, a, sat) =>
      assert(a >= 0 && a <= cap, s"$src: allocation $a outside [0, $cap]")
      assert(sat == (a == cap) || !sat && a == cap,
        s"$src: saturation flag inconsistent")
    }
    val unsat = rows.filter(!_._5)
    if (unsat.nonEmpty) {
      // all unsaturated sources share ONE level (the water line), and the
      // level is >= every saturated capacity (else that source should have
      // been unsaturated too)
      val levels = unsat.map(_._4).distinct
      assert(levels.length == 1, s"multiple water lines: ${levels.toSeq}")
      val satCaps = rows.filter(_._5).map(_._3)
      if (satCaps.nonEmpty)
        assert(levels.head >= satCaps.max,
          s"water line ${levels.head} below a saturated cap ${satCaps.max}")
      // budget exhausted up to the integer-division remainder
      val leftover = budget - rows.map(_._4).sum
      assert(leftover >= 0 && leftover < unsat.length,
        s"leftover $leftover not in [0, ${unsat.length})")
    } else {
      // all saturated: total capacity fit inside the budget
      assert(rows.map(_._4).sum == rows.map(_._3).sum)
      assert(rows.map(_._3).sum <= budget)
    }
    // non-vacuous: the deterministic epoch caps must split the corpus into
    // BOTH saturated and unsaturated sources at this SF
    assert(rows.exists(_._5) && rows.exists(!_._5),
      s"degenerate split (${rows.count(_._5)} saturated of ${rows.length})")
  }

  test("H44 mix epochs: allocation decomposes exactly; partial prefix covers the remainder") {
    val rows = CorpusClean.mixEpochs(spark, sf).collect()
    assert(rows.nonEmpty)
    // the per-source max doc-token count bounds the prefix overshoot
    val maxDocTok = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(max(size(split(col("text"), " ")).cast("long")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (nt, a) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("allocation"))
      val (fe, rem) = (r.getAs[Long]("full_epochs"), r.getAs[Long]("rem_tokens"))
      val (pd, pt) = (r.getAs[Long]("partial_docs"), r.getAs[Long]("partial_tokens"))
      assert(fe * nt + rem == a, s"$src: $fe*$nt+$rem != $a")
      assert(rem >= 0 && rem < nt, s"$src: remainder $rem outside [0, $nt)")
      if (rem == 0) assert(pd == 0 && pt == 0, s"$src: partial on zero remainder")
      else {
        // the prefix reaches the remainder, overshooting by less than its
        // last document (the H5 packing convention)
        assert(pd > 0 && pt >= rem, s"$src: prefix $pt short of remainder $rem")
        assert(pt - rem < maxDocTok(src),
          s"$src: overshoot ${pt - rem} >= max doc ${maxDocTok(src)}")
        assert(pt <= nt, s"$src: partial tokens $pt exceed the source")
      }
    }
    // non-vacuous: some source repeats (full epoch >= 1) and some has a
    // genuine partial prefix at this SF
    assert(rows.exists(_.getAs[Long]("full_epochs") >= 1L))
    assert(rows.exists(_.getAs[Long]("partial_docs") > 0L))
  }

  test("H50 pack report: reconciles against the per-pack frame; overhead honest") {
    val r = CorpusClean.packReport(spark, sf).head()
    val packs = CorpusClean.pack(spark, sf).collect()
      .map(_.getAs[Long]("n_tokens"))
    assert(r.getAs[Long]("n_packs") == packs.length.toLong)
    assert(r.getAs[Long]("total_tokens") == packs.sum)
    assert(r.getAs[Long]("n_overflow") ==
      packs.count(_ > CorpusClean.PackBudget).toLong)
    val ideal = (packs.sum + CorpusClean.PackBudget - 1) / CorpusClean.PackBudget
    assert(r.getAs[Long]("ideal_packs") == ideal)
    // the packer can never beat the LP bound, and this corpus's per-group
    // remainders make the overhead strictly positive (honest, not hidden)
    assert(r.getAs[Long]("n_packs") >= ideal)
    assert(r.getAs[Long]("overhead_bps") ==
      10000 * (packs.length - ideal) / math.max(ideal, 1L))
    assert(r.getAs[Long]("overhead_bps") > 0, "overhead vacuous on this corpus")
    assert(r.getAs[Long]("mean_fill_bps") ==
      10000 * packs.sum / (packs.length * CorpusClean.PackBudget))
  }

  test("H48 stratified split: exact per-source floor boundaries, partition, determinism") {
    val rows = CorpusClean.splitStratified(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("split")))
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == total, "split does not partition the corpus")
    // exact floor arithmetic per source: train = floor(0.9n), val =
    // floor(0.95n) - floor(0.9n), test = rest
    rows.groupBy(_._2).foreach { case (src, g) =>
      val n = g.length.toLong
      val counts = g.groupBy(_._3).view.mapValues(_.length.toLong)
        .toMap.withDefaultValue(0L)
      assert(counts("train") == n * 90 / 100, s"$src train")
      assert(counts("val") == n * 95 / 100 - n * 90 / 100, s"$src val")
      assert(counts("test") == n - n * 95 / 100, s"$src test")
      // unlike H6's expectation-only buckets, every stratum of this corpus
      // gets a non-empty val set
      assert(counts("val") > 0 && counts("test") > 0, s"$src empty eval split")
    }
    val again = CorpusClean.splitStratified(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toMap
    rows.foreach { case (id, _, sp) => assert(again(id) == sp) }
  }

  test("H47 span decontamination: agrees with H2's verdicts but cuts, not drops") {
    val rows = CorpusClean.decontaminateSpans(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_spans_hit"), r.getAs[Long]("words_removed"),
        r.getAs[Long]("words_kept")))
    assert(rows.nonEmpty)
    // the hit set is EXACTLY the doc set H2 drops (one contamination rule)
    val survivors = CorpusClean.decontaminate(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val hitDocs = rows.filter(_._3 > 0).map(_._1).toSet
    val cleanDocs = rows.filter(_._3 == 0).map(_._1).toSet
    assert(cleanDocs == survivors, "span verdicts drifted from H2's")
    assert(hitDocs.nonEmpty, "no contamination on this corpus — vacuous")
    rows.foreach { case (id, nw, h, rm, kept) =>
      assert(kept == nw - rm && rm <= nw, s"doc $id accounting")
      if (h > 0) assert(rm >= CorpusClean.DecontaminationGram && rm <= 5 * h,
        s"doc $id: $h hits removed $rm words")
      else assert(rm == 0)
    }
    // the policy's point: the cut is SURGICAL — some contaminated doc
    // retains words H2 would have dropped (the fixture's contaminated docs
    // are near-total eval duplicates, so retention is small but non-zero;
    // the merged-union accounting above is what pins the span arithmetic)
    assert(rows.exists(r => r._3 > 0 && r._5 > 0),
      "no contaminated doc retained anything — the cut degenerates to H2's drop")
  }

  test("H45 temperature mixing: exact integer sqrt; shares flatten toward uniform") {
    val rows = CorpusClean.mixTemperature(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("w_root"), r.getAs[Long]("share_bps"),
        r.getAs[Long]("temp_share_bps"), r.getAs[Long]("alloc_tokens")))
    assert(rows.length > 1)
    // w_root is THE integer square root (not a float approximation)
    rows.foreach { case (src, nt, w, _, _, _) =>
      assert(w * w <= nt && (w + 1) * (w + 1) > nt, s"$src: isqrt($nt) != $w")
    }
    // flattening: sqrt is concave, so the dominant source loses share and
    // the smallest gains (strict on this corpus — sources differ in size)
    val byRaw = rows.sortBy(_._4)
    assert(byRaw.last._4 > byRaw.head._4, "degenerate fixture: equal shares")
    assert(byRaw.last._5 < byRaw.last._4,
      s"head source not damped: ${byRaw.last._5} vs ${byRaw.last._4}")
    assert(byRaw.head._5 > byRaw.head._4,
      s"tail source not boosted: ${byRaw.head._5} vs ${byRaw.head._4}")
    // monotone transform: token ordering implies weight ordering (no
    // pairwise inversions — floor ties collapse but never cross)
    for (a <- rows; b <- rows if a._2 < b._2)
      assert(a._3 <= b._3, s"isqrt inversion: ${a._1} vs ${b._1}")
    val budget = rows.map(_._2).sum * 3 / 2
    val spent = rows.map(_._6).sum
    assert(spent <= budget && budget - spent < rows.length,
      s"alloc $spent vs budget $budget")
  }

  test("H36 water-filling: hand-built skewed corpus resolves the exact allocation") {
    import SparkSpecBase.spark.implicits._
    // capacities engineered around the budget: tokens per source via
    // documents of known word counts, epochs from the pinned source hash
    val dir = java.nio.file.Files.createTempDirectory("graft-wf").toString
    def doc(i: Long, src: String, words: Int) =
      (i, (1 to words).map(_ => "w").mkString(" "), "en", src, 0L)
    // three sources with very different volumes
    val docs = (0 until 2).map(i => doc(i, "tiny", 10)) ++
      (2 until 6).map(i => doc(i, "mid", 100)) ++
      (6 until 16).map(i => doc(i, "big", 1000))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = CorpusClean.budgetWaterfill(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("max_epochs"),
          r.getAs[Long]("capacity"), r.getAs[Long]("allocation"),
          r.getAs[Boolean]("saturated"))).toMap
    // replay the algorithm by hand from first principles
    val toks = rows.view.mapValues(_._1).toMap
    val budget = toks.values.sum * 3 / 2
    val caps = rows.map { case (s, v) => s -> v._3 }
    val order = caps.toSeq.sortBy { case (s, c) => (c, s) }
    // reference: saturate in ascending-cap order while cap <= the running
    // fair share; the first unsaturated source FREEZES the water line for
    // every remaining source (they all see the same frontier)
    var remaining = budget; var nLeft = order.length
    var level = -1L
    var expected = Map.empty[String, Long]
    order.foreach { case (src, cap) =>
      if (level < 0 && cap <= remaining / nLeft) {
        expected += src -> cap; remaining -= cap; nLeft -= 1
      } else {
        if (level < 0) level = remaining / nLeft
        expected += src -> level
      }
    }
    rows.foreach { case (src, (_, _, cap, alloc, sat)) =>
      assert(alloc == expected(src),
        s"$src: engine $alloc vs reference ${expected(src)} (cap $cap, sat $sat)")
    }
  }

  test("shard manifest: contiguous doc ranges, token conservation, budget band") {
    import org.apache.spark.sql.functions._
    import graft.operators.CorpusClean
    val m = CorpusClean.shardManifest(spark, sf).collect()
      .sortBy(_.getAs[Long]("shard_id"))
    assert(m.length > 1, "one shard — budget never binds")
    // shard ids are dense from 0
    assert(m.map(_.getAs[Long]("shard_id")).sameElements(m.indices.map(_.toLong)))
    // contiguity: shards tile the doc_id line in order
    m.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("last_doc") + 1 == b.getAs[Long]("first_doc"),
        s"gap between shards ${a.getAs[Long]("shard_id")} and ${b.getAs[Long]("shard_id")}")
    case _ => ()
    }
    val docsTok = graft.operators.Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " "))).as("t"), count(lit(1)).as("n")).head
    assert(m.map(_.getAs[Long]("total_tokens")).sum == docsTok.getLong(0), "token loss")
    assert(m.map(_.getAs[Long]("n_docs")).sum == docsTok.getLong(1), "doc loss")
    // a doc never splits, so every non-final shard is within one max-doc of
    // the budget (docs cap at 99 words on this corpus)
    m.init.foreach { r =>
      assert(math.abs(r.getAs[Long]("total_tokens") - CorpusClean.ShardTokens) < 100,
        s"shard ${r.getAs[Long]("shard_id")} total ${r.getAs[Long]("total_tokens")}")
    }
  }
  test("corpus_split is a shuffle-free total partition with ~90/5/5 mass") {
    val df = CorpusClean.trainSplit(spark, sf)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "split must be a pure per-row map — no shuffle")
    val total = Tables.documents(spark, sf).count()
    val bys = df.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys.values.sum == total, "every doc gets exactly one split")
    // binomial noise at sf0.001 (~50 docs) is wide; just pin the order
    assert(bys.getOrElse("train", 0L) > bys.getOrElse("val", 0L))
    assert(bys.keySet.subsetOf(Set("train", "val", "test")))
    // determinism: a doc's assignment never changes between runs
    val a = df.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = CorpusClean.trainSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
  }

  test("mini-BPE: vocabulary well-formed, expression matches the greedy reference") {
    import graft.functions.TextFunctions
    // exactly 256 distinct regex-safe pairs
    val m = TextFunctions.miniBpeMerges
    assert(m.length == 256 && m.distinct.length == 256)
    assert(m.forall(_.matches("[a-z ,]{2}")))
    // the regexp_count form equals a literal greedy left-to-right
    // non-overlapping pair-merge state machine on real corpus text
    val mset = m.toSet
    def refTokens(text: String): Long = {
      var merges = 0L; var i = 0
      while (i + 1 < text.length) {
        if (mset.contains(text.substring(i, i + 2))) { merges += 1; i += 2 }
        else i += 1
      }
      text.length - merges
    }
    val rows = Tables.documents(spark, sf).limit(25)
      .select(col("doc_id"), col("text"),
        TextFunctions.miniBpeTokens(col("text")).as("t"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2).toLong == refTokens(r.getString(1)),
        s"mini-BPE mismatch on doc ${r.getLong(0)}")
    }
    // the count responds to bigram statistics: english text compresses,
    // a pairless string does not
    assert(refTokens("the then there") < "the then there".length)
  }

  test("events_hopping_agg counts every event in exactly width/slide windows") {
    val df = Relational.eventsHoppingAgg(spark, sf)
    val rows = df.collect()
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == 2 * nEvents,
      "1h windows every 30min => each event in exactly 2 windows")
    // window starts are 30-min aligned
    val aligned = df.filter(
      (minute(col("window_start")) % 30 === 0) && second(col("window_start")) === 0)
    assert(aligned.count() == rows.length)
  }

  test("funnel report reconciles exactly with corpus_clean's survivors") {
    val funnel = CorpusClean.funnelReport(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 10).map(r.getLong).toVector).toMap
    // stage attribution is a total partition of each source's docs AND of
    // its tokens: n = fq + fl + fd + kept, tokTot = tfq + tfl + tdup + tkept
    funnel.values.foreach {
      case Vector(n, fq, fl, fd, kept, tokTot, tfq, tfl, tdup, tokKept) =>
        assert(fq + fl + fd + kept == n, "stages must partition the docs")
        assert(tfq + tfl + tdup + tokKept == tokTot,
          "stages must partition the tokens")
        assert(tokKept <= tokTot && kept <= n)
      case v => fail(s"unexpected row shape $v")
    }
    // the kept set IS corpus_clean's survivor set, per source
    val survivors = CorpusClean.corpusClean(spark, sf)
      .select(col("doc_id"))
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    funnel.foreach { case (src, f) =>
      assert(f(4) == survivors.getOrElse(src, 0L),
        s"source $src: funnel kept ${f(4)} != corpus_clean ${survivors.getOrElse(src, 0L)}")
    }
  }

  test("bloom decontamination never misses what exact contamination finds") {
    import graft.operators.CorpusSpans
    // the bloom guarantee: zero false negatives — every gram the exact
    // H16 scorer counts as an eval hit also probes positive in the bitmap,
    // so per doc bloom_hits >= exact_hits and bloom-clean ==> exact-clean
    val exact = CorpusSpans.contaminationScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_hit
    val bloom = CorpusSpans.bloomDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(bloom.nonEmpty && bloom.map(_._1).toSet == exact.keySet)
    bloom.foreach { case (doc, nGrams, nHits, clean) =>
      assert(nHits >= exact(doc),
        s"doc $doc: bloom $nHits under-counts exact ${exact(doc)}")
      assert(nHits <= nGrams && (clean == 1) == (nHits == 0L))
    }
  }

  test("corpus_lm_score: fluent text beats gibberish; exact bigram counts; deterministic") {
    import SparkSpecBase.spark.implicits._
    // 20 copies of a fluent sentence dominate the bigram statistics; one
    // gibberish doc is all singleton bigrams over out-of-pattern tokens
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    val gibberish = "zq vxw pfft qqj nlr brr wik zz plov mnx kchh grd tss"
    val docs = ((1L to 20L).map(i => (i, fluent)) :+ (99L, gibberish) :+
      (100L, "solo")).toDF("doc_id", "text")
    val out = graft.operators.CorpusSpans.lmScoreDf(spark, docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // <2-token docs carry no bigrams and are excluded (H15 discipline)
    assert(!out.contains(100L))
    // n_bigrams = tokens - 1, exactly
    assert(out(1L)._1 == fluent.split(" ").length - 1)
    assert(out(99L)._1 == gibberish.split(" ").length - 1)
    // the model finds the repeated sentence highly probable, the
    // singleton-bigram soup highly surprising
    assert(out(99L)._2 > out(1L)._2 + 1.0,
      s"gibberish ${out(99L)._2} bits should far exceed fluent ${out(1L)._2}")
    // every copy of the same text scores identically
    assert(out(1L) == out(20L))
    // integer fixed-point scoring: a rerun is bit-identical
    val again = graft.operators.CorpusSpans.lmScoreDf(spark, docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == out)
  }

  test("H18b multi-round BPE: kernel == replace-chain reference; merges compound " +
      "across generations; codepoint-exact on emoji") {
    import SparkSpecBase.spark.implicits._
    import graft.functions.TextFunctions.{bpeMergeTable, bpeTokensK}
    // reference state machine: literal java.lang.String.replace per rule in
    // table order (left-to-right, non-overlapping, replacement not
    // rescanned within its pass) — the exact semantics the SQL oracle's
    // nested replace() chain runs
    def ref(text: String): Int = {
      val merged = bpeMergeTable.foldLeft(text) {
        case (acc, (p, sym)) => acc.replace(p, sym.toString)
      }
      merged.codePointCount(0, merged.length)
    }
    val planted = Seq(
      "the cat sat on the mat", "nation station ration", "thththth",
      "", " ", "the", " the theatre and the thing ",
      "running jumping singing", "a🎉b the 🎉",
      "zzzz", "information organization")
    for (t <- planted) {
      val got = Seq(t).toDF("text")
        .select(bpeTokensK(col("text")).as("n")).head.getInt(0)
      assert(got == ref(t), s"'$t': kernel $got != reference ${ref(t)}")
    }
    // and over a real corpus sample, row by row
    val rows = Tables.documents(spark, sf).limit(200)
      .select(col("text"), bpeTokensK(col("text")).as("n")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == ref(r.getString(0)))
    }
    // generations compound: "the" is th+e (gen 2) -> 1 token, where the
    // single-round count can never go below 2 for 3 chars
    def one(t: String): Int =
      Seq(t).toDF("text").select(bpeTokensK(col("text")).as("n")).head.getInt(0)
    assert(one("the") == 1)
    assert(one(" the ") == 2) // gen-3 " the" then ["the "] ordering: " the"+" "
    // "ation" -> a+[tion] (gen 3, via gen-2 t+[ion], via gen-1 io+n) = 1
    assert(one("ation") == 1)
    // single-round lower bound: length - merges >= ceil(len/2) = 2 for "the"
    val single = Seq("the").toDF("text")
      .select(graft.functions.TextFunctions.miniBpeTokens(col("text")).as("n"))
      .head.getInt(0)
    assert(single == 2, s"single-round 'the' = $single")
    // emoji count as one symbol (codepoint semantics, DuckDB length parity)
    assert(one("🎉") == 1)
  }
}
