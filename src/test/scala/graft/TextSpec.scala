package graft

import org.apache.spark.sql.functions._
import graft.plans.Winnow
import graft.operators.{Tables, TextAnalysis}

class TextSpec extends SparkSpec {
  import SparkSpecBase.spark.implicits._

  test("winnow guarantees shared fingerprints for shared substrings") {
    val k = 5; val w = 4
    val common = "the quick brown fox jumps over the lazy dog"
    val a = s"prefix one $common suffix alpha"
    val b = s"completely different head $common and another tail"
    val df = Seq(("a", a), ("b", b)).toDF("id", "text")
      .select(col("id"), Winnow.winnow(col("text"), k, w).as("fps"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    // winnowing guarantee: substrings of length >= w + k - 1 share a fingerprint
    assert(rows("a").intersect(rows("b")).nonEmpty)
  }

  test("winnow is deterministic and non-empty for real docs") {
    val df = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), Winnow.winnow(col("text")).as("fps"))
    val a = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b && a.values.forall(_.nonEmpty))
  }

  test("winnow works inside whole-stage codegen (no fallback)") {
    val plan = Tables.documents(spark, sf)
      .select(Winnow.winnow(col("text")).as("fps"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[winnow.*"), plan)
  }

  test("textTopTerms emits <=3 integer-ranked terms per doc with finite weights") {
    val rows = TextAnalysis.textTopTerms(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty && byDoc.values.forall(_.length <= 3))
    // ranking is (tf desc, df asc, term asc): within a doc no kept term may
    // be strictly dominated by a dropped one — spot-check tf ordering holds
    byDoc.values.foreach { rs =>
      val tfs = rs.map(_.getLong(2))
      assert(tfs.forall(_ >= 1) && rows.forall(r => !r.getDouble(4).isNaN))
    }
  }

  test("textRepetition fractions are in [0,1] and consistent with counts") {
    val rows = TextAnalysis.textRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nd) = (r.getInt(1), r.getInt(2))
      val dupW = r.getDouble(3)
      assert(nd <= n && dupW >= 0.0 && dupW <= 1.0)
      if (n > 0) assert(math.abs(dupW - (n - nd).toDouble / n) < 1e-12)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("langId returns a declared language or und") {
    val langs = TextAnalysis.textLangid(spark, sf).collect().map(_.getString(0)).toSet
    val allowed = graft.functions.TextFunctions.langMarkers.map(_._1).toSet + "und"
    assert(langs.subsetOf(allowed))
  }

  test("D13 strip_html: blocks drop with content, tags to spaces, entities decode") {
    val out = TextAnalysis.textStripHtml(SparkSpecBase.spark, sf)
      .join(Tables.documents(SparkSpecBase.spark, sf).select(col("doc_id"), col("text")), "doc_id")
      .limit(200).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val stripped = r.getAs[String]("stripped")
      // script/style content is GONE (not just the tags)
      assert(!stripped.contains("track()"), s"doc $id leaked script body")
      assert(!stripped.contains("color:red"), s"doc $id leaked style body")
      // the document body survives verbatim
      assert(stripped.contains(r.getAs[String]("text")), s"doc $id lost body text")
      // entities decoded exactly once
      assert(stripped.contains("Home & About Us"), s"doc $id entity decode failed")
      assert(!stripped.contains("&amp;") && !stripped.contains("&nbsp;"))
      // no markup left: any residual < comes only from the decoded &lt; ad
      if (id % 2 == 0) assert(stripped.contains(s"<${id % 50}% off>"))
      else assert(!stripped.contains("<"), s"doc $id left a tag")
      assert(r.getAs[String]("title") == s"Doc $id")
      assert(r.getAs[Int]("n_scripts") == 1)
    }
  }

  test("D12 RAKE: stopword islands, chunking, degree/freq scoring, top-k order") {
    import SparkSpecBase.spark.implicits._
    val docs = Seq(
      // runs: "quick brown fox jumps" (4) and "lazy dog" (2); all words
      // appear once -> each word scores its phrase length; scores 16 vs 4
      (1L, "the quick brown fox jumps over the lazy dog"),
      // a 6-word run chunks into 4 + 2; "data" appears in both chunks
      // (freq 2), every other word once
      (2L, "big data systems love data pipelines")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.textKeyphrasesDf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq("quick brown fox jumps", "lazy dog"))
    assert(d1(0)._4 == 16.0 && d1(1)._4 == 4.0)
    val d2 = out.filter(_._1 == 2L).sortBy(_._2)
    // chunk 1 = "big data systems love", chunk 2 = "data pipelines";
    // degree(data) = 4 + 2 = 6, freq 2 -> word score 3; chunk1 = 4+3+4+4 =
    // 15, chunk2 = 3+2 = 5
    assert(d2.map(_._3).toSeq == Seq("big data systems love", "data pipelines"))
    assert(d2(0)._4 == 15.0 && d2(1)._4 == 5.0)
    // ranks are dense from 1 within each doc
    out.groupBy(_._1).values.foreach(rs =>
      assert(rs.map(_._2).sorted.sameElements(1 to rs.length)))
  }

  test("D14 trigram langid beats stopword argmax where stopwords mislead") {
    import SparkSpecBase.spark.implicits._
    import graft.functions.TextFunctions.{langId, langIdNgram, langIdNgramScore}
    // (text, expected stopword verdict, expected trigram verdict)
    val cases = Seq(
      // French relative 'que' is a SPANISH stopword marker — the marker
      // argmax votes es; the trigram model reads ' je'/'ais'/'est'
      ("je pense que tu sais que tout est vrai", "es", "fr"),
      // marker-free German: stopword argmax says 'und' (no der/die/und),
      // orthography (sch/ich/cht) says German
      ("ich spreche wirklich nicht schlecht", "und", "de"),
      // marker-free English gerunds: 'ing' everywhere, zero markers
      ("running swimming jumping singing", "und", "en"),
      // sanity: ordinary English agrees in both models
      ("the cat sat on the mat and the dog sat", "en", "en"))
    val out = cases.map(_._1).toDF("text")
      .select(col("text"), langId(col("text")).as("stop"),
        langIdNgram(col("text")).as("ngram"),
        langIdNgramScore(col("text")).as("score"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    for ((text, expStop, expNgram) <- cases) {
      val (stop, ngram, score) = out(text)
      assert(stop == expStop, s"'$text': stopword gave $stop, expected $expStop")
      assert(ngram == expNgram, s"'$text': trigram gave $ngram, expected $expNgram")
      if (expNgram != "und") assert(score > 0)
    }
  }
  test("D17 mojibake: planted damage counted exactly per class, clean text scores zero") {
    val rows = TextAnalysis.textMojibake(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // the plant is fully deterministic: each class's count is its
      // doc_id-derived repetition (the ASCII base text matches nothing,
      // and the classes don't bleed: '©' U+00A9 is outside the C1 range)
      assert(r.getAs[Long]("n_replacement") == id % 3, s"doc $id repl")
      assert(r.getAs[Long]("n_latin1_utf8") == id % 4, s"doc $id latin1")
      assert(r.getAs[Long]("n_c1_controls") == id % 5, s"doc $id c1")
      val dmg = id % 3 + id % 4 + id % 5
      assert(r.getAs[Long]("damage_per_kchar") ==
        1000 * dmg / math.max(r.getAs[Long]("n_chars"), 1L), s"doc $id score")
    }
    // a doc_id divisible by 60 plants nothing — the zero branch is real
    assert(rows.exists(r => r.getAs[Long]("doc_id") % 60 == 0 &&
      r.getAs[Long]("damage_per_kchar") == 0))
  }

  test("D16 readability replays the fixed-point Flesch formulas exactly") {
    val rows = TextAnalysis.textReadability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("n_words"); val s = r.getAs[Long]("n_sentences")
      val syl = r.getAs[Long]("n_syllables")
      val fre = 206835L - (1015L * w) / s - (84600L * syl) / math.max(w, 1L)
      val fkgl = (390L * w) / s + (11800L * syl) / math.max(w, 1L) - 15590L
      assert(r.getAs[Long]("fre_milli") == fre)
      assert(r.getAs[Long]("fkgl_milli") == fkgl)
      // planted sentence structure: ~sentence_len words per sentence
      assert(s >= w / r.getAs[Long]("sentence_len") - 1)
    }
    // row-varying bands (the formula discriminates on this corpus)
    assert(rows.map(_.getAs[String]("band")).distinct.length > 1)
  }

  test("D18 hash-embed: sparse integer vectors that reconstruct from the token stream") {
    val df = TextAnalysis.textHashEmbed(spark, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // sparse and bounded: at most D rows per doc, dims in [0, D), no zeros
    val perDoc = rows.groupBy(_._1)
    assert(perDoc.values.forall(_.length <= TextAnalysis.HashEmbedDims))
    assert(rows.forall(t => t._2 >= 0 && t._2 < TextAnalysis.HashEmbedDims && t._3 != 0L))
    // reconstruction: for a sample of docs, replay the hashing trick
    // token-by-token locally and compare the full vector
    val sample = perDoc.keys.toSeq.sorted.take(5)
    val texts = graft.operators.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(sample: _*))
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    sample.foreach { id =>
      val v = new Array[Long](TextAnalysis.HashEmbedDims)
      texts(id).toLowerCase.split(" ").filter(_.nonEmpty).foreach { w =>
        val h = graft.plans.MixHash.polyHash(w)
        val dim = java.lang.Math.floorMod(h, TextAnalysis.HashEmbedDims.toLong).toInt
        v(dim) += 1L - 2L * ((h >> 6) & 1L)
      }
      val got = perDoc(id).map(t => (t._2, t._3)).sortBy(_._1).toSeq
      val want = v.zipWithIndex.collect { case (x, j) if x != 0 => (j, x) }.toSeq
      assert(got == want, s"doc $id: $got != $want")
    }
    // both signs occur across the corpus (the sign hash is live)
    assert(rows.exists(_._3 > 0) && rows.exists(_._3 < 0))
  }

  test("G14 spectrum: bins reconstruct from a local integer replay and discriminate") {
    import graft.multimodal.Multimodal
    val rows = Multimodal.audioSpectrum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_._1)
    assert(perDoc.values.forall(_.length == Multimodal.SpectrumBins.length))
    // bins discriminate on this corpus (a vacuous all-equal gate proves nothing)
    assert(perDoc.values.exists(rs => rs.map(_._3).distinct.length > 1))
    // local replay for a sample of docs: same tables, fresh loop
    val fr = Multimodal.SpectrumFrame
    val sample = perDoc.keys.toSeq.sorted.take(3)
    val texts = graft.operators.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(sample: _*))
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    sample.foreach { id =>
      val bytes = texts(id).getBytes("UTF-8")
      val nf = bytes.length / fr
      Multimodal.SpectrumBins.zipWithIndex.foreach { case (k, bi) =>
        var tot = 0L; var pkF = 0L; var pkP = -1L
        (0 until nf).foreach { f =>
          var c = 0L; var sA = 0L
          (0 until fr).foreach { n =>
            val v = ((bytes(f * fr + n) & 0xFF) - 128).toLong
            c += v * Multimodal.SpectrumCosTab(bi)(n)
            sA += v * Multimodal.SpectrumSinTab(bi)(n)
          }
          val pw = c * c + sA * sA
          tot += pw
          if (pw > pkP) { pkP = pw; pkF = f }
        }
        val got = rows.find(t => t._1 == id && t._2 == k).get
        assert((got._3, got._4, got._5) == ((tot, pkF, pkP)),
          s"doc $id bin $k diverges from the local replay")
      }
    }
  }

}
