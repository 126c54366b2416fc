package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityTrain

/** Pins the in-engine trained quality classifier (round-12 verdict item 1)
  * against a plain in-process reference trainer: the same fixed-point
  * diag-preconditioned logistic rounds written with none of the
  * distributed machinery (features recomputed from raw text in Scala), so
  * the two implementations share no code — and holds the learned filter
  * to BEATING both the hand-weighted H29 ensemble selection and the
  * majority class on held-out agreement with the Gopher weak label.
  */
class QualityTrainSpec extends SparkSpec {

  private val P = QualityTrain.PScale
  private val D = QualityTrain.ZDen

  /** Truncating division — the shared Spark DIV / DuckDB // semantics. */
  private def tdiv(a: Long, b: Long): Long = a / b

  private def sig(z: Long): Long = {
    val az = math.abs(z)
    (P * ((D + az) + z)) / (2L * (D + az))
  }

  /** Reference features from raw text — independent re-derivation. */
  private def refFeatures(text: String): (Array[Long], Long) = {
    val nc = text.length.toLong
    val na = text.count(c => c >= 'a' && c <= 'z').toLong
    val chars = text.count(_ != ' ').toLong
    val ws = text.split(" ", -1).filter(_.nonEmpty)
    val nw = ws.length.toLong
    val nd = ws.distinct.length.toLong
    val stops = graft.operators.CorpusSpans.GopherStops.toSet
    val ns = ws.count(stops.contains).toLong
    val f = Array(
      1000L,
      1000L * na / math.max(nc, 1L) - 500,
      1000L * ns / math.max(nw, 1L) - 500,
      1000L * (nw - nd) / math.max(nw, 1L) - 500,
      1000L * math.min(nw, 60L) / 60L - 500,
      math.min(math.abs(1000L * chars / math.max(nw, 1L) - 4500L), 3000L) / 3L - 500)
    val y = if (nw >= 30 && 4 * nw <= chars && chars <= 5 * nw &&
      25 * ns >= nw && 5 * (nw - nd) <= 3 * nw) 1L else 0L
    (f, y)
  }

  test("learned trajectory equals the in-process reference trainer, round for round") {
    val docs = graft.operators.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val train = docs.filter(_._1 % 4 != 0).map(d => refFeatures(d._2))
    val nf = QualityTrain.NFeat
    val q = Array.fill(nf)(0L)
    train.foreach { case (f, _) =>
      (0 until nf).foreach(j => q(j) += f(j) * f(j))
    }
    val w = Array.fill(nf)(0L)
    val expected = (1 to QualityTrain.Rounds).map { _ =>
      val g = Array.fill(nf)(0L)
      train.foreach { case (f, y) =>
        var z = 0L
        (0 until nf).foreach(j => z += w(j) * f(j))
        val resid = sig(z) - y * P
        (0 until nf).foreach(j => g(j) += resid * f(j))
      }
      (0 until nf).foreach(j =>
        w(j) -= tdiv(QualityTrain.EtaNum * 1000L * g(j), q(j)))
      w.toSeq
    }
    val got = QualityTrain.qualityWeights(spark, sf).orderBy("round").collect()
      .map(r => (0 until nf).map(j => r.getAs[Long](s"w$j")))
    assert(got.length == QualityTrain.Rounds)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"round ${i + 1}: engine $g vs reference $e")
    }
    // training must actually move off the origin and keep moving past the
    // first round (a stalled trajectory would pass equality vacuously)
    assert(expected.head.exists(_ != 0L) && expected.last != expected.head)
  }

  test("held-out agreement beats the H29 ensemble selection AND the majority class") {
    val scored = QualityTrain.qualityLearned(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pred"),
        r.getAs[Long]("label"), r.getAs[Long]("is_holdout")))
    val hold = scored.filter(_._4 == 1L)
    assert(hold.nonEmpty && hold.length < scored.length)
    val learnedAgree = hold.count(r => r._2 == r._3).toDouble / hold.length
    // H29's kept-quarter as a predictor of the same weak label
    val kept = graft.operators.CorpusSpans.qualityEnsemble(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ensembleAgree = hold.count(r =>
      (if (kept.contains(r._1)) 1L else 0L) == r._3).toDouble / hold.length
    val nPos = hold.count(_._3 == 1L)
    val majority = math.max(nPos, hold.length - nPos).toDouble / hold.length
    assert(learnedAgree > ensembleAgree,
      s"learned $learnedAgree <= ensemble $ensembleAgree")
    assert(learnedAgree > majority,
      s"learned $learnedAgree <= majority $majority — classifier is vacuous")
  }

  test("scores are calibrated to the fixed-point grid; pred is the >= half rule") {
    val rows = QualityTrain.qualityLearned(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("score_fx")
      assert(s >= 0L && s <= P, s"score $s outside [0, $P]")
      assert(r.getAs[Long]("pred") == (if (s >= P / 2) 1L else 0L))
    }
    // both classes must be predicted somewhere — a constant filter is no
    // filter
    assert(rows.map(_.getAs[Long]("pred")).distinct.length == 2)
  }

  test("calibration table: conserves the held-out split and discriminates across buckets") {
    val cal = QualityTrain.qualityCalibration(spark, sf).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("obs_bps"),
        r.getAs[Long]("pred_bps"))).sortBy(_._1)
    assert(cal.nonEmpty && cal.forall(b => b._1 >= 0 && b._1 <= 9))
    // conservation against the per-doc gated frame's held-out rows
    val held = QualityTrain.qualityLearned(spark, sf)
      .filter(org.apache.spark.sql.functions.col("is_holdout") === 1).collect()
    assert(cal.map(_._2).sum == held.length)
    assert(cal.map(_._3).sum == held.count(_.getAs[Long]("label") == 1L))
    cal.foreach { case (b, n, p, obs, pred) =>
      assert(p <= n && obs == 10000 * p / n, s"bucket $b rate")
      assert(pred >= 0 && pred <= 10000, s"bucket $b pred $pred")
    }
    // discrimination: the top occupied bucket's observed positive rate
    // strictly exceeds the bottom occupied bucket's (the classifier orders
    // reality, not just its own scores)
    assert(cal.last._4 > cal.head._4,
      s"no discrimination: top ${cal.last._4} vs bottom ${cal.head._4}")
    // direction agreement: predicted rates rise with bucket by construction
    cal.sliding(2).foreach { w => assert(w(0)._5 <= w(1)._5) }
  }

  test("stored artifact: retraining is skipped while the corpus fingerprint holds") {
    val first = QualityTrain.qualityWeights(spark, sf).collect().toSeq
    val second = QualityTrain.qualityWeights(spark, sf).collect().toSeq
    assert(first == second && first.nonEmpty)
  }
}
