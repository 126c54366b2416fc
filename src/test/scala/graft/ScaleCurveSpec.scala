package graft

import graft.operators.ScaleCurve

/** S1: the gated growth report's internal consistency — the rows whose
  * growth is linear BY CONSTRUCTION must be exact k-multiples, and the
  * probabilistic devices must grow monotonically and stay within the
  * linear envelope (their exactness vs DuckDB is the hash gate's job).
  */
class ScaleCurveSpec extends SparkSpec {

  test("scale report: constructed rows are exact k-multiples; devices grow ~linearly") {
    // the spec tier runs the EXTENDED curve (1x/2x/4x) — the headline key
    // gates 1x/2x only (round-15 verdict item 4: bench right-sizing), so
    // the 4x point's linearity is asserted here
    val rows = ScaleCurve.scaleCurveReportAt(spark, sf, ScaleCurve.SpecScales).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byKey = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(t => t._2 -> (t._3, t._4, t._5)).toMap
    }
    val scales = ScaleCurve.SpecScales.map(_.toLong)
    assert(scales.contains(4L), "spec tier must include the 4x point")
    // deterministic-by-construction rows: exact k-multiples of scale 1
    for (key <- Seq("corpus_scaled", "dedup_exact", "text_tokens"); k <- scales) {
      val (_, out1, ch1) = byKey(key)(1L)
      val (_, outK, chK) = byKey(key)(k)
      assert(outK == k * out1, s"$key out at $k×: $outK != ${k}x$out1")
      assert(chK == 0 && ch1 == 0 || chK >= k * ch1,
        s"$key chars at $k×: $chK vs ${k}x$ch1") // rep salting only ADDS chars
    }
    // planted duplicates actually fire (the row is not vacuous)
    assert(byKey("dedup_exact")(1L)._2 > 0, "no planted exact dups at scale 1")
    // device rows: input exact multiples, output monotone and ≤ the
    // quadratic would-be blowup (banding/binning hold the line)
    for (key <- Seq("dedup_minhash", "interval_overlap"); k <- scales) {
      val (in1, out1, _) = byKey(key)(1L)
      val (inK, outK, _) = byKey(key)(k)
      assert(inK == k * in1, s"$key input at $k× not replicated exactly")
      assert(outK >= out1, s"$key output shrank with scale")
      assert(outK <= 2 * k * out1,
        s"$key output superlinear: $outK at $k× vs $out1 (cross-replica leakage?)")
    }
  }
}
