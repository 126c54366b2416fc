package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks of the native expressions' host-side algorithms —
  * the invariants hold for arbitrary generated inputs, not just the corpus.
  * (Plain ScalaCheck generators driven with fixed seeds: deterministic, no
  * scalatestplus bridge needed.)
  */
class PropertySpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("winnow guarantee: substrings of length >= w+k-1 share a fingerprint") {
    val k = 5; val w = 4
    forAllSeeded(Gen.zip(text, text, text)) { case (pre, common0, post) =>
      val common = common0.padTo(w + k - 1, 'x')
      val a = s"$pre $common"
      val b = s"$common $post"
      val fa = graft.plans.Winnow.fingerprints(a, k, w).toSet
      val fb = graft.plans.Winnow.fingerprints(b, k, w).toSet
      assert(fa.intersect(fb).nonEmpty, s"a='$a' b='$b'")
    }
  }

  test("winnow fingerprints are deduped and nonempty when text >= k") {
    forAllSeeded(text) { t =>
      if (t.length >= 5) {
        val fps = graft.plans.Winnow.fingerprints(t, 5, 4)
        assert(fps.toSet.size == fps.length)
        assert(fps.nonEmpty)
      }
    }
  }

  test("shingles: order, count and distinctness match the reference definition") {
    forAllSeeded(text) { t =>
      val got = graft.plans.ShingleArray.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3)
      val words = t.split(" ", -1)
      val want =
        if (words.length < 3) Seq.empty
        else words.sliding(3).map(_.mkString(" ")).toSeq.distinct
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq == want, s"t='$t'")
    }
  }

  test("dot product matches the naive sum for arbitrary vectors") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vec = Gen.listOfN(16, Gen.choose(-1e3, 1e3))
    forAllSeeded(Gen.zip(vec, vec)) { case (a, b) =>
      val got = graft.plans.DotProduct.dot(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val want = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(got - want) <= 1e-9 * (1 + math.abs(want)))
    }
  }

  test("salted aggregation is identical to plain aggregation (skewed keys)") {
    import org.apache.spark.sql.functions._
    import SparkSpecBase.spark.implicits._
    // heavy skew: 90% of rows share one key
    val rows = (1 to 5000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (i.toLong, k, (i % 997).toDouble / 7)
    }
    val df = rows.toDF("id", "k", "v")
    val plain = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(18,4)")).cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = graft.operators.Skew.saltedCountSum(df, "k", $"v", "id", 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }
}
