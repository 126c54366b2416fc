package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._
import graft.operators.Exact
import graft.plans.{Int128ToDouble, ScaledLong}

/** The exact-sum stack (ScaledLong → SumInt128 → Int128ToDouble): the
  * distributed aggregate must equal a scalar BigInteger replay of the same
  * per-row rounding, including 128-bit carries, null skipping, and the
  * DuckDB-replica int128→double conversion. (The cross-engine halves —
  * ScaledLong.sql vs DuckDB FLOOR/CASE, Int128ToDouble vs DuckDB's
  * CastBigintToFloating — are pinned by the driver's oracle gate on every
  * dsum query, and were validated against DuckDB directly on 50k random
  * int128 values and 150k random doubles at build time.)
  */
class ExactSumSpec extends SparkSpec {
  import SparkSpecBase.spark.implicits._

  private def referenceSum(xs: Seq[Double]): Double = {
    val units = xs.foldLeft(BigInteger.ZERO) { (acc, x) =>
      acc.add(BigInteger.valueOf(ScaledLong.scale(x, 10000.0)))
    }
    val full = units.and(BigInteger.ONE.shiftLeft(128).subtract(BigInteger.ONE))
    val lo = full.and(BigInteger.ONE.shiftLeft(64).subtract(BigInteger.ONE)).longValue
    val hi = full.shiftRight(64).longValue
    Int128ToDouble.toDouble(hi, lo) / 10000.0
  }

  test("dsum equals a BigInteger replay across magnitudes, partitions, carries") {
    val rnd = new scala.util.Random(11)
    // mixed magnitudes: money-sized, tiny fractions, and 1e14-scale values
    // whose scaled units (1e18) overflow a single long within a few rows —
    // every sum below 2^53 units round-trips exactly, larger ones go through
    // the bit-pinned int128→double path
    val groups = Seq(
      "money" -> Seq.fill(5000)(rnd.nextDouble() * 200000 - 100000),
      "tiny" -> Seq.fill(2000)(rnd.nextDouble() * 2e-4 - 1e-4),
      "huge" -> Seq.fill(64)(rnd.nextDouble() * 2e14 - 1e14),
      "hugeneg" -> Seq.fill(64)(-9.1e14),
      "single" -> Seq(4.56))
    val df = groups.flatMap { case (g, xs) => xs.map(x => (g, x)) }
      .toDF("g", "x").repartition(7)
    val got = df.groupBy($"g").agg(Exact.dsum($"x").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    groups.foreach { case (g, xs) =>
      val want = referenceSum(xs)
      assert(java.lang.Double.doubleToLongBits(got(g)) ==
        java.lang.Double.doubleToLongBits(want),
        s"group $g: got ${got(g)}, want $want")
    }
  }

  test("dsum skips nulls; an all-null group is null; davg rounds to 6dp") {
    val df = Seq(("a", Some(1.5)), ("a", None), ("a", Some(2.25)),
      ("b", Option.empty[Double]))
      .toDF("g", "x")
    val rows = df.groupBy($"g")
      .agg(Exact.dsum($"x").as("s"), Exact.davg($"x").as("m"))
      .collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    assert(rows("a")._1 == 3.75)
    // davg divides the exact numerator by COUNT(*) (SQL COUNT(*) counts the
    // null row too) — 3.75 / 3
    assert(rows("a")._2 == 1.25)
    assert(rows("b")._1 == null && rows("b")._2 == null)
  }

  test("ScaledLong rounds HALF_UP away from zero and survives the floor(x+.5) trap") {
    assert(ScaledLong.scale(0.00025, 10000.0) == 3) // 2.5 units → 3
    assert(ScaledLong.scale(-0.00025, 10000.0) == -3)
    assert(ScaledLong.scale(4.56, 10000.0) == 45600)
    assert(ScaledLong.scale(-4.56, 10000.0) == -45600)
    assert(ScaledLong.scale(0.0, 10000.0) == 0)
    // 0.49999999999999994 units: naive floor(x+0.5) would round UP to 1
    assert(ScaledLong.scale(0.49999999999999994e-4, 10000.0) == 0)
  }

  test("Int128ToDouble matches correctly-rounded conversion where exact, DuckDB order elsewhere") {
    // exact below 2^53
    assert(Int128ToDouble.toDouble(0L, 42L) == 42.0)
    assert(Int128ToDouble.toDouble(-1L, -42L) == -42.0) // hi==-1 special case
    assert(Int128ToDouble.toDouble(-1L, 0L) == -1.8446744073709552e19)
    // u2d sticky-bit correctness: 2^64-1 rounds to 2^64, not down
    assert(Int128ToDouble.u2d(-1L) == 1.8446744073709552e19)
    // vs BigDecimal single-rounding reference: within 2 double ulps for the
    // two-rounding upper-word path
    val rnd = new scala.util.Random(5)
    (1 to 2000).foreach { _ =>
      val hi = rnd.nextLong() >> rnd.nextInt(60)
      val lo = rnd.nextLong()
      val got = Int128ToDouble.toDouble(hi, lo)
      val exact = new java.math.BigDecimal(
        BigInteger.valueOf(hi).shiftLeft(64)
          .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))).doubleValue()
      assert(math.abs(got - exact) <= 2 * math.ulp(exact),
        s"hi=$hi lo=$lo got=$got exact=$exact")
    }
  }
}
