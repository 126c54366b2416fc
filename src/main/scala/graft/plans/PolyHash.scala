package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** ORACLE-REPLICABLE string hash: base-257 polynomial (natural 64-bit
  * wraparound, same family as [[Winnow]]) finalized with the splitmix64
  * mixer. Every step is integer arithmetic mod 2^64, so a DuckDB oracle can
  * replay it bit-exactly in HUGEINT (see [[MixHash.sqlMixed]]) — which is the
  * whole point: MinHash/SimHash built on this hash get full driver-side SQL
  * oracles instead of rows-only checks. xxhash64 (the round-2 base) is a
  * fine hash but its 8-byte-lane rotate/fold structure is not expressible in
  * a single SQL statement.
  *
  * Native codegen expression: the hot loop is a static JVM method inside
  * whole-stage codegen — no UDF ser/de.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MixHash.polyHash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MixHash.polyHash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** ORACLE-REPLICABLE integer hash: splitmix64 of a long column. Same mixer
  * as [[PolyHash]]'s finalizer, minus the string fold — for hashing numeric
  * keys (the deterministic-HLL distinct sketch buckets on it). Native
  * codegen keeps it inside whole-stage codegen, and the JVM's wrapping long
  * arithmetic sidesteps ANSI-mode overflow errors a Column-level
  * `z * constant` would hit.
  */
case class Splitmix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MixHash.splitmix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MixHash.splitmix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Splitmix64 =
    copy(child = newChild)
}

object MixHash {

  /** splitmix64 finalizer (public-domain constants, Steele et al.). */
  def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Mixed polynomial hash of a string: splitmix64(sum c_i * 257^(n-1-i)),
    * where c_i are UNICODE CODE POINTS — the same units DuckDB's
    * `ord(substring(s, i, 1))` yields — so the SQL replay is exact for ANY
    * string, not just ASCII (round-5 stretch item; Java `charAt` UTF-16
    * units diverge from `ord()` on supplementary-plane characters). For
    * ASCII/BMP text the code point equals the UTF-16 unit, so existing
    * hashes are unchanged.
    */
  def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = h * 257L + cp
      i += Character.charCount(cp)
    }
    splitmix64(h)
  }

  /** Affine slot family for MinHash: slot i value = h * A(i) + B(i) (wrap
    * 64). Odd A makes each slot a bijection of the hash universe, so the
    * 64 slot orders are 64 different permutations of the same base hash —
    * the standard affine minwise family. Constants derive from splitmix64
    * of the slot index, so Scala and SQL generate the same table.
    */
  def slotA(i: Int): Long = SlotA(i)
  def slotB(i: Int): Long = SlotB(i)
  private val MaxSlots = 256 // precomputed: update() reads these per row x slot
  private val SlotA: Array[Long] =
    Array.tabulate(MaxSlots)(i => splitmix64(1000L + 2L * i) | 1L)
  private val SlotB: Array[Long] =
    Array.tabulate(MaxSlots)(i => splitmix64(1001L + 2L * i))

  // ---- SQL (DuckDB) fragment emitters for the oracle twins ----

  val M64 = "18446744073709551616::HUGEINT" // 2^64

  private def u(x: Long): String = // unsigned rendering of a Scala Long
    java.lang.Long.toUnsignedString(x) + "::HUGEINT"

  /** (a * b) mod 2^64 for a, b in [0, 2^64): hi/lo split keeps every
    * intermediate below 2^97, inside HUGEINT's 127-bit range.
    */
  def sqlMulMod(a: String, b: String): String =
    s"((($a % 4294967296::HUGEINT) * $b) % $M64 " +
      s"+ ((($a // 4294967296::HUGEINT) * $b) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $M64"

  /** splitmix64 over a HUGEINT expression in [0, 2^64). Emitted as nested
    * single-use lambdas? No — DuckDB has no LET; callers should stage each
    * step as a CTE column. These helpers emit ONE step each.
    */
  def sqlMixStep1(z: String): String = s"($z + ${u(0x9E3779B97F4A7C15L)}) % $M64"
  def sqlMixStep2(z: String): String =
    sqlMulMod(s"xor($z, $z // 1073741824::HUGEINT)", u(0xBF58476D1CE4E5B9L)) // >>> 30
  def sqlMixStep3(z: String): String =
    sqlMulMod(s"xor($z, $z // 134217728::HUGEINT)", u(0x94D049BB133111EBL)) // >>> 27
  def sqlMixStep4(z: String): String =
    s"xor($z, $z // 2147483648::HUGEINT)" // >>> 31

  /** Unsigned [0,2^64) -> signed BIGINT (two's complement), the domain Spark
    * Longs compare in.
    */
  def sqlToSigned(x: String): String =
    s"CAST(CASE WHEN $x >= 9223372036854775808::HUGEINT " +
      s"THEN $x - $M64 ELSE $x END AS BIGINT)"

  /** Raw polynomial hash of a string column as a HUGEINT fold (sequential
    * left fold == the Scala loop; both sides iterate code points, so the
    * replay is exact for any Unicode string).
    */
  def sqlRawPoly(sCol: String): String =
    s"list_reduce(list_prepend(0::HUGEINT, " +
      s"list_transform(range(length($sCol)), j -> " +
      s"CAST(ord(substring($sCol, CAST(j + 1 AS INT), 1)) AS HUGEINT))), " +
      s"(acc, x) -> (acc * 257 + x) % $M64)"

  /** CTE chain computing the MIXED hash for rows of (…, `strCol`): emits
    * `srcCte` -> `$prefix` (columns: passthrough `keep` + `h` HUGEINT in
    * [0,2^64)). The prefix names the intermediate CTEs, so one statement
    * can chain the hash over several sources (e.g. the bloom oracle's
    * eval and training sides).
    */
  def sqlMixedCtes(srcCte: String, strCol: String, keep: Seq[String],
      prefix: String = "mh"): String = {
    val ks = keep.mkString(", ")
    s"""${prefix}0 AS (SELECT $ks, ${sqlRawPoly(strCol)} AS z FROM $srcCte),
    ${prefix}1 AS (SELECT $ks, ${sqlMixStep1("z")} AS z FROM ${prefix}0),
    ${prefix}2 AS (SELECT $ks, ${sqlMixStep2("z")} AS z FROM ${prefix}1),
    ${prefix}3 AS (SELECT $ks, ${sqlMixStep3("z")} AS z FROM ${prefix}2),
    $prefix AS (SELECT $ks, ${sqlMixStep4("z")} AS h FROM ${prefix}3)"""
  }

  /** CTE chain computing splitmix64 of an INTEGER-VALUED expression: emits
    * `srcCte` -> `$prefix` (columns: passthrough `keep` + `h` HUGEINT in
    * [0,2^64)) — the value-keyed twin of [[sqlMixedCtes]], and the ONE
    * register-sketch seeding chain (round-11 verdict item 8): B16b/C17's
    * HLL buckets and B55/C16's CMS grid rows all replay through it, so the
    * next register sketch is a finisher over `h`, not a re-rolled chain.
    */
  def sqlSplitmixCtes(srcCte: String, zExpr: String, keep: Seq[String],
      prefix: String): String = {
    val ks = if (keep.isEmpty) "" else keep.mkString("", ", ", ", ")
    s"""${prefix}0 AS (SELECT $ks$zExpr AS z FROM $srcCte),
    ${prefix}1 AS (SELECT $ks${sqlMixStep1("z")} AS z FROM ${prefix}0),
    ${prefix}2 AS (SELECT $ks${sqlMixStep2("z")} AS z FROM ${prefix}1),
    ${prefix}3 AS (SELECT $ks${sqlMixStep3("z")} AS z FROM ${prefix}2),
    $prefix AS (SELECT $ks${sqlMixStep4("z")} AS h FROM ${prefix}3)"""
  }

  /** SQL literal arrays of the affine slot constants (1-indexed lists). */
  def sqlSlotA(n: Int): String =
    (0 until n).map(i => u(slotA(i))).mkString("[", ",", "]")
  def sqlSlotB(n: Int): String =
    (0 until n).map(i => u(slotB(i))).mkString("[", ",", "]")

  /** Column builders. */
  def polyHashCol(c: Column): Column = column(PolyHash(expression(c)))
  def splitmix64Col(c: Column): Column = column(Splitmix64(expression(c)))
}
