package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Sketch aggregates as single TypedImperativeAggregates (SURVEY §2 E3/E4).
  *
  * The composable form — 64 separate `min(xxhash64(i, h))` /
  * `sum(bit(j)*2-1)` aggregate columns — generates an enormous codegen
  * class: when it falls out of the (bounded) generated-class cache, janino
  * recompilation costs ~10 s per run, which showed up as bimodal bench
  * times. One imperative aggregate with a primitive-array buffer is a tiny
  * constant-size class, one pass, same shuffle shape (partial + final).
  */

/** 64-slot MinHash signature: slot i = min over inputs of the affine
  * permutation h * A(i) + B(i) (wrap 64, signed compare) — see
  * [[MixHash.slotA]]. Affine-of-hash instead of XXH64(h, seed=i) (round 2)
  * because the whole pipeline is then replayable in DuckDB HUGEINT SQL:
  * that upgrade turns the driver's rows-only check into a full hash oracle.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val p = h * MixHash.slotA(i) + MixHash.slotB(i)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

/** 64-bit SimHash: bit j set iff the sign-sum of input bit j is >= 0. */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (((h >>> j) & 1L).toInt * 2) - 1
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sim = 0L
    var j = 0
    while (j < 64) { if (buf(j) >= 0) sim |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sim)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

/** Mutable buffer for [[BoundedPostingsAgg]]: exact running count plus a
  * size-capped (id, sz) list.
  */
final class PostingsBuffer(
    var n: Long,
    val ids: ArrayBuffer[Long],
    val szs: ArrayBuffer[Int])

/** Size-capped posting-list collector for inverted-index joins (SURVEY E2):
  * ONE shuffle yields both the document frequency and the posting list, and
  * the aggregation buffer is bounded at `maxDf` entries — a hot key can no
  * longer grow an unbounded `collect_list` buffer (the acknowledged round-1
  * scale hole). Overflowing keys are emitted with an EMPTY list (df stays
  * exact): postings that common carry no prefix-filter signal, mirroring the
  * E6 stop-fingerprint cut.
  *
  * Merge soundness: each partial keeps min(count, maxDf) items, so whenever
  * the GLOBAL count is <= maxDf every partial list is complete and the
  * merged list is exact — truncation can only affect keys that are dropped
  * at eval anyway.
  */
case class BoundedPostingsAgg(
    idExpr: Expression,
    szExpr: Expression,
    maxDf: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PostingsBuffer] with BinaryLike[Expression] {

  override def left: Expression = idExpr
  override def right: Expression = szExpr

  override def createAggregationBuffer(): PostingsBuffer =
    new PostingsBuffer(0L, ArrayBuffer.empty, ArrayBuffer.empty)

  override def update(buf: PostingsBuffer, input: InternalRow): PostingsBuffer = {
    val id = idExpr.eval(input)
    val sz = szExpr.eval(input)
    if (id != null && sz != null) {
      buf.n += 1
      if (buf.ids.length < maxDf) {
        buf.ids += id.asInstanceOf[Long]
        buf.szs += sz.asInstanceOf[Int]
      }
    }
    buf
  }

  override def merge(a: PostingsBuffer, b: PostingsBuffer): PostingsBuffer = {
    a.n += b.n
    var i = 0
    while (i < b.ids.length && a.ids.length < maxDf) {
      a.ids += b.ids(i)
      a.szs += b.szs(i)
      i += 1
    }
    a
  }

  override def eval(buf: PostingsBuffer): Any = {
    val items: Array[Any] =
      if (buf.n > maxDf) Array.empty
      else Array.tabulate[Any](buf.ids.length)(i => InternalRow(buf.ids(i), buf.szs(i)))
    InternalRow(buf.n, new GenericArrayData(items))
  }

  override def serialize(buf: PostingsBuffer): Array[Byte] = {
    val m = buf.ids.length
    val bb = ByteBuffer.allocate(8 + 4 + 12 * m)
    bb.putLong(buf.n)
    bb.putInt(m)
    var i = 0
    while (i < m) { bb.putLong(buf.ids(i)); bb.putInt(buf.szs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PostingsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val m = bb.getInt
    val ids = new ArrayBuffer[Long](m)
    val szs = new ArrayBuffer[Int](m)
    var i = 0
    while (i < m) { ids += bb.getLong; szs += bb.getInt; i += 1 }
    new PostingsBuffer(n, ids, szs)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("ps", ArrayType(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sz", IntegerType, nullable = false))), containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): BoundedPostingsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedPostingsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedPostingsAgg =
    copy(idExpr = newLeft, szExpr = newRight)
}

/** Mutable buffer for [[BoundedBasketAgg]]: sorted-distinct items capped at
  * maxItems, plus an eviction flag.
  */
final class BasketBuffer(var capped: Boolean, val items: ArrayBuffer[Long])

/** Size-capped sorted-distinct collector — `sort_array(collect_set(x))`
  * with a hard bound on the aggregation buffer (SURVEY B56: the
  * BoundedPostingsAgg discipline applied to basket mining). Keeps the
  * `maxItems` SMALLEST distinct values; a mega-basket degrades to its
  * deterministic prefix instead of growing an unbounded buffer and then
  * exploding quadratically in the pair enumeration (or tripping
  * array_pairs' hard limit and failing the job).
  *
  * Merge soundness: each partial keeps its own maxItems smallest distinct
  * items, and the global maxItems smallest are a subset of the union of
  * partial keeps — so the merged prefix is EXACT, and `capped` is exact
  * too (a partial evicts only when its distinct count exceeds the cap,
  * which implies the global distinct count does; the final merge truncates
  * whenever the global count does).
  */
case class BoundedBasketAgg(
    itemExpr: Expression,
    maxItems: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BasketBuffer] with UnaryLike[Expression] {

  override def child: Expression = itemExpr

  override def createAggregationBuffer(): BasketBuffer =
    new BasketBuffer(false, ArrayBuffer.empty)

  private def insert(buf: BasketBuffer, v: Long): Unit = {
    var lo = 0
    var hi = buf.items.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf.items(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < buf.items.length && buf.items(lo) == v) return // already present
    if (buf.items.length >= maxItems) {
      buf.capped = true
      if (lo >= maxItems) return // larger than everything kept
      buf.items.remove(buf.items.length - 1)
    }
    buf.items.insert(lo, v)
  }

  override def update(buf: BasketBuffer, input: InternalRow): BasketBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BasketBuffer, other: BasketBuffer): BasketBuffer = {
    buf.capped ||= other.capped
    other.items.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: BasketBuffer): Any =
    InternalRow(new GenericArrayData(buf.items.toArray), buf.capped)

  override def serialize(buf: BasketBuffer): Array[Byte] = {
    val m = buf.items.length
    val bb = ByteBuffer.allocate(1 + 4 + 8 * m)
    bb.put(if (buf.capped) 1.toByte else 0.toByte)
    bb.putInt(m)
    buf.items.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BasketBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val capped = bb.get() == 1.toByte
    val m = bb.getInt
    val items = new ArrayBuffer[Long](m)
    var i = 0
    while (i < m) { items += bb.getLong; i += 1 }
    new BasketBuffer(capped, items)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ps", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("capped", BooleanType, nullable = false)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): BoundedBasketAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedBasketAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BoundedBasketAgg =
    copy(itemExpr = newChild)
}

/** Exact scaled-integer GRAM MATRIX accumulator (SURVEY §2 F18): buffer =
  * the dim² upper-triangle-complete outer-product sums of per-component
  * fixed-point units (round-HALF_UP to 2^20, the IvfScale discipline at a
  * coarser grid sized so unit products stay long-safe: |unit| ≤ 2^20 ⇒
  * product ≤ 2^40, headroom for 2^23 rows per partial). One constant-size
  * mergeable buffer per group — the distributed shape of covariance/PCA
  * input computation; integer sums are accumulation-order-proof, so the
  * matrix is hash-gateable like any exact query.
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim * dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(dim, arr.numElements())
      val u = new Array[Long](n)
      var i = 0
      while (i < n) { u(i) = ScaledLong.scale(arr.getDouble(i), GramAgg.Scale); i += 1 }
      i = 0
      while (i < n) {
        var j = 0
        while (j < n) { buf(i * dim + j) += u(i) * u(j); j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim * dim)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): GramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
}

object GramAgg {
  /** Fixed-point grid for components (2^20). */
  val Scale: Double = (1L << 20).toDouble
}

object SketchAggs {
  /** Exact scaled-integer Gram matrix (array<long> of dim² sums). */
  def gram(v: Column, dim: Int): Column =
    column(GramAgg(expression(v), dim).toAggregateExpression())

  /** MinHash signature column (array<long> of numPerms slots). */
  def minhash(h: Column, numPerms: Int = 64): Column =
    column(MinHashAgg(expression(h), numPerms).toAggregateExpression())

  /** SimHash column (64-bit long). */
  def simhash(h: Column): Column =
    column(SimHashAgg(expression(h)).toAggregateExpression())

  /** df + size-capped posting list in one aggregate:
    * struct(df: long, ps: array<struct<doc_id, sz>>), ps empty when df > maxDf.
    */
  def boundedPostings(id: Column, sz: Column, maxDf: Int): Column =
    column(BoundedPostingsAgg(expression(id), expression(sz), maxDf).toAggregateExpression())

  /** Capped sorted-distinct basket: struct(ps: array<long> — the maxItems
    * smallest distinct values, ascending — capped: boolean).
    */
  def boundedBasket(item: Column, maxItems: Int): Column =
    column(BoundedBasketAgg(expression(item), maxItems).toAggregateExpression())
}
