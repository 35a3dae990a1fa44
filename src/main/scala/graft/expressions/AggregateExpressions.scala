// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions.scala: custom Catalyst expressions use spark-internal
// interfaces (TypedImperativeAggregate, InternalRow) that the public
// package boundary hides.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, IntegerType, LongType}

/** Mergeable buffer of the k smallest (hash, id, value) triples by
  * (hash, id) — a binary max-heap on the sample key, so insert beyond k
  * is an O(log k) replace-root and the buffer NEVER exceeds k entries
  * at any input size (the map-side partial state of [[BottomKQuantile]]).
  */
final class BottomKBuffer(val k: Int) {
  // Parallel arrays, heap-ordered (root = LARGEST (hash, id) kept).
  val hs = new Array[Long](k)
  val ids = new Array[Long](k)
  val vs = new Array[Double](k)
  var n: Int = 0

  private def gt(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
    h1 > h2 || (h1 == h2 && i1 > i2)

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (gt(hs(i), ids(i), hs(p), ids(p))) {
        val th = hs(i); hs(i) = hs(p); hs(p) = th
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        val tv = vs(i); vs(i) = vs(p); vs(p) = tv
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      if (l >= n) return
      val r = l + 1
      val c = if (r < n && gt(hs(r), ids(r), hs(l), ids(l))) r else l
      if (gt(hs(c), ids(c), hs(i), ids(i))) {
        val th = hs(i); hs(i) = hs(c); hs(c) = th
        val ti = ids(i); ids(i) = ids(c); ids(c) = ti
        val tv = vs(i); vs(i) = vs(c); vs(c) = tv
        i = c
      } else return
    }
  }

  def insert(h: Long, id: Long, v: Double): Unit =
    if (n < k) {
      hs(n) = h; ids(n) = id; vs(n) = v
      n += 1
      siftUp(n - 1)
    } else if (gt(hs(0), ids(0), h, id)) {
      hs(0) = h; ids(0) = id; vs(0) = v
      siftDown()
    }
}

object AggregateExpressions {
  /** Column-level surface of [[BottomKQuantile]] — the aggregate wrapped
    * for `agg(...)` use, mirroring the SQL `approx_pct_det`.
    */
  def approxPctDet(hash: org.apache.spark.sql.Column,
                   id: org.apache.spark.sql.Column,
                   value: org.apache.spark.sql.Column,
                   p: Double, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(BottomKQuantile(
      org.apache.spark.sql.classic.ExpressionUtils.expression(hash),
      org.apache.spark.sql.classic.ExpressionUtils.expression(id),
      org.apache.spark.sql.classic.ExpressionUtils.expression(value),
      org.apache.spark.sql.catalyst.expressions.Literal(p),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())

  /** Column-level surface of [[TopKIds]], mirroring the SQL `topk_det`. */
  def topkDet(score: org.apache.spark.sql.Column,
              id: org.apache.spark.sql.Column,
              k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(TopKIds(
      org.apache.spark.sql.classic.ExpressionUtils.expression(score),
      org.apache.spark.sql.classic.ExpressionUtils.expression(id),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())
}

/** `topk_det(score, id, k)` — deterministic top-k-per-group as ONE
  * aggregate: the ids of the group's k largest (score, then smallest id
  * on ties), in rank order, as an array. The engine-surface alternative
  * to the rank-window idiom: a window sorts every group's full slice;
  * this aggregate's partial state is a k-entry min-heap, map-side
  * partials combine by heap merge, so the shuffle carries k (score, id)
  * pairs per group per partition — the shape that survives a group
  * whose slice is a terabyte. Deterministic by the id tiebreak; null
  * scores/ids are skipped; an all-null group returns an empty array.
  */
case class TopKIds(
    scoreExpr: Expression, idExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"topk_det: k must be a foldable int literal, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!kExpr.foldable || kExpr.eval() == null)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_det: k must be a non-null foldable literal")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_det: k must be >= 1, got $k")
    else base
  }

  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, LongType, IntegerType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_det"
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  // Reuses [[BottomKBuffer]]'s bottom-k-by-(key, id) heap: "top-k by
  // (score DESC, id ASC)" IS "bottom-k by (key, id)" under an
  // order-REVERSING double→long key. sortableBits is the classic
  // monotone map of IEEE doubles onto signed longs (positive doubles'
  // bits already ascend; negative doubles' bits descend, so flipping
  // their 63 low bits re-ascends them); bitwise NOT then reverses it
  // without overflow. -0.0 normalizes to +0.0 so the two zeros rank
  // identically (ties fall to the id); NaN maps above +Inf, matching
  // both engines' NaN-greatest sort order.
  // doubleToLongBits (not Raw) canonicalizes every NaN payload: a
  // sign-bit NaN arriving from parquet would otherwise take raw bits
  // BELOW -Inf and rank least instead of NaN-greatest.
  private def keyOf(score: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(
      if (score == 0.0) 0.0 else score)
    val asc = if (b < 0) b ^ 0x7fffffffffffffffL else b
    ~asc
  }

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val sc = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (sc != null && id != null)
      buf.insert(keyOf(sc.asInstanceOf[Double]), id.asInstanceOf[Long],
        sc.asInstanceOf[Double])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    var i = 0
    while (i < other.n) {
      buf.insert(other.hs(i), other.ids(i), other.vs(i))
      i += 1
    }
    buf
  }

  override def eval(buf: BottomKBuffer): Any = {
    val idx = Array.range(0, buf.n)
    val sorted = idx.sortBy(i => (buf.hs(i), buf.ids(i)))
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      sorted.map(i => buf.ids(i)))
  }

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 24)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.hs(i)); bb.putLong(buf.ids(i)); bb.putDouble(buf.vs(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new BottomKBuffer(k)
    var i = 0
    while (i < n) {
      buf.insert(bb.getLong(), bb.getLong(), bb.getDouble())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))
}

/** `approx_pct_det(hash, id, value, p, k)` — DETERMINISTIC mergeable
  * quantile aggregate: the engine-surface (one SQL call) version of the
  * bottom-k hash-sample sketch behind `events_quantile_sketch` /
  * `StreamingAnomaly.bottomKQuantiles`. The sample is the k rows with
  * the smallest (hash, id) — callers pass a content hash (md5Hash64 of
  * the row key), which makes the "approximate" answer a pure function of
  * the data: any engine, any partitioning, any arrival order rebuilds
  * the identical sample, so a DuckDB oracle hash-matches it.
  *
  * Scale shape: partial state is the k-entry heap ([[BottomKBuffer]]) —
  * map-side partials combine by merging heaps (bottom-k of a union =
  * bottom-k of merged bottom-k's), so the shuffle carries k triples per
  * group per partition and nothing ever sorts the corpus. The final
  * estimate is the shared rank interpolation (h=(n−1)p, linear between
  * the lo/hi order statistics, 4dp-rounded via round4Jvm — bit-identical
  * to StatsOps.rankPercentiles and the streaming fold's emission).
  *
  * `p` and `k` must be foldable (literals); null rows are skipped; an
  * all-null group returns null.
  */
case class BottomKQuantile(
    hashExpr: Expression, idExpr: Expression, valueExpr: Expression,
    pExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with ImplicitCastInputTypes {

  private lazy val p: Double = pExpr.eval() match {
    case d: Double => d
    case other => throw new IllegalArgumentException(
      s"approx_pct_det: p must be a foldable double literal, got $other")
  }
  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"approx_pct_det: k must be a foldable int literal, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!pExpr.foldable || !kExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "approx_pct_det: p and k must be foldable literals")
    else if (pExpr.eval() == null || kExpr.eval() == null)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "approx_pct_det: p and k must be non-null")
    else if (p < 0.0 || p > 1.0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"approx_pct_det: p must be in [0, 1], got $p")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"approx_pct_det: k must be >= 1, got $k")
    else base
  }

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "approx_pct_det"
  override def children: Seq[Expression] =
    Seq(hashExpr, idExpr, valueExpr, pExpr, kExpr)

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val h = hashExpr.eval(input)
    val id = idExpr.eval(input)
    val v = valueExpr.eval(input)
    if (h != null && id != null && v != null)
      buf.insert(h.asInstanceOf[Long], id.asInstanceOf[Long],
        v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    var i = 0
    while (i < other.n) {
      buf.insert(other.hs(i), other.ids(i), other.vs(i))
      i += 1
    }
    buf
  }

  override def eval(buf: BottomKBuffer): Any =
    if (buf.n == 0) null
    else {
      val vs = java.util.Arrays.copyOf(buf.vs, buf.n)
      java.util.Arrays.sort(vs)
      // The rankPercentiles interpolation verbatim: h=(n−1)p, linear
      // between the lo/hi order statistics, 4dp-rounded.
      val h = (buf.n - 1).toDouble * p
      val lo = math.floor(h)
      val vlo = vs(lo.toInt)
      val vhi = vs(math.ceil(h).toInt)
      graft.functions.CleanFunctions.round4Jvm(vlo + (h - lo) * (vhi - vlo))
    }

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 24)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.hs(i)); bb.putLong(buf.ids(i)); bb.putDouble(buf.vs(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new BottomKBuffer(k)
    var i = 0
    while (i < n) {
      buf.insert(bb.getLong(), bb.getLong(), bb.getDouble())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0), idExpr = newChildren(1),
      valueExpr = newChildren(2), pExpr = newChildren(3),
      kExpr = newChildren(4))
}
