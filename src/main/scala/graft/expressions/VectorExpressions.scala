// Lives under org.apache.spark.sql so it can use the private[sql] Column <->
// Expression bridge (classic.ExpressionUtils) and AbstractDataType — the
// supported pattern for session-independent custom Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Dot product of two float-array columns, accumulated in double strictly
  * left-to-right — the same order as a `functions.aggregate` left fold and
  * DuckDB's `list_sum`, so swapping this in preserves oracle bit-parity.
  *
  * This is the hot inner loop of every embedding operator (cosine scoring
  * of LSH candidate pairs, ANN re-rank). The higher-order-function
  * formulation (`aggregate(zip_with(...))`) materializes a 64-element
  * intermediate array and interprets two lambdas per element per pair;
  * this expression is a single codegen'd fused loop over the raw
  * `ArrayData`, keeping candidate scoring inside whole-stage codegen.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"
  // Mismatched lengths yield null, not a silently-truncated dot: a corrupt
  // or short embedding must surface, never score plausibly.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two double-array columns, accumulated strictly
  * left-to-right from a 0.0 seed — bit-identical to the literal add
  * chain `(0.0 + x(0)*v(0)) + x(1)*v(1) + …` and to a
  * `functions.aggregate` left fold (and DuckDB list_sum order).
  *
  * Exists for emb_top_direction's power iteration (r17): the projection
  * was a 64-term add chain over 64 SCALAR double literals, and scalar
  * literals are inlined into the generated source, so every iteration's
  * new vector forced a fresh Janino compilation of the whole stage
  * (~0.5 s × iterations, measured). An ARRAY literal goes through the
  * codegen `references` array instead — the generated source is
  * byte-identical across iterations and the codegen cache hits.
  * Null semantics match the chain: null array or any null element (or a
  * length mismatch) yields null.
  */
case class DoubleVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_vector_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    var acc = 0.0
    i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 60-bit SimHash of a token array in one fused pass: per token, the
  * md5-derived 60-bit hash (first 15 hex chars — identical to
  * `CleanFunctions.md5Hash64` and the DuckDB oracle's
  * `('0x' || substring(md5(t),1,15))::BIGINT`), a +-1 vote per bit
  * position, then sign bits packed into a long.
  *
  * Replaces a nested `aggregate(zip_with(...))` formulation that
  * interpreted two lambdas per token per bit (tokens x 60 closure calls
  * and a 60-element intermediate array per step). Eval-only
  * (CodegenFallback): it runs once per document, not per candidate pair,
  * so the fused JVM loop is what matters, not codegen fusion.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      if (!toks.isNullAt(t)) {
        md.reset()
        val digest = md.digest(toks.getUTF8String(t).getBytes)
        // First 15 hex chars == first 60 bits: big-endian first 8 bytes >>> 4.
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
        h = h >>> 4
        var b = 0
        while (b < 60) {
          votes(b) += (((h >>> b) & 1L).toInt * 2) - 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit sign signature of a float-array column: bit i set iff element
  * i > 0 (elements beyond 60 ignored) — the binarized-embedding index key
  * behind hamming ANN. One fused codegen'd loop over the raw ArrayData;
  * semantically identical to the `aggregate(sequence(0,59), ...)`
  * higher-order fold (and to the DuckDB twin's list_sum of shifted bits),
  * but without interpreting a lambda per element.
  */
case class SignBits60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits60"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 60)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && x.getFloat(i) > 0.0f) acc |= (1L << i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 60);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $a.getFloat($i) > 0.0f) {
         |    $acc |= (1L << $i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dynamic-time-warping distance between two double-array columns —
  * the elastic distance the pointwise family (cosine, euclidean) can't
  * express: sequences that are similar but locally time-shifted align.
  * Full O(m·n) DP with the textbook recurrence
  *   dp(i,j) = |a_i − b_j| + min(dp(i−1,j), dp(i,j−1), dp(i−1,j−1))
  * in one codegen'd loop with a two-row rolling buffer (no m×n
  * materialization). Cross-engine parity: each cell is a pure function
  * of its three predecessors — no reassociation anywhere — so ANY
  * evaluation order (this row scan, the oracle's anti-diagonal CTE
  * unroll) produces bit-identical doubles.
  *
  * Callers bound the array length (the query contract: small per-key
  * PROFILES — e.g. 7-day shapes — never raw series); length > 64 is
  * rejected as null so an unbounded array can't smuggle an O(n²) loop
  * into a row expression. Empty inputs are null, not 0: a missing
  * profile must surface.
  */
case class DtwDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dtw_distance"
  override def nullable: Boolean = true

  private val MaxLen = 64

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val m = x.numElements()
    val n = y.numElements()
    if (m == 0 || n == 0 || m > MaxLen || n > MaxLen) return null
    val prev = new Array[Double](n)
    val curr = new Array[Double](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        val base = math.abs(x.getDouble(i) - y.getDouble(j))
        val best =
          if (i == 0 && j == 0) 0.0
          else if (i == 0) curr(j - 1)
          else if (j == 0) prev(j)
          else math.min(prev(j), math.min(curr(j - 1), prev(j - 1)))
        curr(j) = base + best
        j += 1
      }
      System.arraycopy(curr, 0, prev, 0, n)
      i += 1
    }
    prev(n - 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val prev = ctx.freshName("prev")
      val curr = ctx.freshName("curr")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      s"""
         |int $m = $a.numElements();
         |int $n = $b.numElements();
         |if ($m == 0 || $n == 0 || $m > $MaxLen || $n > $MaxLen) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $prev = new double[$n];
         |  double[] $curr = new double[$n];
         |  for (int $i = 0; $i < $m; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      double $base = Math.abs($a.getDouble($i) - $b.getDouble($j));
         |      double $best;
         |      if ($i == 0 && $j == 0) { $best = 0.0; }
         |      else if ($i == 0) { $best = $curr[$j - 1]; }
         |      else if ($j == 0) { $best = $prev[$j]; }
         |      else { $best = Math.min($prev[$j], Math.min($curr[$j - 1], $prev[$j - 1])); }
         |      $curr[$j] = $base + $best;
         |    }
         |    System.arraycopy($curr, 0, $prev, 0, $n);
         |  }
         |  ${ev.value} = $prev[$n - 1];
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level dot product of two ArrayType(FloatType) columns. */
  def floatDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-level dot product of two ArrayType(DoubleType) columns. */
  def doubleDot(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleVectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-level 60-bit sign signature of an ArrayType(FloatType) column. */
  def signBits60(v: Column): Column =
    ExpressionUtils.column(SignBits60(ExpressionUtils.expression(v)))

  /** Column-level DTW distance of two ArrayType(DoubleType) columns. */
  def dtwDistance(a: Column, b: Column): Column =
    ExpressionUtils.column(DtwDistance(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-level 60-bit SimHash of an ArrayType(StringType) column. */
  def simhash60(toks: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(toks)))

  /** Membership probe against a serialized `util.sketch.BloomFilter`
    * (from `df.stat.bloomFilter`), via Spark's internal
    * BloomFilterMightContain — the same expression the optimizer's
    * runtime row-level filtering injects. Long-typed values probe with
    * `mightContainLong`, matching the builder's `putLong`.
    */
  def bloomMightContain(filterBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(filterBytes,
          org.apache.spark.sql.types.BinaryType),
        ExpressionUtils.expression(value)))
}
