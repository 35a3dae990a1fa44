// Lives under org.apache.spark.sql so it can use the private[sql] Column <->
// Expression bridge (classic.ExpressionUtils) and AbstractDataType — the
// supported pattern for session-independent custom Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
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
}
