package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{BottomKQuantile, DtwDistance, FloatVectorDot, SignBits60, SimHash60, TopKIds}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same codegen'd hot paths as the DataFrame API.
  *
  * Wire-up: `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "float_vector_dot(a, b) takes 2 arguments")
        FloatVectorDot(args.head, args(1))
      }),
    (new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash60(tokens) takes 1 argument")
        SimHash60(args.head)
      }),
    (new FunctionIdentifier("sign_bits60"),
      new ExpressionInfo(classOf[SignBits60].getName, "sign_bits60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "sign_bits60(vec) takes 1 argument")
        SignBits60(args.head)
      }),
    (new FunctionIdentifier("dtw_distance"),
      new ExpressionInfo(classOf[DtwDistance].getName, "dtw_distance"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dtw_distance(a, b) takes 2 arguments")
        DtwDistance(args.head, args(1))
      }),
    (new FunctionIdentifier("approx_pct_det"),
      new ExpressionInfo(classOf[BottomKQuantile].getName, "approx_pct_det"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "approx_pct_det(hash, id, value, p, k) takes 5 arguments")
        BottomKQuantile(args(0), args(1), args(2), args(3), args(4))
      }),
    (new FunctionIdentifier("topk_det"),
      new ExpressionInfo(classOf[TopKIds].getName, "topk_det"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "topk_det(score, id, k) takes 3 arguments")
        TopKIds(args(0), args(1), args(2))
      }))

  /** Register the same functions into an ALREADY-RUNNING session (the
    * extensions path only applies at session build; a driver-owned
    * session opts in at runtime with this).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
