package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.TextFunctions

/** IVF (inverted-file) coarse quantizer: deterministic Lloyd's k-means,
  * built from first principles so every arithmetic step is replicable as
  * DuckDB SQL — the oracle COMPUTES the same centers instead of trusting a
  * black-box fit (MLlib's k-means|| init draws from a partition-dependent
  * RNG stream, which no SQL oracle can reproduce).
  *
  * Determinism contract (shared with the SQL twin in SimilarityQueries):
  * - init: rank vectors by id; center c = embedding at rank c*stride+1,
  *   stride = max(n/k, 1) (integer division).
  * - assignment: cell = argmin over centers of (-2*dot(x,c) + dot(c,c)),
  *   ties to the smallest cell id; dot is the sequential left-fold
  *   (FloatVectorDot == DuckDB list_sum order).
  * - update: per-dimension mean of assigned vectors through
  *   DECIMAL(28,6) (exact, partition-order-independent), divided in
  *   double, cast to float — bit-identical in both engines.
  * - empty cells drop out; surviving cells keep their original ids.
  *
  * Scale: each iteration is one corpus scan (codegen'd argmin over k
  * literal dots) + one grouped aggregate of k*dim decimal sums; only the
  * k x dim center matrix (model parameters) ever touches the driver.
  */
object IvfIndex {

  private val SumDec = DecimalType(28, 6)

  /** Sequential self-dot in double — same fold order as FloatVectorDot
    * and DuckDB list_sum, so center norms agree bitwise.
    */
  private def selfDot(c: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
    acc
  }

  /** Argmin-cell expression over literal centers: one codegen'd dot per
    * center, ties to the smallest cell id via struct ordering.
    */
  def cellExpr(emb: Column, centers: Seq[(Int, Array[Float])]): Column = {
    val scored = centers.map { case (cellId, c) =>
      struct((lit(-2.0) * TextFunctions.dot(emb, lit(c)) + lit(selfDot(c))).as("score"),
        lit(cellId).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }

  /** Same -2*dot+cc ranking score as a column (for nprobe cell probing —
    * ||q||^2 is constant per query, so this orders like true distance).
    */
  def centerScore(emb: Column, center: Array[Float]): Column =
    lit(-2.0) * TextFunctions.dot(emb, lit(center)) + lit(selfDot(center))

  /** Fit `iters` Lloyd rounds over `e` (columns: idCol long, embCol
    * array<float> of length `dim`). Returns surviving (cellId, center)
    * pairs, original ids, ascending.
    */
  def fit(e: DataFrame, idCol: String, embCol: String,
          k: Int, dim: Int, iters: Int): Seq[(Int, Array[Float])] = {
    val n = e.count()
    val stride = math.max(n / k, 1L)
    // Strided init picks rank over the 8-byte id column ONLY (embeddings
    // join back via a broadcast of the k picked ids) — the global sort
    // moves ids, not vectors. Init-time-only; at extreme scale swap in a
    // deterministic id-quantile pick.
    val picks = e.select(col(idCol))
      .withColumn("__rn", row_number().over(Window.orderBy(col(idCol))))
      .filter(expr(s"(__rn - 1) % $stride = 0 AND (__rn - 1) div $stride < $k"))
      .select(expr(s"CAST((__rn - 1) div $stride AS INT)").as("cell"), col(idCol))
    val init = e.join(broadcast(picks), idCol)
      .select(col("cell"), col(embCol))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).toSeq

    (1 to iters).foldLeft(init) { (centers, _) =>
      val assigned = e.withColumn("__cell", cellExpr(col(embCol), centers))
      val sums = (0 until dim).map(i =>
        sum(element_at(col(embCol), i + 1).cast(DoubleType).cast(SumDec))
          .cast(DoubleType).as(s"s$i"))
      val rows = assigned.groupBy("__cell")
        .agg(count(lit(1)).as("__cnt"), sums: _*)
        .collect()
      rows.map { r =>
        val cnt = r.getLong(1).toDouble
        val center = Array.tabulate(dim)(i => (r.getDouble(2 + i) / cnt).toFloat)
        r.getInt(0) -> center
      }.sortBy(_._1).toSeq
    }
  }
}
