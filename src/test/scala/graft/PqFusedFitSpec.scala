package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** r17 optimization fence: ProductQuantizer.fitFromInit advances all m
  * subspaces through each Lloyd round in ONE exploded job instead of m
  * per-subspace jobs. The codebooks must be BIT-identical (the DuckDB
  * oracles of emb_pq / dedup_pq / ann_ivfpq_topk recompute them from the
  * per-subspace formulation), so this spec re-derives the OLD shape —
  * IvfIndex.iterate per sliced subspace — and compares every center
  * float exactly, plus the init-sharing contract ann_ivfpq_topk now
  * leans on (initCenters(k) feeding both fits).
  */
class PqFusedFitSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val Dim = 64
  private val M = 4
  private val K = 16
  private val Sub = Dim / M

  test("fused fitFromInit equals the per-subspace iterate formulation bit-for-bit") {
    val e = Tables.embeddings(spark, SparkTestSession.sfDir)
      .select(col("vec_id"), col("embedding")).cache()
    val fullInit = graft.operators.IvfIndex.initCenters(e, "vec_id", "embedding", K)
    // iters=2 exercises the fold across rounds (the entries run 1).
    val fused = graft.operators.ProductQuantizer.fitFromInit(
      e, "embedding", fullInit, Dim, M, K, iters = 2)
    val old = (0 until M).map { j =>
      val init = fullInit.map { case (cid, c) =>
        cid -> c.slice(j * Sub, j * Sub + Sub) }
      graft.operators.IvfIndex.iterate(
        e.select(slice(col("embedding"), j * Sub + 1, Sub).as("__pq_sub")),
        "__pq_sub", init, Sub, iters = 2)
    }
    assert(fused.length == M && old.length == M)
    (0 until M).foreach { j =>
      assert(fused(j).map(_._1) == old(j).map(_._1), s"cell ids differ in subspace $j")
      fused(j).zip(old(j)).foreach { case ((cid, fc), (_, oc)) =>
        assert(fc.length == Sub && oc.length == Sub)
        (0 until Sub).foreach { i =>
          assert(java.lang.Float.floatToRawIntBits(fc(i)) ==
            java.lang.Float.floatToRawIntBits(oc(i)),
            s"subspace $j cell $cid dim $i: fused=${fc(i)} old=${oc(i)}")
        }
      }
    }
    e.unpersist()
  }

  test("ProductQuantizer.fit delegates to the same codebooks as fitFromInit") {
    val e = Tables.embeddings(spark, SparkTestSession.sfDir)
      .select(col("vec_id"), col("embedding")).cache()
    val viaFit = graft.operators.ProductQuantizer.fit(
      e, "vec_id", "embedding", Dim, M, K, iters = 1)
    val viaInit = graft.operators.ProductQuantizer.fitFromInit(
      e, "embedding",
      graft.operators.IvfIndex.initCenters(e, "vec_id", "embedding", K),
      Dim, M, K, iters = 1)
    assert(viaFit.map(_.map { case (c, a) => (c, a.toSeq) }) ==
      viaInit.map(_.map { case (c, a) => (c, a.toSeq) }))
    e.unpersist()
  }
}
