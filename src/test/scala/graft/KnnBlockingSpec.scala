package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CleanFunctions, TextFunctions}
import graft.queries.SimilarityQueries
import graft.sources.Tables

/** The two-level blocked kNN candidate stage under emb_lof /
  * emb_intrinsic_dim: recall against brute force, and the bucket-local
  * skew split (AnnSearch.SplitOccupancy) firing on a clustered corpus
  * without destroying neighbor recall.
  */
class KnnBlockingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def topK(pairs: DataFrame, k: Int): Set[(Long, Long)] = {
    val w = Window.partitionBy("a_id").orderBy(col("dist"), col("b_id"))
    pairs.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
  }

  private def bruteForcePairs(e: DataFrame): DataFrame =
    e.as("x").join(e.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"),
        CleanFunctions.round4(lit(1.0) - TextFunctions.cosine(
          col("x.embedding"), col("y.embedding"))).as("dist"))

  test("blocked kNN(5) recall vs brute force on the real corpus") {
    val e = Tables.embeddings(spark, SparkTestSession.sfDir)
      .select("vec_id", "embedding").cache()
    val approx = topK(
      SimilarityQueries.knnCandidatePairsForSpec(spark, SparkTestSession.sfDir), 5)
    val exact = topK(bruteForcePairs(e), 5)
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"blocked kNN recall too low: $recall")
    e.unpersist()
    ()
  }

  test("bucket-local split fires on a clustered corpus, keeps recall, stays deterministic") {
    val A = graft.operators.AnnSearch
    // Two tight clusters of 600 — far larger than SplitOccupancy — with a
    // deterministic integer-derived perturbation small enough that no
    // global hyperplane separates members: the exact corpus shape that
    // makes level-1 sign buckets cluster-sized.
    // Noise sized so intra-cluster distances resolve ABOVE the 4dp
    // rounding fence (~2.5e-3) while the per-plane noise projection
    // (std ~2.4) stays far below the cluster center's (|proj| ~28) —
    // members share their level-1 bucket but have real neighbor geometry.
    val rows = (0 until 1200).map { id =>
      val base = if (id % 2 == 0) 2.5f else -2.5f
      val emb = Array.tabulate(64)(i =>
        base * (1.0f + 0.2f * (i % 5)) +
          0.006f * (((id * 31 + i * 17) % 101) - 50))
      (id.toLong, emb.toSeq)
    }.toDF("vec_id", "embedding")
    rows.cache()
    // Level-1 occupancy: at least one bucket must exceed the split bar
    // (this is what the corpus is built to guarantee).
    val np = A.annPlanes(1200L, A.DefaultTargetOccupancy)
    val occ = rows.select(TextFunctions.packBits((0 until np).map(p =>
        TextFunctions.lshSign(col("embedding"), p))).as("bucket"))
      .groupBy("bucket").count()
    assert(occ.agg(max("count")).head().getLong(0) > A.SplitOccupancy,
      "corpus failed to produce an over-limit bucket; split never fired")
    val pairs = SimilarityQueries.knnCandidatePairsOf(rows).cache()
    // The split engaged: an unsplit cluster-sized bucket would emit
    // >= occ*(occ-1) self-probe candidates per cluster (~719k for the
    // pair of 600s, before flip probes); the split caps effective
    // occupancy near the target, an order of magnitude below.
    val nCand = pairs.count()
    assert(nCand < 500000L, s"candidate stage too large ($nCand): split did not engage")
    // DISTANCE-based recall@5 (the standard ANN metric — identity recall
    // is ill-posed under 4dp rounding ties): a blocked neighbor counts
    // as a hit when it is at least as close as the true 5th neighbor.
    val w = Window.partitionBy("a_id").orderBy(col("dist"), col("b_id"))
    val kth = bruteForcePairs(rows)
      .withColumn("rk", row_number().over(w)).where(col("rk") === 5)
      .select(col("a_id"), col("dist").as("kdist"))
    val blocked5 = pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5).select("a_id", "dist")
    val hits = blocked5.join(kth, "a_id")
      .agg(sum(when(col("dist") <= col("kdist"), 1L).otherwise(0L)).as("h"),
        count(lit(1)).as("t")).head()
    val recall = hits.getLong(0).toDouble / hits.getLong(1)
    assert(recall >= 0.8, s"split-bucket kNN distance-recall too low: $recall")
    // Bit-determinism across replans.
    val again = SimilarityQueries.knnCandidatePairsOf(rows)
      .select("a_id", "b_id", "dist").as[(Long, Long, Double)].collect().toSet
    val first = pairs.select("a_id", "b_id", "dist")
      .as[(Long, Long, Double)].collect().toSet
    assert(first == again)
    pairs.unpersist(); rows.unpersist()
    ()
  }
}
