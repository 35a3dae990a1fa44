package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("chain cluster gets ONE label at fixpoint (fixed-round would split it)") {
    // A 5-hop chain: diameter > 2, so two fixed propagation rounds would
    // leave split labels; the fixpoint must label every node 1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("x", "y")
    val labels = GraphOps.minLabelPropagate(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("disjoint components keep distinct min-id labels") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 33L))
      .toDF("x", "y")
    val labels = GraphOps.minLabelPropagate(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(12L) == 10L && labels(11L) == 10L)
    assert(labels(21L) == 20L)
    assert(labels(33L) == 30L && labels(31L) == 30L)
    assert(labels.size == 9)
  }

  test("round cap bounds the iteration count") {
    // A 30-hop path with maxRounds=3: must terminate (no hang) even though
    // 3 rounds cannot reach the fixpoint; labels are monotone non-increasing.
    val edges = (1L until 30L).map(i => (i, i + 1)).toDF("x", "y")
    val labels = GraphOps.minLabelPropagate(edges, maxRounds = 3)
    assert(labels.count() == 30)
    assert(labels.filter(col("lbl") > col("id")).count() == 0)
  }

  test("df-pruning bounds hot-shingle candidate pairs") {
    // One shingle hash shared by 60 docs (corpus boilerplate) would emit
    // 60*59/2 = 1770 pairs; with df <= 10 pruning those vanish and only
    // the genuine low-df pairs survive — the exact shape used by
    // dedup_ngram_jaccard's pre-join filter.
    val hot  = (1L to 60L).map(d => (d, 999L))           // df = 60 -> pruned
    val cold = Seq((1L, 5L), (2L, 5L), (3L, 7L))         // df <= 2 -> kept
    val ex = (hot ++ cold).toDF("doc_id", "s")
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("df") <= 10)
      .drop("df")
    val pairs = ex.as("a").join(ex.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    assert(pairs.count() == 1) // only (1,2) via shingle 5
  }
}
