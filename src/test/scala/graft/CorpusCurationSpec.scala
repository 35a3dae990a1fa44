package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusCuration, CorpusDedup}
import graft.sources.Tables

/** End-to-end invariants of the one-call curation pipeline on the real
  * sf0.001 corpus: every gate it claims to apply actually holds on the
  * output.
  */
class CorpusCurationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val out = CorpusCuration.run(docs).cache()

  test("survivors pass the quality and language gates") {
    assert(out.filter(col("quality") < 0.4 || col("lang_pred") === "und").count() === 0)
    assert(out.count() > 0)
  }

  test("no two survivors share exact content") {
    val dups = out.join(docs, "doc_id")
      .groupBy(md5(col("text"))).count().filter(col("count") > 1)
    assert(dups.count() === 0)
  }

  test("no near-dup pair survives (the split needs no cluster keying)") {
    val survivors = docs.join(out.select("doc_id"), "doc_id")
    assert(CorpusDedup.nearDupPairs(survivors, "doc_id", "text").count() === 0)
  }

  test("split is exhaustive, deterministic and roughly 90/10") {
    val byopt = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byopt.keySet.subsetOf(Set("train", "val")))
    val total = byopt.values.sum.toDouble
    assert(byopt.getOrElse("train", 0L) / total > 0.75,
      s"train share off: $byopt")
    // Deterministic: a second run yields the identical assignment —
    // symmetric check (one-directional except would pass on a superset).
    val again = CorpusCuration.run(docs)
    assert(out.select("doc_id", "split").except(again.select("doc_id", "split")).count() === 0)
    assert(again.select("doc_id", "split").except(out.select("doc_id", "split")).count() === 0)
    assert(again.count() === out.count())
  }
}
