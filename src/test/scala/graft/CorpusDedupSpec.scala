package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusDedup

class CorpusDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")

  test("exact stage keeps the minimum id per distinct content") {
    val docs = Seq((5L, base), (2L, base), (9L, "other text here")).toDF("doc_id", "text")
    val kept = CorpusDedup.exactSurvivors(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 9L))
  }

  test("run drops a near-duplicate (one appended token) but keeps distinct docs") {
    val near = base + " extra"
    val distinct = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, near), (4L, distinct))
      .toDF("doc_id", "text")
    val out = CorpusDedup.run(docs).select("doc_id").as[Long].collect().toSet
    // 2 is an exact dup of 1; 3 is a simhash near-dup of 1; 4 survives.
    assert(out == Set(1L, 4L), s"got $out")
  }

  test("run is idempotent and preserves original columns") {
    val docs = Seq((1L, base, "en"), (2L, base, "en"), (7L, "unique words entirely", "de"))
      .toDF("doc_id", "text", "lang")
    val once = CorpusDedup.run(docs)
    assert(once.columns.toSeq == Seq("doc_id", "text", "lang"))
    val twice = CorpusDedup.run(once)
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }

  test("clusterLabels gives every doc a label; near-dups share it") {
    val near = base + " extra"
    val distinct = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((1L, base), (3L, near), (4L, distinct)).toDF("doc_id", "text")
    val lbl = CorpusDedup.clusterLabels(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.keySet == Set(1L, 3L, 4L), "one row per input doc, singletons included")
    assert(lbl(1L) == lbl(3L), "near-dups must share a cluster label")
    assert(lbl(4L) == 4L, "a singleton labels itself")
  }

  test("leakageSafeSplit: near-dups land on the same side at EVERY trainPct") {
    // The property a per-doc split violates: whatever the bucket
    // boundary, members of one near-dup cluster co-assign. Sweep the
    // boundary so the assertion can't pass by bucket luck.
    val near = base + " extra"
    val docs = Seq((1L, base), (3L, near), (4L, (1 to 60).map(i => s"zzz$i").mkString(" ")))
      .toDF("doc_id", "text")
    (10 to 90 by 20).foreach { pct =>
      val split = CorpusDedup.leakageSafeSplit(docs, trainPct = pct)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(split(1L) == split(3L), s"near-dups split apart at trainPct=$pct")
    }
  }
}
