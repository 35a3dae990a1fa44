package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontaminate

/** Production-scale decontamination contract: k=8 shingles (the
  * text_decontaminate entry runs the same operator at k=4 against the
  * DuckDB oracle) and the case/punctuation normalizer.
  */
class DecontaminateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 12-token benchmark sentence; the contaminated train doc repeats it
  // with different case + punctuation, so only the normalized path can
  // see the overlap.
  private val benchText =
    "the quick brown fox jumps over the lazy dog near the river"
  private val docs = Seq(
    (0L, benchText),                                             // bench
    (1L, "The QUICK brown fox, jumps over the lazy dog - near the river!"), // contaminated
    (2L, "a completely unrelated training document about spark engines"),   // clean
    (3L, "quick brown fox jumps over the lazy cat in town today")           // 7-gram overlap only
  ).toDF("doc_id", "text")

  test("k=8 with normalization flags the case/punct-variant doc only") {
    val out = Decontaminate
      .flag(docs, col("doc_id") === 0, "doc_id", "text", k = 8)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L),
      s"expected only doc 1 flagged, got ${out.mkString(",")}")
    val r = out.head
    assert(r.getLong(1) == 1L) // one bench doc matched
    // 12 shared tokens -> 12-8+1 = 5 shared 8-gram shingles
    assert(r.getLong(2) == 5L, s"shared shingles: ${r.getLong(2)}")
  }

  test("without normalization the punctuation variant escapes (the trap)") {
    val out = Decontaminate
      .flag(docs, col("doc_id") === 0, "doc_id", "text", k = 8, normalizeText = false)
      .collect()
    assert(out.isEmpty, s"raw-text match should miss: ${out.mkString(",")}")
  }

  test("k bounds the match window: the 7-gram overlap doc appears at k=7, not k=8") {
    val at7 = Decontaminate
      .flag(docs, col("doc_id") === 0, "doc_id", "text", k = 7)
      .collect().map(_.getLong(0)).toSet
    assert(at7.contains(3L), s"doc 3 shares a 7-gram, got $at7")
  }

  test("normalizer is strip-then-lower (engine-portable on non-ASCII)") {
    val got = Seq("Héllo, Wörld! The Answer Is 42.").toDF("s")
      .select(Decontaminate.normalize(col("s"))).head().getString(0)
    assert(got == "hllo wrld the answer is 42")
  }
}
