package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plain-JVM tests of the Bench self-shard orchestrator's pure parts —
  * no SparkSession, no forked processes. Covers the r14 verdict item 8
  * (injected-failure retry policy) and the r14 ADVICE items on the
  * merge parse (field-order coupling) and the re-vote selection rule.
  */
class BenchOrchestratorSpec extends AnyFunSuite {

  test("parseQueriesObject is anchored to the closing brace, not field order") {
    // A numeric field AFTER "queries" (the future-proofing hazard the
    // old scan-to-end parse would merge as a phantom query entry).
    val line = """{"metric":"total","value":12.5,"unit":"sec","reps":3,""" +
      """"queries":{"q1_agg":1.25,"ts_kalman":0.5,"emb_lof":-1},""" +
      """"elapsed_wall":99.9,"sf":"/root/testdata/sf0.1"}"""
    val qs = Bench.parseQueriesObject(line).toMap
    assert(qs === Map("q1_agg" -> 1.25, "ts_kalman" -> 0.5, "emb_lof" -> -1.0))
    assert(!qs.contains("elapsed_wall"))
  }

  test("parseQueriesObject rejects a line with no queries object") {
    intercept[IllegalArgumentException] {
      Bench.parseQueriesObject("""{"metric":"total","value":1.0}""")
    }
  }

  test("eachShardWithRetry: clean run launches each shard once, no retries") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Int]
    val retried = Bench.eachShardWithRetry(4, { i => calls += i; 0 })
    assert(retried.isEmpty)
    assert(calls.toSeq === Seq(0, 1, 2, 3))
  }

  test("eachShardWithRetry: one transient failure is retried once and recorded") {
    var shard2Attempts = 0
    val retried = Bench.eachShardWithRetry(4, { i =>
      if (i == 2) { shard2Attempts += 1; if (shard2Attempts == 1) 137 else 0 }
      else 0
    })
    assert(retried === Seq(2))
    assert(shard2Attempts === 2)
  }

  test("eachShardWithRetry: a twice-failing shard throws (fallback marker path)") {
    val e = intercept[IllegalArgumentException] {
      Bench.eachShardWithRetry(3, i => if (i == 1) 1 else 0)
    }
    assert(e.getMessage.contains("shard 1 failed twice"))
  }

  test("revoteCandidates flags >2x-vs-prior above the 0.5s floor only") {
    val prior = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.1, "d" -> 5.0, "f" -> -1.0)
    val merged = Map(
      "a" -> 2.5,  // 2.5x prior, above floor -> flagged
      "b" -> 3.9,  // 1.95x prior -> not flagged
      "c" -> 0.25, // 2.5x prior but under the 0.5s floor -> not flagged
      "d" -> 4.0,  // faster than prior -> not flagged
      "e" -> 9.0,  // no prior value -> not comparable, not flagged
      "f" -> 3.0)  // prior was a failure (-1) -> not comparable
    assert(Bench.revoteCandidates(merged, prior) === Seq("a"))
  }

  test("revoteCandidates caps the batch at the slowest N entries") {
    val prior = (1 to 100).map(i => s"q$i" -> 1.0).toMap
    val merged = (1 to 100).map(i => s"q$i" -> (2.0 + i)).toMap
    val out = Bench.revoteCandidates(merged, prior, cap = 10)
    assert(out.size === 10)
    // Cap keeps the SLOWEST entries (q91..q100), returned name-sorted.
    assert(out.toSet === (91 to 100).map(i => s"q$i").toSet)
  }

  test("revoteCandidates is empty when no prior artifact exists") {
    assert(Bench.revoteCandidates(Map("a" -> 99.0), Map.empty) === Seq.empty)
  }
}
