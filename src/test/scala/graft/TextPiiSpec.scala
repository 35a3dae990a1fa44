package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.AnnSearch

/** Synthetic-input specs for the round-6 redaction + quantization ops:
  * the driver oracle proves engine parity on real tables (which contain
  * no emails), these prove the SEMANTICS on inputs that exercise every
  * pattern.
  */
class TextPiiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("scrubPii redacts emails before number runs, counts match") {
    val docs = Seq(
      (1L, "contact jane.doe+spam@example.co.uk or call 555 0199"),
      (2L, "no pii here at all"),
      (3L, "ids 12 345 6789 and a@b.io x@y.org"),
      (4L, "")).toDF("id", "text")
    val r = docs.select(col("id"),
        TextFunctions.scrubPii(col("text")).as("s"),
        TextFunctions.piiCount(col("text"), TextFunctions.PiiPatterns(0)._1).as("ne"),
        TextFunctions.piiCount(col("text"), TextFunctions.PiiPatterns(1)._1).as("nn"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // Email tag wins over its own digits (order of PiiPatterns).
    assert(r(1)._1 == "contact <EMAIL> or call <NUM> <NUM>")
    assert(r(1)._2 == 1 && r(1)._3 == 2)
    assert(r(2)._1 == "no pii here at all" && r(2)._2 == 0 && r(2)._3 == 0)
    assert(r(3)._1 == "ids <NUM> <NUM> <NUM> and <EMAIL> <EMAIL>")
    assert(r(3)._2 == 2 && r(3)._3 == 3)
    assert(r(4)._1 == "")
  }

  test("quantizeInt8 bounds codes, dequantizes within half a step, nulls zero vectors") {
    val rng = new scala.util.Random(53)
    val rows = (1 to 50).map(i =>
      (i.toLong, Array.fill(16)((rng.nextFloat() - 0.5f) * 10f))) :+
      (51L, Array.fill(16)(0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val got = AnnSearch.quantizeInt8(df, "embedding")
      .select("vec_id", "q_scale", "q_codes").collect().map { r =>
      r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_ => r.getSeq[Int](2))))
    }.toMap
    rows.foreach { case (id, emb) =>
      val (scale, codes) = got(id)
      if (emb.forall(_ == 0.0f)) {
        assert(scale.isEmpty && codes.isEmpty, "zero vector must yield nulls")
      } else {
        val s = scale.get
        val q = codes.get
        assert(q.forall(c => c >= -127 && c <= 127), s"codes out of int8: $q")
        emb.zip(q).foreach { case (x, c) =>
          assert(math.abs(c / s - x) <= 0.5 / s + 1e-9,
            s"vec $id: dequant ${c / s} vs $x at scale $s")
        }
      }
    }
  }
}
