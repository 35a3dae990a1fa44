package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PcaReconstruction

class PcaReconstructionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Two series of a clean daily sinusoid; one large spike injected.
  private def mkEvents(spikeAt: Int): org.apache.spark.sql.DataFrame =
    (for (u <- 1 to 2; i <- 0 until 200) yield {
      val base = 10.0 + 5.0 * math.sin(2 * math.Pi * (i % 24) / 24.0)
      val v = if (u == 1 && i == spikeAt) base + 80.0 else base
      (u.toLong * 1000 + i, i.toLong, u.toLong, v)
    }).toDF("event_id", "t", "user_id", "value")

  test("injected spike dominates reconstruction error and is flagged") {
    val out = PcaReconstruction.detect(
      mkEvents(150), Seq("user_id"), Seq("t"), "value", seqLen = 24, k = 4)
      .select("event_id", "user_id", "recon_err", "is_anomaly").cache()
    assert(out.filter(col("recon_err") < 0).count() == 0)
    // Windows containing the spike (user 1, t in [150, 173]) carry the error.
    val top = out.orderBy(desc("recon_err")).select("event_id").head().getLong(0)
    assert(top >= 1150 && top < 1174, s"hottest window was event $top")
    val flagged = out.filter(col("is_anomaly") === 1)
    assert(flagged.count() > 0)
    assert(flagged.filter(col("user_id") === 2).count() == 0,
      "clean series must not flag")
  }

  test("k = seqLen reconstructs exactly: zero error everywhere") {
    val out = PcaReconstruction.detect(
      mkEvents(150), Seq("user_id"), Seq("t"), "value", seqLen = 8, k = 8)
    val maxErr = out.agg(max("recon_err")).head().getDouble(0)
    assert(maxErr < 1e-6, s"max recon_err $maxErr with full basis")
  }

  test("sequence count matches the batch sequences operator") {
    val out = PcaReconstruction.detect(
      mkEvents(150), Seq("user_id"), Seq("t"), "value", seqLen = 24, k = 2)
    // 200 rows per series -> 200 - 24 + 1 = 177 full windows per series.
    assert(out.groupBy("user_id").count().collect().forall(_.getLong(1) == 177))
  }
}
