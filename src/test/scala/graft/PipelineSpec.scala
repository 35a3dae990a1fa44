package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("end-to-end pipeline runs on events and produces scores + flags") {
    val cfg = PipelineConfig(lags = Seq(1, 2, 3, 24), rollingWindows = Seq(3, 24))
    val out = Pipeline.run(graft.sources.Tables.events(spark, sfDir), cfg).cache()
    val n = out.count()
    assert(n > 0)
    assert(out.filter(col("recon_err").isNull || col("recon_err") < 0).count() == 0)
    assert(out.filter(!col("is_anomaly").isin(0L, 1L)).count() == 0)
    // Scaled features present and in [0,1].
    Pipeline.featureColumns(cfg).take(2).foreach { c =>
      assert(out.columns.contains(c + "_scaled"), s"missing ${c}_scaled")
    }
    assert(out.filter(col("value_scaled") < 0 || col("value_scaled") > 1).count() == 0)
  }

  test("mlp model trains the nonlinear AE on the full (L, F) feature matrix") {
    val cfg = PipelineConfig(lags = Seq(1, 2, 3, 24), rollingWindows = Seq(3, 24),
      model = "mlp", seqLen = 12)
    val out = Pipeline.run(graft.sources.Tables.events(spark, sfDir), cfg).cache()
    assert(out.count() > 0)
    assert(out.filter(col("recon_err").isNull || col("recon_err") < 0).count() == 0)
    assert(out.filter(!col("is_anomaly").isin(0L, 1L)).count() == 0)
    // Deterministic: a second run reproduces the scores exactly.
    val out2 = Pipeline.run(graft.sources.Tables.events(spark, sfDir), cfg)
    assert(out.select("event_id", "recon_err")
      .exceptAll(out2.select("event_id", "recon_err")).count() == 0)
  }

  test("lstm model runs the recurrent AE end to end on the (L, F) feature matrix") {
    val cfg = PipelineConfig(lags = Seq(1, 2, 3, 24), rollingWindows = Seq(3, 24),
      model = "lstm", seqLen = 12)
    val out = Pipeline.run(graft.sources.Tables.events(spark, sfDir), cfg).cache()
    assert(out.count() > 0)
    assert(out.filter(col("recon_err").isNull || col("recon_err") < 0).count() == 0)
    assert(out.filter(!col("is_anomaly").isin(0L, 1L)).count() == 0)
  }
}
