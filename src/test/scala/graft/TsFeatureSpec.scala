package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TsFeatureQueries

class TsFeatureSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def run(name: String) =
    TsFeatureQueries.queries(name)(spark, sfDir)

  test("ts_stability_lumpiness: nonnegative, defined where tiles exist") {
    val out = run("ts_stability_lumpiness").cache()
    assert(out.count() > 0)
    assert(out.where(col("stability") < 0.0 || col("lumpiness") < 0.0).count() == 0)
    assert(out.where(col("n_tiles") < 1).count() == 0)
    out.unpersist()
  }

  test("ts_flat_spots: runs bounded by series length, at least 1") {
    val out = run("ts_flat_spots")
    val lens = graft.sources.Tables.events(spark, sfDir)
      .where(col("value").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val j = out.join(lens, "user_id")
    assert(j.where(col("max_flat_run") < 1 || col("max_flat_run") > col("n")).count() == 0)
  }

  test("ts_crossing_points: white-noise-like series cross near n/2, never above n-1") {
    val out = run("ts_crossing_points").cache()
    assert(out.count() > 0)
    assert(out.where(col("crossings") >= col("n_obs")).count() == 0)
    // Median split => each side holds ~half the points, so at least SOME
    // crossings exist on every non-degenerate series of this synthetic data.
    assert(out.where(col("crossings") === 0).count() == 0)
    out.unpersist()
  }

  test("ts_arch_stat: R-squared within [0, 1]") {
    val out = run("ts_arch_stat")
    assert(out.where(col("arch_r2") < 0.0 || col("arch_r2") > 1.0 + 1e-9).count() == 0)
  }

  test("burstPath flags a sustained count spike and not the quiet baseline") {
    import spark.implicits._
    import graft.functions.CleanFunctions.{round4, round6}
    // 20 quiet days at rate ~10, 10 burst days at rate 40, 10 quiet again.
    val counts = (1 to 20).map(d => (d, 10.0)) ++ (21 to 30).map(d => (d, 40.0)) ++
      (31 to 40).map(d => (d, 10.0))
    val df = counts.toDF("day", "c").withColumn("k", lit("t"))
    val r0 = 17.5 // mean of the crafted counts
    val r1 = 3.0 * r0
    val prep = df
      .withColumn("e0", round6(lit(r0) - col("c") * log(lit(r0))))
      .withColumn("e1", round6(lit(r1) - col("c") * log(lit(r1))))
    val out = graft.operators.TimeSeriesOps.burstPath(
      prep, Seq("k"), Seq("day"), "e0", "e1", gamma = 2.0).cache()
    val burstDays = out.where(col("in_burst") === 1).select("day")
      .collect().map(_.getInt(0)).sorted
    assert(burstDays.nonEmpty, "the 4x spike must trigger the burst state")
    assert(burstDays.forall(d => d >= 21 && d <= 32),
      s"burst flags outside the spike window (+ hysteresis tail): ${burstDays.mkString(",")}")
    assert(burstDays.count(d => d >= 21 && d <= 30) >= 8,
      "most spike days must be flagged")
    out.unpersist()
  }

  test("ts_bursts entry emits both states and bounded flags") {
    val out = run("ts_bursts").cache()
    assert(out.count() > 0)
    assert(out.where(col("in_burst") =!= 0L && col("in_burst") =!= 1L).count() == 0)
    out.unpersist()
  }

  test("hawkesPath: excitation decays between sparse events, grows in cascades") {
    import spark.implicits._
    // Events at t = 0, 1, 2, 3 (tight cascade), then one at t = 100
    // (long gap): excitation must increase through the cascade and
    // collapse to ~0 after the gap.
    val beta = 0.5
    val times = Seq(0.0, 1.0, 2.0, 3.0, 100.0)
    val df = times.zipWithIndex.map { case (t, i) => (i.toLong, t, "k") }
      .toDF("id", "t", "k")
      .withColumn("decay", exp(lit(-beta) * (col("t") - lag(col("t"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("t")))))
    val out = graft.operators.TimeSeriesOps
      .hawkesPath(df, Seq("k"), Seq("t"), "decay")
      .orderBy("id").select("excitation").collect().map(_.getDouble(0))
    assert(out(0) == 0.0)
    assert(out(1) > 0.0 && out(2) > out(1) && out(3) > out(2),
      s"cascade must build excitation: ${out.mkString(",")}")
    assert(out(4) < 1e-9, s"50 half-lives later the excitation must be ~0, got ${out(4)}")
  }

  test("ts_variogram: five lags per series, gamma nonnegative") {
    val out = run("ts_variogram").cache()
    assert(out.count() > 0)
    assert(out.where(col("gamma_h") < 0.0).count() == 0)
    val perUser = out.groupBy("user_id").agg(countDistinct(col("h")).as("nh"))
    assert(perUser.where(col("nh") =!= 5).count() == 0,
      "every series long enough must report all five lags")
    out.unpersist()
  }

  test("ts_hill_tail: hill >= 0 (top-k over threshold), alpha consistent") {
    val out = run("ts_hill_tail").cache()
    assert(out.count() > 0)
    // Every top-20 value is >= the 21st largest, so each log-ratio and
    // the Hill mean are nonnegative.
    assert(out.where(col("hill") < 0.0).count() == 0)
    val r = out.where(col("hill").isNotNull && col("hill") > 0.0).collect()
    r.foreach { row =>
      val want = math.round(1.0 / row.getAs[Double]("hill") * 10000.0) / 10000.0
      assert(math.abs(row.getAs[Double]("alpha") - want) < 1e-9)
    }
    out.unpersist()
  }

  test("ts_poincare: SD1/SD2 nonnegative, ratio consistent with rounded parts") {
    val out = run("ts_poincare").cache()
    assert(out.count() > 0)
    assert(out.where(col("sd1") < 0.0 || col("sd2") < 0.0).count() == 0)
    val r = out.where(col("sd2") > 0.0).collect()
    r.foreach { row =>
      val want = math.round(row.getAs[Double]("sd1") / row.getAs[Double]("sd2") * 10000.0) / 10000.0
      assert(math.abs(row.getAs[Double]("sd_ratio") - want) < 1e-9)
    }
    out.unpersist()
  }

  test("ts_transfer_entropy: nonnegative up to rounding, pair count symmetric") {
    val out = run("ts_transfer_entropy").cache()
    assert(out.count() > 0)
    // TE is an information quantity: >= 0 exactly; each cell term was
    // 6dp-rounded before the sum, so allow that quantization downward.
    assert(out.where(col("te") < -1e-4).count() == 0)
    // Directed pairs come from the same day-grid join both ways.
    val ab = out.select(col("yu"), col("xu"))
    val ba = out.select(col("xu").as("yu"), col("yu").as("xu"))
    assert(ab.except(ba).count() == 0)
    out.unpersist()
  }

  test("ts_allan_var: deviation nonnegative, at most three taus per series") {
    val out = run("ts_allan_var").cache()
    assert(out.count() > 0)
    assert(out.where(col("allan_dev") < 0.0).count() == 0)
    val perUser = out.groupBy("user_id").agg(countDistinct(col("tau_h")).as("nt"))
    assert(perUser.where(col("nt") > 3).count() == 0)
    out.unpersist()
  }

  test("ts_ses_select: winner comes from the candidate grid with minimal SSE") {
    val out = run("ts_ses_select").cache()
    assert(out.count() > 0)
    val grid = Set(0.1, 0.3, 0.5, 0.7, 0.9)
    out.collect().foreach { row =>
      assert(grid.contains(row.getAs[Double]("best_alpha")))
      assert(row.getAs[Double]("sse") >= 0.0)
    }
    out.unpersist()
  }

  test("ts_regime_switch: a crafted level step flips the regime exactly once") {
    import spark.implicits._
    import graft.functions.CleanFunctions.round6
    // 20 low rows then 20 high rows, z-emissions around the +-0.6745 centers.
    val rows = (1 to 20).map(i => (i.toLong, -1.0)) ++ (21 to 40).map(i => (i.toLong, 1.0))
    val df = rows.toDF("tsu", "z").withColumn("k", lit("s"))
      .withColumn("e0", round6((col("z") + lit(0.6745)) * (col("z") + lit(0.6745)) / lit(2.0)))
      .withColumn("e1", round6((col("z") - lit(0.6745)) * (col("z") - lit(0.6745)) / lit(2.0)))
    val out = graft.operators.TimeSeriesOps.burstPath(
      df, Seq("k"), Seq("tsu"), "e0", "e1", gamma = 2.0).cache()
    val seq = out.orderBy("tsu").select("in_burst").collect().map(_.getLong(0)).toSeq
    val flips = seq.zip(seq.tail).count { case (a, b) => a != b }
    assert(flips == 1, s"expected exactly one regime flip, got $flips in $seq")
    assert(seq.head == 0 && seq.last == 1)
    out.unpersist()
  }

  test("ts_dfa: fluctuations nonnegative and alpha defined for full series") {
    val out = run("ts_dfa").cache()
    assert(out.count() > 0)
    assert(out.where(col("f2_s4") < 0.0 || col("f2_s8") < 0.0 || col("f2_s16") < 0.0).count() == 0)
    out.unpersist()
  }
}
