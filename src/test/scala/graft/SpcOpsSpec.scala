package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the SPC / EVT detector family (SpcQueries). */
class SpcOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("ts_we_rules: every emitted row fires at least one rule, and r1 implies |z| > 3") {
    val out = SparkEntry.queries("ts_we_rules")(spark, sfDir)
    assert(out.filter(col("r1") + col("r2") + col("r3") + col("r4") === 0).count() == 0)
    assert(out.filter(col("r1") === 1 && abs(col("z")) <= 3.0).count() == 0,
      "r1 must mean beyond 3 sigma")
    assert(out.filter(col("r2") === 1 && abs(col("z")) <= 2.0).count() == 0,
      "r2 fires only when the current point itself is beyond 2 sigma")
  }

  test("ts_grubbs: G is the max per-series z-score and nonnegative") {
    val g = SparkEntry.queries("ts_grubbs")(spark, sfDir)
    assert(g.filter(col("g_stat") < 0).count() == 0)
    // one row per series
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(g.count() == users)
    // the flagged event really is in the series
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id").as("outlier_event_id"), col("user_id").as("u2"))
    assert(g.join(ev, "outlier_event_id")
      .filter(col("user_id") =!= col("u2")).count() == 0)
  }

  test("ts_evt_pot: threshold is ~p95 (about 5% of the series exceeds it)") {
    val out = SparkEntry.queries("ts_evt_pot")(spark, sfDir).collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n"); val exc = r.getAs[Long]("n_exc")
      assert(exc >= 1 && exc <= math.max(2L, (n * 0.10).toLong + 1),
        s"user ${r.get(0)}: $exc of $n exceed — not a tail")
    }
  }

  test("ts_matrix_profile: discord >= motif, indices are valid windows") {
    val out = SparkEntry.queries("ts_matrix_profile")(spark, sfDir)
    assert(out.filter(col("discord_dist") < col("motif_dist")).count() == 0,
      "discord is the max of the profile, motif the min")
    assert(out.filter(col("discord_idx") < 1 || col("motif_idx") < 1 ||
      col("discord_idx") > col("n_windows") || col("motif_idx") > col("n_windows"))
      .count() == 0, "window indices inside [1, n_windows]")
    assert(out.filter(col("motif_dist") < 0).count() == 0, "squared distances nonnegative")
  }

  test("ts_loess: smooths a seeded spike less than the raw value moves") {
    // residuals should be centered: mean |resid| well below the series sd
    val ev = graft.sources.Tables.events(spark, sfDir)
    val sd = ev.agg(stddev(col("value"))).head.getDouble(0)
    val meanAbsResid = SparkEntry.queries("ts_loess")(spark, sfDir)
      .agg(avg(abs(col("resid")))).head.getDouble(0)
    assert(meanAbsResid < sd, s"LOESS residual $meanAbsResid not below raw sd $sd")
  }

  test("events_ks_test: D in [0,1] and critical value positive") {
    val r = SparkEntry.queries("events_ks_test")(spark, sfDir).head
    val d = r.getAs[Double]("ks_d"); val c = r.getAs[Double]("crit")
    assert(d >= 0.0 && d <= 1.0); assert(c > 0.0)
    assert(r.getAs[Long]("reject") == (if (d > c) 1L else 0L))
  }

  test("ts_sampen: counts are consistent (A <= B) and sampen >= 0 when defined") {
    val out = SparkEntry.queries("ts_sampen")(spark, sfDir)
    assert(out.filter(col("a_count") > col("b_count")).count() == 0,
      "a triple-match implies a pair-match")
    assert(out.filter(col("sampen").isNotNull && col("sampen") < 0).count() == 0,
      "-ln(A/B) with A<=B is nonnegative")
  }

  test("events_bootstrap_ci: point estimate sits inside the CI, lo <= hi") {
    SparkEntry.queries("events_bootstrap_ci")(spark, sfDir).collect().foreach { r =>
      val (m, lo, hi) = (r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= hi, s"ci_lo > ci_hi for ${r.get(0)}")
      assert(m >= lo - 1e-9 && m <= hi + 1e-9,
        s"mean $m outside bootstrap CI [$lo, $hi] for ${r.get(0)}")
    }
  }

  test("ts_burstiness: B in [-1,1], Fano nonnegative") {
    val out = SparkEntry.queries("ts_burstiness")(spark, sfDir)
    assert(out.filter(col("burstiness") < -1.0 || col("burstiness") > 1.0).count() == 0)
    assert(out.filter(col("fano") < 0.0).count() == 0)
  }

  test("ts_seasonal_zscore: anomalies are exactly the |z| > 3 rows") {
    val out = SparkEntry.queries("ts_seasonal_zscore")(spark, sfDir)
    assert(out.filter(col("is_anomaly") === 1 && abs(col("z")) <= 3.0).count() == 0)
    assert(out.filter(col("is_anomaly") === 0 && abs(col("z")) > 3.001).count() == 0)
    val n = graft.sources.Tables.events(spark, sfDir).count()
    assert(out.count() == n, "one scored row per event")
  }

  test("ts_theta_forecast: three horizons per series, forecasts move linearly in h") {
    val rows = SparkEntry.queries("ts_theta_forecast")(spark, sfDir)
      .orderBy("user_id", "h").collect()
      .groupBy(_.getAs[Long]("user_id"))
    rows.foreach { case (u, rs) =>
      assert(rs.map(_.getAs[Long]("h")).sorted.toSeq == Seq(1L, 2L, 3L), s"user $u horizons")
      val f = rs.sortBy(_.getAs[Long]("h")).map(_.getAs[Double]("forecast"))
      // equal spacing (within the 4dp rounding grain): f2-f1 == f3-f2
      assert(math.abs((f(1) - f(0)) - (f(2) - f(1))) < 2e-4,
        s"user $u: theta forecasts not linear in h: ${f.mkString(",")}")
    }
  }

  test("events_sprt: decision consistent with the crossing index") {
    SparkEntry.queries("events_sprt")(spark, sfDir).collect().foreach { r =>
      val dec = r.getAs[String]("decision")
      val at = Option(r.getAs[Any]("decision_at"))
      if (dec == "continue") assert(at.isEmpty, "continue must have no crossing index")
      else {
        assert(at.nonEmpty, s"$dec needs a crossing index")
        assert(at.get.asInstanceOf[Long] >= 1 &&
          at.get.asInstanceOf[Long] <= r.getAs[Long]("n_obs"))
      }
    }
  }

  test("streaming_seasonal_score: stream-static scoring bit-equals the batch detector") {
    import org.apache.spark.sql.functions._
    val batch = SparkEntry.queries("ts_seasonal_zscore")(spark, sfDir)
      .select("event_id", "z", "is_anomaly")
    val stream = SparkEntry.queries("streaming_seasonal_score")(spark, sfDir)
      .select("event_id", "z", "is_anomaly")
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).count() == 0 && batch.exceptAll(stream).count() == 0,
      "stream-static scored rows must equal the batch twin exactly")
  }

  test("ts_records: first point is always a record, counts bounded by n") {
    val out = SparkEntry.queries("ts_records")(spark, sfDir)
    assert(out.filter(col("n_records") < 1 || col("n_records") > col("n")).count() == 0)
    assert(out.filter(col("expected_records") <= 0).count() == 0)
  }
}
