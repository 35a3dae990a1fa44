package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Anomaly
import graft.sources.Tables

class AnomalySpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val ev = Tables.events(spark, sfDir).cache()

  test("zscore flags exactly |z| > 3") {
    val r = Anomaly.zscore(ev, Seq("user_id"), "value")
    assert(r.filter((abs(col("z")) > 3.0).cast("long") =!= col("is_anomaly")).count() == 0)
  }

  test("injected spike is caught by rolling zscore") {
    import spark.implicits._
    val base = (1 to 200).map(i => (i.toLong, "u", 10.0 + (i % 5) * 0.1))
    val spiked = base.updated(150, (151L, "u", 500.0))
    val df = spiked.toDF("event_id", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("event_id") * 3600L * 1000000L))
    val r = Anomaly.rollingZscore(df, Seq("user_id"), Seq("ts", "event_id"), "value")
    assert(r.filter(col("event_id") === 151L && col("is_anomaly") === 1L).count() == 1)
    assert(r.filter(col("is_anomaly") === 1L).count() <= 3) // spike + shadow only
  }

  test("iqr fences bracket the bulk of the data") {
    val r = Anomaly.iqr(ev, Seq("user_id"), "value")
    val frac = r.filter(col("is_anomaly") === 1L).count().toDouble / r.count()
    assert(frac < 0.05)
    assert(r.filter(col("lo") >= col("hi")).count() == 0)
  }

  test("winsorize clamps into the band and flags exactly the out-of-band rows") {
    val r = Anomaly.winsorize(ev, Seq("user_id"), "value").cache()
    // Output never escapes the per-series band, in-band values untouched.
    assert(r.filter(col("value_wins") < col("lo") || col("value_wins") > col("hi")).count() == 0)
    assert(r.filter(col("is_clamped") === 0L && col("value_wins") =!= col("value")).count() == 0)
    // ~10% sits outside a [p05, p95] band by construction (ties aside).
    val frac = r.filter(col("is_clamped") === 1L).count().toDouble / r.count()
    assert(frac > 0.05 && frac < 0.15, s"clamped fraction $frac")
    r.unpersist()
  }

  test("winsorize pins NULL targets to is_clamped=0 (oracle CASE WHEN semantic)") {
    // r5 ADVICE: a NULL target used to leak NULL from the band comparison
    // while the DuckDB oracle's CASE WHEN yields 0 — pin the 0 semantic.
    import spark.implicits._
    val rows = (1 to 20).map(i => (i.toLong, "k", Some(i.toDouble))) :+
      (21L, "k", None: Option[Double])
    val r = Anomaly.winsorize(rows.toDF("event_id", "k", "v"), Seq("k"), "v").cache()
    assert(r.filter(col("is_clamped").isNull).count() == 0)
    assert(r.filter(col("v").isNull).select("is_clamped").as[Long].head() == 0L)
    assert(r.filter(col("v").isNull).select("v_wins").head().isNullAt(0))
    r.unpersist()
  }

  test("mad robust z flags extremes only") {
    val r = Anomaly.mad(ev, Seq("user_id"), "value")
    val frac = r.filter(col("is_anomaly") === 1L).count().toDouble / r.count()
    assert(frac < 0.10)
  }

  test("ensemble is the majority vote of its three detectors") {
    val r = Anomaly.ensemble(ev, Seq("user_id"), "value").cache()
    // votes is exactly the (null-safe) sum of the three flags, and the
    // final flag is votes >= 2 — no other signal sneaks in.
    val sum = coalesce(col("vote_z"), lit(0L)) + coalesce(col("vote_iqr"), lit(0L)) +
      coalesce(col("vote_mad"), lit(0L))
    assert(r.filter(col("votes") =!= sum).count() == 0)
    assert(r.filter(col("is_anomaly") =!= (col("votes") >= 2).cast("long")).count() == 0)
    // Consensus flags no more than the sum of its parts and stays rare.
    val frac = r.filter(col("is_anomaly") === 1L).count().toDouble / r.count()
    assert(frac < 0.05, s"ensemble flagged fraction $frac")
    r.unpersist()
  }

  test("reconstruction error drops warm-up and scores all remaining rows") {
    val r = Anomaly.reconstructionError(ev, Seq("user_id"), Seq("ts", "event_id"), "value")
    assert(r.count() > 0)
    assert(r.filter(col("seq_err").isNull).count() == 0)
    assert(r.filter(col("seq_err") < 0).count() == 0)
  }

  test("S-H-ESD: one extraction per (series, round), rounds 1..3, no event extracted twice") {
    val out = SparkEntry.queries("ts_shesd_anomalies")(
      SparkTestSession.spark, SparkTestSession.sfDir)
    assert(out.count() > 0)
    assert(out.filter(col("esd_round") < 1 || col("esd_round") > 3).count() == 0)
    assert(out.filter(col("z") < 0).count() == 0)
    assert(out.groupBy("user_id", "esd_round").count()
      .filter(col("count") > 1).count() == 0, "one extraction per round per series")
    assert(out.groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0, "an event is extracted at most once")
  }
}
