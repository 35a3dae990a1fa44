package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ordering-semantics tests for the events-analytics entries on crafted
  * sequences the synthetic corpus cannot guarantee to contain.
  */
class AnalyticsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val tmpDirs = scala.collection.mutable.ArrayBuffer[String]()
  override def afterAll(): Unit = tmpDirs.foreach { d =>
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(d))
  }

  /** Write a synthetic events table in the testdata layout (ts as INT64
    * nanos, like the driver-generated parquet) and return its directory.
    */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    tmpDirs += dir
    rows.toDF("event_id", "tsu", "user_id", "event_type", "value")
      .withColumn("ts", col("tsu") * 1000L) // micros -> nanos
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val H = 3600L * 1000000 // one hour in micros

  test("funnel counts only strictly-ordered view -> click -> purchase") {
    val d = eventsDir(Seq(
      // u1: full ordered funnel -> stage 3
      (1L, 1 * H, 1L, "view", 1.0), (2L, 2 * H, 1L, "click", 1.0), (3L, 3 * H, 1L, "purchase", 1.0),
      // u2: click BEFORE the first view, purchase after -> stage 1
      (4L, 1 * H, 2L, "click", 1.0), (5L, 2 * H, 2L, "view", 1.0), (6L, 3 * H, 2L, "purchase", 1.0),
      // u3: view only -> stage 1
      (7L, 1 * H, 3L, "view", 1.0),
      // u4: purchase between view and click -> stage 2 (no purchase AFTER click)
      (8L, 1 * H, 4L, "view", 1.0), (9L, 2 * H, 4L, "purchase", 1.0), (10L, 3 * H, 4L, "click", 1.0)))
    val stages = SparkEntry.queries("events_funnel")(spark, d)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(stages == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 2L), s"got $stages")
  }

  test("average precision is 1.0 for a perfectly separating score, low for the inverse") {
    // purchase owns the 10 highest scores -> every prefix of its ranking
    // is pure -> AP = 1. view owns the 10 lowest -> its precision at
    // each recall step is k/(10+k) -> AP ~ 0.33.
    val d = eventsDir(
      (1 to 10).map(i => (i.toLong, i * H, 1L, "purchase", 100.0 + i)) ++
      (1 to 10).map(i => (10L + i, i * H, 2L, "view", 1.0 + i)))
    val ap = SparkEntry.queries("events_pr_auc")(spark, d)
      .select("event_type", "ap").as[(String, Double)].collect().toMap
    assert(ap("purchase") === 1.0, s"got $ap")
    val expectedView = (1 to 10).map(k => (k.toDouble / 10.0 - (k - 1) / 10.0) *
      (k.toDouble / (10.0 + k))).sum
    assert(math.abs(ap("view") - expectedView) < 1e-3, s"got $ap want ~$expectedView")
  }

  test("JS divergence is zero for a user matching the global mix, symmetric-positive for disjoint") {
    // Two users with IDENTICAL mixes: global mix == each user's mix -> 0.
    val same = eventsDir(Seq(
      (1L, 1 * H, 1L, "view", 1.0), (2L, 2 * H, 1L, "click", 1.0),
      (3L, 1 * H, 2L, "view", 1.0), (4L, 2 * H, 2L, "click", 1.0)))
    val z = SparkEntry.queries("events_js_divergence")(spark, same)
      .select("jsd").as[Double].collect().toSeq
    assert(z === Seq(0.0, 0.0), s"got $z")
    // Disjoint users: each P=(1,0) vs global Q=(.5,.5) -> JSD ~ 0.2158,
    // identical for both by symmetry, and well under the ln 2 bound.
    val disj = eventsDir(Seq(
      (1L, 1 * H, 1L, "view", 1.0), (2L, 2 * H, 1L, "view", 1.0),
      (3L, 1 * H, 2L, "click", 1.0), (4L, 2 * H, 2L, "click", 1.0)))
    val j = SparkEntry.queries("events_js_divergence")(spark, disj)
      .select("jsd").as[Double].collect().toSeq
    assert(j.length == 2 && j.distinct.length == 1, s"got $j")
    assert(math.abs(j.head - 0.2158) < 1e-3 && j.head < math.log(2.0), s"got $j")
  }

  test("Nelson-Aalen cumulative hazard is nondecreasing and bounds its variance") {
    val rows = SparkEntry.queries("events_nelson_aalen")(spark, SparkTestSession.sfDir)
      .orderBy("t_hours")
      .select("cum_hazard", "hazard_var").as[(Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.sliding(2).forall { case Seq(a, b) => b._1 >= a._1; case _ => true },
      "cumulative hazard must be nondecreasing")
    assert(rows.forall { case (h, v) => v >= 0.0 && v <= h + 1e-9 },
      "Poisson variance sums d/n^2 <= d/n = hazard")
  }

  test("attribution credits each purchase to the first and last preceding touch") {
    val d = eventsDir(Seq(
      // u1: view -> click -> purchase(10): first=view, last=click
      (1L, 1 * H, 1L, "view", 1.0), (2L, 2 * H, 1L, "click", 1.0), (3L, 3 * H, 1L, "purchase", 10.0),
      // u1 again: another purchase(5) later; click is still the last touch
      (4L, 4 * H, 1L, "purchase", 5.0),
      // u2: purchase with no preceding touch -> excluded
      (5L, 1 * H, 2L, "purchase", 99.0),
      // u3: click only then purchase(7): first=last=click
      (6L, 1 * H, 3L, "click", 1.0), (7L, 2 * H, 3L, "purchase", 7.0)))
    val rows = SparkEntry.queries("events_attribution")(spark, d)
      .select("channel", "first_rev", "first_convs", "last_rev", "last_convs")
      .as[(String, Double, Long, Double, Long)].collect().toSet
    // first-touch: view gets u1's 15.0 (2 convs), click gets u3's 7.0.
    // last-touch: click gets u1's 15.0 + u3's 7.0 (3 convs), view none.
    assert(rows === Set(
      ("view", 15.0, 2L, 0.0, 0L),
      ("click", 7.0, 1L, 22.0, 3L)), s"got $rows")
  }

  test("peaks are strict local extrema only (plateaus and edges excluded)") {
    val d = eventsDir(Seq(
      (1L, 1 * H, 1L, "view", 1.0), (2L, 2 * H, 1L, "view", 5.0),  // peak at 2
      (3L, 3 * H, 1L, "view", 2.0), (4L, 4 * H, 1L, "view", 0.5),  // trough at 4
      (5L, 5 * H, 1L, "view", 3.0), (6L, 6 * H, 1L, "view", 3.0),  // plateau: neither
      (7L, 7 * H, 1L, "view", 9.0)))                               // edge: excluded
    val got = SparkEntry.queries("ts_peaks")(spark, d)
      .select("event_id", "kind").as[(Long, String)].collect().toSet
    assert(got === Set((2L, "peak"), (4L, "trough")), s"got $got")
  }

  test("session concurrency counts each covered hour once per session") {
    val d = eventsDir(Seq(
      // u1 chain: 1h00, 1h20 | 2h00, 2h30, 3h00 — the 40 min gap
      // (1h20 -> 2h00) exceeds the 30 min threshold and SPLITS it into
      // session A (hour 1) and session B (hours 2-3; 30 min gaps hold).
      (1L, 1 * H, 1L, "view", 1.0), (2L, 1 * H + H / 3, 1L, "view", 1.0),
      (3L, 3 * H, 1L, "view", 1.0),
      (4L, 2 * H, 1L, "view", 1.0), (5L, 2 * H + H / 2, 1L, "view", 1.0),
      // u2: short session inside hour 2
      (6L, 2 * H + H / 4, 2L, "view", 1.0)))
    val got = SparkEntry.queries("events_session_concurrency")(spark, d)
      .select("hr", "n_sessions", "n_users").as[(Long, Long, Long)].collect()
      .map { case (h, s, u) => h -> ((s, u)) }.toMap
    assert(got === Map(1L -> ((1L, 1L)), 2L -> ((2L, 2L)), 3L -> ((1L, 1L))), s"got $got")
  }

  test("dominant-period detection locks onto a pure 24h sine") {
    val rows = (0 until 240).map { h => // 10 days, hourly samples
      (h.toLong + 1, h * H, 1L, "view",
        100.0 + 50.0 * math.sin(2 * math.Pi * h / 24.0))
    }
    val d = eventsDir(rows)
    val got = SparkEntry.queries("ts_dominant_period")(spark, d)
      .select("best_period_h").as[Long].collect()
    assert(got.toSeq === Seq(24L), s"got $got")
  }

  test("rolling median resists the spike the rolling mean would follow") {
    val d = eventsDir(Seq(
      (1L, 1 * H, 1L, "view", 1.0), (2L, 2 * H, 1L, "view", 100.0),
      (3L, 3 * H, 1L, "view", 2.0), (4L, 4 * H, 1L, "view", 3.0)))
    val med = SparkEntry.queries("ts_rolling_median")(spark, d)
      .orderBy("event_id").select("roll_med").as[Double].collect()
    // windows: [1], [1,100], [1,2,100], [1,2,3,100]
    assert(med.toSeq === Seq(1.0, 50.5, 2.0, 2.5))
  }

  test("retention offsets are measured from each user's first-seen day") {
    val day = 24 * H
    val d = eventsDir(Seq(
      (1L, 0 * day + H, 1L, "view", 1.0),      // u1 cohort day 0
      (2L, 2 * day + H, 1L, "view", 1.0),      // u1 back on day 2
      (3L, 1 * day + H, 2L, "view", 1.0),      // u2 cohort day 1
      (4L, 2 * day + H, 2L, "view", 1.0)))     // u2 back on day 1 offset
    val r = SparkEntry.queries("events_retention")(spark, d)
      .select("cohort_us", "offset_days", "n_users").as[(Long, Long, Long)].collect().toSet
    assert(r == Set((0L, 0L, 1L), (0L, 2L, 1L), (1L * day, 0L, 1L), (1L * day, 1L, 1L)), s"got $r")
  }

  test("time spine materializes every hourly bucket and forward-fills gaps") {
    val d = eventsDir(Seq(
      (1L, 1 * H, 1L, "view", 10.0),
      (2L, 4 * H, 1L, "view", 40.0)))  // 3-hour gap -> buckets 2,3 synthesized
    val r = SparkEntry.queries("ts_time_spine")(spark, d)
      .select("bucket_us", "n", "v_ffill").as[(Long, Long, Double)].collect()
      .sortBy(_._1).toList
    assert(r.map(_._1) == List(1 * H, 2 * H, 3 * H, 4 * H), "spine must cover every hour")
    assert(r.map(_._2) == List(1L, 0L, 0L, 1L), "synthesized buckets carry n=0")
    assert(r.map(_._3) == List(10.0, 10.0, 10.0, 40.0), "gaps forward-fill the last mean")
  }
}
