package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatsOps
import graft.sources.Tables

class StatsOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val ev = Tables.events(spark, sfDir).cache()

  test("pageHinkley fires on a mean shift, not on a stationary stretch") {
    import spark.implicits._
    // 60 rows at level 10 (noise-free), then 60 at level 30: PH starts
    // climbing once the running mean lags the shifted data. A second key
    // stays flat and must never alarm (its terms are exactly -delta).
    val rows = (1L to 120L).map { i =>
      (i, i, "shift", if (i <= 60) 10.0 else 30.0)
    } ++ (1L to 120L).map(i => (200 + i, i, "flat", 10.0))
    val df = rows.toDF("id", "t", "k", "v")
    val out = StatsOps.pageHinkley(df, Seq("k"), Seq("t"), "v",
      delta = 1.0, lambda = 50.0).cache()
    assert(out.where(col("k") === "flat" && col("is_drift") === 1).count() == 0)
    val firstAlarm = out.where(col("k") === "shift" && col("is_drift") === 1)
      .agg(min("t")).as[Long].head()
    assert(firstAlarm > 60, s"alarm at t=$firstAlarm precedes the shift")
    assert(firstAlarm < 80, s"alarm at t=$firstAlarm is too late for a 20-point shift")
    // Once PH - min exceeds lambda under a sustained shift it stays up.
    assert(out.where(col("k") === "shift" && col("t") >= firstAlarm &&
      col("is_drift") === 0).count() == 0)
    out.unpersist()
  }

  test("rankPercentiles matches Spark's exact percentile (PERCENTILE_CONT)") {
    val ps = Seq(0.25, 0.5, 0.9)
    val got = StatsOps.rankPercentiles(ev, Seq("user_id"), "value", ps)
      .withColumnRenamed("pct", "got")
    // Spark's percentile UDAF is an independent implementation of the
    // same interpolation (it buffers groups in memory — fine in test).
    val exact = ev.groupBy("user_id")
      .agg(expr(s"percentile(value, array(${ps.mkString(",")}))").as("q"))
      .select(col("user_id"), posexplode(col("q")).as(Seq("i", "want")))
      .withColumn("p", element_at(array(ps.map(lit): _*), col("i") + 1))
    val joined = got.join(exact, Seq("user_id", "p")).cache()
    assert(joined.count() == got.count() && got.count() > 0)
    val bad = joined.where(abs(col("got") - col("want")) > 1e-4).count()
    assert(bad == 0, "rank-interpolated percentiles disagree with percentile()")
  }

  test("globalRank equals a global row_number in both directions") {
    val base = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
    def reference(asc: Boolean) = {
      val o = if (asc) Seq(col("cnt").asc, col("user_id").asc)
              else Seq(col("cnt").desc, col("user_id").asc)
      base.withColumn("want", row_number().over(Window.orderBy(o: _*)))
    }
    for (asc <- Seq(true, false)) {
      val got = StatsOps.globalRank(base, col("cnt"), col("user_id"), asc, "rk", bands = 8)
      val bad = got.join(reference(asc), Seq("user_id"))
        .where(col("rk") =!= col("want")).count()
      assert(bad == 0, s"globalRank(asc=$asc) diverges from global row_number")
    }
  }

  test("groupedGlobalRank equals a per-group row_number") {
    val base = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    val got = StatsOps.groupedGlobalRank(
      base, Seq("event_type"), col("cnt"), col("user_id"), "rk", bands = 8)
    val want = base.withColumn("want", row_number().over(
      Window.partitionBy("event_type").orderBy(col("cnt").asc, col("user_id").asc)))
    val bad = got.join(want, Seq("user_id", "event_type"))
      .where(col("rk") =!= col("want")).count()
    assert(bad == 0, "groupedGlobalRank diverges from per-group row_number")
  }

  test("globalRank is partition-count invariant") {
    val base = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val r1 = StatsOps.globalRank(base.coalesce(1), col("cnt"), col("user_id"), asc = true, "rk")
      .select("user_id", "rk")
    val r7 = StatsOps.globalRank(base.repartition(7), col("cnt"), col("user_id"), asc = true, "rk")
      .select("user_id", "rk")
    assert(r1.exceptAll(r7).count() == 0 && r7.exceptAll(r1).count() == 0)
  }

  test("rankedCumShare equals the sequential cumulative share and ends at 1") {
    val rev = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).as("rev"))
    val got = StatsOps.rankedCumShare(rev, col("o_custkey"), col("rev"))
    val w = Window.orderBy(col("rev").desc, col("o_custkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rev.agg(sum("rev")).head.getDecimal(0)
    val want = rev.withColumn("want",
      graft.functions.CleanFunctions.round4(
        sum("rev").over(w).cast("double") / lit(tot).cast("double")))
    val bad = got.join(want.select("o_custkey", "want"), Seq("o_custkey"))
      .where(col("cum_share") =!= col("want")).count()
    assert(bad == 0, "banded prefix share diverges from sequential cumsum")
    val last = got.agg(max("cum_share")).head.getDouble(0)
    assert(last == 1.0, s"cumulative share must end at exactly 1.0, got $last")
  }

  test("cusum starts at first deviation and sums to ~zero at series end") {
    val c = StatsOps.cusum(ev, Seq("user_id"), Seq("ts", "event_id"), "value")
    // S_n = sum(x) - n*mean == 0 by construction (up to the 4dp rounding).
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val lastRows = c.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
    val offZero = lastRows.where(abs(col("cusum")) > 1e-3).count()
    assert(offZero == 0, "per-series CUSUM must return to zero at the last sample")
    assert(c.count() == ev.count())
  }

  test("olsTrend recovers an exact line and nulls out zero x-variance") {
    import spark.implicits._
    val line  = (0 until 20).map(i => ("line", i.toDouble, 2.0 * i + 3.0))
    val const = (0 until 5).map(_ => ("constx", 7.0, 1.0))
    val got = StatsOps.olsTrend((line ++ const).toDF("k", "x", "y"),
        Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("line").getLong(1) == 20)
    assert(got("line").getDouble(2) == 2.0 && got("line").getDouble(3) == 3.0)
    assert(got("line").getDouble(4) == 1.0)
    assert(got("constx").isNullAt(2) && got("constx").isNullAt(3))
  }

  test("rollingSkewKurt: symmetric frame skew 0, known kurtosis, constant nulls") {
    import spark.implicits._
    // One key whose 4th frame is exactly [1,2,3,4] (symmetric), one
    // constant key (m2 = 0 -> nulls on every row).
    val df = Seq(("s", 1L, 1.0), ("s", 2L, 2.0), ("s", 3L, 3.0), ("s", 4L, 4.0),
      ("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0))
      .toDF("k", "i", "v")
    val got = StatsOps.rollingSkewKurt(df, Seq("k"), Seq("i"), "v", 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val s4 = got(("s", 4L))
    assert(s4.getAs[Long]("n_frame") == 4)
    assert(s4.getAs[Double]("roll_skew") == 0.0)
    // frame [1,2,3,4]: m2 = 1.25, m4 = 2.5625 -> excess kurt = -1.36
    assert(math.abs(s4.getAs[Double]("roll_kurt") - (-1.36)) < 1e-9)
    assert(got(("c", 3L)).isNullAt(got(("c", 3L)).fieldIndex("roll_skew")))
  }

  test("theilSen ignores the outlier day that drags OLS") {
    import spark.implicits._
    val days = (0L until 10L).map(d => ("u", d, if (d == 9) 100.0 else d.toDouble))
    val df = days.toDF("k", "day", "m")
    val ts = StatsOps.theilSen(df, Seq("k"), "day", "m").head.getDouble(1)
    assert(ts == 1.0, s"median pairwise slope should be the clean 1.0, got $ts")
    val ols = StatsOps.olsTrend(df, Seq("k"), col("day").cast("double"), col("m"))
      .head.getAs[Double]("slope")
    assert(ols > 3.0, s"OLS should be dragged by the outlier, got $ols")
  }

  test("bucketEntropy: constant series is 0, uniform over k buckets is ln k") {
    import spark.implicits._
    val df = (Seq.fill(40)("const" -> 5.2) ++
      (0 until 40).map(i => "unif" -> (i % 4).toDouble))
      .toDF("user_id", "value")
    val got = StatsOps.bucketEntropy(df, Seq("user_id"), "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("const") == 0.0)
    assert(math.abs(got("unif") - math.log(4.0)) < 1e-5)
  }

  test("lineitem_anova: F nonnegative, SSB + SSW ~ total SS, df sane") {
    val r = SparkEntry.queries("lineitem_anova")(spark, sfDir).head
    val (k, n) = (r.getAs[Long]("k"), r.getAs[Long]("n"))
    assert(k >= 2 && n > k)
    assert(r.getAs[Double]("f_stat") >= 0.0)
    assert(r.getAs[Double]("ssb") >= -1e-6 && r.getAs[Double]("ssw") >= 0.0)
  }
}
