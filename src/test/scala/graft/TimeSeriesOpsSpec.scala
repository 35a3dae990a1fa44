package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TimeSeriesOps => TS}
import graft.sources.Tables

class TimeSeriesOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val ev = Tables.events(spark, sfDir).cache()

  test("time features match pandas semantics (Mon=0, ISO week)") {
    import spark.implicits._
    val df = Seq(("2024-01-01 10:30:00"), ("2024-01-07 23:00:00")) // Mon, Sun
      .toDF("s").withColumn("ts", to_timestamp(col("s")))
    val r = TS.addTimeFeatures(df, "ts")
      .select("hour", "dayofweek", "is_weekend", "weekofyear", "quarter").collect()
    assert(r(0).getLong(0) == 10 && r(0).getLong(1) == 0 && r(0).getLong(2) == 0)
    assert(r(1).getLong(1) == 6 && r(1).getLong(2) == 1)
    assert(r(0).getLong(3) == 1 && r(0).getLong(4) == 1)
  }

  test("lag features shift within series, never across users") {
    val lagged = TS.addLags(ev, Seq("user_id"), Seq("ts", "event_id"), "value", Seq(1))
    // first row per user has null lag; all others equal previous value
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val check = lagged.withColumn("expected", lag(col("value"), 1).over(w))
      .filter((col("value_lag_1") =!= col("expected")) ||
        (col("value_lag_1").isNull =!= col("expected").isNull))
    assert(check.count() == 0)
    val firsts = lagged.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(firsts.filter(col("value_lag_1").isNotNull).count() == 0)
  }

  test("rolling mean uses PAST rows only (shift-1), min_periods=1") {
    val r = TS.addRolling(ev, Seq("user_id"), Seq("ts", "event_id"), "value", Seq(3), Seq("mean"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val withRn = r.withColumn("rn", row_number().over(w))
    // row 1: empty frame -> null; row 2: mean of exactly the previous value
    assert(withRn.filter(col("rn") === 1 && col("value_roll_mean_3h").isNotNull).count() == 0)
    val second = withRn.filter(col("rn") === 2)
      .withColumn("prev", lag(col("value"), 1).over(w))
    assert(second.filter(abs(col("value_roll_mean_3h") - col("prev")) > 1e-9).count() == 0)
  }

  test("ffill fills nulls with last prior value, residual zero") {
    val nulled = ev.withColumn("v",
      when(col("event_type") === "click", lit(null)).otherwise(col("value")))
    val filled = TS.fill(nulled, Seq("user_id"), Seq("ts", "event_id"), "v", "ffill")
    assert(filled.filter(col("v").isNull).count() == 0)
  }

  test("minmax scale lands in [0,1] per user") {
    val r = TS.minMaxScale(ev, Seq("user_id"), "value", "scaled")
    assert(r.filter(col("scaled") < 0 || col("scaled") > 1).count() == 0)
  }

  test("sequences: count = seriesLen - L + 1 per user, arrays are length L") {
    val L = 24
    val seq = TS.sequences(ev.withColumn("vs", col("value")), Seq("user_id"),
      Seq("ts", "event_id"), "vs", L)
    val perUser = ev.groupBy("user_id").count()
      .join(seq.groupBy("user_id").agg(count(lit(1)).as("nseq")), "user_id")
    assert(perUser.filter(col("nseq") =!= col("count") - (L - 1)).count() == 0)
    assert(seq.filter(size(col("seq")) =!= L).count() == 0)
  }

  test("dedup keep=first retains earliest event per bucket") {
    val d = TS.dedupIndex(ev, Seq("user_id"), date_trunc("hour", col("ts")),
      Seq("ts", "event_id"), "first")
    val grouped = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("b"))
      .agg(min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("want"))
    val got = d.select(col("event_id").as("got"), col("user_id"),
      date_trunc("hour", col("ts")).as("b"))
    assert(got.join(grouped, Seq("user_id", "b")).filter(col("got") =!= col("want")).count() == 0)
  }
}
