package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CleanFunctions

class CleanFunctionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("cleanNumeric handles the reference's locale formats") {
    // ref preprocessing.py:99-122: comma decimal, junk, coercion to null.
    val cases = Seq(
      "1.234,56" -> Some(1.23456), // a dot-grouped comma-decimal collapses
      "12,5"     -> Some(12.5),
      "€ 12,5 units" -> Some(12.5),
      "1000"     -> Some(1000.0),
      "-"        -> None,
      ""         -> None,
      "abc"      -> None)
    val got = cases.map(_._1).toDF("s")
      .select(CleanFunctions.cleanNumeric(col("s")).as("v")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    cases.map(_._2).zip(got).zip(cases.map(_._1)).foreach { case ((want, have), in) =>
      assert(want == have, s"cleanNumeric('$in')")
    }
  }

  test("toTsFmt parses the reference format and falls back to inference") {
    // ref preprocessing.py:10-49: '%b %d, %Y %I:%M %p' then inference.
    val fmt = "MMM d, yyyy h:mm a"
    val rows = Seq("Jan 5, 2024 3:30 PM", "2024-01-05 15:30:00", "not a date")
      .toDF("s").select(CleanFunctions.toTsFmt(col("s"), fmt).as("t")).collect()
    assert(rows(0).getTimestamp(0) == java.sql.Timestamp.valueOf("2024-01-05 15:30:00"))
    assert(rows(1).getTimestamp(0) == java.sql.Timestamp.valueOf("2024-01-05 15:30:00"))
    assert(rows(2).isNullAt(0))
  }

  test("month-name parsing survives a non-English JVM default locale") {
    // The CsvSource locale contract: catalyst's datetime formatter pins
    // Locale.US, so "Jan"/"PM" parse on a de-DE/fr-FR cluster exactly as
    // on en-US. Locale.setDefault is JVM-global, which in local mode
    // covers the executor threads evaluating the expression — if Spark
    // ever read the default locale, "Jan" would fail under FRANCE and
    // this test would catch the regression.
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.FRANCE)
      val rows = Seq("Jan 5, 2024 3:30 PM", "Aug 31, 2023 11:59 PM")
        .toDF("s")
        .select(CleanFunctions.toTsFmt(col("s"), "MMM d, yyyy h:mm a").as("t"))
        .collect()
      assert(rows(0).getTimestamp(0) == java.sql.Timestamp.valueOf("2024-01-05 15:30:00"))
      assert(rows(1).getTimestamp(0) == java.sql.Timestamp.valueOf("2023-08-31 23:59:00"))
    } finally java.util.Locale.setDefault(saved)
  }

  test("md5Hash64 is stable and 60-bit") {
    val vals = Seq("a", "b", "hello world").toDF("s")
      .select(CleanFunctions.md5Hash64(col("s")).as("h")).collect().map(_.getLong(0))
    assert(vals.forall(h => h >= 0 && h < (1L << 60)))
    // Spot value pinned against DuckDB: CAST(('0x'||substring(md5('a'),1,15)) AS BIGINT)
    val again = Seq("a").toDF("s")
      .select(CleanFunctions.md5Hash64(col("s")).as("h")).head().getLong(0)
    assert(again == vals(0))
  }

  test("exact decimal sums match plain double sums on tidy data") {
    val df = (1 to 1000).map(i => (i % 7, i * 0.01)).toDF("k", "v")
    val exact = df.groupBy("k").agg(CleanFunctions.exactSum(col("v")).as("s"))
    val plain = df.groupBy("k").agg(sum("v").as("p"))
    exact.join(plain, "k").collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("s") - r.getAs[Double]("p")) < 1e-9)
    }
  }

  test("round4Jvm/round6Jvm fast path is bit-identical to the BigDecimal formulation") {
    // r16 optimization fence: the Jvm replicas dropped the per-call
    // BigDecimal (Double.toString parse + alloc) for pure double
    // arithmetic. This property test pins the NEW implementation to the
    // OLD one — the exact semantics Catalyst's Round(double) has — over
    // seeded random magnitudes and every boundary class the equivalence
    // argument leans on.
    def ref(v: Double, scale: Double): Double =
      if (v.isNaN || v.isInfinite) v
      else {
        val scaled = v * scale
        if (scaled.isInfinite) scaled / scale
        else java.math.BigDecimal.valueOf(scaled)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / scale + 0.0
      }
    def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
    def check(v: Double): Unit = {
      val r4n = CleanFunctions.round4Jvm(v); val r4o = ref(v, 10000.0)
      val r6n = CleanFunctions.round6Jvm(v); val r6o = ref(v, 1000000.0)
      assert(bits(r4n) == bits(r4o) || (r4n.isNaN && r4o.isNaN),
        s"round4Jvm($v): new=$r4n old=$r4o")
      assert(bits(r6n) == bits(r6o) || (r6n.isNaN && r6o.isNaN),
        s"round6Jvm($v): new=$r6n old=$r6o")
    }
    // Boundary classes: exact half-integer ties at both scales (pos/neg),
    // the inexact-subtraction trap x = -(0.5 - 2^-54) scaled back, signed
    // zero, non-finite, overflow region, subnormals, 2^52/2^53 edges.
    val pow54 = math.pow(2.0, -54)
    val crafted = Seq(
      0.0, -0.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1.8e304, -1.8e304, Double.MaxValue / 1e4, Double.MinPositiveValue,
      -Double.MinPositiveValue, 4.9e-324, 1e-320,
      (0.5 - pow54) / 1e4, -(0.5 - pow54) / 1e4,
      (0.5 - pow54) / 1e6, -(0.5 - pow54) / 1e6,
      (0.5 + math.pow(2.0, -53)) / 1e6, -(0.5 + math.pow(2.0, -53)) / 1e6,
      math.pow(2.0, 52) / 1e6, (math.pow(2.0, 52) - 0.5) / 1e6,
      math.pow(2.0, 53) / 1e6, -(math.pow(2.0, 52) - 0.5) / 1e6) ++
      (-20 to 20).flatMap(n => Seq(
        (n + 0.5) / 1e4, (n + 0.5) / 1e6,   // exact ties
        (n + 0.49999999999) / 1e6, (n + 0.50000000001) / 1e6,
        n / 1e4, n / 1e6,
        math.nextUp((n + 0.5)) / 1e6, math.nextDown((n + 0.5)) / 1e6))
    crafted.foreach(check)
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      val mag = math.pow(10.0, rnd.nextInt(25) - 12)
      check((rnd.nextDouble() - 0.5) * mag)
      // near-tie stress: random integer + noise around .5 at round6 scale
      val n = rnd.nextInt(2000000) - 1000000
      check((n + 0.5 + (rnd.nextDouble() - 0.5) * 1e-12) / 1e6)
    }
  }
}
