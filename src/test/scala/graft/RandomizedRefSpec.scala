package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CleanFunctions
import graft.operators.{TimeSeriesOps => TS}

/** Seeded randomized tests against independent driver-side reference
  * models — the edge-case net the DuckDB oracles (which share the SQL
  * formulation) cannot provide. Every generator is seeded: failures
  * reproduce exactly.
  */
class RandomizedRefSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("cleanNumeric matches the documented contract on 300 decorated numerics") {
    val rng = new scala.util.Random(11)
    // Reference model: comma->dot, strip junk, collapse a second dot
    // (global regex replace, same as Spark's regexp_replace).
    def ref(s: String): Option[Double] = {
      val dotted = s.replace(',', '.')
      val stripped = dotted.replaceAll("[^0-9.]", "")
      val collapsed = stripped.replaceAll("(\\.[0-9]*)\\.", "$1")
      try { val d = collapsed.toDouble; if (d.isNaN) None else Some(d) }
      catch { case _: NumberFormatException => None }
    }
    val decorations = Seq[Double => String](
      d => f"€ $d%.2f",
      d => f"$d%.2f kWh",
      d => f"  $d%.1f  ",
      d => f"$d%.2f".replace('.', ','),        // comma decimal
      d => "%,.2f".formatLocal(java.util.Locale.GERMANY, d), // 1.234,56
      d => f"x$d%.0f~",
      _ => "n/a",
      _ => "--",
      _ => "")
    val cases = (1 to 300).map { i =>
      val d = (rng.nextDouble() - 0.3) * 10000
      (i.toLong, decorations(rng.nextInt(decorations.length))(math.abs(d)))
    }
    val got = cases.toDF("id", "s")
      .select(col("id"), CleanFunctions.cleanNumeric(col("s")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    cases.foreach { case (id, s) =>
      assert(got(id) == ref(s), s"cleanNumeric('$s'): got ${got(id)}, want ${ref(s)}")
    }
  }

  test("asofJoin matches a brute-force reference on 500 random rows") {
    val rng = new scala.util.Random(23)
    val leftRows = (1 to 500).map(i =>
      (i.toLong, rng.nextInt(5).toLong, rng.nextInt(10000).toLong, rng.nextDouble()))
    val rightRows = (1 to 200).map { i =>
      (rng.nextInt(5).toLong, rng.nextInt(10000).toLong, rng.nextDouble())
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique per (key, ts)
    val left = leftRows.toDF("event_id", "k", "tsu", "value")
    val right = rightRows.toDF("k", "tsu", "rv")
    val got = TS.asofJoin(left, right, Seq("k"), "tsu", Seq("rv"))
      .select(col("event_id"), col("asof_rv"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    leftRows.foreach { case (id, k, tsu, _) =>
      val want = rightRows.filter(r => r._1 == k && r._2 <= tsu)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == want, s"asof mismatch for event $id (k=$k tsu=$tsu)")
    }
  }

  test("sessionize matches a driver reference on random gap patterns") {
    val rng = new scala.util.Random(31)
    val gap = 100L
    val rows = (for (k <- 0 until 4) yield {
      var t = 0L
      (1 to 150).map { i =>
        t += (if (rng.nextBoolean()) rng.nextInt(100).toLong + 1  // within gap
              else 101L + rng.nextInt(500))                       // breaks session
        (k.toLong * 1000 + i, k.toLong, t)
      }
    }).flatten
    val got = TS.sessionize(rows.toDF("event_id", "k", "tsu"), Seq("k"), Seq("tsu", "event_id"),
        "tsu", gap)
      .select(col("event_id"), col("session_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (_, evs) =>
      var sid = 0L
      var prev = Long.MinValue
      evs.sortBy(e => (e._3, e._1)).foreach { case (id, _, t) =>
        if (prev == Long.MinValue || t - prev > gap) sid += 1
        assert(got(id) == sid, s"session mismatch for event $id")
        prev = t
      }
    }
  }

  test("twaResample matches a driver-side step-function reference on irregular data") {
    val rng = new scala.util.Random(31)
    val HourUs = 3600L * 1000000L
    // 4 series, irregular microsecond timestamps over ~6 hours, ~8% nulls,
    // occasional exact-duplicate timestamps (zero-weight samples).
    val rows = (1 to 400).map { i =>
      val ts = (rng.nextLong() % (6 * HourUs)).abs / 1000L * 1000L // ms-aligned
      val v = if (rng.nextDouble() < 0.08) None else Some((rng.nextDouble() - 0.5) * 200)
      (i.toLong, rng.nextInt(4).toLong, ts, v)
    }
    val df = rows.toDF("event_id", "user_id", "tsu", "value")
      .withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")
    val got = TS.twaResample(df, Seq("user_id"), "ts", Seq("ts", "event_id"), "value")
      .select(col("user_id"), unix_micros(col("bucket")).as("b"), col("twa"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    // Reference: per series, sorted by (ts, event_id); each non-null sample
    // holds until the next sample or its bucket end.
    // .toSeq before flatMap: flatMapping a Map with pair-valued output
    // builds another Map and silently dedups by (user, bucket) key.
    val ref = rows.filter(_._4.isDefined).groupBy(_._2).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._1))
      val withNext = sorted.zipAll(sorted.drop(1).map(e => Some(e._3)), null, None)
      withNext.map { case ((_, _, ts, Some(v)), next) =>
        val bucket = ts / HourUs * HourUs
        val end = bucket + HourUs
        val w = (math.min(next.getOrElse(end), end) - ts) / 1e6
        ((u, bucket), (w, v))
      }
    }.groupBy(_._1).map { case (k, ws) =>
      val sw = ws.map(_._2._1).sum
      k -> (if (sw == 0.0) None else Some(ws.map { case (_, (w, v)) => w * v }.sum / sw))
    }
    assert(got.keySet == ref.keySet, "bucket sets differ")
    ref.foreach { case (k, want) =>
      (got(k), want) match {
        case (Some(g), Some(r)) =>
          // The operator sums through DECIMAL(18,6) (1e-6 quantization per
          // term); the reference uses plain doubles — compare to 1e-4.
          assert(math.abs(g - r) < 1e-4, s"$k: got $g want $r")
        case (g, r) => assert(g == r, s"$k: got $g want $r")
      }
    }
  }

  test("winsorize matches a driver-side interpolated-percentile reference") {
    val rng = new scala.util.Random(37)
    val rows = (1 to 600).map(i =>
      (i.toLong, rng.nextInt(5).toLong, (rng.nextGaussian() * 50) + rng.nextInt(3) * 100))
    val got = graft.operators.Anomaly
      .winsorize(rows.toDF("event_id", "k", "v"), Seq("k"), "v", qLo = 0.1, qHi = 0.9)
      .select(col("event_id"), col("v_wins"), col("is_clamped"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // Reference: Spark's exact `percentile` is linear interpolation at
    // rank q*(n-1) over the sorted values.
    def pct(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted
      val rank = q * (s.length - 1)
      val lo = s(rank.toInt)
      val hi = s(math.min(rank.toInt + 1, s.length - 1))
      lo + (rank - rank.toInt) * (hi - lo)
    }
    rows.groupBy(_._2).foreach { case (_, evs) =>
      val vs = evs.map(_._3)
      val (lo, hi) = (pct(vs, 0.1), pct(vs, 0.9))
      evs.foreach { case (id, _, v) =>
        val want = math.min(math.max(v, lo), hi)
        val (gw, gc) = got(id)
        assert(math.abs(gw - want) < 1e-9, s"event $id: got $gw want $want")
        assert(gc == (if (v < lo || v > hi) 1L else 0L), s"event $id clamp flag")
      }
    }
  }

  test("saltedJoin equals the plain join on random skewed data") {
    val rng = new scala.util.Random(41)
    // 80% of large-side rows share one hot key — the salted join's reason to exist.
    val large = (1 to 2000).map { i =>
      val k = if (rng.nextDouble() < 0.8) 7L else rng.nextInt(50).toLong
      (i.toLong, k, rng.nextDouble())
    }.toDF("id", "k", "v")
    val small = (0 until 50).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val salted = graft.operators.JoinOps.saltedJoin(large, small, Seq("k"), salt = 6)
      .select("id", "k", "name")
    val plain = large.join(small, "k").select("id", "k", "name")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("rangeJoin equals the filter-based reference on random intervals") {
    val rng = new scala.util.Random(43)
    val facts = (1 to 1000).map(i => (i.toLong, rng.nextDouble() * 100)).toDF("id", "v")
    // Overlapping AND gapped intervals: rows may match several bands or none.
    val ivals = (1 to 20).map { b =>
      val lo = rng.nextDouble() * 90
      (b.toLong, lo, lo + rng.nextDouble() * 15)
    }.toDF("band", "lo", "hi")
    val got = graft.operators.JoinOps.rangeJoin(facts, ivals, "v", "lo", "hi")
      .select("id", "band")
    val want = facts.crossJoin(ivals)
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("overlapJoin equals the predicate cross join on random intervals, any span") {
    val rng = new scala.util.Random(53)
    def ivals(n: Int, id: String, lo: String, hi: String) =
      (1 to n).map { i =>
        val l = rng.nextInt(10000).toLong
        (i.toLong, l, l + rng.nextInt(300).toLong) // incl. zero-length points
      }.toDF(id, lo, hi)
    val a = ivals(300, "ida", "lo1", "hi1")
    val b = ivals(300, "idb", "lo2", "hi2")
    val want = a.crossJoin(b)
      .filter(col("lo1") <= col("hi2") && col("lo2") <= col("hi1"))
      .select("ida", "idb")
    for (span <- Seq(7L, 100L, 5000L)) { // smaller / near / larger than intervals
      val got = graft.operators.JoinOps.overlapJoin(a, b, "lo1", "hi1", "lo2", "hi2", span)
        .select("ida", "idb")
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"overlapJoin(span=$span) diverges from the predicate join")
      assert(got.count() == got.distinct().count(),
        s"overlapJoin(span=$span) emitted duplicate pairs — canonical-bucket guard broken")
    }
  }

  test("interpolateTime matches a driver-side reference on random gappy series") {
    val rng = new scala.util.Random(47)
    val rows = (1 to 600).map { i =>
      val v = if (rng.nextDouble() < 0.4) None else Some(rng.nextDouble() * 50)
      (i.toLong, rng.nextInt(4).toLong, rng.nextInt(100000).toLong, v)
    }.groupBy(r => (r._2, r._3)).map(_._2.head).toSeq // unique (key, t)
    val df = rows.toDF("id", "k", "tsec", "v")
      .withColumn("ts", timestamp_seconds(col("tsec")))
    val got = TS.interpolateTime(df, Seq("k"), "ts", Seq("ts", "id"), "v", "interp")
      .select("id", "interp").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    rows.groupBy(_._2).foreach { case (_, series) =>
      val s = series.sortBy(_._3)
      s.zipWithIndex.foreach { case ((id, _, t, v), i) =>
        val want: Option[Double] = v.orElse {
          val prev = s.take(i).reverse.find(_._4.isDefined)
          val next = s.drop(i + 1).find(_._4.isDefined)
          for (p <- prev; n <- next) yield
            p._4.get + (n._4.get - p._4.get) *
              ((t - p._3).toDouble / (n._3 - p._3).toDouble)
        }
        (got(id), want) match {
          case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-9, s"row $id: $g != $w")
          case (g, w) => assert(g.isDefined == w.isDefined, s"row $id null mismatch: $g vs $w")
        }
      }
    }
  }
}
