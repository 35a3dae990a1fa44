package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.CleanFunctions
import graft.functions.CleanFunctions.{exactSum, exactSumSql, round4, round4Sql, round6Sql}
import graft.operators.StatsOps
import graft.sources.Tables

/** Statistical-inference operators: distribution tests (Jarque–Bera,
  * Kruskal–Wallis, Brown–Forsythe), multiple-testing correction
  * (Benjamini–Hochberg FDR across the per-series test fleet), and OLS
  * influence diagnostics (leverage + Cook's distance) — the
  * "is this effect real across 100k series" layer on top of the
  * detector suite (reference scope: the EDA notebooks' normality /
  * group-difference probes, scaled to a series fleet).
  *
  * Scale notes: every test here is a grouped aggregate or a keyed
  * window over exact DECIMAL moments — no global sort anywhere. The
  * two cross-series stages (Kruskal–Wallis global ranks, BH's ordered
  * p-value scan) go through StatsOps' banded two-level decompositions
  * whose only driver-visible stage is O(bands). p-values use the shared
  * engine-portable normal CDF (CleanFunctions.normalCdf — A&S 7.1.26
  * polynomial over round4-quantized z, identical literals both
  * engines).
  */
object InferenceQueries {

  private val Dec38 = DecimalType(38, 6)

  /** chi²(2) 95% critical value for the JB decision, one shared literal. */
  private val Chi2Crit2df = 5.9915

  /** BH significance level. */
  private val FdrQ = 0.05

  /** Apdex satisfied threshold T (tolerating up to 4T), sized to the
    * events value scale (mean ≈ 50).
    */
  private val ApdexT = 50.0

  /** Capacity threshold for ts_capacity_eta (~mean + 2σ of the value
    * scale — a minority of trending series cross it).
    */
  private val CapacityC = 150.0

  private def dlit(x: Double): String = CleanFunctions.dlitSql(x)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Jarque–Bera normality test per series: JB = n/6 (S² + K²/4) from
    // one pass of DECIMAL power sums (the grouped sibling of
    // StatsOps.rollingSkewKurt — same 4dp-quantized vᵖ terms, same
    // IEEE op order, same sqrt(m₂³)-not-pow discipline). The decision
    // compares the ROUNDED statistic against the shared chi²(2)
    // critical literal so both engines flag identically; constant
    // series (m₂=0) yield null S/K/JB and flag 0 via the nullif guard.
    "ts_jarque_bera" -> { (s, d) =>
      val v = col("value")
      val m = Tables.events(s, d).where(v.isNotNull)
        .groupBy("user_id").agg(
          count(lit(1)).cast(DoubleType).as("n"),
          exactSum(v).as("s1"),
          sum(round4(v * v).cast(Dec38)).cast(DoubleType).as("s2"),
          sum(round4(v * v * v).cast(Dec38)).cast(DoubleType).as("s3"),
          sum(round4(v * v * v * v).cast(Dec38)).cast(DoubleType).as("s4"))
      val n = col("n"); val mean = col("s1") / n
      val m2 = greatest(col("s2") / n - mean * mean, lit(0.0))
      val m3 = col("s3") / n - lit(3.0) * mean * (col("s2") / n) +
        lit(2.0) * mean * mean * mean
      val m4 = col("s4") / n - lit(4.0) * mean * (col("s3") / n) +
        lit(6.0) * (mean * mean) * (col("s2") / n) -
        lit(3.0) * (mean * mean) * (mean * mean)
      m.withColumn("skew", round4(m3 / nullif(sqrt(m2 * m2 * m2), lit(0.0))))
        .withColumn("ex_kurt", round4(m4 / nullif(m2 * m2, lit(0.0)) - lit(3.0)))
        .withColumn("jb", round4((n / lit(6.0)) *
          (col("skew") * col("skew") + col("ex_kurt") * col("ex_kurt") / lit(4.0))))
        .select(col("user_id"), n.cast(LongType).as("n_obs"),
          col("skew"), col("ex_kurt"), col("jb"),
          when(col("jb") > lit(Chi2Crit2df), lit(1L)).otherwise(lit(0L)).as("is_nonnormal"))
        .orderBy("user_id")
    },

    // Anderson–Darling normality test per series — the TAIL-WEIGHTED
    // companion of ts_jarque_bera (JB reads two moments; A² integrates
    // squared CDF error with 1/[F(1−F)] weight, so tail departures that
    // leave skew/kurtosis near 0 still score) and of events_ks_test
    // (KS's sup-norm is tail-blind for the same reason). Identity used:
    // Σ(2i−1)[ln p_(i) + ln(1−p_(n+1−i))] = Σ_i [(2i−1)ln p_i +
    // (2n+1−2i)ln(1−p_i)] after substituting j = n+1−i in the second
    // term — so ONE pass per row, no reverse-rank self-join. z is
    // 4dp-pinned before the shared portable normal CDF (its input
    // contract), p clamped to [1e-15, 1−1e-15] with identical literals
    // so ln never hits −∞, per-row terms 6dp-pinned into the exact
    // DECIMAL sum. A*² = A²(1 + 0.75/n + 2.25/n²) vs the 0.752
    // D'Agostino 5% critical value (mean+variance estimated). Rank
    // windows are per-series (the standard partition), moments from one
    // grouped exact pass.
    "ts_anderson_darling" -> { (s, d) =>
      val v = col("value")
      val m = Tables.events(s, d).where(v.isNotNull)
        .groupBy("user_id").agg(
          count(lit(1)).cast(DoubleType).as("n"),
          exactSum(v).as("sx"),
          exactSum(v * v).as("sxx"))
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("sd", CleanFunctions.momentStd(col("n"), col("sx"), col("sxx")))
        .where(col("sd") > 0.0)
      val w = Window.partitionBy("user_id").orderBy("value", "event_id")
      val ranked = Tables.events(s, d).where(v.isNotNull)
        .join(m.select("user_id", "n", "mean", "sd"), "user_id")
        .withColumn("i", row_number().over(w).cast(DoubleType))
        .withColumn("z", round4((v - col("mean")) / col("sd")))
        .withColumn("phi", CleanFunctions.normalCdf(col("z")))
        .withColumn("p", greatest(least(col("phi"), lit(0.999999999999999)),
          lit(1.0e-15)))
        .withColumn("term", CleanFunctions.round6(
          (lit(2.0) * col("i") - lit(1.0)) * log(col("p")) +
            (lit(2.0) * col("n") + lit(1.0) - lit(2.0) * col("i")) *
              log(lit(1.0) - col("p"))))
      val a2 = -col("n") - col("s") / col("n")
      val a2adj = a2 * (lit(1.0) + lit(0.75) / col("n") +
        lit(2.25) / (col("n") * col("n")))
      ranked.groupBy("user_id")
        .agg(max(col("n")).as("n"), exactSum(col("term")).as("s"))
        .select(col("user_id"), col("n").cast(LongType).as("n_obs"),
          round4(a2).as("a2"), round4(a2adj).as("a2_adj"),
          when(round4(a2adj) > lit(0.752), lit(1L)).otherwise(lit(0L))
            .as("is_nonnormal"))
        .orderBy("user_id")
    },

    // Kruskal–Wallis rank ANOVA across event types on value — the
    // k-group nonparametric sibling of events_mannwhitney. Global
    // average ranks come from the banded StatsOps.globalRank + tie
    // join; H uses the mean-rank identity H = 12/(N(N+1)) Σ nⱼ(r̄ⱼ −
    // (N+1)/2)² so every summed term stays ≤ nⱼ·N² /4 ≈ 1e10 at sf0.1
    // (inside the DECIMAL(18,6) exact-sum envelope after round4 — the
    // Σrⱼ²/nⱼ textbook form overflows it at 1e13). Tie correction is
    // INTEGER-exact (Σ t³−t as BIGINT).
    "events_kruskal_wallis" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("event_type"), col("value"))
      val ranked = StatsOps.globalRank(e, col("value"), col("event_id"),
        asc = true, "rk")
      val ties = ranked.groupBy("value").agg(
        ((min(col("rk")) + max(col("rk"))).cast(DoubleType) / 2.0).as("ar"),
        count(lit(1)).as("t"))
      val tsum = ties.agg(
        sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      val grp = ranked.join(ties.select("value", "ar"), "value")
        .groupBy("event_type").agg(
          count(lit(1)).cast(DoubleType).as("nj"),
          exactSum(col("ar")).as("rj"))
      val tot = grp.agg(sum(col("nj")).as("nn"), count(lit(1)).as("k"))
      val c = (col("nn") + lit(1.0)) / 2.0
      val term = col("nj") * (col("rj") / col("nj") - c) * (col("rj") / col("nj") - c)
      val agg = grp.crossJoin(broadcast(tot))
        .agg(first(col("nn")).as("nn"), first(col("k")).as("k"),
          exactSum(round4(term)).as("ssq"))
        .crossJoin(broadcast(tsum))
      val h = lit(12.0) / (col("nn") * (col("nn") + lit(1.0))) * col("ssq")
      val dcorr = lit(1.0) - col("tsum").cast(DoubleType) /
        (col("nn") * col("nn") * col("nn") - col("nn"))
      agg.select(
        col("nn").cast(LongType).as("n"),
        col("k").cast(LongType).as("k_groups"),
        round4(h).as("h"),
        round4(h / nullif(dcorr, lit(0.0))).as("h_adj"))
    },

    // Friedman rank test — the BLOCKED companion of Kruskal–Wallis:
    // each complete day is a block, event types are the treatments, and
    // ranking WITHIN the day removes day-to-day level shifts that KW's
    // global ranks would read as a group effect (weekend volume swamps
    // any real between-type difference in an unblocked test). Blocks =
    // days where every type appears; per-day midranks from the
    // (min+max)/2 row-number trick on the 6dp-pinned daily means;
    // χ²_F = 12/(bk(k+1))·ΣRj² − 3b(k+1), plus Kendall's W = χ²/(b(k−1))
    // as the effect size. Rank windows are per-day (bounded k rows per
    // partition at any scale); the cross-type fold is O(k).
    "events_friedman" -> { (s, d) =>
      val md = Tables.events(s, d).where(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(CleanFunctions.round6(CleanFunctions.exactMean(col("value"))).as("m"))
      val k = md.select("event_type").distinct().agg(count(lit(1)).as("k"))
      val full = md
        .withColumn("nt", count(lit(1)).over(Window.partitionBy("day")))
        .crossJoin(broadcast(k)).where(col("nt") === col("k"))
      val rnW = Window.partitionBy("day").orderBy(col("m"), col("event_type"))
      val withRn = full.withColumn("rn", row_number().over(rnW))
      val mid = withRn.groupBy("day", "m").agg(
        ((min(col("rn")) + max(col("rn"))).cast(DoubleType) / 2.0).as("ar"))
      val rj = withRn.join(mid, Seq("day", "m"))
        .groupBy("event_type").agg(count(lit(1)).as("b"), exactSum(col("ar")).as("rj"))
      val agg = rj.agg(count(lit(1)).as("kk"), max(col("b")).as("b"),
        exactSum(round4(col("rj") * col("rj"))).as("srj2"))
      val bD = col("b").cast(DoubleType)
      val kD = col("kk").cast(DoubleType)
      val chi2 = lit(12.0) / (bD * kD * (kD + 1.0)) * col("srj2") -
        lit(3.0) * bD * (kD + 1.0)
      agg.select(col("b").as("n_blocks"), col("kk").as("k_groups"),
        round4(chi2).as("chi2_f"),
        round4(CleanFunctions.safeDiv(chi2, bD * (kD - 1.0))).as("kendall_w"))
    },

    // Brown–Forsythe (median-centered Levene) homogeneity-of-variance
    // test of l_quantity across return flags. Group medians come from
    // the DISCRETE value domain (quantities are small integers): per
    // (flag, qty) counts + a ≤50-row keyed cumulative window — no
    // per-group value buffering at any scale. |x − medⱼ| terms are
    // exact halves, so every moment is DECIMAL-exact; the k-row
    // between/within sums are round4-quantized before the exact sum so
    // group iteration order cannot drift the statistic.
    "lineitem_levene" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
        col("l_quantity").as("qty"))
      val counts = li.groupBy("flag", "qty").agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy("flag").orderBy("qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = counts.withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("ntot", sum(col("cnt")).over(Window.partitionBy("flag")))
      val meds = cum
        .withColumn("p1", expr("(ntot + 1) DIV 2"))
        .withColumn("p2", expr("(ntot + 2) DIV 2"))
        .groupBy("flag").agg(
          min(when(col("cum") >= col("p1"), col("qty"))).as("v1"),
          min(when(col("cum") >= col("p2"), col("qty"))).as("v2"))
        .select(col("flag"), ((col("v1") + col("v2")) / lit(2.0)).as("med"))
      val z = li.join(broadcast(meds), "flag")
        .select(col("flag"), abs(col("qty") - col("med")).as("z"))
      val g = z.groupBy("flag").agg(
        count(lit(1)).cast(DoubleType).as("nj"),
        exactSum(col("z")).as("sz"),
        exactSum(col("z") * col("z")).as("szz"))
      val tot = g.agg(sum(col("nj")).as("nn"), count(lit(1)).as("k"),
        exactSum(col("sz")).as("sgz"))
      val gm = col("sgz") / col("nn")
      val between = col("nj") * (col("sz") / col("nj") - gm) * (col("sz") / col("nj") - gm)
      val within = col("szz") - col("sz") * col("sz") / col("nj")
      val agg = g.crossJoin(broadcast(tot))
        .agg(first(col("nn")).as("nn"), first(col("k")).as("k"),
          exactSum(round4(between)).as("ssb"),
          exactSum(round4(within)).as("ssw"))
      val w = ((col("nn") - col("k").cast(DoubleType)) / (col("k").cast(DoubleType) - lit(1.0))) *
        (col("ssb") / nullif(col("ssw"), lit(0.0)))
      agg.select(col("nn").cast(LongType).as("n"),
        col("k").cast(LongType).as("k_groups"),
        round4(w).as("w_stat"),
        (col("k") - lit(1L)).cast(LongType).as("df1"),
        (col("nn").cast(LongType) - col("k")).as("df2"))
    },

    // Benjamini–Hochberg FDR across the per-series trend fleet: each
    // series gets a sign-test z on its daily-mean first differences
    // (integer counts → exact z), a two-sided p from the shared
    // engine-portable normal CDF, then the BH step-up over ALL series —
    // the multiple-testing layer every 100k-series anomaly sweep needs
    // (raw p<0.05 would flag 5k false series). The ordered-p scan is
    // banded: rank via StatsOps.globalRank, suffix-min of p·m/i via
    // per-band windows + an O(bands²) broadcast band-minima join — no
    // single-partition window over the fleet.
    "ts_fdr_bh" -> { (s, d) =>
      val daily = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("day", expr("tsu DIV 86400000000"))
        .groupBy("user_id", "day")
        .agg(round4(CleanFunctions.exactMean(col("value"))).as("m"))
      val wd = Window.partitionBy("user_id").orderBy("day")
      val sg = daily.withColumn("prev", lag(col("m"), 1).over(wd))
        .where(col("prev").isNotNull)
        .select(col("user_id"),
          when(col("m") > col("prev"), lit(1L))
            .when(col("m") < col("prev"), lit(-1L)).otherwise(lit(0L)).as("sg"))
      // One row per series. NOT cached: the frame feeds the m-count, the
      // rank pass and the band minima, but a .cache() barrier here
      // measured 4x SLOWER end-to-end (10.6 s vs 2.7 s at sf0.1) — the
      // recomputed branches all collapse into the same whole-stage
      // codegen'd scan and Spark's shuffle reuse already dedups the
      // heavy daily aggregate, while the cache forces materialization +
      // a non-codegen InMemoryScan on every downstream branch.
      val per = sg.groupBy("user_id").agg(
        sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("npos"),
        sum(when(col("sg") =!= 0L, 1L).otherwise(0L)).as("nd"))
        .where(col("nd") > 0L)
        .withColumn("z", round4((lit(2.0) * col("npos") - col("nd")) /
          sqrt(col("nd").cast(DoubleType))))
        .withColumn("p", round4(lit(2.0) *
          (lit(1.0) - CleanFunctions.normalCdf(abs(col("z"))))))
      val m = per.agg(count(lit(1)).as("mtests"))
      val ranked = StatsOps.globalRank(
          per.crossJoin(broadcast(m)), col("p"), col("user_id"),
          asc = true, "i")
        .withColumn("q", col("p") * col("mtests").cast(DoubleType) /
          col("i").cast(DoubleType))
      // Banded suffix min of q over ascending rank i (mirror of
      // globalRank's two-level shape; the oracle uses a plain suffix
      // window — same values, different physical plan).
      val banded = ranked.withColumn("bb", expr("((i - 1) * 64) DIV mtests"))
      val wsuf = Window.partitionBy("bb").orderBy(col("i"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val inband = banded.withColumn("minin", min(col("q")).over(wsuf))
      val bmins = banded.groupBy("bb").agg(min(col("q")).as("bmin"))
      val later = bmins.select(col("bb").as("b2"), col("bmin").as("bmin2"))
      val laterMin = bmins.join(broadcast(later), col("b2") > col("bb"), "left")
        .groupBy("bb").agg(min(col("bmin2")).as("latermin"))
      inband.join(broadcast(laterMin), Seq("bb"))
        .withColumn("padj", round4(least(lit(1.0),
          when(col("latermin").isNull, col("minin"))
            .otherwise(least(col("minin"), col("latermin"))))))
        .select(col("user_id"), col("nd").as("n_diffs"), col("z"), col("p"),
          col("padj").as("p_adj"),
          when(col("padj") <= lit(FdrQ), lit(1L)).otherwise(lit(0L)).as("is_sig"))
        .orderBy("user_id")
    },

    // OLS influence diagnostics per series: leverage hᵢ and Cook's
    // distance Dᵢ for the hour-index trend fit — which single
    // observations steer each series' trend line (the robustness
    // companion of ts_ols_trend / ts_theilsen). Everything rides ONE
    // user_id partitioning: min-ts, the six DECIMAL moments and the
    // per-row formulas are windows over the same partition spec — one
    // exchange, no join. Degenerate fits (n ≤ 2 or zero x-variance)
    // yield null diagnostics via nullif guards.
    "ts_influence" -> { (s, d) =>
      val wp = Window.partitionBy("user_id")
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("mn", min(col("tsu")).over(wp))
        .withColumn("x", expr("(tsu - mn) DIV 3600000000").cast(DoubleType))
        .withColumn("y", col("value"))
      val mom = e
        .withColumn("n", count(lit(1)).over(wp).cast(DoubleType))
        .withColumn("sx", CleanFunctions.exactSumOver(col("x"), wp))
        .withColumn("sy", CleanFunctions.exactSumOver(col("y"), wp))
        .withColumn("sxy", CleanFunctions.exactSumOver(col("x") * col("y"), wp))
        .withColumn("sxx", CleanFunctions.exactSumOver(col("x") * col("x"), wp))
        .withColumn("syy", CleanFunctions.exactSumOver(col("y") * col("y"), wp))
      val n = col("n")
      val sxxc = col("sxx") - col("sx") * col("sx") / n
      val b = (n * col("sxy") - col("sx") * col("sy")) /
        nullif(n * col("sxx") - col("sx") * col("sx"), lit(0.0))
      val a = (col("sy") - b * col("sx")) / n
      val eres = col("y") - a - b * col("x")
      val h = lit(1.0) / n +
        (col("x") - col("sx") / n) * (col("x") - col("sx") / n) / nullif(sxxc, lit(0.0))
      val sse = greatest(col("syy") - a * col("sy") - b * col("sxy"), lit(0.0))
      val s2 = sse / nullif(n - lit(2.0), lit(0.0))
      val dcook = eres * eres * h /
        nullif(lit(2.0) * s2 * (lit(1.0) - h) * (lit(1.0) - h), lit(0.0))
      mom
        .withColumn("leverage", round4(h))
        .withColumn("cooks_d", round4(dcook))
        .select(col("event_id"), col("leverage"), col("cooks_d"),
          when(col("cooks_d") > lit(4.0) / n, lit(1L)).otherwise(lit(0L))
            .as("is_influential"))
        .orderBy("event_id")
    },

    // James–Stein / empirical-Bayes shrinkage of the per-series means
    // toward the grand mean — the fleet-estimation primitive (a 100k-
    // series dashboard should NOT trust 30-observation raw means; the
    // JS estimator dominates them in total squared error). Equal-
    // variance approximation: c = max(0, 1 − (k−3)·v̄ / Σ(m̄ⱼ−m̄)²) with
    // v̄ the pooled within-series variance over the mean sample sizes.
    // Three bounded passes: per-series moments, k-row totals
    // (broadcast), per-series output — every cross-series sum is
    // round4-quantized into the DECIMAL envelope so group order can't
    // drift it.
    "ts_james_stein" -> { (s, d) =>
      val v = col("value")
      val g = Tables.events(s, d).where(v.isNotNull)
        .groupBy("user_id").agg(
          count(lit(1)).cast(DoubleType).as("nj"),
          exactSum(v).as("sz"),
          exactSum(round4(v * v)).as("szz"))
        .withColumn("mj", round4(col("sz") / col("nj")))
      val tot = g.agg(
        sum(col("nj")).as("nn"),
        count(lit(1)).cast(DoubleType).as("k"),
        exactSum(col("mj")).as("sm"),
        exactSum(round4(col("szz") - col("sz") * col("sz") / col("nj"))).as("ssw"),
        exactSum(round4(lit(1.0) / col("nj"))).as("sinv"))
      val j = g.crossJoin(broadcast(tot))
      val gm = col("sm") / col("k")
      val ss = j.select(round4((col("mj") - gm) * (col("mj") - gm)).as("t"))
        .agg(exactSum(col("t")).as("ss"))
      val vbar = (col("ssw") / (col("nn") - col("k"))) * (col("sinv") / col("k"))
      val c = when(col("ss") > 0.0,
        greatest(lit(0.0), lit(1.0) - (col("k") - lit(3.0)) * vbar / col("ss")))
        .otherwise(lit(0.0))
      j.crossJoin(broadcast(ss))
        .withColumn("shrink_c", round4(c))
        .select(col("user_id"), col("nj").cast(LongType).as("n_obs"),
          col("mj").as("raw_mean"),
          round4(gm + col("shrink_c") * (col("mj") - gm)).as("shrunk_mean"),
          col("shrink_c"))
        .orderBy("user_id")
    },

    // Historical VaR(95) + expected shortfall per series on the step
    // changes (first differences) — "how bad is a bad step, and how bad
    // is the average of the bad steps": the tail-risk summary of each
    // series' movement distribution. The quantile is the exact rank-
    // interpolated PERCENTILE_CONT via StatsOps.rankPercentiles (no
    // per-group buffering); ES is one conditional exact-mean over the
    // diffs at or below the rounded VaR.
    "ts_var_es" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val diffs = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("dv", round4(col("value") - lag(col("value"), 1).over(w)))
        .where(col("dv").isNotNull)
        .select(col("user_id"), col("event_id"), col("dv"))
      val varq = StatsOps.rankPercentiles(diffs, Seq("user_id"), "dv", Seq(0.05))
        .select(col("user_id"), col("pct").as("var95"))
      diffs.join(varq, "user_id")
        .groupBy("user_id").agg(
          count(lit(1)).as("n_diffs"),
          first(col("var95")).as("var95"),
          round4(exactSum(when(col("dv") <= col("var95"), col("dv"))) /
            count(when(col("dv") <= col("var95"), lit(1)))).as("es95"))
        .orderBy("user_id")
    },

    // Good–Turing count-of-counts over the PER-DOCUMENT term
    // frequencies: N_r = #(doc, term) pairs with tf = r, and the
    // smoothed count r* = (r+1)·N_{r+1}/N_r — the Good–Turing
    // adjusted-frequency table language-model smoothing reads its
    // discounts from. Per-document tf (not corpus-level type counts)
    // because the r-domain is then scale-invariant: doc length bounds
    // r, so the r ≤ 10 head stays populated at any corpus size (the
    // synthetic corpus has only 31 word types, every one frequent —
    // corpus-level N_{r≤10} is empty at EVERY sf). One tokenize +
    // two-level count aggregate; the ≤11-row table joins to itself
    // broadcast. Rows whose r+1 count is absent yield null r*.
    "text_good_turing" -> { (s, d) =>
      val toks = Tables.spread(Tables.documents(s, d), col("doc_id"))
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("r"))
      val coc = tf.groupBy("r").agg(count(lit(1)).as("n_r")).where(col("r") <= 11L)
      val nxt = coc.select((col("r") - 1L).as("r"), col("n_r").as("n_r1"))
      coc.where(col("r") <= 10L).join(broadcast(nxt), Seq("r"), "left")
        .select(col("r"), col("n_r"),
          round4((col("r") + lit(1L)).cast(DoubleType) * col("n_r1").cast(DoubleType) /
            col("n_r").cast(DoubleType)).as("r_star"))
        .orderBy("r")
    },

    // Apdex score per event type: satisfied (value ≤ T) + half-credit
    // tolerating (T < value ≤ 4T) over all samples — THE contractual
    // SRE satisfaction metric, here with T sized to the value scale.
    // One integer-exact grouped aggregate.
    "events_apdex" -> { (s, d) =>
      val v = col("value")
      Tables.events(s, d).where(v.isNotNull)
        .groupBy("event_type").agg(
          count(lit(1)).as("n_samples"),
          count(when(v <= lit(ApdexT), 1)).as("satisfied"),
          count(when(v > lit(ApdexT) && v <= lit(4.0 * ApdexT), 1)).as("tolerating"))
        .withColumn("apdex", round4(
          (col("satisfied").cast(DoubleType) + col("tolerating").cast(DoubleType) / 2.0) /
            col("n_samples").cast(DoubleType)))
        .orderBy("event_type")
    },

    // Capacity ETA per series: project the OLS hour-trend to the shared
    // capacity threshold — "which series run out of headroom, and
    // when" (the capacity-planning read of ts_ols_trend). Fitted level
    // and slope come ROUNDED from StatsOps.olsTrend so the ETA
    // arithmetic is engine-identical; flat/declining series yield null
    // ETA, already-over-capacity series ETA 0.
    "ts_capacity_eta" -> { (s, d) =>
      val wp = Window.partitionBy("user_id")
      val prep = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("mn", min(col("tsu")).over(wp))
        .withColumn("x", expr("(tsu - mn) DIV 3600000000").cast(DoubleType))
      val fit = StatsOps.olsTrend(prep, Seq("user_id"), col("x"), col("value"))
      val xm = prep.groupBy("user_id").agg(max(col("x")).as("xmax"))
      fit.join(xm, "user_id")
        .withColumn("level", round4(col("intercept") + col("slope") * col("xmax")))
        .withColumn("eta_hours", when(col("slope") > 0.0,
          round4(greatest(lit(0.0), (lit(CapacityC) - col("level")) / col("slope")))))
        .select(col("user_id"), col("slope"), col("level"), col("eta_hours"),
          when(col("eta_hours").isNotNull && col("eta_hours") <= lit(720.0), lit(1L))
            .otherwise(lit(0L)).as("breach_30d"))
        .orderBy("user_id")
    },

    // HBOS — histogram-based outlier score (Goldstein & Dengel 2012):
    // per-feature histogram densities multiplied (= log-densities
    // summed, negated) over two independent features, the value's
    // global 10-bin band and the hour-of-day. The fully-unsupervised
    // detector that needs NO per-series state — score any row against
    // the corpus in one pass: two tiny count aggregates broadcast back
    // onto the scan, every bin decision from identical IEEE floor math.
    "events_hbos" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), hour(col("ts")).cast(LongType).as("hb"),
          col("value").as("v"))
      val stats = e.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n"))
      val binned = e.crossJoin(broadcast(stats))
        .withColumn("vb", when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(9L),
            floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / lit(10.0)))
              .cast(LongType))))
      val vc = binned.groupBy("vb").agg(count(lit(1)).as("vcnt"))
      val hc = binned.groupBy("hb").agg(count(lit(1)).as("hcnt"))
      binned.join(broadcast(vc), "vb").join(broadcast(hc), "hb")
        .withColumn("hbos", round4(-(log(col("vcnt").cast(DoubleType) / col("n")) +
          log(col("hcnt").cast(DoubleType) / col("n")))))
        .select(col("event_id"), col("vb"), col("hb"), col("hbos"))
        .orderBy("event_id")
    },

    // Forecast-accuracy scoreboard: naive / seasonal-naive / drift
    // forecasters scored per series on a 7-day holdout with sMAPE and
    // MASE (scaled by the train in-sample naive MAE — the
    // scale-free "is this model better than persistence" number every
    // forecasting bakeoff reports). Long output: one row per (series,
    // model). All forecasts quantized 4dp before the error arithmetic;
    // the only cross-row state is keyed windows + per-series train
    // aggregates joined back on user_id.
    "ts_forecast_accuracy" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("day", expr("tsu DIV 86400000000"))
        .withColumn("hod", expr("(tsu DIV 3600000000) % 24"))
      val split = e.agg((max(col("day")) - lit(6L)).as("splitday"))
      val ds = e.crossJoin(broadcast(split))
      val train = ds.where(col("day") < col("splitday"))
      val test = ds.where(col("day") >= col("splitday"))
      val wtr = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val trRanked = train
        .withColumn("rn", row_number().over(wtr))
        .withColumn("nt", count(lit(1)).over(Window.partitionBy("user_id")))
        .withColumn("dprev", abs(col("value") - lag(col("value"), 1).over(wtr)))
      val trStats = trRanked.groupBy("user_id").agg(
        min(when(col("rn") === 1L, col("value"))).as("firstv"),
        min(when(col("rn") === col("nt"), col("value"))).as("lastv"),
        max(col("nt")).as("nt"),
        round4(CleanFunctions.exactMean(col("dprev"))).as("mae_naive_tr"))
      val prof = train.groupBy("user_id", "hod")
        .agg(round4(CleanFunctions.exactMean(col("value"))).as("fc_snaive"))
      val wte = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val t2 = test
        .withColumn("h", row_number().over(wte).cast(DoubleType))
        .join(trStats, "user_id")
        .join(prof, Seq("user_id", "hod"), "left")
        .withColumn("slope", (col("lastv") - col("firstv")) /
          nullif(col("nt").cast(DoubleType) - lit(1.0), lit(0.0)))
        .withColumn("fc_naive", col("lastv"))
        .withColumn("fc_drift", round4(col("lastv") + col("slope") * col("h")))
      def metrics(fcCol: String, name: String): DataFrame =
        t2.select(col("user_id"), col("value").as("y"), col(fcCol).as("f"),
            col("mae_naive_tr"))
          .where(col("f").isNotNull)
          .withColumn("e", col("y") - col("f"))
          .withColumn("sm", CleanFunctions.round6(lit(2.0) * abs(col("e")) /
            nullif(abs(col("y")) + abs(col("f")), lit(0.0))))
          .groupBy("user_id").agg(
            count(lit(1)).as("n_test"),
            round4(CleanFunctions.exactMean(col("sm"))).as("smape"),
            round4(CleanFunctions.exactMean(abs(col("e"))) /
              nullif(max(col("mae_naive_tr")), lit(0.0))).as("mase"))
          .withColumn("model", lit(name))
      metrics("fc_naive", "naive")
        .unionByName(metrics("fc_snaive", "snaive"))
        .unionByName(metrics("fc_drift", "drift"))
        .select(col("user_id"), col("model"), col("n_test"), col("smape"), col("mase"))
        .orderBy("user_id", "model")
    },

    // Forecast combination (Bates & Granger 1969): inverse-sMAPE
    // weighted blend of the naive/seasonal-naive/drift forecasters,
    // weights fitted on the first 3 holdout days (validation) and
    // scored on the last 4 — the "combinations beat components"
    // classic, with the honest split so the weights never see the
    // scoring window. Shares ts_forecast_accuracy's exact forecast
    // derivations; weights and per-row blends 6dp/4dp-pinned; rows
    // without a seasonal profile are dropped consistently for ALL
    // models so every forecaster faces the same test set.
    "ts_forecast_combo" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("day", expr("tsu DIV 86400000000"))
        .withColumn("hod", expr("(tsu DIV 3600000000) % 24"))
      val split = e.agg((max(col("day")) - lit(6L)).as("splitday"))
      val ds = e.crossJoin(broadcast(split))
      val train = ds.where(col("day") < col("splitday"))
      val test = ds.where(col("day") >= col("splitday"))
      val wtr = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val trRanked = train.withColumn("rn", row_number().over(wtr))
        .withColumn("nt", count(lit(1)).over(Window.partitionBy("user_id")))
      val trStats = trRanked.groupBy("user_id").agg(
        min(when(col("rn") === 1L, col("value"))).as("firstv"),
        min(when(col("rn") === col("nt"), col("value"))).as("lastv"),
        max(col("nt")).as("nt"))
      val prof = train.groupBy("user_id", "hod")
        .agg(round4(CleanFunctions.exactMean(col("value"))).as("fc_snaive"))
      val t2 = test
        .withColumn("h", row_number().over(wtr).cast(DoubleType))
        .join(trStats, "user_id").join(prof, Seq("user_id", "hod"), "left")
        .withColumn("fc_naive", col("lastv"))
        .withColumn("fc_drift", round4(col("lastv") +
          ((col("lastv") - col("firstv")) /
            nullif(col("nt").cast(DoubleType) - lit(1.0), lit(0.0))) * col("h")))
        .where(col("fc_snaive").isNotNull)
        .select(col("user_id"), col("day"), col("splitday"), col("value").as("y"),
          col("fc_naive"), col("fc_snaive"), col("fc_drift"))
      def sm(fc: Column) = CleanFunctions.round6(lit(2.0) * abs(col("y") - fc) /
        nullif(abs(col("y")) + abs(fc), lit(0.0)))
      val vwin = t2.where(col("day") < col("splitday") + 3)
        .groupBy("user_id").agg(
          round4(CleanFunctions.exactMean(sm(col("fc_naive")))).as("sm_n"),
          round4(CleanFunctions.exactMean(sm(col("fc_snaive")))).as("sm_s"),
          round4(CleanFunctions.exactMean(sm(col("fc_drift")))).as("sm_d"))
        .withColumn("wn", CleanFunctions.round6(lit(1.0) / (col("sm_n") + lit(0.01))))
        .withColumn("ws", CleanFunctions.round6(lit(1.0) / (col("sm_s") + lit(0.01))))
        .withColumn("wd", CleanFunctions.round6(lit(1.0) / (col("sm_d") + lit(0.01))))
        .withColumn("wsum", col("wn") + col("ws") + col("wd"))
      val hold = t2.where(col("day") >= col("splitday") + 3)
        .join(vwin, "user_id")
        .withColumn("fc_combo", round4((col("wn") * col("fc_naive") +
          col("ws") * col("fc_snaive") + col("wd") * col("fc_drift")) / col("wsum")))
      hold.groupBy("user_id").agg(
          count(lit(1)).as("n_hold"),
          round4(CleanFunctions.exactMean(sm(col("fc_combo")))).as("combo_smape"),
          round4(CleanFunctions.exactMean(sm(col("fc_naive")))).as("h_n"),
          round4(CleanFunctions.exactMean(sm(col("fc_snaive")))).as("h_s"),
          round4(CleanFunctions.exactMean(sm(col("fc_drift")))).as("h_d"),
          CleanFunctions.round6(max(col("wn")) / max(col("wsum"))).as("w_naive"),
          CleanFunctions.round6(max(col("ws")) / max(col("wsum"))).as("w_snaive"),
          CleanFunctions.round6(max(col("wd")) / max(col("wsum"))).as("w_drift"))
        .withColumn("best_single", least(col("h_n"), col("h_s"), col("h_d")))
        .withColumn("combo_wins",
          (col("combo_smape") <= col("best_single")).cast(LongType))
        .select(col("user_id"), col("n_hold"), col("w_naive"), col("w_snaive"),
          col("w_drift"), col("combo_smape"), col("best_single"), col("combo_wins"))
        .orderBy("user_id")
    },

    // Newey–West HAC slope inference per series: the OLS hour-trend
    // slope with a heteroskedasticity-and-autocorrelation-consistent
    // standard error (Bartlett kernel, L = 3 lags) and its t statistic
    // — the honest "is this trend significant" answer for
    // autocorrelated telemetry, where the plain OLS se (ts_durbin_watson
    // shows why) is wildly overconfident. Same one-partitioning shape
    // as ts_influence: per-series moment windows → per-row residual
    // scores u = (x−x̄)e → three lagged cross-sums on DECIMAL(38,6).
    "ts_newey_west" -> { (s, d) =>
      val wp = Window.partitionBy("user_id")
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("mn", min(col("tsu")).over(wp))
        .withColumn("x", expr("(tsu - mn) DIV 3600000000").cast(DoubleType))
        .withColumn("y", col("value"))
      val mom = e
        .withColumn("n", count(lit(1)).over(wp).cast(DoubleType))
        .withColumn("sx", CleanFunctions.exactSumOver(col("x"), wp))
        .withColumn("sy", CleanFunctions.exactSumOver(col("y"), wp))
        .withColumn("sxy", CleanFunctions.exactSumOver(col("x") * col("y"), wp))
        .withColumn("sxx", CleanFunctions.exactSumOver(col("x") * col("x"), wp))
      val n = col("n")
      val b = (n * col("sxy") - col("sx") * col("sy")) /
        nullif(n * col("sxx") - col("sx") * col("sx"), lit(0.0))
      val a = (col("sy") - b * col("sx")) / n
      val scored = mom
        .withColumn("u", round4((col("x") - col("sx") / n) * (col("y") - a - b * col("x"))))
        .withColumn("b4", round4(b))
        .withColumn("sxxc", col("sxx") - col("sx") * col("sx") / n)
        .withColumn("u1", lag(col("u"), 1).over(wo))
        .withColumn("u2", lag(col("u"), 2).over(wo))
        .withColumn("u3", lag(col("u"), 3).over(wo))
      val g = scored.groupBy("user_id").agg(
        count(lit(1)).as("n_obs"),
        max(col("b4")).as("slope"),
        max(col("sxxc")).as("sxxc"),
        sum(round4(col("u") * col("u")).cast(Dec38)).cast(DoubleType).as("s0"),
        sum(round4(col("u") * col("u1")).cast(Dec38)).cast(DoubleType).as("s1"),
        sum(round4(col("u") * col("u2")).cast(Dec38)).cast(DoubleType).as("s2"),
        sum(round4(col("u") * col("u3")).cast(Dec38)).cast(DoubleType).as("s3"))
      val sHac = col("s0") + lit(2.0) *
        (lit(0.75) * col("s1") + lit(0.5) * col("s2") + lit(0.25) * col("s3"))
      g.withColumn("se_nw", round4(sqrt(greatest(sHac, lit(0.0))) /
          nullif(col("sxxc"), lit(0.0))))
        .select(col("user_id"), col("n_obs"), col("slope"), col("se_nw"),
          round4(col("slope") / nullif(col("se_nw"), lit(0.0))).as("t_nw"))
        .orderBy("user_id")
    },

    // Laspeyres / Paasche / Fisher price indices between the first and
    // last shipping month: per-part unit values weighted by base /
    // current quantities — the standard commerce price-level read over
    // the fact table. Only parts trading in BOTH months enter (matched
    // basket); all four weighted sums are round4-quantized DECIMAL
    // sums, the index ratios one final division each.
    "lineitem_price_index" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .withColumn("mth", expr("year(l_shipdate) * 12 + month(l_shipdate)"))
      val mm = li.agg(min(col("mth")).as("m0"), max(col("mth")).as("m1"))
      val pm = li.crossJoin(broadcast(mm))
        .where(col("mth") === col("m0") || col("mth") === col("m1"))
        .withColumn("is_base", col("mth") === col("m0"))
        .groupBy("l_partkey", "is_base").agg(
          exactSum(col("l_quantity")).as("q"),
          exactSum(col("l_extendedprice")).as("v"))
        .withColumn("p", round4(col("v") / col("q")))
      val base = pm.where(col("is_base")).select(col("l_partkey"),
        col("q").as("q0"), col("p").as("p0"))
      val curr = pm.where(!col("is_base")).select(col("l_partkey"),
        col("q").as("q1"), col("p").as("p1"))
      val j = base.join(curr, "l_partkey")
      val agg = j.agg(
        count(lit(1)).as("n_parts"),
        exactSum(round4(col("p1") * col("q0"))).as("p1q0"),
        exactSum(round4(col("p0") * col("q0"))).as("p0q0"),
        exactSum(round4(col("p1") * col("q1"))).as("p1q1"),
        exactSum(round4(col("p0") * col("q1"))).as("p0q1"))
      agg
        .withColumn("laspeyres", round4(col("p1q0") / nullif(col("p0q0"), lit(0.0))))
        .withColumn("paasche", round4(col("p1q1") / nullif(col("p0q1"), lit(0.0))))
        .select(col("n_parts"), col("laspeyres"), col("paasche"),
          round4(sqrt(col("laspeyres") * col("paasche"))).as("fisher"))
    },

    // Per-series categorical diversity: event-type richness, Simpson
    // index 1 − Σp² (probability two draws differ), and Good's coverage
    // 1 − N₁/N (how much of the type distribution the sample has seen —
    // the unseen-mass companion of text_good_turing, on behavioral
    // types). Two grouped integer aggregates; Σp² terms 6dp-quantized.
    "events_diversity" -> { (s, d) =>
      val tc = Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val p = col("c").cast(DoubleType) /
        sum(col("c")).over(Window.partitionBy("user_id")).cast(DoubleType)
      tc.withColumn("p2", CleanFunctions.round6(p * p).cast(DecimalType(18, 6)))
        .groupBy("user_id").agg(
          sum(col("c")).as("n_events"),
          count(lit(1)).as("richness"),
          sum(col("p2")).cast(DoubleType).as("sp2"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("singletons"))
        .select(col("user_id"), col("n_events"), col("richness"),
          round4(lit(1.0) - col("sp2")).as("simpson"),
          round4(lit(1.0) - col("singletons").cast(DoubleType) /
            col("n_events").cast(DoubleType)).as("coverage"))
        .orderBy("user_id")
    }
  )

  val oracleSql: Map[String, String] = Map(

    "ts_jarque_bera" -> {
      val skew = "(s3/n - 3.0*mean*(s2/n) + 2.0*mean*mean*mean) / nullif(sqrt(m2*m2*m2), 0.0)"
      val kurt = "(s4/n - 4.0*mean*(s3/n) + 6.0*(mean*mean)*(s2/n) - 3.0*(mean*mean)*(mean*mean)) / nullif(m2*m2, 0.0) - 3.0"
      s"""WITH e AS (SELECT user_id, value FROM events WHERE value IS NOT NULL),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("value")} AS s1,
         |    CAST(sum(CAST(${round4Sql("value * value")} AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         |    CAST(sum(CAST(${round4Sql("value * value * value")} AS DECIMAL(38,6))) AS DOUBLE) AS s3,
         |    CAST(sum(CAST(${round4Sql("value * value * value * value")} AS DECIMAL(38,6))) AS DOUBLE) AS s4
         |  FROM e GROUP BY user_id),
         |g AS (SELECT *, s1/n AS mean,
         |        greatest(s2/n - (s1/n)*(s1/n), 0.0) AS m2 FROM m),
         |k AS (SELECT user_id, n,
         |        ${round4Sql(skew)} AS skew, ${round4Sql(kurt)} AS ex_kurt FROM g),
         |j AS (SELECT *, ${round4Sql("(n/6.0)*(skew*skew + ex_kurt*ex_kurt/4.0)")} AS jb FROM k)
         |SELECT user_id, CAST(n AS BIGINT) AS n_obs, skew, ex_kurt, jb,
         |  CASE WHEN jb > ${dlit(Chi2Crit2df)} THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS is_nonnormal
         |FROM j ORDER BY user_id""".stripMargin
    },

    "ts_anderson_darling" -> {
      val a2 = "(-n - s / n)"
      s"""WITH e AS (SELECT user_id, event_id, value FROM events WHERE value IS NOT NULL),
         |m AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |  ${exactSumSql("value")} AS sx, ${exactSumSql("value * value")} AS sxx
         |  FROM e GROUP BY user_id),
         |m2 AS (SELECT user_id, n, sx / n AS mean,
         |  ${CleanFunctions.momentStdSql("n", "sx", "sxx")} AS sd FROM m),
         |r AS (SELECT e.user_id, m2.n,
         |  CAST(row_number() OVER (PARTITION BY e.user_id ORDER BY value, event_id) AS DOUBLE) AS i,
         |  ${round4Sql("(value - mean) / sd")} AS z
         |  FROM e JOIN m2 USING (user_id) WHERE sd > 0),
         |pp AS (SELECT user_id, n, i,
         |  greatest(least(${CleanFunctions.normalCdfSql("z")}, 0.999999999999999), 1e-15) AS p
         |  FROM r),
         |t AS (SELECT user_id, n, ${round6Sql(
            "(2.0 * i - 1.0) * ln(p) + (2.0 * n + 1.0 - 2.0 * i) * ln(1.0 - p)")} AS term
         |  FROM pp),
         |a AS (SELECT user_id, max(n) AS n, ${exactSumSql("term")} AS s
         |  FROM t GROUP BY user_id)
         |SELECT user_id, CAST(n AS BIGINT) AS n_obs,
         |  ${round4Sql(a2)} AS a2,
         |  ${round4Sql(s"$a2 * (1.0 + 0.75 / n + 2.25 / (n * n))")} AS a2_adj,
         |  CAST(CASE WHEN ${round4Sql(s"$a2 * (1.0 + 0.75 / n + 2.25 / (n * n))")} > 0.752
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_nonnormal
         |FROM a ORDER BY user_id""".stripMargin
    },

    "events_kruskal_wallis" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL),
         |r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (ORDER BY value, event_id) AS rk
         |  FROM e),
         |t AS (
         |  SELECT value, CAST(min(rk) + max(rk) AS DOUBLE) / 2.0 AS ar,
         |    count(*) AS t FROM r GROUP BY value),
         |ts AS (SELECT sum(t*t*t - t) AS tsum FROM t),
         |g AS (
         |  SELECT r.event_type, CAST(count(*) AS DOUBLE) AS nj,
         |    ${exactSumSql("t.ar")} AS rj
         |  FROM r JOIN t USING (value) GROUP BY r.event_type),
         |tot AS (SELECT sum(nj) AS nn, count(*) AS k FROM g),
         |a AS (
         |  SELECT any_value(nn) AS nn, any_value(k) AS k,
         |    ${exactSumSql(round4Sql("nj * (rj/nj - (nn+1.0)/2.0) * (rj/nj - (nn+1.0)/2.0)"))} AS ssq
         |  FROM g, tot)
         |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
         |  ${round4Sql("12.0 / (nn * (nn + 1.0)) * ssq")} AS h,
         |  ${round4Sql("(12.0 / (nn * (nn + 1.0)) * ssq) / nullif(1.0 - CAST(tsum AS DOUBLE) / (nn*nn*nn - nn), 0.0)")} AS h_adj
         |FROM a, ts""".stripMargin,

    "events_friedman" -> {
      val chi2 = "12.0 / (bd * kd * (kd + 1.0)) * srj2 - 3.0 * bd * (kd + 1.0)"
      s"""WITH md AS (
         |  SELECT CAST(ts AS DATE) AS day, event_type,
         |    ${round6Sql(CleanFunctions.exactMeanSql("value"))} AS m
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |kk AS (SELECT count(DISTINCT event_type) AS k FROM md),
         |fl AS (
         |  SELECT md.day, md.event_type, md.m,
         |    count(*) OVER (PARTITION BY md.day) AS nt, kk.k
         |  FROM md, kk),
         |full_b AS (SELECT day, event_type, m FROM fl WHERE nt = k),
         |rn AS (
         |  SELECT day, event_type, m,
         |    row_number() OVER (PARTITION BY day ORDER BY m, event_type) AS rn
         |  FROM full_b),
         |mid AS (
         |  SELECT day, m, CAST(min(rn) + max(rn) AS DOUBLE) / 2.0 AS ar
         |  FROM rn GROUP BY day, m),
         |rj AS (
         |  SELECT rn.event_type, count(*) AS b, ${exactSumSql("mid.ar")} AS rj
         |  FROM rn JOIN mid USING (day, m) GROUP BY rn.event_type),
         |a AS (
         |  SELECT count(*) AS kk, max(b) AS b,
         |    ${exactSumSql(round4Sql("rj * rj"))} AS srj2
         |  FROM rj),
         |c AS (SELECT b, kk, srj2, CAST(b AS DOUBLE) AS bd,
         |  CAST(kk AS DOUBLE) AS kd FROM a)
         |SELECT b AS n_blocks, kk AS k_groups,
         |  ${round4Sql(chi2)} AS chi2_f,
         |  ${round4Sql(s"($chi2) / nullif(bd * (kd - 1.0), 0.0)")} AS kendall_w
         |FROM c""".stripMargin
    },

    "lineitem_levene" ->
      s"""WITH li AS (SELECT l_returnflag AS flag, l_quantity AS qty FROM lineitem),
         |c AS (SELECT flag, qty, count(*) AS cnt FROM li GROUP BY flag, qty),
         |cc AS (
         |  SELECT flag, qty,
         |    sum(cnt) OVER (PARTITION BY flag ORDER BY qty
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(cnt) OVER (PARTITION BY flag) AS ntot
         |  FROM c),
         |med AS (
         |  SELECT flag,
         |    (min(CASE WHEN cum >= (ntot + 1) // 2 THEN qty END) +
         |     min(CASE WHEN cum >= (ntot + 2) // 2 THEN qty END)) / 2.0 AS med
         |  FROM cc GROUP BY flag),
         |z AS (
         |  SELECT li.flag, abs(li.qty - med.med) AS z
         |  FROM li JOIN med ON li.flag = med.flag),
         |g AS (
         |  SELECT flag, CAST(count(*) AS DOUBLE) AS nj,
         |    ${exactSumSql("z")} AS sz, ${exactSumSql("z * z")} AS szz
         |  FROM z GROUP BY flag),
         |tot AS (SELECT sum(nj) AS nn, count(*) AS k,
         |          ${exactSumSql("sz")} AS sgz FROM g),
         |a AS (
         |  SELECT any_value(nn) AS nn, any_value(k) AS k,
         |    ${exactSumSql(round4Sql("nj * (sz/nj - sgz/nn) * (sz/nj - sgz/nn)"))} AS ssb,
         |    ${exactSumSql(round4Sql("szz - sz * sz / nj"))} AS ssw
         |  FROM g, tot)
         |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
         |  ${round4Sql("((nn - CAST(k AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)) * (ssb / nullif(ssw, 0.0))")} AS w_stat,
         |  CAST(k - 1 AS BIGINT) AS df1,
         |  CAST(nn AS BIGINT) - k AS df2
         |FROM a""".stripMargin,

    "ts_fdr_bh" -> {
      val p = s"(${round4Sql(s"2.0 * (1.0 - ${CleanFunctions.normalCdfSql("abs(z)")})")})"
      s"""WITH daily AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |    ${round4Sql(CleanFunctions.exactMeanSql("value"))} AS m
         |  FROM events WHERE value IS NOT NULL GROUP BY user_id, day),
         |sg AS (
         |  SELECT user_id,
         |    CASE WHEN m > lag(m) OVER w THEN 1
         |         WHEN m < lag(m) OVER w THEN -1 ELSE 0 END AS sg,
         |    lag(m) OVER w AS prev
         |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         |per0 AS (
         |  SELECT user_id,
         |    sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS npos,
         |    sum(CASE WHEN sg <> 0 THEN 1 ELSE 0 END) AS nd
         |  FROM sg WHERE prev IS NOT NULL GROUP BY user_id),
         |per1 AS (
         |  SELECT user_id, nd,
         |    ${round4Sql("(2.0 * npos - nd) / sqrt(CAST(nd AS DOUBLE))")} AS z
         |  FROM per0 WHERE nd > 0),
         |per AS (SELECT *, $p AS p FROM per1),
         |mm AS (SELECT count(*) AS mtests FROM per),
         |rk AS (
         |  SELECT per.*, mtests,
         |    row_number() OVER (ORDER BY p, user_id) AS i
         |  FROM per, mm),
         |q AS (SELECT *, p * CAST(mtests AS DOUBLE) / CAST(i AS DOUBLE) AS q FROM rk),
         |sm AS (
         |  SELECT *, min(q) OVER (ORDER BY i
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS qmin
         |  FROM q),
         |f AS (SELECT *, ${round4Sql("least(1.0, qmin)")} AS p_adj FROM sm)
         |SELECT user_id, CAST(nd AS BIGINT) AS n_diffs, z, p, p_adj,
         |  CASE WHEN p_adj <= ${dlit(FdrQ)} THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS is_sig
         |FROM f ORDER BY user_id""".stripMargin
    },

    "ts_influence" -> {
      val b = "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)"
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value AS y FROM events
         |  WHERE value IS NOT NULL),
         |x AS (
         |  SELECT event_id, user_id, y,
         |    CAST((tsu - min(tsu) OVER (PARTITION BY user_id)) // 3600000000 AS DOUBLE) AS x
         |  FROM e),
         |m AS (
         |  SELECT event_id, x, y,
         |    CAST(count(*) OVER w AS DOUBLE) AS n,
         |    CAST(sum(CAST(x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
         |    CAST(sum(CAST(x * y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(x * x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(y * y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS syy
         |  FROM x WINDOW w AS (PARTITION BY user_id)),
         |f AS (
         |  SELECT event_id, x, y, n, sx, sy, sxy, sxx, syy,
         |    $b AS b,
         |    (sy - ($b) * sx) / n AS a,
         |    sxx - sx * sx / n AS sxxc
         |  FROM m),
         |g AS (
         |  SELECT event_id, n,
         |    y - a - b * x AS eres,
         |    1.0 / n + (x - sx/n) * (x - sx/n) / nullif(sxxc, 0.0) AS h,
         |    greatest(syy - a * sy - b * sxy, 0.0) / nullif(n - 2.0, 0.0) AS s2
         |  FROM f),
         |o AS (
         |  SELECT event_id, n, ${round4Sql("h")} AS leverage,
         |    ${round4Sql("eres * eres * h / nullif(2.0 * s2 * (1.0 - h) * (1.0 - h), 0.0)")} AS cooks_d
         |  FROM g)
         |SELECT event_id, leverage, cooks_d,
         |  CASE WHEN cooks_d > 4.0 / n THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS is_influential
         |FROM o ORDER BY event_id""".stripMargin
    },

    "ts_james_stein" ->
      s"""WITH g AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS nj,
         |    ${exactSumSql("value")} AS sz,
         |    ${exactSumSql(round4Sql("value * value"))} AS szz
         |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
         |g2 AS (SELECT *, ${round4Sql("sz / nj")} AS mj FROM g),
         |tot AS (
         |  SELECT sum(nj) AS nn, CAST(count(*) AS DOUBLE) AS k,
         |    ${exactSumSql("mj")} AS sm,
         |    ${exactSumSql(round4Sql("szz - sz * sz / nj"))} AS ssw,
         |    ${exactSumSql(round4Sql("1.0 / nj"))} AS sinv
         |  FROM g2),
         |ssq AS (
         |  SELECT ${exactSumSql(round4Sql("(mj - sm/k) * (mj - sm/k)"))} AS ss
         |  FROM g2, tot),
         |f AS (
         |  SELECT g2.*, tot.*, ssq.ss,
         |    ${round4Sql("CASE WHEN ss > 0.0 THEN greatest(0.0, 1.0 - (k - 3.0) * ((ssw / (nn - k)) * (sinv / k)) / ss) ELSE 0.0 END")} AS shrink_c
         |  FROM g2, tot, ssq)
         |SELECT user_id, CAST(nj AS BIGINT) AS n_obs, mj AS raw_mean,
         |  ${round4Sql("sm/k + shrink_c * (mj - sm/k)")} AS shrunk_mean,
         |  shrink_c
         |FROM f ORDER BY user_id""".stripMargin,

    "ts_var_es" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |dd AS (
         |  SELECT user_id, event_id,
         |    ${round4Sql("value - lag(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id)")} AS dv
         |  FROM e),
         |d AS (SELECT * FROM dd WHERE dv IS NOT NULL),
         |r AS (
         |  SELECT user_id, dv AS v,
         |    row_number() OVER (PARTITION BY user_id ORDER BY dv) - 1 AS rn0,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM d),
         |f AS (
         |  SELECT user_id, v, rn0,
         |    CAST(n - 1 AS DOUBLE) * 0.05 AS h,
         |    floor(CAST(n - 1 AS DOUBLE) * 0.05) AS lo,
         |    ceil(CAST(n - 1 AS DOUBLE) * 0.05) AS hi
         |  FROM r
         |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * 0.05)
         |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * 0.05)),
         |q AS (
         |  SELECT user_id,
         |    ${round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(h) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS var95
         |  FROM f GROUP BY user_id)
         |SELECT d.user_id, count(*) AS n_diffs, any_value(q.var95) AS var95,
         |  ${round4Sql(s"${exactSumSql("CASE WHEN d.dv <= q.var95 THEN d.dv END")} / count(CASE WHEN d.dv <= q.var95 THEN 1 END)")} AS es95
         |FROM d JOIN q ON d.user_id = q.user_id
         |GROUP BY d.user_id ORDER BY d.user_id""".stripMargin,

    "text_good_turing" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
         |  FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS r FROM t GROUP BY doc_id, tok),
         |coc AS (SELECT r, count(*) AS n_r FROM tf GROUP BY r)
         |SELECT c1.r, c1.n_r,
         |  ${round4Sql("CAST(c1.r + 1 AS DOUBLE) * CAST(c2.n_r AS DOUBLE) / CAST(c1.n_r AS DOUBLE)")} AS r_star
         |FROM coc c1 LEFT JOIN coc c2 ON c2.r = c1.r + 1
         |WHERE c1.r <= 10 ORDER BY c1.r""".stripMargin,

    "events_apdex" ->
      s"""SELECT event_type, count(*) AS n_samples,
         |  count(CASE WHEN value <= ${dlit(ApdexT)} THEN 1 END) AS satisfied,
         |  count(CASE WHEN value > ${dlit(ApdexT)} AND value <= ${dlit(4.0 * 50.0)} THEN 1 END) AS tolerating,
         |  ${round4Sql("(CAST(count(CASE WHEN value <= " + dlit(ApdexT) + " THEN 1 END) AS DOUBLE) + CAST(count(CASE WHEN value > " + dlit(ApdexT) + " AND value <= " + dlit(4.0 * 50.0) + " THEN 1 END) AS DOUBLE) / 2.0) / CAST(count(*) AS DOUBLE)")} AS apdex
         |FROM events WHERE value IS NOT NULL
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_capacity_eta" -> {
      val slope = "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)"
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |x AS (
         |  SELECT user_id,
         |    CAST((tsu - min(tsu) OVER (PARTITION BY user_id)) // 3600000000 AS DOUBLE) AS x,
         |    value AS y
         |  FROM e),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n, max(x) AS xmax,
         |    ${exactSumSql("x")} AS sx, ${exactSumSql("y")} AS sy,
         |    ${exactSumSql("x * y")} AS sxy, ${exactSumSql("x * x")} AS sxx
         |  FROM x GROUP BY user_id),
         |f AS (
         |  SELECT user_id, xmax,
         |    ${round4Sql(slope)} AS slope,
         |    ${round4Sql(s"(sy - ($slope) * sx) / n")} AS intercept
         |  FROM m),
         |g AS (
         |  SELECT user_id, slope,
         |    ${round4Sql("intercept + slope * xmax")} AS level
         |  FROM f),
         |h AS (
         |  SELECT user_id, slope, level,
         |    CASE WHEN slope > 0.0
         |         THEN ${round4Sql(s"greatest(0.0, (${dlit(CapacityC)} - level) / slope)")}
         |         END AS eta_hours
         |  FROM g)
         |SELECT user_id, slope, level, eta_hours,
         |  CASE WHEN eta_hours IS NOT NULL AND eta_hours <= 720.0
         |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS breach_30d
         |FROM h ORDER BY user_id""".stripMargin
    },

    "events_hbos" ->
      s"""WITH e AS (
         |  SELECT event_id, CAST(hour(ts) AS BIGINT) AS hb, value AS v
         |  FROM events WHERE value IS NOT NULL),
         |st AS (SELECT min(v) AS mn, max(v) AS mx, count(*) AS n FROM e),
         |b AS (
         |  SELECT event_id, hb,
         |    CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
         |         ELSE least(CAST(9 AS BIGINT),
         |                    CAST(floor((v - mn) / ((mx - mn) / 10.0)) AS BIGINT)) END AS vb,
         |    n
         |  FROM e, st),
         |vc AS (SELECT vb, count(*) AS vcnt FROM b GROUP BY vb),
         |hc AS (SELECT hb, count(*) AS hcnt FROM b GROUP BY hb)
         |SELECT b.event_id, b.vb, b.hb,
         |  ${round4Sql("-(ln(CAST(vcnt AS DOUBLE) / n) + ln(CAST(hcnt AS DOUBLE) / n))")} AS hbos
         |FROM b JOIN vc USING (vb) JOIN hc USING (hb)
         |ORDER BY b.event_id""".stripMargin,

    "ts_forecast_accuracy" -> {
      def smOf(fc: String) = s"2.0 * abs(y - $fc) / nullif(abs(y) + abs($fc), 0.0)"
      def metricsSql(fc: String, name: String) =
        s"""SELECT user_id, '$name' AS model, count(*) AS n_test,
           |  ${round4Sql(CleanFunctions.exactMeanSql(CleanFunctions.round6Sql(smOf(fc))))} AS smape,
           |  ${round4Sql(s"${CleanFunctions.exactMeanSql(s"abs(y - $fc)")} / nullif(max(mae_naive_tr), 0.0)")} AS mase
           |FROM t2 WHERE $fc IS NOT NULL GROUP BY user_id""".stripMargin
      s"""WITH e AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS tsu,
         |    epoch_us(ts) // 86400000000 AS day,
         |    (epoch_us(ts) // 3600000000) % 24 AS hod
         |  FROM events WHERE value IS NOT NULL),
         |sp AS (SELECT max(day) - 6 AS splitday FROM e),
         |tr AS (SELECT e.* FROM e, sp WHERE day < splitday),
         |te AS (SELECT e.* FROM e, sp WHERE day >= splitday),
         |trr AS (
         |  SELECT user_id, value,
         |    row_number() OVER w AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS nt,
         |    abs(value - lag(value) OVER w) AS dprev
         |  FROM tr WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |trs AS (
         |  SELECT user_id,
         |    min(CASE WHEN rn = 1 THEN value END) AS firstv,
         |    min(CASE WHEN rn = nt THEN value END) AS lastv,
         |    max(nt) AS nt,
         |    ${round4Sql(CleanFunctions.exactMeanSql("dprev"))} AS mae_naive_tr
         |  FROM trr GROUP BY user_id),
         |prof AS (
         |  SELECT user_id, hod,
         |    ${round4Sql(CleanFunctions.exactMeanSql("value"))} AS fc_snaive
         |  FROM tr GROUP BY user_id, hod),
         |teh AS (
         |  SELECT te.*,
         |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS DOUBLE) AS h
         |  FROM te),
         |t2 AS (
         |  SELECT teh.user_id, teh.value AS y, teh.h, trs.mae_naive_tr,
         |    trs.lastv AS fc_naive,
         |    prof.fc_snaive,
         |    ${round4Sql("trs.lastv + ((trs.lastv - trs.firstv) / nullif(CAST(trs.nt AS DOUBLE) - 1.0, 0.0)) * teh.h")} AS fc_drift
         |  FROM teh
         |  JOIN trs ON teh.user_id = trs.user_id
         |  LEFT JOIN prof ON teh.user_id = prof.user_id AND teh.hod = prof.hod)
         |${metricsSql("fc_naive", "naive")}
         |UNION ALL
         |${metricsSql("fc_snaive", "snaive")}
         |UNION ALL
         |${metricsSql("fc_drift", "drift")}
         |ORDER BY user_id, model""".stripMargin
    },

    "ts_forecast_combo" -> {
      def smOf(fc: String) = CleanFunctions.round6Sql(
        s"2.0 * abs(y - $fc) / nullif(abs(y) + abs($fc), 0.0)")
      def meanSm(fc: String) = round4Sql(CleanFunctions.exactMeanSql(smOf(fc)))
      s"""WITH e AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS tsu,
         |    epoch_us(ts) // 86400000000 AS day,
         |    (epoch_us(ts) // 3600000000) % 24 AS hod
         |  FROM events WHERE value IS NOT NULL),
         |sp AS (SELECT max(day) - 6 AS splitday FROM e),
         |tr AS (SELECT e.* FROM e, sp WHERE day < splitday),
         |te AS (SELECT e.* FROM e, sp WHERE day >= splitday),
         |trr AS (
         |  SELECT user_id, value,
         |    row_number() OVER w AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS nt
         |  FROM tr WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |trs AS (
         |  SELECT user_id,
         |    min(CASE WHEN rn = 1 THEN value END) AS firstv,
         |    min(CASE WHEN rn = nt THEN value END) AS lastv,
         |    max(nt) AS nt
         |  FROM trr GROUP BY user_id),
         |prof AS (
         |  SELECT user_id, hod,
         |    ${round4Sql(CleanFunctions.exactMeanSql("value"))} AS fc_snaive
         |  FROM tr GROUP BY user_id, hod),
         |teh AS (
         |  SELECT te.*,
         |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS DOUBLE) AS h
         |  FROM te),
         |t2 AS (
         |  SELECT teh.user_id, teh.day, sp.splitday, teh.value AS y,
         |    trs.lastv AS fc_naive, prof.fc_snaive,
         |    ${round4Sql("trs.lastv + ((trs.lastv - trs.firstv) / nullif(CAST(trs.nt AS DOUBLE) - 1.0, 0.0)) * teh.h")} AS fc_drift
         |  FROM teh
         |  JOIN trs ON teh.user_id = trs.user_id
         |  LEFT JOIN prof ON teh.user_id = prof.user_id AND teh.hod = prof.hod, sp
         |  WHERE prof.fc_snaive IS NOT NULL),
         |vw AS (
         |  SELECT user_id,
         |    ${meanSm("fc_naive")} AS sm_n,
         |    ${meanSm("fc_snaive")} AS sm_s,
         |    ${meanSm("fc_drift")} AS sm_d
         |  FROM t2 WHERE day < splitday + 3 GROUP BY 1),
         |w AS (
         |  SELECT user_id,
         |    ${CleanFunctions.round6Sql("1.0 / (sm_n + 0.01)")} AS wn,
         |    ${CleanFunctions.round6Sql("1.0 / (sm_s + 0.01)")} AS ws,
         |    ${CleanFunctions.round6Sql("1.0 / (sm_d + 0.01)")} AS wd
         |  FROM vw),
         |w2 AS (SELECT user_id, wn, ws, wd, wn + ws + wd AS wsum FROM w),
         |hd AS (
         |  SELECT t2.user_id, y, fc_naive, fc_snaive, fc_drift,
         |    w2.wn, w2.ws, w2.wd, w2.wsum,
         |    ${round4Sql("(wn * fc_naive + ws * fc_snaive + wd * fc_drift) / wsum")} AS fc_combo
         |  FROM t2 JOIN w2 ON t2.user_id = w2.user_id
         |  WHERE day >= splitday + 3),
         |res AS (
         |  SELECT user_id, count(*) AS n_hold,
         |    ${meanSm("fc_combo")} AS combo_smape,
         |    ${meanSm("fc_naive")} AS h_n,
         |    ${meanSm("fc_snaive")} AS h_s,
         |    ${meanSm("fc_drift")} AS h_d,
         |    ${CleanFunctions.round6Sql("max(wn) / max(wsum)")} AS w_naive,
         |    ${CleanFunctions.round6Sql("max(ws) / max(wsum)")} AS w_snaive,
         |    ${CleanFunctions.round6Sql("max(wd) / max(wsum)")} AS w_drift
         |  FROM hd GROUP BY 1)
         |SELECT user_id, n_hold, w_naive, w_snaive, w_drift, combo_smape,
         |  least(h_n, h_s, h_d) AS best_single,
         |  CAST(CASE WHEN combo_smape <= least(h_n, h_s, h_d) THEN 1
         |       ELSE 0 END AS BIGINT) AS combo_wins
         |FROM res ORDER BY user_id""".stripMargin
    },

    "ts_newey_west" -> {
      val b = "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)"
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value AS y FROM events
         |  WHERE value IS NOT NULL),
         |x AS (
         |  SELECT event_id, user_id, tsu, y,
         |    CAST((tsu - min(tsu) OVER (PARTITION BY user_id)) // 3600000000 AS DOUBLE) AS x
         |  FROM e),
         |m AS (
         |  SELECT event_id, user_id, tsu, x, y,
         |    CAST(count(*) OVER w AS DOUBLE) AS n,
         |    CAST(sum(CAST(x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
         |    CAST(sum(CAST(x * y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(x * x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx
         |  FROM x WINDOW w AS (PARTITION BY user_id)),
         |f AS (
         |  SELECT event_id, user_id, tsu,
         |    ${round4Sql(s"(x - sx/n) * (y - ((sy - ($b) * sx) / n) - ($b) * x)")} AS u,
         |    ${round4Sql(b)} AS b4,
         |    sxx - sx * sx / n AS sxxc
         |  FROM m),
         |l AS (
         |  SELECT user_id, u, b4, sxxc,
         |    lag(u, 1) OVER w AS u1, lag(u, 2) OVER w AS u2, lag(u, 3) OVER w AS u3
         |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |g AS (
         |  SELECT user_id, count(*) AS n_obs, max(b4) AS slope, max(sxxc) AS sxxc,
         |    CAST(sum(CAST(${round4Sql("u * u")} AS DECIMAL(38,6))) AS DOUBLE) AS s0,
         |    CAST(sum(CAST(${round4Sql("u * u1")} AS DECIMAL(38,6))) AS DOUBLE) AS s1,
         |    CAST(sum(CAST(${round4Sql("u * u2")} AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         |    CAST(sum(CAST(${round4Sql("u * u3")} AS DECIMAL(38,6))) AS DOUBLE) AS s3
         |  FROM l GROUP BY user_id),
         |h AS (
         |  SELECT user_id, n_obs, slope,
         |    ${round4Sql("sqrt(greatest(s0 + 2.0 * (0.75 * s1 + 0.5 * s2 + 0.25 * s3), 0.0)) / nullif(sxxc, 0.0)")} AS se_nw
         |  FROM g)
         |SELECT user_id, n_obs, slope, se_nw,
         |  ${round4Sql("slope / nullif(se_nw, 0.0)")} AS t_nw
         |FROM h ORDER BY user_id""".stripMargin
    },

    "lineitem_price_index" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice,
         |    year(l_shipdate) * 12 + month(l_shipdate) AS mth
         |  FROM lineitem),
         |mm AS (SELECT min(mth) AS m0, max(mth) AS m1 FROM li),
         |pm AS (
         |  SELECT l_partkey, (mth = m0) AS is_base,
         |    ${exactSumSql("l_quantity")} AS q, ${exactSumSql("l_extendedprice")} AS v
         |  FROM li, mm WHERE mth = m0 OR mth = m1
         |  GROUP BY l_partkey, (mth = m0)),
         |pp AS (SELECT l_partkey, is_base, q, ${round4Sql("v / q")} AS p FROM pm),
         |b AS (SELECT l_partkey, q AS q0, p AS p0 FROM pp WHERE is_base),
         |c AS (SELECT l_partkey, q AS q1, p AS p1 FROM pp WHERE NOT is_base),
         |j AS (SELECT * FROM b JOIN c USING (l_partkey)),
         |a AS (
         |  SELECT count(*) AS n_parts,
         |    ${exactSumSql(round4Sql("p1 * q0"))} AS p1q0,
         |    ${exactSumSql(round4Sql("p0 * q0"))} AS p0q0,
         |    ${exactSumSql(round4Sql("p1 * q1"))} AS p1q1,
         |    ${exactSumSql(round4Sql("p0 * q1"))} AS p0q1
         |  FROM j),
         |ix AS (
         |  SELECT n_parts,
         |    ${round4Sql("p1q0 / nullif(p0q0, 0.0)")} AS laspeyres,
         |    ${round4Sql("p1q1 / nullif(p0q1, 0.0)")} AS paasche
         |  FROM a)
         |SELECT n_parts, laspeyres, paasche,
         |  ${round4Sql("sqrt(laspeyres * paasche)")} AS fisher
         |FROM ix""".stripMargin,

    "events_diversity" ->
      s"""WITH tc AS (
         |  SELECT user_id, event_type, count(*) AS c FROM events
         |  GROUP BY user_id, event_type),
         |pt AS (
         |  SELECT user_id, c,
         |    CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY user_id) AS DOUBLE) AS p
         |  FROM tc),
         |g AS (
         |  SELECT user_id, sum(c) AS n_events, count(*) AS richness,
         |    CAST(sum(CAST(${round6Sql("p * p")} AS DECIMAL(18,6))) AS DOUBLE) AS sp2,
         |    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS singletons
         |  FROM pt GROUP BY user_id)
         |SELECT user_id, CAST(n_events AS BIGINT) AS n_events, richness,
         |  ${round4Sql("1.0 - sp2")} AS simpson,
         |  ${round4Sql("1.0 - CAST(singletons AS DOUBLE) / CAST(n_events AS DOUBLE)")} AS coverage
         |FROM g ORDER BY user_id""".stripMargin
  )
}
