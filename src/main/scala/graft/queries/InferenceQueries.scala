package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.CleanFunctions
import graft.functions.CleanFunctions.{exactSum, exactSumSql, round4, round4Sql}
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
         |SELECT user_id, nd AS n_diffs, z, p, p_adj,
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
    }
  )
}
