package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.CleanFunctions
import graft.functions.CleanFunctions.{exactSum, exactSumSql, momentStd, momentStdSql, momentVar, momentVarSql, round6, round6Sql}
import graft.sources.Tables

/** Statistical-process-control + extreme-value anomaly operators over
  * `events` (reference: the >3σ anomaly rule, config.py ANOMALY_THRESHOLD
  * = 3.0, generalized to the classical SPC/EVT detector family).
  *
  * Every detector keys by the series (`user_id`): the per-series moments
  * are one map-side-combinable grouped aggregate (DECIMAL-exact, so both
  * engines derive bit-identical mean/σ), and the per-row window frames
  * are bounded (≤ 8 rows) — state stays O(1) per row at any scale. The
  * only quadratic stage (sample entropy's template pairs) is per-series
  * and series length is bounded upstream by resampling.
  */
object SpcQueries {

  private val Ord = Seq("ts", "event_id")

  /** Sakoe-Chiba band half-width (days) for ts_dtw_profile — widened
    * per user to |n − m| when a short series needs it (both engines
    * apply the same rule, so the cell set is identical).
    */
  private val DtwBand = 7

  /** Cumulative inverse-CDF thresholds of Poisson(1) for k = 0..3
    * (replication count truncated at 4). Computed ONCE here with pinned
    * left-to-right addition and baked as identical literals into both
    * engines via dlitSql.
    */
  private val PoissonThresholds: Seq[Double] = {
    val e1 = math.exp(-1.0)
    Seq(1.0, 1.0, 0.5, 1.0 / 6.0).map(_ * e1).scanLeft(0.0)(_ + _).tail
  }

  /** Bootstrap uniform-mixing constants: one 60-bit md5 per row, then
    * u_r = h·(A + r·S) mod p per replicate (see events_bootstrap_ci).
    */
  private val BootP = 2147483647L
  private val BootA = 1103633L
  private val BootS = 65537L

  /** Euler–Mascheroni γ for the record-count expectation H_n ≈ ln n + γ. */
  private val EulerGamma = 0.5772156649015329

  /** Wald SPRT decision boundaries at α = β = 0.05: ln((1−β)/α), ln(β/(1−α)). */
  private val SprtUpper = math.log(19.0)
  private val SprtLower = math.log(1.0 / 19.0)

  /** events_sprt's oracle, shared VERBATIM with streaming_sprt (the
    * emit-once streaming fold replays to the identical DECIMAL cumsum +
    * first-crossing decision — the streaming_kalman shared-body rule).
    */
  private lazy val SprtOracleSql: String = {
    val up = CleanFunctions.dlitSql(SprtUpper)
    val lo = CleanFunctions.dlitSql(SprtLower)
    val sig2 = momentVarSql("cn", "csx", "csxx")
    val pw = "PARTITION BY user_id ORDER BY ts, event_id"
    s"""WITH c AS (SELECT CAST(count(*) AS DOUBLE) AS cn,
       |  ${exactSumSql("value")} AS csx,
       |  ${exactSumSql("value * value")} AS csxx
       |  FROM events WHERE value IS NOT NULL AND event_type = 'view'),
       |t AS (SELECT user_id, ts, event_id, value,
       |  (csx / cn) AS mu0, (csx / cn) * 1.05 AS mu1, $sig2 AS sig2
       |  FROM events, c WHERE value IS NOT NULL AND event_type = 'click'),
       |l AS (SELECT user_id, ts, event_id,
       |  ${round6Sql("((mu1 - mu0) * value - (mu1 * mu1 - mu0 * mu0) / 2.0) / sig2")} AS llr_term
       |  FROM t),
       |cm AS (SELECT user_id,
       |  CAST(row_number() OVER ($pw) AS BIGINT) AS idx,
       |  ${exactSumSql("llr_term", s"OVER ($pw ROWS UNBOUNDED PRECEDING)")} AS llr
       |  FROM l),
       |d AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
       |  arg_max(llr, idx) AS final_llr,
       |  min(CASE WHEN llr > $up THEN idx END) AS up_at,
       |  min(CASE WHEN llr < $lo THEN idx END) AS lo_at
       |  FROM cm GROUP BY user_id)
       |SELECT user_id, n_obs, ${round6Sql("final_llr")} AS final_llr,
       |  CASE WHEN up_at IS NOT NULL AND (lo_at IS NULL OR up_at <= lo_at)
       |         THEN 'reject_h0'
       |       WHEN lo_at IS NOT NULL THEN 'accept_h0'
       |       ELSE 'continue' END AS decision,
       |  CASE WHEN up_at IS NOT NULL AND (lo_at IS NULL OR up_at <= lo_at)
       |         THEN up_at
       |       WHEN lo_at IS NOT NULL THEN lo_at END AS decision_at
       |FROM d ORDER BY user_id""".stripMargin
  }

  /** Per-series DECIMAL-exact moments joined back onto the rows. */
  private def withMoments(df: DataFrame): DataFrame = {
    val m = df.groupBy("user_id").agg(
      count(lit(1)).cast(LongType).as("n"),
      exactSum(col("value")).as("sx"),
      exactSum(col("value") * col("value")).as("sxx"))
    df.join(m, Seq("user_id"))
      .withColumn("mean", col("sx") / col("n").cast("double"))
      .withColumn("sd", momentStd(col("n").cast("double"), col("sx"), col("sxx")))
  }

  private val MomentsCte =
    s"""m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |  ${exactSumSql("value")} AS sx, ${exactSumSql("value * value")} AS sxx
       |  FROM events GROUP BY user_id)""".stripMargin
  private val SdSql = momentStdSql("CAST(m.n AS DOUBLE)", "m.sx", "m.sxx")
  private val MeanSql = "(m.sx / CAST(m.n AS DOUBLE))"

  /** Banded-DTW divergence from the fleet reference (the `ts_dtw_profile`
    * entry — full rationale on the entry's doc comment). `band` is the
    * Sakoe-Chiba half-width in days — the constructor-level knob a
    * deployment sizes to its tolerable phase shift; the default stays
    * the pinned [[DtwBand]] so the driver entry and its recursive-CTE
    * DuckDB oracle share one literal (the nbSourceConfusion precedent).
    * Per user the band is still widened to |n − m| so the DP corner is
    * always reachable; the knob changes per-key DP work O(span·band),
    * never the plan shape.
    */
  def dtwProfile(s: SparkSession, d: String, band: Int = DtwBand): DataFrame = {
    require(band >= 1, s"band=$band must be >= 1")
    import s.implicits._
    val e = Tables.events(s, d).where(col("value").isNotNull)
      .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
      .withColumn("day", expr("tsu DIV 86400000000"))
    val daily = e.groupBy("user_id", "day")
      .agg(CleanFunctions.round4(CleanFunctions.exactMean(col("value"))).as("m"))
    val wu = Window.partitionBy("user_id").orderBy("day")
    val a = daily.withColumn("i", row_number().over(wu))
    val ref = e.groupBy("day")
      .agg(CleanFunctions.round4(CleanFunctions.exactMean(col("value"))).as("w"))
      .orderBy("day").collect().map(_.getDouble(1))
    val bb = s.sparkContext.broadcast(ref)
    a.select(col("user_id"), col("i"), col("m"))
      .as[(Long, Int, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val av = it.toArray.sortBy(_._2).map(_._3)
        val b = bb.value
        val w = math.max(band, math.abs(av.length - b.length))
        (uid, av.length.toLong,
          graft.operators.TimeSeriesOps.dtwBanded(av, b, w))
      }
      .toDF("user_id", "n_days", "dtw_raw")
      .select(col("user_id"), col("n_days"),
        CleanFunctions.round4(col("dtw_raw")).as("dtw"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // p-chart (attribute control chart): daily purchase SHARE against
    // binomial limits p̄ ± 3√(p̄(1−p̄)/n) — the proportions chart that
    // completes the SPC family (the x-charts here watch a measurement;
    // conversion/defect RATES need variable-width limits because daily
    // volume n changes). All counts integer-exact; p̄ is one broadcast
    // scalar; out-of-bounds compares the ROUNDED p against the ROUNDED
    // limits so both engines agree at the boundary.
    "events_p_chart" -> { (s, d) =>
      import org.apache.spark.sql.types.DoubleType
      val daily = Tables.events(s, d)
        .select(CleanFunctions.epochUs(date_trunc("day", col("ts"))).as("day"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("xx"))
        .groupBy("day").agg(count(lit(1)).as("n"), sum(col("xx")).as("x"))
      val cl = daily.agg((sum(col("x")).cast(DoubleType) /
        sum(col("n")).cast(DoubleType)).as("pbar"))
      daily.crossJoin(broadcast(cl))
        .withColumn("p", round6(col("x").cast(DoubleType) / col("n").cast(DoubleType)))
        .withColumn("sig", sqrt(col("pbar") * (lit(1.0) - col("pbar")) /
          col("n").cast(DoubleType)))
        .withColumn("ucl", round6(col("pbar") + lit(3.0) * col("sig")))
        .withColumn("lcl", round6(greatest(col("pbar") - lit(3.0) * col("sig"), lit(0.0))))
        .withColumn("oob", (col("p") > col("ucl") || col("p") < col("lcl")).cast(LongType))
        .select(col("day"), col("n"), col("x"), col("p"),
          round6(col("pbar")).as("pbar"), col("ucl"), col("lcl"), col("oob"))
        .orderBy("day")
    },

    // Western Electric run rules (the 1956 control-chart classic): with
    // per-series control limits mean ± kσ, flag
    //   r1: one point beyond 3σ,
    //   r2: ≥2 of the last 3 beyond 2σ on the SAME side (incl. current),
    //   r3: ≥4 of the last 5 beyond 1σ on the same side,
    //   r4: 8 consecutive points on one side of the mean.
    // z is derived from DECIMAL-exact moments so both engines compare
    // bit-identical doubles against the σ thresholds — no rounding band
    // needed; the rule windows are ≤ 8 trailing rows (O(1) state).
    "ts_we_rules" -> { (s, d) =>
      val z = (col("value") - col("mean")) / col("sd")
      val w3 = Window.partitionBy("user_id").orderBy(Ord.map(col): _*).rowsBetween(-2, 0)
      val w5 = Window.partitionBy("user_id").orderBy(Ord.map(col): _*).rowsBetween(-4, 0)
      val w8 = Window.partitionBy("user_id").orderBy(Ord.map(col): _*).rowsBetween(-7, 0)
      val cnt = (c: org.apache.spark.sql.Column, w: org.apache.spark.sql.expressions.WindowSpec) =>
        sum(when(c, 1L).otherwise(0L)).over(w)
      withMoments(Tables.events(s, d))
        .withColumn("z", z)
        .withColumn("r1", (abs(col("z")) > 3.0).cast(LongType))
        .withColumn("r2",
          ((col("z") > 2.0 && cnt(col("z") > 2.0, w3) >= 2) ||
           (col("z") < -2.0 && cnt(col("z") < -2.0, w3) >= 2)).cast(LongType))
        .withColumn("r3",
          ((col("z") > 1.0 && cnt(col("z") > 1.0, w5) >= 4) ||
           (col("z") < -1.0 && cnt(col("z") < -1.0, w5) >= 4)).cast(LongType))
        .withColumn("r4",
          (cnt(col("z") > 0.0, w8) === 8 || cnt(col("z") < 0.0, w8) === 8).cast(LongType))
        .where(col("r1") + col("r2") + col("r3") + col("r4") > 0)
        .select(col("event_id"), col("user_id"), round6(col("z")).as("z"),
          col("r1"), col("r2"), col("r3"), col("r4"))
        .orderBy("event_id")
    },

    // Grubbs' outlier statistic per series: G = max |x−mean|/σ with the
    // argmax point, flagged against the reference's fixed 3.0 threshold
    // (config.py ANOMALY_THRESHOLD — the t-quantile critical value stays
    // downstream). One grouped-moment pass + one per-series rank window.
    "ts_grubbs" -> { (s, d) =>
      val dev = abs(col("value") - col("mean"))
      val g = dev / col("sd")
      val w = Window.partitionBy("user_id").orderBy(col("g").desc, col("event_id"))
      withMoments(Tables.events(s, d))
        .withColumn("g", g)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("user_id"), col("n"), round6(col("g")).as("g_stat"),
          col("event_id").as("outlier_event_id"),
          (round6(col("g")) > 3.0).cast(LongType).as("exceeds_3sigma"))
        .orderBy("user_id")
    },

    // Peaks-over-threshold EVT (the SPOT detector family): per series,
    // threshold u = the ceil(0.95·n)-th order statistic (integer rank
    // math — (19n+19) div 20 — so both engines pick the identical row,
    // no percentile-semantics drift), then a Generalized Pareto fit on
    // the excesses by method of moments: ξ = ½(1 − m̄²/s²),
    // σ = ½·m̄·(m̄²/s² + 1). Moments DECIMAL-exact; two shuffles total
    // (rank window + excess aggregate).
    "ts_evt_pot" -> { (s, d) =>
      val e = Tables.events(s, d)
      val wr = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
      val wn = Window.partitionBy("user_id")
      val ranked = e
        .withColumn("r", row_number().over(wr))
        .withColumn("n", count(lit(1)).over(wn).cast(LongType))
        .withColumn("k", expr("(19 * n + 19) div 20"))
      val thr = ranked.where(col("r") === col("k"))
        .select(col("user_id"), col("n"), col("value").as("u"))
      val exc = e.join(thr, Seq("user_id"))
        .where(col("value") > col("u"))
        .groupBy("user_id")
        .agg(first(col("n")).as("n"), first(col("u")).as("u"),
          count(lit(1)).cast(LongType).as("n_exc"),
          exactSum(col("value") - col("u")).as("sy"),
          exactSum((col("value") - col("u")) * (col("value") - col("u"))).as("syy"))
      val m1 = col("sy") / col("n_exc").cast("double")
      val s2 = momentVar(col("n_exc").cast("double"), col("sy"), col("syy"))
      val ratio = m1 * m1 / s2
      exc.select(col("user_id"), col("n"), col("u"), col("n_exc"),
          round6(lit(0.5) * (lit(1.0) - ratio)).as("xi"),
          round6(lit(0.5) * m1 * (ratio + lit(1.0))).as("sigma"))
        .orderBy("user_id")
    },

    // Sample entropy (Richman & Moorman 2000; m=2, r=0.2σ): B = pairs of
    // 2-point templates within Chebyshev distance r, A = same for
    // 3-point; SampEn = −ln(A/B). Template coords come from two bounded
    // leads; the pair stage is a per-series equi-join on user_id
    // (quadratic IN THE SERIES only — series length is bounded upstream
    // by resampling, and each series' pairs co-locate on one executor).
    // r derives from the DECIMAL-exact σ, so the ≤ r comparisons are on
    // bit-identical doubles; A and B are integers.
    "ts_sampen" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(Ord.map(col): _*)
      val t = withMoments(Tables.events(s, d))
        .withColumn("idx", row_number().over(w))
        .withColumn("x1", lead(col("value"), 1).over(w))
        .withColumn("x2", lead(col("value"), 2).over(w))
        .where(col("x2").isNotNull)
        .select(col("user_id"), col("n"), col("idx"),
          col("value").as("x0"), col("x1"), col("x2"),
          (col("sd") * 0.2).as("r"))
      val a = t.select(col("user_id"), col("n"), col("r"), col("idx").as("i"),
        col("x0").as("a0"), col("x1").as("a1"), col("x2").as("a2"))
      val b = t.select(col("user_id"), col("idx").as("j"),
        col("x0").as("b0"), col("x1").as("b1"), col("x2").as("b2"))
      val chebM = greatest(abs(col("a0") - col("b0")), abs(col("a1") - col("b1")))
      val chebM1 = greatest(chebM, abs(col("a2") - col("b2")))
      a.join(b, Seq("user_id"))
        .where(col("i") < col("j"))
        .groupBy("user_id")
        .agg(first(col("n")).as("n"),
          sum(when(chebM <= col("r"), 1L).otherwise(0L)).as("b_count"),
          sum(when(chebM1 <= col("r"), 1L).otherwise(0L)).as("a_count"))
        .select(col("user_id"), col("n"), col("b_count"), col("a_count"),
          round6(-log(col("a_count").cast("double") /
            when(col("b_count") > 0, col("b_count").cast("double"))))
            .as("sampen"))
        .orderBy("user_id")
    },

    // Exact matrix profile (Yeh et al. 2016; window w=8, exclusion zone
    // |i−j| ≥ w/2): mp[i] = min squared Euclidean distance from window i
    // to every non-trivial window j — the discord (max mp) is the
    // series' most anomalous shape, the motif (min mp) its most repeated
    // one. Windows come from 7 bounded leads; the pair stage is the
    // per-series equi-join (quadratic in the series ONLY, pairs
    // co-located per series — the same contract as ts_sampen; STOMP's
    // O(n²)→O(n² /w) trick is a single-node optimization that doesn't
    // change the shuffle shape). The 8 squared terms sum left-to-right
    // in both engines, so min/argmin pick identical windows.
    "ts_matrix_profile" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(Ord.map(col): _*)
      val base = Tables.events(s, d)
        .withColumn("idx", row_number().over(w))
        .withColumn("v0", col("value"))
      val leads = (1 to 7).foldLeft(base) { case (df, i) =>
        df.withColumn(s"v$i", lead(col("value"), i).over(w))
      }.where(col("v7").isNotNull)
      val a = leads.select(col("user_id") +: col("idx").as("i") +:
        (0 to 7).map(i => col(s"v$i").as(s"a$i")): _*)
      val b = leads.select(col("user_id") +: col("idx").as("j") +:
        (0 to 7).map(i => col(s"v$i").as(s"b$i")): _*)
      val dist = (0 to 7).map(i =>
        (col(s"a$i") - col(s"b$i")) * (col(s"a$i") - col(s"b$i"))).reduce(_ + _)
      val mp = a.join(b, Seq("user_id"))
        .where(abs(col("i") - col("j")) >= 4)
        .select(col("user_id"), col("i"), dist.as("dist"))
        .groupBy("user_id", "i").agg(min(col("dist")).as("mp"))
      val wd = Window.partitionBy("user_id").orderBy(col("mp").desc, col("i"))
      val wm = Window.partitionBy("user_id").orderBy(col("mp").asc, col("i"))
      mp.withColumn("rkd", row_number().over(wd))
        .withColumn("rkm", row_number().over(wm))
        .groupBy("user_id").agg(
          count(lit(1)).cast(LongType).as("n_windows"),
          min(when(col("rkd") === 1, col("i"))).cast(LongType).as("discord_idx"),
          round6(min(when(col("rkd") === 1, col("mp")))).as("discord_dist"),
          min(when(col("rkm") === 1, col("i"))).cast(LongType).as("motif_idx"),
          round6(min(when(col("rkm") === 1, col("mp")))).as("motif_dist"))
        .orderBy("user_id")
    },

    // Banded DTW divergence from the fleet reference (Sakoe-Chiba band,
    // Berndt & Clifford 1994): each user's daily-mean series vs the
    // GLOBAL daily-mean series under time warping — "whose weekly shape
    // diverges most from the fleet even allowing a few days of phase
    // shift", the alignment-tolerant sibling of the pointwise z/PSI
    // drift detectors (a user running the fleet's exact shape 2 days
    // late scores ~0 here and huge on any lockstep metric). Costs are
    // |a_i − b_j| on round4 daily means; the DP is plain adds +
    // order-independent 3-way mins, so the DuckDB twin replays the
    // identical wavefront via an anti-diagonal recursive CTE (cell
    // (i,j) materializes at iteration i+j with its three predecessors
    // carried as the previous two diagonals) — exact parity. Band =
    // max(7, |n−m|) so the corner is always reachable. Scale: daily
    // series length is bounded by the time span (the ts_pava_trend
    // contract), per-key DP is O(span·band), the global reference is
    // an O(span) model-sized readout (the calibration-row rule), and
    // the only shuffles are the two grouped means + one keyed group.
    "ts_dtw_profile" -> { (s, d) => dtwProfile(s, d) },

    // LOESS smoothing (Cleveland 1979, local linear, row-space span ±5,
    // tricube weights on |i−j|/6): each point's fit is a weighted OLS
    // over its 11-row neighborhood. Neighborhoods come from a bounded
    // band self-join per series (11 rows per anchor, co-located per
    // series); each weighted term is 6dp-quantized then DECIMAL-summed
    // (the psi pattern) so the normal-equation sums are order-proof and
    // bit-identical across engines.
    "ts_loess" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(Ord.map(col): _*)
      val base = Tables.events(s, d).withColumn("idx", row_number().over(w))
      val a = base.select(col("user_id"), col("event_id"),
        col("idx").as("i"), col("value").as("y0"))
      val b = base.select(col("user_id"), col("idx").as("j"), col("value").as("y"))
      val u = abs(col("i") - col("j")).cast("double") / 6.0
      val oneMinusU3 = lit(1.0) - (u * u) * u
      val wgt = round6((oneMinusU3 * oneMinusU3) * oneMinusU3)
      val x = col("j").cast("double")
      val sums = a.join(b, Seq("user_id"))
        .where(abs(col("i") - col("j")) <= 5)
        .select(col("user_id"), col("event_id"), col("i"), col("y0"),
          wgt.as("wt"), x.as("x"), col("y"))
        .groupBy("user_id", "event_id", "i", "y0").agg(
          exactSum(col("wt")).as("sw"),
          exactSum(round6(col("wt") * col("x"))).as("swx"),
          exactSum(round6(col("wt") * col("y"))).as("swy"),
          exactSum(round6(col("wt") * col("x") * col("x"))).as("swxx"),
          exactSum(round6(col("wt") * col("x") * col("y"))).as("swxy"))
      val beta = CleanFunctions.safeDiv(
        col("sw") * col("swxy") - col("swx") * col("swy"),
        col("sw") * col("swxx") - col("swx") * col("swx"))
      val alpha = (col("swy") - beta * col("swx")) / col("sw")
      val fitted = alpha + beta * col("i").cast("double")
      sums.select(col("event_id"),
          CleanFunctions.round4(fitted).as("smooth"),
          CleanFunctions.round4(col("y0") - fitted).as("resid"))
        .orderBy("event_id")
    },

    // Poisson bootstrap CI for the per-type mean (the distributed
    // bootstrap — Chamandy et al. 2012: each row draws an independent
    // Poisson(1) replication count per replicate, so resampling is one
    // stateless map over the data, never a gather). B=32 replicates,
    // counts from the inverse Poisson CDF on an md5-derived uniform
    // (thresholds baked as identical literals both engines, k truncated
    // at 4); replicate means from 6dp-quantized DECIMAL sums; the CI is
    // the [2nd, 31st] order statistic of the 32 means (≈90% band) — a
    // 32-row window per group. One map-side-combined shuffle total.
    "events_bootstrap_ci" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
      // ONE md5 per row; the 32 per-replicate uniforms come from integer
      // mixing with a PER-REPLICATE MULTIPLIER — u_r = h·(A + r·S) mod p
      // (p = 2³¹−1). The multiplier (not an additive offset) is
      // load-bearing: an additive r-shift would move every row's uniform
      // by the same constant, perfectly correlating the replicates and
      // collapsing the CI; a row-dependent increment h·S decorrelates
      // them. h·(A+31·S) < 7e15 — far inside BIGINT, exact on both
      // engines, no float in the hash path.
      val u = ((col("h") * (lit(BootA) + col("r").cast(LongType) * lit(BootS))) % lit(BootP) + 1L)
        .cast("double") / lit(2147483648.0)
      val k = PoissonThresholds.zipWithIndex.foldRight(lit(4): org.apache.spark.sql.Column) {
        case ((t, i), acc) => when(u < lit(t), i).otherwise(acc)
      }
      val reps = e
        // digest computed BELOW the explode — once per row, not 32x
        // (Catalyst won't hoist it for us: the projection holding it
        // would otherwise sit above the Generate).
        .select(col("event_type"), col("value"),
          pmod(CleanFunctions.md5Hash64(
            concat(lit("boot:"), col("event_id"))), lit(BootP)).as("h"))
        .select(col("event_type"), col("value"), col("h"),
          explode(sequence(lit(0), lit(31))).as("r"))
        .select(col("event_type"), col("r"), col("value"), k.as("k"))
        .groupBy("event_type", "r")
        .agg(sum(col("k")).cast(LongType).as("nk"),
          exactSum(col("k").cast("double") * col("value")).as("skv"))
        .where(col("nk") > 0)
        .withColumn("mean_r", col("skv") / col("nk").cast("double"))
      val wr = Window.partitionBy("event_type").orderBy(col("mean_r"), col("r"))
      val ci = reps.withColumn("rk", row_number().over(wr))
        .groupBy("event_type").agg(
          min(when(col("rk") === 2, col("mean_r"))).as("ci_lo"),
          min(when(col("rk") === 31, col("mean_r"))).as("ci_hi"))
      val base = e.groupBy("event_type").agg(
        count(lit(1)).cast(LongType).as("n"),
        (exactSum(col("value")) / count(lit(1))).as("mean"))
      base.join(ci, Seq("event_type"))
        .select(col("event_type"), col("n"), round6(col("mean")).as("mean"),
          round6(col("ci_lo")).as("ci_lo"), round6(col("ci_hi")).as("ci_hi"))
        .orderBy("event_type")
    },

    // Inter-event burstiness B = (σ−μ)/(σ+μ) over inter-arrival gaps
    // (Goh & Barabási 2008; B→−1 periodic, 0 Poisson, →1 bursty) plus
    // the Fano factor (var/mean of hourly counts — overdispersion).
    // Gaps in HOURS rounded 4dp before the DECIMAL moment sums (keeps
    // squares far inside DECIMAL(18,6) range for month-long series);
    // hourly counts from one date_trunc aggregate (empty buckets carry
    // no rows and are deliberately excluded — the Fano here conditions
    // on activity; the gap-fill spine operator exists separately).
    "ts_burstiness" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val gaps = Tables.events(s, d)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("gap", CleanFunctions.round4(
          (col("tsu") - lag(col("tsu"), 1).over(w)).cast("double") / lit(3600000000.0)))
        .where(col("gap").isNotNull)
        .groupBy("user_id").agg(
          count(lit(1)).cast(LongType).as("n_gaps"),
          exactSum(col("gap")).as("sg"),
          exactSum(CleanFunctions.round4(col("gap") * col("gap"))).as("sgg"))
        .where(col("n_gaps") >= 2)
      val gm = col("sg") / col("n_gaps").cast("double")
      val gsd = momentStd(col("n_gaps").cast("double"), col("sg"), col("sgg"))
      val b = CleanFunctions.safeDiv(gsd - gm, gsd + gm)
      val fano = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"))
        .groupBy("user_id").agg(
          count(lit(1)).cast(LongType).as("n_buckets"),
          exactSum(col("c").cast("double")).as("sc"),
          exactSum(col("c").cast("double") * col("c").cast("double")).as("scc"))
        .withColumn("fano", CleanFunctions.safeDiv(
          momentVar(col("n_buckets").cast("double"), col("sc"), col("scc")),
          col("sc") / col("n_buckets").cast("double")))
        .select(col("user_id"), col("n_buckets"), col("fano"))
      gaps.join(fano, Seq("user_id"))
        .select(col("user_id"), col("n_gaps"), col("n_buckets"),
          round6(b).as("burstiness"), round6(col("fano")).as("fano"))
        .orderBy("user_id")
    },

    // Theta-method forecast (Assimakopoulos & Nikolopoulos 2000; via the
    // Hyndman & Billah 2003 equivalence: SES level + h·(OLS slope)/2).
    // Level = the production truncated-EWMA operator evaluated at the
    // series' last row; drift = DECIMAL-exact OLS slope on the row index.
    // Horizons 1..3 explode per series. One moment aggregate + one
    // bounded lag-kernel window — no recursion needed at any scale.
    "ts_theta_forecast" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(Ord.map(col): _*)
      val withIdx = Tables.events(s, d).withColumn("idx", row_number().over(w))
      val lev = graft.operators.TimeSeriesOps.ewma(
        withIdx, Seq("user_id"), Ord, "value", alpha = 0.3, span = 12, outCol = "lev")
      val wl = Window.partitionBy("user_id").orderBy(col("idx").desc)
      val lastLev = lev.withColumn("rk", row_number().over(wl))
        .where(col("rk") === 1).select(col("user_id"), col("lev"))
      val mom = withIdx
        .select(col("user_id"), col("idx").cast("double").as("x"), col("value").as("y"))
        .groupBy("user_id").agg(
          count(lit(1)).cast("double").as("cn"),
          exactSum(col("x")).as("sx"), exactSum(col("y")).as("sy"),
          exactSum(round6(col("x") * col("y"))).as("sxy"),
          exactSum(col("x") * col("x")).as("sxx"))
      val slope = CleanFunctions.safeDiv(
        col("cn") * col("sxy") - col("sx") * col("sy"),
        col("cn") * col("sxx") - col("sx") * col("sx"))
      lastLev.join(mom, Seq("user_id"))
        .withColumn("slope", slope)
        .select(col("user_id"), col("lev"), col("slope"),
          explode(sequence(lit(1L), lit(3L))).as("h"))
        .select(col("user_id"), col("h"),
          CleanFunctions.round4(
            col("lev") + col("h").cast("double") * (col("slope") / 2.0))
            .as("forecast"))
        .orderBy("user_id", "h")
    },

    // Sequential probability ratio test (Wald 1945) per series — the
    // always-monitoring A/B shape: each user's click stream is scored
    // against H0 (the global view-baseline mean) vs H1 (a +5% lift),
    // normal LLR increments 6dp-quantized then DECIMAL-cumsum'd (keyed
    // window — order-proof), decision = first crossing of ln(19) /
    // ln(1/19) (α=β=0.05). Baseline is one bounded scalar aggregate
    // broadcast to the stream; everything else is per-series windows.
    "events_sprt" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
      val ctrl = e.where(col("event_type") === "view").agg(
        count(lit(1)).cast("double").as("cn"),
        exactSum(col("value")).as("csx"),
        exactSum(col("value") * col("value")).as("csxx"))
      val upper = SprtUpper
      val lower = SprtLower
      val wo = Window.partitionBy("user_id").orderBy(Ord.map(col): _*)
      val cum = e.where(col("event_type") === "click")
        .crossJoin(broadcast(ctrl))
        .withColumn("mu0", col("csx") / col("cn"))
        .withColumn("sig2", momentVar(col("cn"), col("csx"), col("csxx")))
        .withColumn("mu1", col("mu0") * 1.05)
        .withColumn("llr_term", round6(
          ((col("mu1") - col("mu0")) * col("value") -
            (col("mu1") * col("mu1") - col("mu0") * col("mu0")) / 2.0) / col("sig2")))
        .withColumn("idx", row_number().over(wo).cast(LongType))
        .withColumn("llr", CleanFunctions.exactSumOver(col("llr_term"),
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val dec = cum.groupBy("user_id").agg(
        count(lit(1)).cast(LongType).as("n_obs"),
        max(struct(col("idx").as("i"), col("llr").as("l"))).as("last"),
        min(when(col("llr") > upper, col("idx"))).as("up_at"),
        min(when(col("llr") < lower, col("idx"))).as("lo_at"))
      val decisionAt =
        when(col("up_at").isNotNull &&
          (col("lo_at").isNull || col("up_at") <= col("lo_at")), col("up_at"))
          .when(col("lo_at").isNotNull, col("lo_at"))
      val decision =
        when(col("up_at").isNotNull &&
          (col("lo_at").isNull || col("up_at") <= col("lo_at")), "reject_h0")
          .when(col("lo_at").isNotNull, "accept_h0")
          .otherwise("continue")
      dec.select(col("user_id"), col("n_obs"),
          round6(col("last.l")).as("final_llr"),
          decision.as("decision"), decisionAt.as("decision_at"))
        .orderBy("user_id")
    },

    // Streaming Wald SPRT — the stateful twin of events_sprt, and the
    // test that IS sequential by construction (Wald designed it for
    // observation-at-a-time decisions): per-key DECIMAL-exact LLR
    // accumulation with first-crossing capture inside an emit-once
    // EventTimeTimeout fold (a decision is a TERMINAL summary, the
    // streaming_croston contract), O(1) state per key. μ₀/μ₁/σ² come
    // from the offline control baseline (driver-computed doubles via
    // the IDENTICAL column expressions as the batch twin, broadcast
    // into the fold — the stream-static pattern). DRIVER-VERIFIED: the
    // oracle is the batch twin's SQL, verbatim.
    "streaming_sprt" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val e = Tables.events(s, d).where(col("value").isNotNull)
      val base = e.where(col("event_type") === "view").agg(
          count(lit(1)).cast("double").as("cn"),
          exactSum(col("value")).as("csx"),
          exactSum(col("value") * col("value")).as("csxx"))
        .select((col("csx") / col("cn")).as("mu0"),
          momentVar(col("cn"), col("csx"), col("csxx")).as("sig2"))
        .head()
      val mu0 = base.getDouble(0)
      val sig2 = base.getDouble(1)
      val mu1 = mu0 * 1.05
      val rows = e.where(col("event_type") === "click")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      val maxUs = rows.iterator.map(r => StreamingAnomaly.tsUs(r.ts)).max
      val punct = StreamingAnomaly.punctuationEvent(maxUs + 10L * 86400L * 1000000L)
      StreamingAnomaly.replayToSink(s, rows, "graft_streaming_sprt",
          Some(punct))(ds => StreamingAnomaly.sprt(ds, mu0, mu1, sig2,
            upper = SprtUpper, lower = SprtLower).toDF())
        .select(col("user_id"), col("n_obs"),
          round6(col("llr")).as("final_llr"),
          col("decision"), col("decision_at"))
        .orderBy("user_id")
    },

    // Hour-of-day seasonal z-score (the calendar-baseline detector ops
    // teams run before any model): baseline mean/σ per (series, hour)
    // from DECIMAL-exact moments, every event scored against ITS hour's
    // baseline — a 3σ spike at 3am that would hide inside the all-day σ
    // stands out. Baseline is one map-side agg (series×24 rows), scored
    // by an equi-join on (user_id, hr); emits every row with the flag so
    // downstream thresholds stay tunable.
    "ts_seasonal_zscore" -> { (s, d) =>
      val e = Tables.events(s, d).withColumn("hr", hour(col("ts")).cast(LongType))
      val base = e.groupBy("user_id", "hr").agg(
        count(lit(1)).cast(LongType).as("bn"),
        exactSum(col("value")).as("bsx"),
        exactSum(col("value") * col("value")).as("bsxx"))
      val mean = col("bsx") / col("bn").cast("double")
      val sd = momentStd(col("bn").cast("double"), col("bsx"), col("bsxx"))
      val z = CleanFunctions.safeDiv(col("value") - mean, sd)
      e.join(base, Seq("user_id", "hr"))
        .select(col("event_id"), col("hr"), round6(z).as("z"),
          // when/otherwise, not a bool cast: a null z (single-obs hour
          // baseline, sd undefined) must flag 0 like the oracle's CASE,
          // not propagate null.
          when(abs(z) > 3.0, 1L).otherwise(0L).as("is_anomaly"))
        .orderBy("event_id")
    },

    // Record statistics (Glick 1978): count of running maxima per series
    // vs the i.i.d. expectation H_n ≈ ln n + γ — materially MORE records
    // than expected is a trend/level-shift signal with zero parameters
    // (the nonparametric cousin of Mann-Kendall). One bounded-frame
    // window + one grouped agg.
    "ts_records" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(Ord.map(col): _*)
      val prevMax = max(col("value"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      val expected = log(col("n").cast("double")) + lit(EulerGamma)
      Tables.events(s, d)
        .withColumn("pm", prevMax)
        .withColumn("is_rec",
          when(col("pm").isNull || col("value") > col("pm"), 1L).otherwise(0L))
        .groupBy("user_id").agg(
          count(lit(1)).cast(LongType).as("n"),
          sum(col("is_rec")).as("n_records"))
        .select(col("user_id"), col("n"), col("n_records"),
          round6(expected).as("expected_records"),
          round6(col("n_records").cast("double") / expected).as("record_ratio"))
        .orderBy("user_id")
    },

    // Out-of-order-arrival diagnostic (the watermark-sizing input every
    // streaming deployment needs): Kendall-tau concordance between
    // arrival order (event_id — the ingest sequence) and event-time
    // order, per series. inversions = late-arriving pairs; tau near 1 =
    // in-order feed, near 0 = shuffled. Pair stage is the per-series
    // equi-join (quadratic in the SERIES, pairs co-located — the
    // ts_sampen contract); counts integer, ratios exact.
    "events_disorder" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val t = Tables.events(s, d)
        .withColumn("arr", row_number().over(w))
        .select(col("user_id"), col("arr"),
          CleanFunctions.epochUs(col("ts")).as("tsu"))
      val a = t.select(col("user_id"), col("arr").as("ai"), col("tsu").as("ti"))
      val b = t.select(col("user_id"), col("arr").as("aj"), col("tsu").as("tj"))
      a.join(b, Seq("user_id")).where(col("ai") < col("aj"))
        .groupBy("user_id").agg(
          count(lit(1)).cast(LongType).as("n_pairs"),
          sum(when(col("ti") > col("tj"), 1L).otherwise(0L)).as("inversions"))
        .select(col("user_id"), col("n_pairs"), col("inversions"),
          round6(col("inversions").cast("double") / col("n_pairs").cast("double"))
            .as("disorder_rate"),
          round6(lit(1.0) - lit(2.0) * (col("inversions").cast("double") /
            col("n_pairs").cast("double"))).as("kendall_tau"))
        .orderBy("user_id")
    },

    // STREAM-STATIC join scoring — the model-serving streaming shape the
    // other 11 streaming entries don't cover: a batch-computed feature
    // table (the hour-of-day baseline) joined against a live stream each
    // micro-batch (stateless, no watermark; the static side broadcasts).
    // Replayed through the MemoryStream harness and driver-verified
    // exact-hash against the same calendar-baseline SQL as
    // ts_seasonal_zscore (value-null rows filtered on the scored side —
    // the Event feed's contract — baseline unchanged).
    "streaming_seasonal_score" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val all = Tables.events(s, d)
      val base = all
        .groupBy(col("user_id"), hour(col("ts")).cast(LongType).as("hr"))
        .agg(count(lit(1)).cast(LongType).as("bn"),
          exactSum(col("value")).as("bsx"),
          exactSum(col("value") * col("value")).as("bsxx"))
      val mean = col("bsx") / col("bn").cast("double")
      val sd = momentStd(col("bn").cast("double"), col("bsx"), col("bsxx"))
      val z = CleanFunctions.safeDiv(col("value") - mean, sd)
      val rows = all.where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      StreamingAnomaly.replayToSink(s, rows, "graft_streaming_seasonal", None)(
        ds => ds.toDF()
          .withColumn("hr", hour(col("ts")).cast(LongType))
          .join(base, Seq("user_id", "hr"))
          .select(col("event_id"), col("hr"), round6(z).as("z"),
            when(abs(z) > 3.0, 1L).otherwise(0L).as("is_anomaly")))
        .orderBy("event_id")
    }
  )

  val oracleSql: Map[String, String] = Map(
    // Anti-diagonal DTW wavefront: dp's working set is diag k (fresh=1)
    // + diag k-1 (fresh=0, re-emitted once); a diag-(k+1) cell takes
    // min over its (i−1,j)/(i,j−1) contributions from the fresh rows
    // and (i−1,j−1) from the copies — single recursive reference, the
    // same cells in the same order as TimeSeriesOps.dtwBanded.
    "ts_dtw_profile" -> {
      val mean4 = CleanFunctions.round4Sql(CleanFunctions.exactMeanSql("value"))
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
         |  FROM events WHERE value IS NOT NULL),
         |ad AS (SELECT user_id, day, $mean4 AS m FROM e GROUP BY 1, 2),
         |a AS (SELECT user_id, day, m,
         |  row_number() OVER (PARTITION BY user_id ORDER BY day) AS i FROM ad),
         |bd AS (SELECT day, $mean4 AS w FROM e GROUP BY 1),
         |b AS (SELECT day, w, row_number() OVER (ORDER BY day) AS j FROM bd),
         |dims AS (SELECT user_id, max(i) AS n FROM a GROUP BY 1),
         |mm AS (SELECT max(j) AS mj FROM b),
         |bands AS (SELECT user_id,
         |  greatest($DtwBand, abs(n - (SELECT mj FROM mm))) AS band FROM dims),
         |cost AS (
         |  SELECT a.user_id, a.i, b.j, abs(a.m - b.w) AS c
         |  FROM a JOIN bands USING (user_id) JOIN b
         |    ON abs(a.i - b.j) <= bands.band),
         |dp AS (
         |  SELECT user_id, i, j, c AS d, 1 AS fresh FROM cost
         |  WHERE i = 1 AND j = 1
         |  UNION ALL
         |  SELECT s.user_id, s.i2, s.j2,
         |    CASE WHEN s.typ = 'n' THEN cst.c + s.md ELSE s.md END AS d,
         |    CASE WHEN s.typ = 'n' THEN 1 ELSE 0 END AS fresh
         |  FROM (
         |    SELECT w.user_id, w.i + o.di AS i2, w.j + o.dj AS j2, o.typ,
         |      min(w.d) AS md
         |    FROM dp w, (VALUES (1, 0, 'n', 1), (0, 1, 'n', 1),
         |      (1, 1, 'n', 0), (0, 0, 'c', 1)) o(di, dj, typ, fr)
         |    WHERE w.fresh = o.fr
         |    GROUP BY 1, 2, 3, 4) s
         |  LEFT JOIN cost cst
         |    ON cst.user_id = s.user_id AND cst.i = s.i2 AND cst.j = s.j2
         |  WHERE (s.typ = 'c') OR cst.c IS NOT NULL)
         |SELECT d1.user_id, dims.n AS n_days,
         |  ${CleanFunctions.round4Sql("d1.d")} AS dtw
         |FROM dp d1 JOIN dims USING (user_id) CROSS JOIN mm
         |WHERE d1.fresh = 1 AND d1.i = dims.n AND d1.j = mm.mj
         |ORDER BY user_id""".stripMargin
    },

    "events_p_chart" ->
      s"""WITH daily AS (
         |  SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day,
         |    count(*) AS n,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |cl AS (SELECT CAST(sum(x) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS pbar FROM daily),
         |r AS (SELECT day, n, x, pbar,
         |  ${round6Sql("CAST(x AS DOUBLE) / CAST(n AS DOUBLE)")} AS p,
         |  sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE)) AS sig
         |  FROM daily, cl),
         |b AS (SELECT day, n, x, p, pbar,
         |  ${round6Sql("pbar + 3.0 * sig")} AS ucl,
         |  ${round6Sql("greatest(pbar - 3.0 * sig, 0.0)")} AS lcl
         |  FROM r)
         |SELECT day, n, x, p, ${round6Sql("pbar")} AS pbar, ucl, lcl,
         |  CAST(CASE WHEN p > ucl OR p < lcl THEN 1 ELSE 0 END AS BIGINT) AS oob
         |FROM b ORDER BY day""".stripMargin,

    "ts_we_rules" -> {
      def cnt(cond: String, pre: Int) =
        s"sum(CASE WHEN $cond THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN $pre PRECEDING AND CURRENT ROW)"
      s"""WITH $MomentsCte,
         |z AS (SELECT e.event_id, e.user_id, e.ts,
         |  (e.value - $MeanSql) / $SdSql AS z
         |  FROM events e JOIN m ON e.user_id = m.user_id),
         |r AS (SELECT event_id, user_id, z,
         |  CAST(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END AS BIGINT) AS r1,
         |  CAST(CASE WHEN (z > 2.0 AND ${cnt("z > 2.0", 2)} >= 2)
         |         OR (z < -2.0 AND ${cnt("z < -2.0", 2)} >= 2)
         |       THEN 1 ELSE 0 END AS BIGINT) AS r2,
         |  CAST(CASE WHEN (z > 1.0 AND ${cnt("z > 1.0", 4)} >= 4)
         |         OR (z < -1.0 AND ${cnt("z < -1.0", 4)} >= 4)
         |       THEN 1 ELSE 0 END AS BIGINT) AS r3,
         |  CAST(CASE WHEN ${cnt("z > 0.0", 7)} = 8
         |         OR ${cnt("z < 0.0", 7)} = 8
         |       THEN 1 ELSE 0 END AS BIGINT) AS r4
         |  FROM z)
         |SELECT event_id, user_id, ${round6Sql("z")} AS z, r1, r2, r3, r4
         |FROM r WHERE r1 + r2 + r3 + r4 > 0 ORDER BY event_id""".stripMargin
    },

    "ts_grubbs" ->
      s"""WITH $MomentsCte,
         |g AS (SELECT e.user_id, m.n, e.event_id,
         |  abs(e.value - $MeanSql) / $SdSql AS g,
         |  row_number() OVER (PARTITION BY e.user_id
         |    ORDER BY abs(e.value - $MeanSql) / $SdSql DESC, e.event_id) AS rk
         |  FROM events e JOIN m ON e.user_id = m.user_id)
         |SELECT user_id, n, ${round6Sql("g")} AS g_stat,
         |  event_id AS outlier_event_id,
         |  CAST(CASE WHEN ${round6Sql("g")} > 3.0 THEN 1 ELSE 0 END AS BIGINT) AS exceeds_3sigma
         |FROM g WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "ts_evt_pot" -> {
      val m1 = "(x.sy / CAST(x.n_exc AS DOUBLE))"
      val s2 = momentVarSql("CAST(x.n_exc AS DOUBLE)", "x.sy", "x.syy")
      val ratio = s"($m1 * $m1 / $s2)"
      s"""WITH rk AS (SELECT user_id, event_id, value,
         |  row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS r,
         |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
         |  FROM events),
         |thr AS (SELECT user_id, n, value AS u FROM rk WHERE r = (19 * n + 19) // 20),
         |x AS (SELECT e.user_id, any_value(t.n) AS n, any_value(t.u) AS u,
         |  CAST(count(*) AS BIGINT) AS n_exc,
         |  ${exactSumSql("e.value - t.u")} AS sy,
         |  ${exactSumSql("(e.value - t.u) * (e.value - t.u)")} AS syy
         |  FROM events e JOIN thr t ON e.user_id = t.user_id
         |  WHERE e.value > t.u GROUP BY e.user_id)
         |SELECT x.user_id, x.n, x.u, x.n_exc,
         |  ${round6Sql(s"0.5 * (1.0 - $ratio)")} AS xi,
         |  ${round6Sql(s"0.5 * $m1 * ($ratio + 1.0)")} AS sigma
         |FROM x ORDER BY x.user_id""".stripMargin
    },

    "ts_sampen" -> {
      val cm = "greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1))"
      val cm1 = s"greatest($cm, abs(a.x2 - b.x2))"
      s"""WITH $MomentsCte,
         |t AS (SELECT e.user_id, m.n, $SdSql * 0.2 AS r,
         |  row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS idx,
         |  e.value AS x0,
         |  lead(e.value, 1) OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS x1,
         |  lead(e.value, 2) OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS x2
         |  FROM events e JOIN m ON e.user_id = m.user_id
         |  QUALIFY x2 IS NOT NULL),
         |p AS (SELECT a.user_id, any_value(a.n) AS n,
         |  CAST(sum(CASE WHEN $cm <= a.r THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
         |  CAST(sum(CASE WHEN $cm1 <= a.r THEN 1 ELSE 0 END) AS BIGINT) AS a_count
         |  FROM t a JOIN t b ON a.user_id = b.user_id AND a.idx < b.idx
         |  GROUP BY a.user_id)
         |SELECT user_id, n, b_count, a_count,
         |  CASE WHEN a_count > 0 AND b_count > 0 THEN
         |    ${round6Sql("-ln(CAST(a_count AS DOUBLE) / CAST(b_count AS DOUBLE))")}
         |  END AS sampen
         |FROM p ORDER BY user_id""".stripMargin
    },

    "ts_matrix_profile" -> {
      val dist = (0 to 7).map(i =>
        s"(a.v$i - b.v$i) * (a.v$i - b.v$i)").mkString(" + ")
      val leads = (1 to 7).map(i =>
        s"lead(value, $i) OVER win AS v$i").mkString(", ")
      s"""WITH s AS (SELECT user_id, value AS v0, $leads,
         |  row_number() OVER win AS idx
         |  FROM events
         |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |t AS (SELECT * FROM s WHERE v7 IS NOT NULL),
         |d AS (SELECT a.user_id, a.idx AS i, min($dist) AS mp
         |  FROM t a JOIN t b ON a.user_id = b.user_id AND abs(a.idx - b.idx) >= 4
         |  GROUP BY a.user_id, a.idx),
         |r AS (SELECT user_id, i, mp,
         |  row_number() OVER (PARTITION BY user_id ORDER BY mp DESC, i) AS rkd,
         |  row_number() OVER (PARTITION BY user_id ORDER BY mp ASC, i) AS rkm
         |  FROM d)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(min(CASE WHEN rkd = 1 THEN i END) AS BIGINT) AS discord_idx,
         |  ${round6Sql("min(CASE WHEN rkd = 1 THEN mp END)")} AS discord_dist,
         |  CAST(min(CASE WHEN rkm = 1 THEN i END) AS BIGINT) AS motif_idx,
         |  ${round6Sql("min(CASE WHEN rkm = 1 THEN mp END)")} AS motif_dist
         |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "ts_loess" -> {
      val u = "(CAST(abs(a.i - b.j) AS DOUBLE) / 6.0)"
      val om = s"(1.0 - ($u * $u) * $u)"
      val wgt = round6Sql(s"($om * $om) * $om")
      val beta = "((sw * swxy - swx * swy) / nullif(sw * swxx - swx * swx, 0.0))"
      val fitted = s"((swy - $beta * swx) / sw + $beta * CAST(i AS DOUBLE))"
      s"""WITH s AS (SELECT user_id, event_id, value,
         |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
         |  FROM events),
         |a AS (SELECT user_id, event_id, idx AS i, value AS y0 FROM s),
         |b AS (SELECT user_id, idx AS j, value AS y FROM s),
         |p AS (SELECT a.user_id, a.event_id, a.i, a.y0,
         |  $wgt AS wt, CAST(b.j AS DOUBLE) AS x, b.y AS y
         |  FROM a JOIN b ON a.user_id = b.user_id AND abs(a.i - b.j) <= 5),
         |g AS (SELECT user_id, event_id, i, y0,
         |  ${exactSumSql("wt")} AS sw,
         |  ${exactSumSql(round6Sql("wt * x"))} AS swx,
         |  ${exactSumSql(round6Sql("wt * y"))} AS swy,
         |  ${exactSumSql(round6Sql("wt * x * x"))} AS swxx,
         |  ${exactSumSql(round6Sql("wt * x * y"))} AS swxy
         |  FROM p GROUP BY user_id, event_id, i, y0)
         |SELECT event_id,
         |  ${CleanFunctions.round4Sql(fitted)} AS smooth,
         |  ${CleanFunctions.round4Sql(s"y0 - $fitted")} AS resid
         |FROM g ORDER BY event_id""".stripMargin
    },

    "events_bootstrap_ci" -> {
      val Seq(t0, t1, t2, t3) = PoissonThresholds.map(CleanFunctions.dlitSql)
      val u = s"(CAST(((${CleanFunctions.md5Hash64Sql("'boot:' || event_id")} % $BootP) * ($BootA + r * $BootS)) % $BootP + 1 AS DOUBLE) / 2147483648.0)"
      s"""WITH e AS (SELECT event_id, event_type, value FROM events
         |  WHERE value IS NOT NULL),
         |x AS (SELECT event_id, event_type, value,
         |  unnest(generate_series(0, 31)) AS r FROM e),
         |kk AS (SELECT event_type, r, value,
         |  CASE WHEN $u < $t0 THEN 0 WHEN $u < $t1 THEN 1
         |       WHEN $u < $t2 THEN 2 WHEN $u < $t3 THEN 3 ELSE 4 END AS k
         |  FROM x),
         |rep AS (SELECT event_type, r, CAST(sum(k) AS BIGINT) AS nk,
         |  ${exactSumSql("CAST(k AS DOUBLE) * value")} AS skv
         |  FROM kk GROUP BY event_type, r HAVING sum(k) > 0),
         |rm AS (SELECT event_type, r, skv / CAST(nk AS DOUBLE) AS mean_r,
         |  row_number() OVER (PARTITION BY event_type
         |    ORDER BY skv / CAST(nk AS DOUBLE), r) AS rk FROM rep),
         |ci AS (SELECT event_type,
         |  min(CASE WHEN rk = 2 THEN mean_r END) AS ci_lo,
         |  min(CASE WHEN rk = 31 THEN mean_r END) AS ci_hi
         |  FROM rm GROUP BY event_type),
         |b AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  ${CleanFunctions.exactMeanSql("value")} AS mean
         |  FROM e GROUP BY event_type)
         |SELECT b.event_type, b.n, ${round6Sql("b.mean")} AS mean,
         |  ${round6Sql("ci.ci_lo")} AS ci_lo, ${round6Sql("ci.ci_hi")} AS ci_hi
         |FROM b JOIN ci ON b.event_type = ci.event_type
         |ORDER BY b.event_type""".stripMargin
    },

    "ts_burstiness" -> {
      val r4 = CleanFunctions.round4Sql _
      val gm = "(sg / CAST(n_gaps AS DOUBLE))"
      val gsd = momentStdSql("CAST(n_gaps AS DOUBLE)", "sg", "sgg")
      val fano = s"(${momentVarSql("CAST(n_buckets AS DOUBLE)", "sc", "scc")} / nullif(sc / CAST(n_buckets AS DOUBLE), 0.0))"
      s"""WITH g AS (SELECT user_id,
         |  ${r4("""CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS DOUBLE)
         |    / 3600000000.0""")} AS gap
         |  FROM events),
         |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         |  ${exactSumSql("gap")} AS sg,
         |  ${exactSumSql(r4("gap * gap"))} AS sgg
         |  FROM g WHERE gap IS NOT NULL GROUP BY 1 HAVING count(*) >= 2),
         |h AS (SELECT user_id, date_trunc('hour', ts) AS hb, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_buckets,
         |  ${exactSumSql("CAST(c AS DOUBLE)")} AS sc,
         |  ${exactSumSql("CAST(c AS DOUBLE) * CAST(c AS DOUBLE)")} AS scc
         |  FROM h GROUP BY 1)
         |SELECT m.user_id, m.n_gaps, f.n_buckets,
         |  ${round6Sql(s"(($gsd) - $gm) / nullif(($gsd) + $gm, 0.0)")} AS burstiness,
         |  ${round6Sql(fano)} AS fano
         |FROM m JOIN f ON m.user_id = f.user_id
         |ORDER BY m.user_id""".stripMargin
    },

    "ts_theta_forecast" -> {
      val kernel = {
        val terms = (0 until 12).map { j =>
          val wt = CleanFunctions.dlitSql(math.pow(0.7, j))
          val v = if (j == 0) "value"
                  else s"lag(value, $j) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
          (s"coalesce(CASE WHEN $v IS NOT NULL THEN $wt * $v END, 0.0)",
            s"coalesce(CASE WHEN $v IS NOT NULL THEN $wt END, 0.0)")
        }
        s"((${terms.map(_._1).mkString(" + ")}) / nullif(${terms.map(_._2).mkString(" + ")}, 0.0))"
      }
      val slope = "((cn * sxy - sx * sy) / nullif(cn * sxx - sx * sx, 0.0))"
      s"""WITH lv AS (SELECT user_id, $kernel AS lev,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rk
         |  FROM events),
         |ll AS (SELECT user_id, lev FROM lv WHERE rk = 1),
         |ix AS (SELECT user_id, value AS y,
         |  CAST(row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id) AS DOUBLE) AS x
         |  FROM events),
         |m AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS cn,
         |  ${exactSumSql("x")} AS sx, ${exactSumSql("y")} AS sy,
         |  ${exactSumSql(round6Sql("x * y"))} AS sxy,
         |  ${exactSumSql("x * x")} AS sxx
         |  FROM ix GROUP BY user_id)
         |SELECT ll.user_id, h,
         |  ${CleanFunctions.round4Sql(s"ll.lev + CAST(h AS DOUBLE) * ($slope / 2.0)")} AS forecast
         |FROM ll JOIN m ON ll.user_id = m.user_id,
         |  (SELECT unnest(generate_series(1, 3)) AS h)
         |ORDER BY ll.user_id, h""".stripMargin
    },

    "events_sprt" -> SprtOracleSql,

    // The emit-once streaming fold replays to the identical SQL (same
    // shared-body rule as streaming_croston).
    "streaming_sprt" -> SprtOracleSql,

    "ts_seasonal_zscore" -> {
      val mean = "(b.bsx / CAST(b.bn AS DOUBLE))"
      val sd = momentStdSql("CAST(b.bn AS DOUBLE)", "b.bsx", "b.bsxx")
      val z = s"((e.value - $mean) / nullif($sd, 0.0))"
      s"""WITH b AS (SELECT user_id, hour(ts) AS hr,
         |  CAST(count(*) AS BIGINT) AS bn,
         |  ${exactSumSql("value")} AS bsx,
         |  ${exactSumSql("value * value")} AS bsxx
         |  FROM events GROUP BY 1, 2)
         |SELECT e.event_id, CAST(hour(e.ts) AS BIGINT) AS hr,
         |  ${round6Sql(z)} AS z,
         |  CAST(CASE WHEN abs($z) > 3.0 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM events e JOIN b ON e.user_id = b.user_id AND hour(e.ts) = b.hr
         |ORDER BY e.event_id""".stripMargin
    },

    "ts_records" -> {
      val g = CleanFunctions.dlitSql(EulerGamma)
      val expected = s"(ln(CAST(n AS DOUBLE)) + $g)"
      s"""WITH r AS (SELECT user_id, value,
         |  max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM events),
         |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN pm IS NULL OR value > pm THEN 1 ELSE 0 END) AS BIGINT) AS n_records
         |  FROM r GROUP BY 1)
         |SELECT user_id, n, n_records,
         |  ${round6Sql(expected)} AS expected_records,
         |  ${round6Sql(s"CAST(n_records AS DOUBLE) / $expected")} AS record_ratio
         |FROM g ORDER BY user_id""".stripMargin
    },

    "events_disorder" ->
      s"""WITH t AS (SELECT user_id,
         |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS arr,
         |  epoch_us(ts) AS tsu FROM events),
         |p AS (SELECT a.user_id,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN a.tsu > b.tsu THEN 1 ELSE 0 END) AS BIGINT) AS inversions
         |  FROM t a JOIN t b ON a.user_id = b.user_id AND a.arr < b.arr
         |  GROUP BY a.user_id)
         |SELECT user_id, n_pairs, inversions,
         |  ${round6Sql("CAST(inversions AS DOUBLE) / CAST(n_pairs AS DOUBLE)")} AS disorder_rate,
         |  ${round6Sql("1.0 - 2.0 * (CAST(inversions AS DOUBLE) / CAST(n_pairs AS DOUBLE))")} AS kendall_tau
         |FROM p ORDER BY user_id""".stripMargin,

    "streaming_seasonal_score" -> {
      val mean = "(b.bsx / CAST(b.bn AS DOUBLE))"
      val sd = momentStdSql("CAST(b.bn AS DOUBLE)", "b.bsx", "b.bsxx")
      val z = s"((e.value - $mean) / nullif($sd, 0.0))"
      s"""WITH b AS (SELECT user_id, hour(ts) AS hr,
         |  CAST(count(*) AS BIGINT) AS bn,
         |  ${exactSumSql("value")} AS bsx,
         |  ${exactSumSql("value * value")} AS bsxx
         |  FROM events GROUP BY 1, 2)
         |SELECT e.event_id, CAST(hour(e.ts) AS BIGINT) AS hr,
         |  ${round6Sql(z)} AS z,
         |  CAST(CASE WHEN abs($z) > 3.0 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM events e JOIN b ON e.user_id = b.user_id AND hour(e.ts) = b.hr
         |WHERE e.value IS NOT NULL
         |ORDER BY e.event_id""".stripMargin
    }
  )
}
