package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.CleanFunctions
import graft.functions.CleanFunctions.{exactSum, exactSumSql, round4, round4Sql, round6, round6Sql}
import graft.operators.{StatsOps, TimeSeriesOps}
import graft.sources.Tables

/** Time-series FEATURE CATALOG (the Hyndman tsfeatures set): per-series
  * scalar descriptors — tiled stability/lumpiness, flat spots, median
  * crossing points, the ARCH effect statistic, and the Hill tail-index
  * — the feature vector a 100k-series fleet is clustered / triaged /
  * routed by (which detector family fits which series). Complements the
  * per-observation detectors: these summarize a series into one row.
  *
  * Scale notes: every feature is keyed windows + grouped exact-DECIMAL
  * moments over ONE user_id partitioning — no global sort, no
  * cross-series stage at all. Wide power terms (4th-moment scale) go
  * through DECIMAL(38,6) like the Jarque-Bera sums.
  */
object TsFeatureQueries {

  private val Dec38 = DecimalType(38, 6)

  /** Tile width (rows) for stability/lumpiness. */
  private val TileW = 24

  /** Hill estimator order-statistic count. */
  private val HillK = 20

  /** Kleinberg burst model: burst rate = BurstS x base rate; entering
    * the burst state costs BurstGamma (leaving is free).
    */
  private val BurstS = 3.0
  private val BurstGamma = 2.0

  /** Hawkes intensity parameters: baseline μ, jump α, decay β (1/hour). */
  private val HawkesMu = 0.2
  private val HawkesAlpha = 0.8
  private val HawkesBeta = 0.1

  /** Variogram row lags. */
  private val VariogramLags = Seq(1, 2, 4, 8, 24)

  /** DFA box sizes (rows). Sized to the sf series lengths (49-86 rows
    * at sf0.01): 16-row boxes still yield >=3 complete boxes per
    * series, so the log-log fit always has 3 scale points.
    */
  private val DfaBoxes = Seq(4, 8, 16)

  /** SES candidate smoothing factors and truncated-kernel span. */
  private val SesAlphas = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
  private val SesSpan = 20

  /** Regime-switching Viterbi: state centers at the z-scored normal
    * quartiles ∓RegimeQ; RegimeGamma is the switch cost.
    */
  private val RegimeQ = 0.6745
  private val RegimeGamma = 2.0

  private def dlit(x: Double): String = CleanFunctions.dlitSql(x)

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).where(col("value").isNotNull)
      .withColumn("tsu", CleanFunctions.epochUs(col("ts")))

  /** Shared daily grid + round6-quantized Poisson emission costs for
    * the Kleinberg burst twins: e_k = r_k − c·ln r_k on the per-type
    * daily counts, with the burst rate r₁ = burstS·r₀.
    */
  private def burstEmissions(s: SparkSession, d: String,
                             burstS: Double): DataFrame = {
    val daily = Tables.events(s, d)
      .withColumn("day", expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"))
      .groupBy("event_type", "day").agg(count(lit(1)).cast(DoubleType).as("c"))
    val rates = daily.groupBy("event_type")
      .agg(round4(CleanFunctions.exactMean(col("c"))).as("r0"))
    daily.join(broadcast(rates), "event_type")
      .withColumn("r1", round4(lit(burstS) * col("r0")))
      .withColumn("e0", round6(col("r0") - col("c") * log(col("r0"))))
      .withColumn("e1", round6(col("r1") - col("c") * log(col("r1"))))
  }

  /** Kleinberg burst detection (the `ts_bursts` entry — rationale on
    * the entry's doc comment). `burstS` (burst-rate multiple of the
    * base rate) and `gamma` (burst-entry cost — higher = more
    * hysteresis) are the constructor-level knobs a deployment tunes;
    * the defaults stay the pinned [[BurstS]]/[[BurstGamma]] so the
    * driver entry and its recursive-CTE DuckDB oracle share one pair
    * of literals (the nbSourceConfusion precedent). The knobs change
    * emission literals only — plan shape and state size are untouched.
    */
  def burstProfile(s: SparkSession, d: String, burstS: Double = BurstS,
                   gamma: Double = BurstGamma): DataFrame = {
    require(burstS > 1.0, s"burstS=$burstS must exceed 1 (burst > base rate)")
    TimeSeriesOps.burstPath(burstEmissions(s, d, burstS),
        Seq("event_type"), Seq("day"), "e0", "e1", gamma)
      .select(col("event_type"), col("day"),
        round4(col("c0")).as("cost_base"),
        round4(col("c1")).as("cost_burst"), col("in_burst"))
      .orderBy("event_type", "day")
  }

  /** Streaming twin of [[burstProfile]] (the `streaming_bursts` entry)
    * — same knobs, same pinned defaults, same emission grid; the fold
    * is `StreamingAnomaly.burstViterbi` replayed over the bounded
    * harness feed.
    */
  def burstProfileStreaming(s: SparkSession, d: String,
                            burstS: Double = BurstS,
                            gamma: Double = BurstGamma): DataFrame = {
    import s.implicits._
    import graft.streaming.{BurstSample, StreamingAnomaly}
    require(burstS > 1.0, s"burstS=$burstS must exceed 1 (burst > base rate)")
    val rows = burstEmissions(s, d, burstS)
      .select(col("event_type"), col("day"), col("e0"), col("e1"))
      .as[BurstSample].collect().toSeq
    StreamingAnomaly.replayToSink(s, rows, "graft_streaming_bursts", None)(
        ds => StreamingAnomaly.burstViterbi(ds, gamma).toDF())
      .select(col("event_type"), col("day"),
        round4(col("c0")).as("cost_base"),
        round4(col("c1")).as("cost_burst"), col("in_burst"))
      .orderBy("event_type", "day")
  }

  /** Per-event round6-quantized Hawkes decay factors e^(−β·Δt) — the
    * shared prep of [[hawkesProfile]] and [[hawkesProfileStreaming]].
    * β is in 1/hour; the transcendental rides each row so the fold
    * itself stays one exact multiply-add.
    */
  private def hawkesDecays(s: SparkSession, d: String,
                           beta: Double): DataFrame = {
    val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    Tables.events(s, d)
      .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
      .select(col("event_id"), col("user_id"), col("tsu"))
      .withColumn("dt", round6((col("tsu") - lag(col("tsu"), 1).over(wo))
        .cast(DoubleType) / lit(3600000000.0)))
      .withColumn("decay", round6(exp(lit(-beta) * col("dt"))))
  }

  /** Hawkes excitation + conditional intensity per event (the
    * `ts_hawkes_intensity` entry). `beta` (decay rate, 1/hour) is the
    * constructor-level knob a deployment tunes; the default stays the
    * pinned [[HawkesBeta]] so the driver entry and its recursive-CTE
    * DuckDB oracle share one literal (the burstProfile precedent). The
    * knob changes the per-row decay column only — plan shape, state
    * size and the one-multiply-add fold are untouched.
    */
  def hawkesProfile(s: SparkSession, d: String,
                    beta: Double = HawkesBeta): DataFrame =
    TimeSeriesOps.hawkesPath(hawkesDecays(s, d, beta),
        Seq("user_id"), Seq("tsu", "event_id"), "decay")
      .select(col("event_id"), round4(col("excitation")).as("excitation"),
        round4(lit(HawkesMu) + lit(HawkesAlpha) * col("excitation")).as("intensity"))
      .orderBy("event_id")

  /** Streaming twin of [[hawkesProfile]] (the `streaming_hawkes`
    * entry) — same knob, same pinned default, same per-row decay grid;
    * the fold is `StreamingAnomaly.hawkes` replayed over the bounded
    * harness feed.
    */
  def hawkesProfileStreaming(s: SparkSession, d: String,
                             beta: Double = HawkesBeta): DataFrame = {
    import s.implicits._
    import graft.streaming.{HawkesSample, StreamingAnomaly}
    val rows = hawkesDecays(s, d, beta)
      .select(col("event_id"), col("user_id"), col("tsu"), col("decay"))
      .as[HawkesSample].collect().toSeq
    StreamingAnomaly.replayToSink(s, rows, "graft_streaming_hawkes", None)(
        ds => StreamingAnomaly.hawkes(ds).toDF())
      .select(col("event_id"), round4(col("excitation")).as("excitation"),
        round4(lit(HawkesMu) + lit(HawkesAlpha) * col("excitation")).as("intensity"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Stability + lumpiness: variance of the 24-row tile MEANS and of
    // the tile VARIANCES — "is this series' level steady, and is its
    // volatility steady" (the two tsfeatures that route series between
    // static-threshold and adaptive detectors). Ragged tail tiles are
    // dropped (equal-width tiles, like the reference feature set); tile
    // stats are 4dp-quantized before the cross-tile moments so the
    // second-level variance is engine-exact.
    "ts_stability_lumpiness" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val tiled = events(s, d)
        .withColumn("tile", expr(s"(row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) - 1) DIV $TileW"))
      val t = tiled.groupBy("user_id", "tile").agg(
          count(lit(1)).as("nt"),
          exactSum(col("value")).as("s1"),
          exactSum(round4(col("value") * col("value"))).as("s2"))
        .where(col("nt") === lit(TileW.toLong))
        .withColumn("tmean", round4(col("s1") / col("nt")))
        .withColumn("tvar", round4(greatest(
          col("s2") / col("nt") - (col("s1") / col("nt")) * (col("s1") / col("nt")),
          lit(0.0))))
      t.groupBy("user_id").agg(
          count(lit(1)).as("n_tiles"),
          exactSum(col("tmean")).as("sm"),
          exactSum(round4(col("tmean") * col("tmean"))).as("smm"),
          exactSum(col("tvar")).as("sv"),
          exactSum(round4(col("tvar") * col("tvar"))).as("svv"))
        .select(col("user_id"), col("n_tiles"),
          round4(greatest(col("smm") / col("n_tiles") -
            (col("sm") / col("n_tiles")) * (col("sm") / col("n_tiles")), lit(0.0)))
            .as("stability"),
          round4(greatest(col("svv") / col("n_tiles") -
            (col("sv") / col("n_tiles")) * (col("sv") / col("n_tiles")), lit(0.0)))
            .as("lumpiness"))
        .orderBy("user_id")
    },

    // Flat spots: the longest run of consecutive observations inside
    // one of ten equal-width per-series value bands — stuck sensors and
    // saturated counters show up as a long flat run. Classic gaps-and-
    // islands (rn − per-band rn is the island id), all inside one keyed
    // ordering.
    "ts_flat_spots" -> { (s, d) =>
      val wp = Window.partitionBy("user_id")
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val banded = events(s, d)
        .withColumn("mn", min(col("value")).over(wp))
        .withColumn("mx", max(col("value")).over(wp))
        .withColumn("band", when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(9L),
            floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / lit(10.0)))
              .cast(LongType))))
        .withColumn("rn", row_number().over(wo))
        .withColumn("rnb", row_number().over(
          Window.partitionBy("user_id", "band").orderBy("tsu", "event_id")))
        .withColumn("island", col("rn") - col("rnb"))
      banded.groupBy("user_id", "band", "island").agg(count(lit(1)).as("run"))
        .groupBy("user_id").agg(max(col("run")).as("max_flat_run"))
        .orderBy("user_id")
    },

    // Median crossing points: how often consecutive observations
    // straddle the series median — white noise crosses ~n/2 times, a
    // trending or strongly cyclic series far less. The median is the
    // exact rank-interpolated PERCENTILE_CONT (StatsOps.rankPercentiles,
    // 4dp) so the straddle comparisons are engine-identical.
    "ts_crossing_points" -> { (s, d) =>
      val e = events(s, d)
      val med = StatsOps.rankPercentiles(e, Seq("user_id"), "value", Seq(0.5))
        .select(col("user_id"), col("pct").as("med"))
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      e.join(med, "user_id")
        .withColumn("above", col("value") > col("med"))
        .withColumn("prev", lag(col("above"), 1).over(wo))
        .groupBy("user_id").agg(
          count(lit(1)).as("n_obs"),
          count(when(col("prev").isNotNull && col("above") =!= col("prev"), 1))
            .as("crossings"))
        .orderBy("user_id")
    },

    // ARCH effect statistic: R² of the lag-1 autoregression of squared
    // mean-deviations — "does volatility cluster" (the Engle LM test
    // core; high values route a series to the GARCH-style detectors).
    // Squared terms are 4dp-quantized; their cross-products ride
    // DECIMAL(38,6) sums (4th-moment scale).
    "ts_arch_stat" -> { (s, d) =>
      val wp = Window.partitionBy("user_id")
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val z = events(s, d)
        .withColumn("mean", CleanFunctions.exactMeanOver(col("value"), wp))
        .withColumn("zz", round4((col("value") - col("mean")) * (col("value") - col("mean"))))
        .withColumn("zl", lag(col("zz"), 1).over(wo))
        .where(col("zl").isNotNull)
      val m = z.groupBy("user_id").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        exactSum(col("zz")).as("sx"),
        exactSum(col("zl")).as("sy"),
        sum(round4(col("zz") * col("zl")).cast(Dec38)).cast(DoubleType).as("sxy"),
        sum(round4(col("zz") * col("zz")).cast(Dec38)).cast(DoubleType).as("sxx"),
        sum(round4(col("zl") * col("zl")).cast(Dec38)).cast(DoubleType).as("syy"))
      val r = CleanFunctions.momentCorr(col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"))
      m.select(col("user_id"), col("n").cast(LongType).as("n_pairs"),
          round4(r * r).as("arch_r2"))
        .orderBy("user_id")
    },

    // Hill tail-index estimator over the top-20 order statistics of the
    // positive values: mean log-ratio to the 21st largest, and its
    // inverse α — "how heavy is this series' upper tail" (α ≤ 2 means
    // infinite variance: route to quantile detectors, not z-scores).
    // The EVT companion of ts_evt_pot: Hill reads the tail SHAPE where
    // POT reads exceedance sizes. One keyed rank window + a windowed
    // conditional max carries the threshold — no join. Series with
    // fewer than 21 positive observations yield null (no tail to read).
    "ts_hill_tail" -> { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
      val wp = Window.partitionBy("user_id")
      val ranked = events(s, d).where(col("value") > 0.0)
        .withColumn("rn", row_number().over(wo))
        .withColumn("xk1", max(when(col("rn") === lit(HillK + 1L), col("value"))).over(wp))
      ranked
        .withColumn("term", when(col("rn") <= lit(HillK.toLong),
          round6(log(col("value") / col("xk1")))))
        .groupBy("user_id").agg(
          count(lit(1)).as("n_pos"),
          round4(exactSum(col("term")) / lit(HillK.toDouble)).as("hill"))
        .withColumn("alpha", round4(lit(1.0) / nullif(col("hill"), lit(0.0))))
        .orderBy("user_id")
    },

    // Kleinberg burst detection over the per-type daily event stream:
    // a two-state (base rate r₀ / burst rate 3r₀) cost automaton with
    // Poisson emission costs r − c·ln r, folded by the forward Viterbi
    // pass ([[TimeSeriesOps.burstPath]]) — "WHEN was this event type
    // bursting" with hysteresis the plain daily z-score lacks (the γ
    // entry cost suppresses one-day blips). Emission costs are
    // round6-quantized SQL expressions; the fold is pure adds + exact
    // mins, replayed exactly by a recursive-CTE oracle like the
    // Kalman / Holt-Winters twins.
    "ts_bursts" -> { (s, d) => burstProfile(s, d) },

    // Streaming Kleinberg burst detection — the streaming twin of
    // ts_bursts over the SAME daily grid with the SAME pre-quantized
    // emission costs (in production the grid + base rates come from an
    // upstream windowed aggregation and a slowly-refreshed reference
    // join; the replay computes them batch-side so the fold sees
    // identical inputs — the streaming_holt_winters precedent). TWO
    // doubles of state per key; oracle = the batch twin's recursive
    // CTE, verbatim.
    "streaming_bursts" -> { (s, d) => burstProfileStreaming(s, d) },

    // Isotonic (monotone non-decreasing) trend per series on the daily
    // grid, via the same PAVA minimax closed form as the calibration
    // fitter: fit_i = max_{j≤i} min_{k≥i} avg(day_j..day_k) — the
    // shape-constrained trend that OLS can't give (a ramp with noise
    // fits as a clean staircase; violations pool instead of wiggling).
    // Day count is bounded by the time span, so the per-series span
    // table is O(days²) per key — keyed joins only, no cross-series
    // stage; span sums stay in DECIMAL until one rounded division.
    "ts_pava_trend" -> { (s, d) =>
      val dec = DecimalType(18, 6)
      val wd = Window.partitionBy("user_id").orderBy("day")
      val idx = events(s, d).withColumn("day", expr("tsu DIV 86400000000"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("sv"))
        .withColumn("i", row_number().over(wd))
      val jk = idx.select(col("user_id"), col("i").as("j"))
        .join(idx.select(col("user_id").as("u2"), col("i").as("k")),
          col("user_id") === col("u2") && col("j") <= col("k"))
        .drop("u2")
      val spans = jk.join(
          idx.select(col("user_id").as("u3"), col("i").as("m"), col("n"), col("sv")),
          col("user_id") === col("u3") && col("m").between(col("j"), col("k")))
        .groupBy("user_id", "j", "k")
        .agg(sum(col("n")).as("nn"), sum(col("sv")).as("ssv"))
        .withColumn("avgjk",
          round6(col("ssv").cast(DoubleType) / col("nn").cast(DoubleType)))
      // `fi` alias: fit derives from idx, so an unaliased i === i in the
      // final join resolves to one attribute (Spark WARNs "trivially
      // true equals predicate"); the alias keeps the index a real key.
      val fit = idx.select(col("user_id").as("uf"), col("i").as("fi"))
        .join(spans, col("uf") === col("user_id") &&
          col("j") <= col("fi") && col("k") >= col("fi"))
        .groupBy("uf", "fi", "j").agg(min(col("avgjk")).as("mn"))
        .groupBy("uf", "fi").agg(round6(max(col("mn"))).as("pava_fit"))
      idx.join(fit, col("user_id") === col("uf") && idx("i") === fit("fi"))
        .select(col("user_id"), col("day"),
          round6(col("sv").cast(DoubleType) / col("n").cast(DoubleType)).as("daily_mean"),
          col("pava_fit"))
        .orderBy("user_id", "day")
    },

    // Regression discontinuity at the 5% discount cutoff: local linear
    // fits of quantity on (discount − 0.05) within the ±0.03 bandwidth
    // on each side, reporting the level JUMP at the cutoff — the
    // threshold-assignment causal design that rounds out the family
    // (events_did: control group; ts_intervention: time split; this:
    // a running-variable cutoff, the shape of every "spend ≥ X gets
    // free shipping" policy question). Same discipline as
    // ts_intervention: one grouped DECIMAL moment pass per side,
    // 6dp-pinned slopes/intercepts, jump from pinned values.
    "lineitem_rdd_discount" -> { (s, d) =>
      val cut = 0.05
      val bw = 0.03
      val base = Tables.lineitem(s, d)
        .withColumn("x", round6(col("l_discount") - lit(cut)))
        .where(abs(col("x")) <= lit(bw))
        .withColumn("side", (col("x") >= 0.0).cast(LongType))
        .select(col("side"), col("x"), col("l_quantity").as("y"))
      val mom = base.groupBy("side").agg(
          count(lit(1)).cast(DoubleType).as("n"),
          exactSum(col("x")).as("sx"), exactSum(col("y")).as("sy"),
          exactSum(round6(col("x") * col("x"))).as("sxx"),
          exactSum(round6(col("x") * col("y"))).as("sxy"))
        .where(col("n") > 2.0)
        .withColumn("slope", round6((col("n") * col("sxy") - col("sx") * col("sy")) /
          nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0))))
        .withColumn("icept", round6(col("sy") / col("n") - col("slope") * (col("sx") / col("n"))))
      mom.groupBy().agg(
          max(when(col("side") === 0L, col("n"))).as("n_left"),
          max(when(col("side") === 1L, col("n"))).as("n_right"),
          max(when(col("side") === 0L, col("slope"))).as("slope_left"),
          max(when(col("side") === 1L, col("slope"))).as("slope_right"),
          max(when(col("side") === 0L, col("icept"))).as("i_left"),
          max(when(col("side") === 1L, col("icept"))).as("i_right"))
        .select(col("n_left").cast(LongType).as("n_left"),
          col("n_right").cast(LongType).as("n_right"),
          col("slope_left"), col("slope_right"),
          round4(col("i_right") - col("i_left")).as("rdd_jump"))
    },

    // Effective sample size per series via the integrated
    // autocorrelation time τ = 1 + 2Σ₁¹²ρ_k (truncated window
    // estimator, floored at 1): ESS = n/τ — how many INDEPENDENT
    // observations the series is worth, the number that deflates every
    // naive standard error downstream (a mean over 4 000 hourly points
    // with τ=20 has the precision of 200). Reuses the production
    // ts_acf_full entry verbatim for the 12 correlations; one grouped
    // DECIMAL sum on its O(series × 12) output.
    "ts_ess" -> { (s, d) =>
      val acf = TimeSeriesQueries.queries("ts_acf_full")(s, d)
      val nn = events(s, d).groupBy("user_id").agg(count(lit(1)).as("n_obs"))
      val tau = acf.groupBy("user_id").agg(
        count(lit(1)).as("n_lags"),
        round4(lit(1.0) + lit(2.0) * exactSum(col("acf"))).as("tau_int"))
      nn.join(tau, "user_id")
        .select(col("user_id"), col("n_obs"), col("n_lags"), col("tau_int"),
          round4(col("n_obs").cast(DoubleType) / greatest(col("tau_int"), lit(1.0)))
            .as("ess"))
        .orderBy("user_id")
    },

    // Interrupted time-series (segmented regression) per series: OLS
    // fit on each side of the span midpoint t0, reporting the level
    // JUMP (intercepts at t0) and slope CHANGE — the single-series
    // causal design (no control group, unlike events_did) every
    // deploy/incident postmortem runs ("did the rollout shift the
    // level or bend the trend"). t0 is the exact integer midpoint
    // (min+max)//2 per series; x is 6dp-quantized days-from-t0; both
    // side fits come from one grouped DECIMAL moment pass + a
    // conditional pivot, slopes/intercepts 6dp-pinned before the
    // deltas.
    "ts_intervention" -> { (s, d) =>
      val wp = Window.partitionBy("user_id")
      val e = events(s, d)
        .withColumn("t0", expr("(CAST(min(tsu) OVER (PARTITION BY user_id) AS BIGINT) + " +
          "CAST(max(tsu) OVER (PARTITION BY user_id) AS BIGINT)) DIV 2"))
        .withColumn("x", round6((col("tsu") - col("t0")).cast(DoubleType) / lit(86400000000.0)))
        .withColumn("side", (col("tsu") >= col("t0")).cast(LongType))
      val mom = e.groupBy("user_id", "side").agg(
          count(lit(1)).cast(DoubleType).as("n"),
          exactSum(col("x")).as("sx"),
          exactSum(col("value")).as("sy"),
          exactSum(round6(col("x") * col("x"))).as("sxx"),
          exactSum(round6(col("x") * col("value"))).as("sxy"))
        .where(col("n") > 2.0)
        .withColumn("slope", round6((col("n") * col("sxy") - col("sx") * col("sy")) /
          nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0))))
        .withColumn("icept", round6(col("sy") / col("n") - col("slope") * (col("sx") / col("n"))))
      mom.groupBy("user_id").agg(
          max(when(col("side") === 0L, col("n"))).as("n_pre"),
          max(when(col("side") === 1L, col("n"))).as("n_post"),
          max(when(col("side") === 0L, col("slope"))).as("slope_pre"),
          max(when(col("side") === 1L, col("slope"))).as("slope_post"),
          max(when(col("side") === 0L, col("icept"))).as("i_pre"),
          max(when(col("side") === 1L, col("icept"))).as("i_post"))
        .where(col("n_pre").isNotNull && col("n_post").isNotNull)
        .select(col("user_id"),
          col("n_pre").cast(LongType).as("n_pre"),
          col("n_post").cast(LongType).as("n_post"),
          col("slope_pre"), col("slope_post"),
          round4(col("i_post") - col("i_pre")).as("level_jump"),
          round4(col("slope_post") - col("slope_pre")).as("slope_change"))
        .orderBy("user_id")
    },

    // Two-state Gaussian regime-switching Viterbi per series: low/high
    // LEVEL regimes at the z-scored normal quartiles ∓0.6745 with
    // switch cost γ — the level-shift dual of ts_bursts (which watches
    // COUNTS through Poisson costs; this watches the measurement, so a
    // sustained load plateau segments into one high regime instead of
    // a run of per-row z flags, and brief spikes don't flip state
    // because the switch cost gates them). Reuses the SAME forward
    // Viterbi fold (TimeSeriesOps.burstPath) with squared-error
    // emissions: z from per-series DECIMAL-exact moments, emissions
    // 6dp-quantized, recursive-CTE oracle replays the identical fold.
    //
    // Cost asymmetry (inherited from burstPath's Kleinberg shape): γ is
    // charged ONLY on the low→high transition; high→low is free. This
    // is the burst-style one-sided switch penalty, not a symmetric
    // two-state Viterbi — entries flip into the high regime reluctantly
    // but drop out of it at the first cheaper step. Oracle replays the
    // identical asymmetric fold, so the entry is exact cross-engine.
    "ts_regime_switch" -> { (s, d) =>
      val e = events(s, d)
      val mom = e.groupBy("user_id").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        exactSum(col("value")).as("sx"),
        exactSum(round4(col("value") * col("value"))).as("sxx"))
      val sd = CleanFunctions.momentStd(col("n"), col("sx"), col("sxx"))
      val prep = e.join(mom, "user_id")
        .where(sd > 0.0)
        .withColumn("z", (col("value") - col("sx") / col("n")) / sd)
        .withColumn("e0", round6((col("z") + lit(RegimeQ)) * (col("z") + lit(RegimeQ)) / lit(2.0)))
        .withColumn("e1", round6((col("z") - lit(RegimeQ)) * (col("z") - lit(RegimeQ)) / lit(2.0)))
        .select("event_id", "user_id", "tsu", "e0", "e1")
      TimeSeriesOps.burstPath(prep, Seq("user_id"), Seq("tsu", "event_id"),
          "e0", "e1", RegimeGamma)
        .select(col("event_id"), round4(col("c0")).as("cost_low"),
          round4(col("c1")).as("cost_high"), col("in_burst").as("in_high"))
        .orderBy("event_id")
    },

    // Hawkes self-excitation per user: the exponentially-decayed count
    // of prior events at each arrival (decay β = 0.1/hour) and the
    // conditional intensity λ = μ + α·A — "is this user's activity
    // self-reinforcing right now" (retry storms, rage-clicks, cascade
    // onsets all read as λ spikes that a plain rate window smears).
    // The decay factor e^(−βΔt) is a round6-quantized column; the fold
    // is one multiply-add per event (TimeSeriesOps.hawkesPath), its
    // recursive-CTE twin exact.
    "ts_hawkes_intensity" -> { (s, d) => hawkesProfile(s, d) },

    // Streaming Hawkes excitation — the streaming twin of
    // ts_hawkes_intensity: the round6-quantized decay factor rides on
    // each replayed row (computed at ingest, so the transcendental
    // stays outside the fold exactly as in the batch path), ONE double
    // of state per key, λ derived from the emitted excitation by the
    // same rounded expression. Oracle = the batch twin's recursive
    // CTE, verbatim.
    "streaming_hawkes" -> { (s, d) => hawkesProfileStreaming(s, d) },

    // Hjorth parameters per series: activity (signal variance),
    // mobility (√(var(Δv)/var(v)) — the dominant-frequency proxy), and
    // complexity (mobility of the differenced series over mobility of
    // the signal — bandwidth / deviation-from-sine). The classic 3-value
    // EEG fingerprint, useful fleet-wide as a cheap spectral triage that
    // needs no FFT. Differences are 4dp-quantized; the three population
    // variances ride one grouped pass of DECIMAL moment sums (null-
    // skipping count/sum pick up the 1- and 2-row warmup automatically).
    "ts_hjorth" -> { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = events(s, d)
        .withColumn("dx", round4(col("value") - lag(col("value"), 1).over(wo)))
        .withColumn("ddx", round4(col("dx") - lag(col("dx"), 1).over(wo)))
      def pvar(q: Column, s1: Column, n: Column): Column =
        round4(greatest(q / n - (s1 / n) * (s1 / n), lit(0.0)))
      e.groupBy("user_id").agg(
          count(col("value")).as("n0"),
          exactSum(col("value")).as("s0"),
          exactSum(round4(col("value") * col("value"))).as("q0"),
          count(col("dx")).as("n1"),
          exactSum(col("dx")).as("s1"),
          exactSum(round4(col("dx") * col("dx"))).as("q1"),
          count(col("ddx")).as("n2"),
          exactSum(col("ddx")).as("s2"),
          exactSum(round4(col("ddx") * col("ddx"))).as("q2"))
        .select(col("user_id"),
          pvar(col("q0"), col("s0"), col("n0")).as("activity"),
          pvar(col("q1"), col("s1"), col("n1")).as("v1"),
          pvar(col("q2"), col("s2"), col("n2")).as("v2"))
        .withColumn("mobility",
          round4(sqrt(col("v1") / nullif(col("activity"), lit(0.0)))))
        .withColumn("complexity",
          round4(sqrt(col("v2") / nullif(col("v1"), lit(0.0))) /
            nullif(col("mobility"), lit(0.0))))
        .select("user_id", "activity", "mobility", "complexity")
        .orderBy("user_id")
    },

    // Nonlinearity fingerprint per series (the two tsfresh stats linear
    // Gaussian processes keep at zero): c3 = E[vₜ·vₜ₋₁·vₜ₋₂] (third-
    // order autocovariance proxy) and trev = E[Δ³]/E[Δ²]^{3/2} (time-
    // reversal asymmetry — linear processes are reversible, so trev≠0
    // flags asymmetric dynamics like slow-rise/fast-crash). Triple
    // products are written with one fixed association order on both
    // engines and 4dp-quantized into DECIMAL sums; the denominator uses
    // sqrt((m·m)·m), never pow(·,1.5).
    "ts_nonlinearity" -> { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = events(s, d)
        .withColumn("l1", lag(col("value"), 1).over(wo))
        .withColumn("l2", lag(col("value"), 2).over(wo))
        .withColumn("p3", round4((col("value") * col("l1")) * col("l2")))
        .withColumn("dd", round4(col("value") - col("l1")))
        .withColumn("d2", round4(col("dd") * col("dd")))
        .withColumn("d3", round4((col("dd") * col("dd")) * col("dd")))
      e.groupBy("user_id").agg(
          count(col("p3")).as("n_triples"),
          round4(exactSum(col("p3")) / count(col("p3"))).as("c3"),
          exactSum(col("d2")).as("m2s"),
          exactSum(col("d3")).as("m3s"),
          count(col("dd")).as("nd"))
        .select(col("user_id"), col("n_triples"), col("c3"),
          round4((col("m3s") / col("nd")) /
            nullif(sqrt(((col("m2s") / col("nd")) * (col("m2s") / col("nd"))) *
              (col("m2s") / col("nd"))), lit(0.0))).as("trev"))
        .orderBy("user_id")
    },

    // Longest strike above / below the series mean: the two tsfresh
    // run-length features (a long above-mean strike = sustained shift
    // the z-score detectors should have caught; below = outage-like
    // sag). Mean is the exact-DECIMAL per-series mean, so the side of
    // every observation is engine-identical; runs are the standard
    // rn − per-side-rn gaps-and-islands inside one keyed ordering.
    "ts_longest_strike" -> { (s, d) =>
      val wp = Window.partitionBy("user_id")
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = events(s, d)
        .withColumn("mean", CleanFunctions.exactMeanOver(col("value"), wp))
        .withColumn("above", col("value") > col("mean"))
        .withColumn("rn", row_number().over(wo))
        .withColumn("rnf", row_number().over(
          Window.partitionBy("user_id", "above").orderBy("tsu", "event_id")))
        .withColumn("island", col("rn") - col("rnf"))
      e.groupBy("user_id", "above", "island").agg(count(lit(1)).as("run"))
        .groupBy("user_id").agg(
          max(when(col("above"), col("run"))).as("longest_above"),
          max(when(!col("above"), col("run"))).as("longest_below"))
        .orderBy("user_id")
    },

    // Turning-point randomness test per series: count local extrema
    // (vₜ₋₁ < vₜ > vₜ₊₁ or the mirror), compare against the i.i.d.
    // expectation 2(n−2)/3 with variance (16n−29)/90 — too FEW turning
    // points = trend/momentum, too MANY = negative autocorrelation
    // (over-differencing, bouncing quantization). Counts are exact
    // integers; only the final z (4dp) and its two-sided p through the
    // shared portable normal CDF are floating.
    "ts_turning_points" -> { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = events(s, d)
        .withColumn("prev", lag(col("value"), 1).over(wo))
        .withColumn("nxt", lead(col("value"), 1).over(wo))
        .withColumn("tp", col("prev").isNotNull && col("nxt").isNotNull &&
          ((col("value") > col("prev") && col("value") > col("nxt")) ||
           (col("value") < col("prev") && col("value") < col("nxt"))))
      e.groupBy("user_id").agg(
          count(lit(1)).as("n_obs"),
          count(when(col("tp"), 1)).as("turning_points"))
        .withColumn("expected", lit(2.0) * (col("n_obs") - lit(2L)) / lit(3.0))
        .withColumn("z", round4((col("turning_points") - col("expected")) /
          sqrt((lit(16.0) * col("n_obs") - lit(29.0)) / lit(90.0))))
        .select(col("user_id"), col("n_obs"), col("turning_points"),
          round4(col("expected")).as("expected"), col("z"),
          round6(lit(2.0) * (lit(1.0) - CleanFunctions.normalCdf(abs(col("z")))))
            .as("p_value"))
        .orderBy("user_id")
    },

    // Detrended fluctuation analysis: integrate the mean-deviations into
    // a profile, OLS-detrend it inside non-overlapping boxes of 4/8/16
    // rows, and read the scaling exponent α off the log-log fit of the
    // mean squared fluctuation — the nonstationarity-robust sibling of
    // ts_hurst (R/S): α≈0.5 white noise, ≈1 pink / long memory, ≈1.5
    // random walk. The profile is an exact-DECIMAL running sum (order-
    // proof), box detrending is closed-form moment OLS on (t, y) sums,
    // and only complete boxes count — all keyed windows + grouped aggs,
    // no cross-series stage.
    "ts_dfa" -> { (s, d) =>
      val wp = Window.partitionBy("user_id")
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val cum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prof = events(s, d)
        .withColumn("mean", CleanFunctions.exactMeanOver(col("value"), wp))
        .withColumn("dev", round4(col("value") - col("mean")))
        .withColumn("y", round4(CleanFunctions.exactSumOver(col("dev"), cum)))
        .withColumn("rn", row_number().over(wo))
      val stacked = prof.select(col("user_id"), col("y"),
          expr(s"stack(${DfaBoxes.size}, " + DfaBoxes.map(b =>
            s"${b}L, (rn - 1) DIV $b").mkString(", ") + ") AS (s, box)"),
          col("rn"))
        .withColumn("t", ((col("rn") - lit(1)) % col("s")) + lit(1L))
      val boxes = stacked.groupBy("user_id", "s", "box").agg(
          count(lit(1)).as("nb"),
          sum(col("t")).cast(DoubleType).as("st"),
          sum(col("t") * col("t")).cast(DoubleType).as("stt"),
          exactSum(col("y")).as("sy"),
          exactSum(round4(col("y") * col("y"))).as("syy"),
          exactSum(round4(col("t") * col("y"))).as("sty"))
        .where(col("nb") === col("s"))
        .withColumn("rss", round6(greatest(
          (col("syy") - col("sy") * col("sy") / col("nb")) -
            (col("sty") - col("st") * col("sy") / col("nb")) *
            (col("sty") - col("st") * col("sy") / col("nb")) /
            (col("stt") - col("st") * col("st") / col("nb")), lit(0.0))))
        .withColumn("rms2", round6(col("rss") / col("s")))
      val fl = boxes.groupBy("user_id", "s").agg(
          count(lit(1)).as("n_boxes"),
          round4(CleanFunctions.exactMean(col("rms2"))).as("f2"))
        .withColumn("lf", round6(log(nullif(col("f2"), lit(0.0)))))
        .withColumn("ls", round6(log(col("s").cast(DoubleType))))
      val alpha = fl.where(col("lf").isNotNull)
        .groupBy("user_id").agg(
          count(lit(1)).cast(DoubleType).as("k"),
          exactSum(col("ls")).as("sls"),
          exactSum(col("lf")).as("slf"),
          exactSum(round6(col("ls") * col("ls"))).as("sll"),
          exactSum(round6(col("ls") * col("lf"))).as("slfl"))
        .select(col("user_id"), round4(lit(0.5) *
          ((col("slfl") - col("sls") * col("slf") / col("k")) /
            nullif(col("sll") - col("sls") * col("sls") / col("k"), lit(0.0))))
          .as("alpha"))
      val pivot = fl.groupBy("user_id").agg(
        max(when(col("s") === 4L, col("f2"))).as("f2_s4"),
        max(when(col("s") === 8L, col("f2"))).as("f2_s8"),
        max(when(col("s") === 16L, col("f2"))).as("f2_s16"))
      pivot.join(alpha, Seq("user_id"), "left").orderBy("user_id")
    },

    // Poincaré-plot descriptors per series (the HRV short/long-term
    // variability pair): over successive pairs (vₜ₋₁, vₜ), SD1² =
    // var(vₜ−vₜ₋₁)/2 is the width of the cloud across the identity line
    // (beat-to-beat jitter) and SD2² = var(vₜ+vₜ₋₁)/2 its length along
    // it (slow level drift); SD1/SD2 ≈ 1 is white noise, ≪1 a smooth
    // trend. Both variances ride one grouped pass of DECIMAL moment
    // sums over 4dp-quantized pair sums/diffs; the ratio is taken on
    // the already-rounded SD1/SD2 so it is engine-exact.
    "ts_poincare" -> { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = events(s, d)
        .withColumn("l1", lag(col("value"), 1).over(wo))
        .withColumn("dd", round4(col("value") - col("l1")))
        .withColumn("su", round4(col("value") + col("l1")))
        .where(col("l1").isNotNull)
      e.groupBy("user_id").agg(
          count(lit(1)).as("n_pairs"),
          exactSum(col("dd")).as("sd"),
          exactSum(round4(col("dd") * col("dd"))).as("qd"),
          exactSum(col("su")).as("ss"),
          exactSum(round4(col("su") * col("su"))).as("qs"))
        .withColumn("vard", greatest(col("qd") / col("n_pairs") -
          (col("sd") / col("n_pairs")) * (col("sd") / col("n_pairs")), lit(0.0)))
        .withColumn("vars", greatest(col("qs") / col("n_pairs") -
          (col("ss") / col("n_pairs")) * (col("ss") / col("n_pairs")), lit(0.0)))
        .select(col("user_id"), col("n_pairs"),
          round4(sqrt(col("vard") / lit(2.0))).as("sd1"),
          round4(sqrt(col("vars") / lit(2.0))).as("sd2"))
        .withColumn("sd_ratio", round4(col("sd1") / nullif(col("sd2"), lit(0.0))))
        .orderBy("user_id")
    },

    // Binary transfer entropy x→y between series pairs on the daily
    // grid: states are above/below each series' own grid mean; TE =
    // Σ p(yₜ,yₜ₋₁,xₜ₋₁)·ln[ p(yₜ|yₜ₋₁,xₜ₋₁) / p(yₜ|yₜ₋₁) ] — the
    // DIRECTED information-flow companion of ts_granger (which only
    // sees linear lag effects; TE catches any predictive coupling).
    // All probabilities are ratios of exact integer counts (marginals
    // are keyed window sums over the 8-cell count table), so the only
    // floating step is one ln per cell, 6dp-quantized into the DECIMAL
    // per-pair sum. Same user sampling as ts_granger bounds pairs; the
    // triple join is the identical y/y-lag/x-lag day-grid shape.
    "ts_transfer_entropy" -> { (s, d) =>
      val day = lit(86400000000L)
      val daily = Tables.events(s, d).where(col("value").isNotNull)
        .filter(col("user_id") % 10 === 0)
        .groupBy(col("user_id"), CleanFunctions.epochUs(date_trunc("day", col("ts"))).as("b"))
        .agg(CleanFunctions.exactMean(col("value")).as("v"))
      val st = daily
        .withColumn("m", CleanFunctions.exactMeanOver(col("v"), Window.partitionBy("user_id")))
        .select(col("user_id"), col("b"),
          when(col("v") > col("m"), lit(1L)).otherwise(lit(0L)).as("s"))
      val rows = st.as("y")
        .join(st.as("yl"),
          col("yl.user_id") === col("y.user_id") && col("yl.b") === col("y.b") - day)
        .join(st.as("xl"),
          col("xl.b") === col("y.b") - day && col("xl.user_id") =!= col("y.user_id"))
        .select(col("y.user_id").as("yu"), col("xl.user_id").as("xu"),
          col("y.s").as("yn"), col("yl.s").as("yp"), col("xl.s").as("xp"))
      val cnt = rows.groupBy("yu", "xu", "yn", "yp", "xp").agg(count(lit(1)).as("c"))
      val terms = cnt
        .withColumn("n", sum(col("c")).over(Window.partitionBy("yu", "xu")))
        .withColumn("cy", sum(col("c")).over(Window.partitionBy("yu", "xu", "yp")))
        .withColumn("cyx", sum(col("c")).over(Window.partitionBy("yu", "xu", "yp", "xp")))
        .withColumn("cny", sum(col("c")).over(Window.partitionBy("yu", "xu", "yn", "yp")))
        .withColumn("term", round6((col("c").cast(DoubleType) / col("n")) *
          log((col("c") * col("cy")).cast(DoubleType) /
            (col("cyx") * col("cny")).cast(DoubleType))))
      terms.groupBy("yu", "xu")
        .agg(max(col("n")).as("n_obs"), round4(exactSum(col("term"))).as("te"))
        .where(col("n_obs") > 3L)
        .orderBy("yu", "xu")
    },

    // Complexity-invariant distance between series pairs on the daily
    // grid (Batista et al.): CID = ED · max(CE_a,CE_b)/min(CE_a,CE_b)
    // with CE = √Σ(Δv)² — the O(n) fleet-clustering distance that
    // corrects plain Euclidean's bias toward calling every complex
    // series "far" (the cheap sibling of ts_dtw_pairs). The pair stage
    // is a day-bucket equi-join (never all-days × all-days); each CE
    // is one keyed lag pass, joined back by series. Squared terms are
    // 4dp-quantized into DECIMAL sums; the correction factor is
    // √(maxCE²/minCE²) so no engine ever takes two roots.
    "ts_cid_pairs" -> { (s, d) =>
      val daily = Tables.events(s, d).where(col("value").isNotNull)
        .filter(col("user_id") % 10 === 0)
        .groupBy(col("user_id"), CleanFunctions.epochUs(date_trunc("day", col("ts"))).as("b"))
        .agg(CleanFunctions.exactMean(col("value")).as("v"))
      val wo = Window.partitionBy("user_id").orderBy("b")
      val ce = daily
        .withColumn("dd", round4(col("v") - lag(col("v"), 1).over(wo)))
        .where(col("dd").isNotNull)
        .groupBy("user_id").agg(exactSum(round4(col("dd") * col("dd"))).as("ce2"))
      val ed = daily.as("a")
        .join(daily.as("b2"),
          col("a.b") === col("b2.b") && col("a.user_id") < col("b2.user_id"))
        .select(col("a.user_id").as("ua"), col("b2.user_id").as("ub"),
          round4(col("a.v") - col("b2.v")).as("dv"))
        .groupBy("ua", "ub").agg(
          count(lit(1)).as("n_common"),
          exactSum(round4(col("dv") * col("dv"))).as("ed2"))
        .where(col("n_common") > 3L)
      ed.join(ce.as("ca"), col("ua") === col("ca.user_id"))
        .join(ce.as("cb"), col("ub") === col("cb.user_id"))
        .select(col("ua"), col("ub"), col("n_common"),
          round4(sqrt(col("ed2"))).as("euclid"),
          round4(sqrt(col("ed2")) * sqrt(greatest(col("ca.ce2"), col("cb.ce2")) /
            nullif(least(col("ca.ce2"), col("cb.ce2")), lit(0.0)))).as("cid"))
        .orderBy("ua", "ub")
    },

    // Allan deviation per series at τ ∈ {1, 4, 24} hours: σ²(τ) =
    // ½⟨(ȳ_{k+1} − ȳ_k)²⟩ over ADJACENT τ-bin means — the
    // clock/sensor-stability profile (white noise falls as τ^{-1/2},
    // flicker noise flattens, drift RISES), which plain variance can't
    // separate. One stack explodes each observation onto its three bin
    // grids so a SINGLE grouped aggregate bins all τ at once; adjacency
    // is enforced by the lagged bucket id (a gap in the series
    // contributes no pair, not a giant spurious one); bin means are
    // exact-DECIMAL and diffs 4dp-quantized.
    "ts_allan_var" -> { (s, d) =>
      val taus = Seq(1L, 4L, 24L)
      val stacked = events(s, d).select(col("user_id"), col("value"),
        expr(s"stack(${taus.size}, " + taus.map(t =>
          s"${t}L, tsu DIV ${t * 3600000000L}L").mkString(", ") +
          ") AS (tau_h, bucket)"))
      val binned = stacked.groupBy("user_id", "tau_h", "bucket")
        .agg(CleanFunctions.exactMean(col("value")).as("yb"))
      val wo = Window.partitionBy("user_id", "tau_h").orderBy("bucket")
      val pairs = binned
        .withColumn("dd", when(lag(col("bucket"), 1).over(wo) === col("bucket") - 1L,
          round4(col("yb") - lag(col("yb"), 1).over(wo))))
        .where(col("dd").isNotNull)
      pairs.groupBy("user_id", "tau_h").agg(
          count(lit(1)).as("n_pairs"),
          round4(sqrt(CleanFunctions.exactMean(round4(col("dd") * col("dd"))) / lit(2.0)))
            .as("allan_dev"))
        .orderBy("user_id", "tau_h")
    },

    // SES hyperparameter selection per series: one-step-ahead simple
    // exponential smoothing at α ∈ {0.1,0.3,0.5,0.7,0.9}, each scored
    // by in-sample SSE, smallest-α tie-break — the model-selection step
    // that turns the EWMA smoother into a FITTED forecaster (fleet
    // routing: high best-α = level-shifting series, low = noisy-stable).
    // The 20 lags are materialized ONCE per row; the five candidate
    // predictions are five linear combinations of the same lag columns
    // inside one window pass (never five passes), stacked long and
    // argmin'd via a keyed rank window. Prediction uses PAST-only lags
    // with present-weight normalization (partial warmup rows count);
    // errors 4dp-quantized into DECIMAL sums.
    "ts_ses_select" -> { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      // spreadKeyed: 20 lag columns x 5 alpha scorings per row — the
      // compute-dense-window shape AQE byte-coalescing starves (see
      // Tables.spreadKeyed).
      val withLags = (1 to SesSpan).foldLeft(
        graft.sources.Tables.spreadKeyed(events(s, d), col("user_id")))((df, j) =>
        df.withColumn(s"l$j", lag(col("value"), j).over(wo)))
      val errCols = SesAlphas.zipWithIndex.map { case (a, i) =>
        val terms = (1 to SesSpan).map { j =>
          val wt = lit(math.pow(1 - a, j - 1))
          (when(col(s"l$j").isNotNull, wt * col(s"l$j")),
           when(col(s"l$j").isNotNull, wt))
        }
        val num = terms.map(t => coalesce(t._1, lit(0.0))).reduce(_ + _)
        val den = terms.map(t => coalesce(t._2, lit(0.0))).reduce(_ + _)
        round4(col("value") - num / nullif(den, lit(0.0))).as(s"e$i")
      }
      val errs = withLags.select(col("user_id") +: errCols: _*)
      val stacked = errs.select(col("user_id"),
        expr(s"stack(${SesAlphas.size}, " + SesAlphas.zipWithIndex.map {
          case (a, i) => s"${dlit(a)}, e$i" }.mkString(", ") + ") AS (alpha, err)"))
        .where(col("err").isNotNull)
      val sse = stacked.groupBy("user_id", "alpha").agg(
        count(lit(1)).as("n_pred"),
        round4(exactSum(round4(col("err") * col("err")))).as("sse"))
      val wr = Window.partitionBy("user_id").orderBy("sse", "alpha")
      sse.withColumn("rn", row_number().over(wr)).where(col("rn") === 1)
        .select(col("user_id"), col("alpha").as("best_alpha"), col("n_pred"), col("sse"))
        .orderBy("user_id")
    },

    // Variogram profile: γ(h) = E[(vₜ − vₜ₋ₕ)²]/2 at row lags 1, 2, 4,
    // 8, 24 per series — the memory-structure fingerprint (white noise
    // is flat, a random walk grows linearly, mean-reversion saturates).
    // One window pass computes all five lags; squared differences are
    // 4dp-quantized into DECIMAL sums.
    "ts_variogram" -> { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val base = events(s, d)
      val lagged = VariogramLags.foldLeft(base) { (df, h) =>
        df.withColumn(s"d$h", round4(
          (col("value") - lag(col("value"), h).over(wo)) *
          (col("value") - lag(col("value"), h).over(wo))))
      }
      val stacked = lagged.select(col("user_id"),
        expr(s"stack(${VariogramLags.size}, " +
          VariogramLags.map(h => s"${h}L, d$h").mkString(", ") + ") AS (h, dsq)"))
        .where(col("dsq").isNotNull)
      stacked.groupBy("user_id", "h").agg(
          count(lit(1)).as("n_pairs"),
          round4(CleanFunctions.exactMean(col("dsq")) / lit(2.0)).as("gamma_h"))
        .orderBy("user_id", "h")
    }
  )

  /** ts_bursts' oracle, shared VERBATIM with streaming_bursts (the
    * streaming_kalman shared-body rule).
    */
  private lazy val BurstsOracleSql: String = {
    val g = dlit(BurstGamma)
    s"""WITH RECURSIVE base AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    CAST(count(*) AS DOUBLE) AS c
       |  FROM events GROUP BY 1, 2),
       |rt AS (
       |  SELECT event_type, ${round4Sql(CleanFunctions.exactMeanSql("c"))} AS r0
       |  FROM base GROUP BY event_type),
       |p0 AS (
       |  SELECT b.event_type, b.day, b.c, rt.r0,
       |    ${round4Sql(s"${dlit(BurstS)} * rt.r0")} AS r1
       |  FROM base b JOIN rt USING (event_type)),
       |prep AS (
       |  SELECT event_type, day,
       |    ${round6Sql("r0 - c * ln(r0)")} AS e0,
       |    ${round6Sql("r1 - c * ln(r1)")} AS e1,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
       |  FROM p0),
       |v AS (
       |  SELECT event_type, day, rn, e0 AS c0, $g + e1 AS c1
       |  FROM prep WHERE rn = 1
       |  UNION ALL
       |  SELECT p.event_type, p.day, p.rn,
       |    least(v.c0, v.c1) + p.e0,
       |    least(v.c0 + $g, v.c1) + p.e1
       |  FROM v JOIN prep p ON p.event_type = v.event_type AND p.rn = v.rn + 1)
       |SELECT event_type, day, ${round4Sql("c0")} AS cost_base,
       |  ${round4Sql("c1")} AS cost_burst,
       |  CASE WHEN c1 < c0 THEN CAST(1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS in_burst
       |FROM v ORDER BY event_type, day""".stripMargin
  }

  /** ts_hawkes_intensity's oracle, shared VERBATIM with streaming_hawkes
    * (the streaming_kalman shared-body rule).
    */
  private lazy val HawkesOracleSql: String = {
    val dt = round6Sql("(tsu - lag(tsu) OVER w) / 3600000000.0")
    s"""WITH RECURSIVE e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events),
       |p AS (
       |  SELECT event_id, user_id, tsu,
       |    ${round6Sql(s"exp(${dlit(-HawkesBeta)} * $dt)")} AS decay,
       |    row_number() OVER w AS rn
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
       |v AS (
       |  SELECT event_id, user_id, rn, CAST(0.0 AS DOUBLE) AS a
       |  FROM p WHERE rn = 1
       |  UNION ALL
       |  SELECT p.event_id, p.user_id, p.rn, p.decay * (v.a + 1.0)
       |  FROM v JOIN p ON p.user_id = v.user_id AND p.rn = v.rn + 1)
       |SELECT event_id, ${round4Sql("a")} AS excitation,
       |  ${round4Sql(s"${dlit(HawkesMu)} + ${dlit(HawkesAlpha)} * a")} AS intensity
       |FROM v ORDER BY event_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "ts_stability_lumpiness" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |td AS (
         |  SELECT user_id, value,
         |    (row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) - 1) // $TileW AS tile
         |  FROM e),
         |t AS (
         |  SELECT user_id, tile, count(*) AS nt,
         |    ${exactSumSql("value")} AS s1,
         |    ${exactSumSql(round4Sql("value * value"))} AS s2
         |  FROM td GROUP BY user_id, tile),
         |tf AS (
         |  SELECT user_id,
         |    ${round4Sql("s1 / nt")} AS tmean,
         |    ${round4Sql("greatest(s2 / nt - (s1 / nt) * (s1 / nt), 0.0)")} AS tvar
         |  FROM t WHERE nt = $TileW),
         |g AS (
         |  SELECT user_id, count(*) AS n_tiles,
         |    ${exactSumSql("tmean")} AS sm,
         |    ${exactSumSql(round4Sql("tmean * tmean"))} AS smm,
         |    ${exactSumSql("tvar")} AS sv,
         |    ${exactSumSql(round4Sql("tvar * tvar"))} AS svv
         |  FROM tf GROUP BY user_id)
         |SELECT user_id, n_tiles,
         |  ${round4Sql("greatest(smm / n_tiles - (sm / n_tiles) * (sm / n_tiles), 0.0)")} AS stability,
         |  ${round4Sql("greatest(svv / n_tiles - (sv / n_tiles) * (sv / n_tiles), 0.0)")} AS lumpiness
         |FROM g ORDER BY user_id""".stripMargin,

    "ts_flat_spots" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |s AS (
         |  SELECT user_id, event_id, tsu, value,
         |    min(value) OVER (PARTITION BY user_id) AS mn,
         |    max(value) OVER (PARTITION BY user_id) AS mx
         |  FROM e),
         |b AS (
         |  SELECT user_id, event_id, tsu,
         |    CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
         |         ELSE least(CAST(9 AS BIGINT),
         |                    CAST(floor((value - mn) / ((mx - mn) / 10.0)) AS BIGINT)) END AS band
         |  FROM s),
         |i AS (
         |  SELECT user_id, band,
         |    row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) -
         |    row_number() OVER (PARTITION BY user_id, band ORDER BY tsu, event_id) AS island
         |  FROM b),
         |r AS (SELECT user_id, band, island, count(*) AS run
         |      FROM i GROUP BY user_id, band, island)
         |SELECT user_id, max(run) AS max_flat_run
         |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_crossing_points" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |r AS (
         |  SELECT user_id, value AS v,
         |    row_number() OVER (PARTITION BY user_id ORDER BY value) - 1 AS rn0,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM e),
         |f AS (
         |  SELECT user_id, v, rn0,
         |    CAST(n - 1 AS DOUBLE) * 0.5 AS h,
         |    floor(CAST(n - 1 AS DOUBLE) * 0.5) AS lo,
         |    ceil(CAST(n - 1 AS DOUBLE) * 0.5) AS hi
         |  FROM r
         |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * 0.5)
         |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * 0.5)),
         |q AS (
         |  SELECT user_id,
         |    ${round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(h) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS med
         |  FROM f GROUP BY user_id),
         |a AS (
         |  SELECT e.user_id, e.value > q.med AS above,
         |    lag(e.value > q.med) OVER (PARTITION BY e.user_id ORDER BY e.tsu, e.event_id) AS prev
         |  FROM e JOIN q ON e.user_id = q.user_id)
         |SELECT user_id, count(*) AS n_obs,
         |  count(CASE WHEN prev IS NOT NULL AND above <> prev THEN 1 END) AS crossings
         |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_arch_stat" -> {
      val corr = CleanFunctions.momentCorrSql("n", "sx", "sy", "sxy", "sxx", "syy")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |z0 AS (
         |  SELECT user_id, event_id, tsu,
         |    ${round4Sql(s"(value - ${CleanFunctions.exactMeanSql("value", "OVER (PARTITION BY user_id)")}) * (value - ${CleanFunctions.exactMeanSql("value", "OVER (PARTITION BY user_id)")})")} AS zz
         |  FROM e),
         |z AS (
         |  SELECT user_id, zz,
         |    lag(zz) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS zl
         |  FROM z0),
         |zf AS (SELECT * FROM z WHERE zl IS NOT NULL),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("zz")} AS sx, ${exactSumSql("zl")} AS sy,
         |    CAST(sum(CAST(${round4Sql("zz * zl")} AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(${round4Sql("zz * zz")} AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(${round4Sql("zl * zl")} AS DECIMAL(38,6))) AS DOUBLE) AS syy
         |  FROM zf GROUP BY user_id)
         |SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
         |  ${round4Sql(s"($corr) * ($corr)")} AS arch_r2
         |FROM m ORDER BY user_id""".stripMargin
    },

    "ts_hill_tail" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL AND value > 0.0),
         |r AS (
         |  SELECT user_id, value,
         |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
         |  FROM e),
         |x AS (
         |  SELECT user_id, value, rn,
         |    max(CASE WHEN rn = ${HillK + 1} THEN value END)
         |      OVER (PARTITION BY user_id) AS xk1
         |  FROM r),
         |t AS (
         |  SELECT user_id, rn,
         |    CASE WHEN rn <= $HillK THEN ${round6Sql("ln(value / xk1)")} END AS term
         |  FROM x),
         |g AS (
         |  SELECT user_id, count(*) AS n_pos,
         |    ${round4Sql(s"${exactSumSql("term")} / ${HillK.toDouble}")} AS hill
         |  FROM t GROUP BY user_id)
         |SELECT user_id, n_pos, hill,
         |  ${round4Sql("1.0 / nullif(hill, 0.0)")} AS alpha
         |FROM g ORDER BY user_id""".stripMargin,

    "ts_bursts" -> BurstsOracleSql,

    // The streaming burst fold replays the identical recursion.
    "streaming_bursts" -> BurstsOracleSql,

    "ts_pava_trend" ->
      s"""WITH idx AS (
         |  SELECT user_id, day, n, sv,
         |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS i
         |  FROM (
         |    SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |      count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS sv
         |    FROM events WHERE value IS NOT NULL GROUP BY 1, 2) q),
         |jk AS (
         |  SELECT a.user_id, a.i AS j, b.i AS k
         |  FROM idx a JOIN idx b ON a.user_id = b.user_id AND a.i <= b.i),
         |spans AS (
         |  SELECT jk.user_id, jk.j, jk.k,
         |    sum(m.n) AS nn, sum(m.sv) AS ssv
         |  FROM jk JOIN idx m
         |    ON m.user_id = jk.user_id AND m.i BETWEEN jk.j AND jk.k
         |  GROUP BY 1, 2, 3),
         |sa AS (SELECT user_id, j, k,
         |  ${round6Sql("CAST(ssv AS DOUBLE) / CAST(nn AS DOUBLE)")} AS avgjk
         |  FROM spans),
         |mj AS (
         |  SELECT i.user_id, i.i, sa.j, min(sa.avgjk) AS mn
         |  FROM idx i JOIN sa ON sa.user_id = i.user_id
         |    AND sa.j <= i.i AND sa.k >= i.i
         |  GROUP BY 1, 2, 3),
         |fit AS (SELECT user_id, i, ${round6Sql("max(mn)")} AS pava_fit
         |  FROM mj GROUP BY 1, 2)
         |SELECT idx.user_id, idx.day,
         |  ${round6Sql("CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)")} AS daily_mean,
         |  fit.pava_fit
         |FROM idx JOIN fit ON idx.user_id = fit.user_id AND idx.i = fit.i
         |ORDER BY idx.user_id, idx.day""".stripMargin,

    "lineitem_rdd_discount" ->
      s"""WITH base AS (
         |  SELECT CASE WHEN ${round6Sql("l_discount - 0.05")} >= 0.0
         |              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS side,
         |    ${round6Sql("l_discount - 0.05")} AS x, l_quantity AS y
         |  FROM lineitem WHERE abs(${round6Sql("l_discount - 0.05")}) <= 0.03),
         |m AS (
         |  SELECT side, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("x")} AS sx, ${exactSumSql("y")} AS sy,
         |    ${exactSumSql(round6Sql("x * x"))} AS sxx,
         |    ${exactSumSql(round6Sql("x * y"))} AS sxy
         |  FROM base GROUP BY 1 HAVING count(*) > 2),
         |ft AS (
         |  SELECT side, n,
         |    ${round6Sql("(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)")} AS slope,
         |    sx, sy
         |  FROM m),
         |fi AS (
         |  SELECT side, n, slope,
         |    ${round6Sql("sy / n - slope * (sx / n)")} AS icept
         |  FROM ft)
         |SELECT CAST(max(CASE WHEN side = 0 THEN n END) AS BIGINT) AS n_left,
         |  CAST(max(CASE WHEN side = 1 THEN n END) AS BIGINT) AS n_right,
         |  max(CASE WHEN side = 0 THEN slope END) AS slope_left,
         |  max(CASE WHEN side = 1 THEN slope END) AS slope_right,
         |  ${round4Sql("max(CASE WHEN side = 1 THEN icept END) - max(CASE WHEN side = 0 THEN icept END)")} AS rdd_jump
         |FROM fi""".stripMargin,

    "ts_ess" -> {
      val acfSql = TimeSeriesQueries.oracleSql("ts_acf_full")
      s"""WITH acf AS MATERIALIZED (SELECT user_id, lag_k, acf FROM ($acfSql) q),
         |nn AS (SELECT user_id, count(*) AS n_obs FROM events
         |  WHERE value IS NOT NULL GROUP BY 1),
         |tau AS (SELECT user_id, count(*) AS n_lags,
         |  ${round4Sql(s"1.0 + 2.0 * ${exactSumSql("acf")}")} AS tau_int
         |  FROM acf GROUP BY 1)
         |SELECT nn.user_id, nn.n_obs, tau.n_lags, tau.tau_int,
         |  ${round4Sql("CAST(n_obs AS DOUBLE) / greatest(tau_int, 1.0)")} AS ess
         |FROM nn JOIN tau ON nn.user_id = tau.user_id
         |ORDER BY nn.user_id""".stripMargin
    },

    "ts_intervention" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |t0s AS (
         |  SELECT user_id, event_id, tsu, value,
         |    (min(tsu) OVER (PARTITION BY user_id) +
         |     max(tsu) OVER (PARTITION BY user_id)) // 2 AS t0
         |  FROM e),
         |xs AS (
         |  SELECT user_id,
         |    ${round6Sql("CAST(tsu - t0 AS DOUBLE) / 86400000000.0")} AS x,
         |    value,
         |    CASE WHEN tsu >= t0 THEN CAST(1 AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS side
         |  FROM t0s),
         |m AS (
         |  SELECT user_id, side, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("x")} AS sx, ${exactSumSql("value")} AS sy,
         |    ${exactSumSql(round6Sql("x * x"))} AS sxx,
         |    ${exactSumSql(round6Sql("x * value"))} AS sxy
         |  FROM xs GROUP BY 1, 2 HAVING count(*) > 2),
         |fit AS (
         |  SELECT user_id, side, n,
         |    ${round6Sql("(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)")} AS slope,
         |    sx, sy
         |  FROM m),
         |fi AS (
         |  SELECT user_id, side, n, slope,
         |    ${round6Sql("sy / n - slope * (sx / n)")} AS icept
         |  FROM fit),
         |piv AS (
         |  SELECT user_id,
         |    max(CASE WHEN side = 0 THEN n END) AS n_pre,
         |    max(CASE WHEN side = 1 THEN n END) AS n_post,
         |    max(CASE WHEN side = 0 THEN slope END) AS slope_pre,
         |    max(CASE WHEN side = 1 THEN slope END) AS slope_post,
         |    max(CASE WHEN side = 0 THEN icept END) AS i_pre,
         |    max(CASE WHEN side = 1 THEN icept END) AS i_post
         |  FROM fi GROUP BY user_id
         |  HAVING max(CASE WHEN side = 0 THEN n END) IS NOT NULL
         |     AND max(CASE WHEN side = 1 THEN n END) IS NOT NULL)
         |SELECT user_id, CAST(n_pre AS BIGINT) AS n_pre,
         |  CAST(n_post AS BIGINT) AS n_post, slope_pre, slope_post,
         |  ${round4Sql("i_post - i_pre")} AS level_jump,
         |  ${round4Sql("slope_post - slope_pre")} AS slope_change
         |FROM piv ORDER BY user_id""".stripMargin,

    "ts_regime_switch" -> {
      val g = dlit(RegimeGamma)
      val q = dlit(RegimeQ)
      val sd = CleanFunctions.momentStdSql("m.n", "m.sx", "m.sxx")
      s"""WITH RECURSIVE e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("value")} AS sx,
         |    ${exactSumSql(round4Sql("value * value"))} AS sxx
         |  FROM e GROUP BY 1),
         |p0 AS (
         |  SELECT e.event_id, e.user_id, e.tsu,
         |    (e.value - m.sx / m.n) / $sd AS z
         |  FROM e JOIN m USING (user_id) WHERE $sd > 0.0),
         |prep AS (
         |  SELECT event_id, user_id, tsu,
         |    ${round6Sql(s"(z + $q) * (z + $q) / 2.0")} AS e0,
         |    ${round6Sql(s"(z - $q) * (z - $q) / 2.0")} AS e1,
         |    row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS rn
         |  FROM p0),
         |v AS (
         |  SELECT event_id, user_id, rn, e0 AS c0, $g + e1 AS c1
         |  FROM prep WHERE rn = 1
         |  UNION ALL
         |  SELECT p.event_id, p.user_id, p.rn,
         |    least(v.c0, v.c1) + p.e0,
         |    least(v.c0 + $g, v.c1) + p.e1
         |  FROM v JOIN prep p ON p.user_id = v.user_id AND p.rn = v.rn + 1)
         |SELECT event_id, ${round4Sql("c0")} AS cost_low,
         |  ${round4Sql("c1")} AS cost_high,
         |  CASE WHEN c1 < c0 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS in_high
         |FROM v ORDER BY event_id""".stripMargin
    },

    "ts_hawkes_intensity" -> HawkesOracleSql,

    // The streaming excitation fold replays the identical recursion.
    "streaming_hawkes" -> HawkesOracleSql,

    "ts_hjorth" -> {
      def pvar(q: String, s1: String, n: String) =
        round4Sql(s"greatest($q / $n - ($s1 / $n) * ($s1 / $n), 0.0)")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |l1 AS (
         |  SELECT user_id, event_id, tsu, value,
         |    ${round4Sql("value - lag(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id)")} AS dx
         |  FROM e),
         |l2 AS (
         |  SELECT user_id, value, dx,
         |    ${round4Sql("dx - lag(dx) OVER (PARTITION BY user_id ORDER BY tsu, event_id)")} AS ddx
         |  FROM l1),
         |m AS (
         |  SELECT user_id,
         |    count(value) AS n0, ${exactSumSql("value")} AS s0,
         |    ${exactSumSql(round4Sql("value * value"))} AS q0,
         |    count(dx) AS n1, ${exactSumSql("dx")} AS s1,
         |    ${exactSumSql(round4Sql("dx * dx"))} AS q1,
         |    count(ddx) AS n2, ${exactSumSql("ddx")} AS s2,
         |    ${exactSumSql(round4Sql("ddx * ddx"))} AS q2
         |  FROM l2 GROUP BY user_id),
         |v AS (
         |  SELECT user_id,
         |    ${pvar("q0", "s0", "n0")} AS activity,
         |    ${pvar("q1", "s1", "n1")} AS v1,
         |    ${pvar("q2", "s2", "n2")} AS v2
         |  FROM m),
         |h AS (
         |  SELECT user_id, activity, v1, v2,
         |    ${round4Sql("sqrt(v1 / nullif(activity, 0.0))")} AS mobility
         |  FROM v)
         |SELECT user_id, activity, mobility,
         |  ${round4Sql("sqrt(v2 / nullif(v1, 0.0)) / nullif(mobility, 0.0)")} AS complexity
         |FROM h ORDER BY user_id""".stripMargin
    },

    "ts_nonlinearity" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT user_id, value,
         |    lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |p AS (
         |  SELECT user_id,
         |    ${round4Sql("(value * l1) * l2")} AS p3,
         |    ${round4Sql("value - l1")} AS dd
         |  FROM l),
         |p2 AS (
         |  SELECT user_id, p3, dd,
         |    ${round4Sql("dd * dd")} AS d2,
         |    ${round4Sql("(dd * dd) * dd")} AS d3
         |  FROM p),
         |m AS (
         |  SELECT user_id, count(p3) AS n_triples,
         |    ${round4Sql(s"${exactSumSql("p3")} / count(p3)")} AS c3,
         |    ${exactSumSql("d2")} AS m2s, ${exactSumSql("d3")} AS m3s,
         |    count(dd) AS nd
         |  FROM p2 GROUP BY user_id)
         |SELECT user_id, n_triples, c3,
         |  ${round4Sql("(m3s / nd) / nullif(sqrt(((m2s / nd) * (m2s / nd)) * (m2s / nd)), 0.0)")} AS trev
         |FROM m ORDER BY user_id""".stripMargin,

    "ts_longest_strike" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |a AS (
         |  SELECT user_id, event_id, tsu,
         |    value > ${CleanFunctions.exactMeanSql("value", "OVER (PARTITION BY user_id)")} AS above
         |  FROM e),
         |i AS (
         |  SELECT user_id, above,
         |    row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) -
         |    row_number() OVER (PARTITION BY user_id, above ORDER BY tsu, event_id) AS island
         |  FROM a),
         |r AS (SELECT user_id, above, island, count(*) AS run
         |      FROM i GROUP BY user_id, above, island)
         |SELECT user_id,
         |  max(CASE WHEN above THEN run END) AS longest_above,
         |  max(CASE WHEN NOT above THEN run END) AS longest_below
         |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_turning_points" -> {
      val z = "((turning_points - (2.0 * (n_obs - 2) / 3.0)) / sqrt((16.0 * n_obs - 29.0) / 90.0))"
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT user_id, value,
         |    lag(value) OVER w AS prev, lead(value) OVER w AS nxt
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |g AS (
         |  SELECT user_id, count(*) AS n_obs,
         |    count(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL AND
         |      ((value > prev AND value > nxt) OR (value < prev AND value < nxt))
         |      THEN 1 END) AS turning_points
         |  FROM l GROUP BY user_id),
         |zz AS (
         |  SELECT user_id, n_obs, turning_points,
         |    ${round4Sql("2.0 * (n_obs - 2) / 3.0")} AS expected,
         |    ${round4Sql(z)} AS z
         |  FROM g)
         |SELECT user_id, n_obs, turning_points, expected, z,
         |  ${round6Sql(s"2.0 * (1.0 - ${CleanFunctions.normalCdfSql("abs(z)")})")} AS p_value
         |FROM zz ORDER BY user_id""".stripMargin
    },

    "ts_dfa" -> {
      val arms = DfaBoxes.map { b =>
        s"""SELECT user_id, CAST($b AS BIGINT) AS s, (rn - 1) // $b AS box,
           |  ((rn - 1) % $b) + 1 AS t, y FROM pr""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |dv AS (
         |  SELECT user_id, event_id, tsu,
         |    ${round4Sql(s"value - ${CleanFunctions.exactMeanSql("value", "OVER (PARTITION BY user_id)")}")} AS dev
         |  FROM e),
         |pr AS (
         |  SELECT user_id,
         |    ${round4Sql(exactSumSql("dev", "OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))} AS y,
         |    row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS rn
         |  FROM dv),
         |u AS (
         |$arms),
         |b AS (
         |  SELECT user_id, s, box, count(*) AS nb,
         |    CAST(sum(t) AS DOUBLE) AS st, CAST(sum(t * t) AS DOUBLE) AS stt,
         |    ${exactSumSql("y")} AS sy,
         |    ${exactSumSql(round4Sql("y * y"))} AS syy,
         |    ${exactSumSql(round4Sql("t * y"))} AS sty
         |  FROM u GROUP BY user_id, s, box),
         |r AS (
         |  SELECT user_id, s,
         |    ${round6Sql(round6Sql("greatest((syy - sy * sy / nb) - (sty - st * sy / nb) * (sty - st * sy / nb) / (stt - st * st / nb), 0.0)") + " / s")} AS rms2
         |  FROM b WHERE nb = s),
         |f AS (
         |  SELECT user_id, s, count(*) AS n_boxes,
         |    ${round4Sql(CleanFunctions.exactMeanSql("rms2"))} AS f2
         |  FROM r GROUP BY user_id, s),
         |g AS (
         |  SELECT user_id, s, f2,
         |    ${round6Sql("ln(nullif(f2, 0.0))")} AS lf,
         |    ${round6Sql("ln(CAST(s AS DOUBLE))")} AS ls
         |  FROM f),
         |a AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS k,
         |    ${exactSumSql("ls")} AS sls, ${exactSumSql("lf")} AS slf,
         |    ${exactSumSql(round6Sql("ls * ls"))} AS sll,
         |    ${exactSumSql(round6Sql("ls * lf"))} AS slfl
         |  FROM g WHERE lf IS NOT NULL GROUP BY user_id),
         |al AS (
         |  SELECT user_id,
         |    ${round4Sql("0.5 * ((slfl - sls * slf / k) / nullif(sll - sls * sls / k, 0.0))")} AS alpha
         |  FROM a),
         |pv AS (
         |  SELECT user_id,
         |    max(CASE WHEN s = 4 THEN f2 END) AS f2_s4,
         |    max(CASE WHEN s = 8 THEN f2 END) AS f2_s8,
         |    max(CASE WHEN s = 16 THEN f2 END) AS f2_s16
         |  FROM g GROUP BY user_id)
         |SELECT pv.user_id, f2_s4, f2_s8, f2_s16, al.alpha
         |FROM pv LEFT JOIN al ON pv.user_id = al.user_id
         |ORDER BY pv.user_id""".stripMargin
    },

    "ts_poincare" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT user_id, value,
         |    lag(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS l1
         |  FROM e),
         |p AS (
         |  SELECT user_id, ${round4Sql("value - l1")} AS dd,
         |    ${round4Sql("value + l1")} AS su
         |  FROM l WHERE l1 IS NOT NULL),
         |m AS (
         |  SELECT user_id, count(*) AS n_pairs,
         |    ${exactSumSql("dd")} AS sd, ${exactSumSql(round4Sql("dd * dd"))} AS qd,
         |    ${exactSumSql("su")} AS ss, ${exactSumSql(round4Sql("su * su"))} AS qs
         |  FROM p GROUP BY user_id),
         |v AS (
         |  SELECT user_id, n_pairs,
         |    greatest(qd / n_pairs - (sd / n_pairs) * (sd / n_pairs), 0.0) AS vard,
         |    greatest(qs / n_pairs - (ss / n_pairs) * (ss / n_pairs), 0.0) AS vars
         |  FROM m),
         |sdv AS (
         |  SELECT user_id, n_pairs,
         |    ${round4Sql("sqrt(vard / 2.0)")} AS sd1,
         |    ${round4Sql("sqrt(vars / 2.0)")} AS sd2
         |  FROM v)
         |SELECT user_id, n_pairs, sd1, sd2,
         |  ${round4Sql("sd1 / nullif(sd2, 0.0)")} AS sd_ratio
         |FROM sdv ORDER BY user_id""".stripMargin,

    "ts_transfer_entropy" ->
      s"""WITH h AS (
         |  SELECT user_id, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS b,
         |    ${CleanFunctions.exactMeanSql("value")} AS v
         |  FROM events WHERE value IS NOT NULL AND user_id % 10 = 0 GROUP BY 1, 2),
         |st AS (
         |  SELECT user_id, b,
         |    CASE WHEN v > ${CleanFunctions.exactMeanSql("v", "OVER (PARTITION BY user_id)")}
         |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS s
         |  FROM h),
         |r AS (
         |  SELECT y.user_id AS yu, xl.user_id AS xu,
         |    y.s AS yn, yl.s AS yp, xl.s AS xp
         |  FROM st y
         |  JOIN st yl ON yl.user_id = y.user_id AND yl.b = y.b - 86400000000
         |  JOIN st xl ON xl.b = y.b - 86400000000 AND xl.user_id <> y.user_id),
         |c AS (SELECT yu, xu, yn, yp, xp, count(*) AS c FROM r GROUP BY 1, 2, 3, 4, 5),
         |m AS (
         |  SELECT yu, xu, c,
         |    sum(c) OVER (PARTITION BY yu, xu) AS n,
         |    sum(c) OVER (PARTITION BY yu, xu, yp) AS cy,
         |    sum(c) OVER (PARTITION BY yu, xu, yp, xp) AS cyx,
         |    sum(c) OVER (PARTITION BY yu, xu, yn, yp) AS cny
         |  FROM c),
         |t AS (
         |  SELECT yu, xu, n,
         |    ${round6Sql("(CAST(c AS DOUBLE) / n) * ln(CAST(c * cy AS DOUBLE) / CAST(cyx * cny AS DOUBLE))")} AS term
         |  FROM m)
         |SELECT yu, xu, CAST(max(n) AS BIGINT) AS n_obs,
         |  ${round4Sql(exactSumSql("term"))} AS te
         |FROM t GROUP BY yu, xu HAVING max(n) > 3 ORDER BY yu, xu""".stripMargin,

    "ts_cid_pairs" ->
      s"""WITH h AS (
         |  SELECT user_id, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS b,
         |    ${CleanFunctions.exactMeanSql("value")} AS v
         |  FROM events WHERE value IS NOT NULL AND user_id % 10 = 0 GROUP BY 1, 2),
         |dd AS (
         |  SELECT user_id,
         |    ${round4Sql("v - lag(v) OVER (PARTITION BY user_id ORDER BY b)")} AS dd
         |  FROM h),
         |ce AS (
         |  SELECT user_id, ${exactSumSql(round4Sql("dd * dd"))} AS ce2
         |  FROM dd WHERE dd IS NOT NULL GROUP BY user_id),
         |ed AS (
         |  SELECT a.user_id AS ua, b2.user_id AS ub, count(*) AS n_common,
         |    ${exactSumSql(round4Sql(round4Sql("a.v - b2.v") + " * " + round4Sql("a.v - b2.v")))} AS ed2
         |  FROM h a JOIN h b2 ON a.b = b2.b AND a.user_id < b2.user_id
         |  GROUP BY 1, 2 HAVING count(*) > 3)
         |SELECT ua, ub, n_common, ${round4Sql("sqrt(ed2)")} AS euclid,
         |  ${round4Sql("sqrt(ed2) * sqrt(greatest(ca.ce2, cb.ce2) / nullif(least(ca.ce2, cb.ce2), 0.0))")} AS cid
         |FROM ed JOIN ce ca ON ua = ca.user_id JOIN ce cb ON ub = cb.user_id
         |ORDER BY ua, ub""".stripMargin,

    "ts_allan_var" -> {
      val arms = Seq(1L, 4L, 24L).map { t =>
        s"""SELECT user_id, CAST($t AS BIGINT) AS tau_h,
           |  tsu // ${t * 3600000000L} AS bucket, value FROM e""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |u AS (
         |$arms),
         |b AS (
         |  SELECT user_id, tau_h, bucket,
         |    ${CleanFunctions.exactMeanSql("value")} AS yb
         |  FROM u GROUP BY 1, 2, 3),
         |l AS (
         |  SELECT user_id, tau_h, bucket,
         |    lag(bucket) OVER w AS prevb,
         |    ${round4Sql("yb - lag(yb) OVER w")} AS dd
         |  FROM b WINDOW w AS (PARTITION BY user_id, tau_h ORDER BY bucket))
         |SELECT user_id, tau_h, count(*) AS n_pairs,
         |  ${round4Sql(s"sqrt(${CleanFunctions.exactMeanSql(round4Sql("dd * dd"))} / 2.0)")} AS allan_dev
         |FROM l WHERE prevb = bucket - 1
         |GROUP BY user_id, tau_h ORDER BY user_id, tau_h""".stripMargin
    },

    "ts_ses_select" -> {
      val lagCols = (1 to SesSpan).map(j =>
        s"lag(value, $j) OVER w AS l$j").mkString(",\n         |    ")
      val errExprs = SesAlphas.zipWithIndex.map { case (a, i) =>
        val num = (1 to SesSpan).map { j =>
          val wt = dlit(math.pow(1 - a, j - 1))
          s"CASE WHEN l$j IS NOT NULL THEN $wt * l$j ELSE 0.0 END"
        }.mkString(" + ")
        val den = (1 to SesSpan).map { j =>
          val wt = dlit(math.pow(1 - a, j - 1))
          s"CASE WHEN l$j IS NOT NULL THEN $wt ELSE 0.0 END"
        }.mkString(" + ")
        s"${round4Sql(s"value - ($num) / nullif($den, 0.0)")} AS e$i"
      }.mkString(",\n         |  ")
      val arms = SesAlphas.zipWithIndex.map { case (a, i) =>
        s"SELECT user_id, ${dlit(a)} AS alpha, e$i AS err FROM er"
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |lg AS (
         |  SELECT user_id, value,
         |    $lagCols
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |er AS (
         |  SELECT user_id,
         |  $errExprs
         |  FROM lg),
         |u AS (
         |$arms),
         |sse AS (
         |  SELECT user_id, alpha, count(*) AS n_pred,
         |    ${round4Sql(exactSumSql(round4Sql("err * err")))} AS sse
         |  FROM u WHERE err IS NOT NULL GROUP BY 1, 2),
         |rk AS (
         |  SELECT user_id, alpha, n_pred, sse,
         |    row_number() OVER (PARTITION BY user_id ORDER BY sse, alpha) AS rn
         |  FROM sse)
         |SELECT user_id, alpha AS best_alpha, n_pred, sse FROM rk
         |WHERE rn = 1 ORDER BY user_id""".stripMargin
    },

    "ts_variogram" -> {
      val arms = VariogramLags.map { h =>
        s"""SELECT user_id, CAST($h AS BIGINT) AS h,
           |  ${round4Sql(s"(value - v$h) * (value - v$h)")} AS dsq FROM l""".stripMargin
      }.mkString("\nUNION ALL\n")
      val lags = VariogramLags.map(h => s"lag(value, $h) OVER w AS v$h").mkString(", ")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT user_id, value, $lags
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |u AS (
         |$arms),
         |f AS (SELECT * FROM u WHERE dsq IS NOT NULL)
         |SELECT user_id, h, count(*) AS n_pairs,
         |  ${round4Sql(s"${CleanFunctions.exactMeanSql("dsq")} / 2.0")} AS gamma_h
         |FROM f GROUP BY user_id, h ORDER BY user_id, h""".stripMargin
    }
  )
}
