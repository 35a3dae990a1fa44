package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.CleanFunctions

/** Distributed order-statistics primitives.
  *
  * Everything here avoids the two shapes that die at 100 TB:
  *   - per-group value buffering (Spark's `percentile` UDAF materializes
  *     every group value in executor memory — [[rankPercentiles]] is one
  *     sort shuffle + one bounded-state agg instead);
  *   - the single-partition exchange of an unpartitioned global window
  *     ([[globalRank]] and [[rankedCumShare]] replace it with a two-level
  *     band decomposition: per-band parallel windows + a broadcast of
  *     O(bands) prefix offsets).
  *
  * Reference semantics: quantile thresholds and rank features of
  * anomaly-detection-in-time-series (threshold selection main.py-style
  * percentile cuts); the banded prefix sum is the classic parallel scan.
  */
object StatsOps {

  /** Exact interpolated percentiles (PERCENTILE_CONT semantics) per key
    * group via rank arithmetic: the target sits at fractional rank
    * h=(n-1)p between sorted ranks floor(h) and ceil(h); only those two
    * rows per (group, p) survive the filter, then one agg interpolates.
    * Arithmetic is kept IEEE-identical to the SQL twin: h, frac and the
    * interpolation all in double, in the same operation order.
    */
  def rankPercentiles(df: DataFrame, keys: Seq[String], valueCol: String,
                      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0), s"bad percentiles: $ps")
    val kcols = keys.map(col)
    val wSort = Window.partitionBy(kcols: _*).orderBy(col("v"))
    val wAll  = Window.partitionBy(kcols: _*)
    val ranked = df
      .select(kcols :+ col(valueCol).cast(DoubleType).as("v"): _*)
      .where(col("v").isNotNull)
      .withColumn("rn0", row_number().over(wSort).cast(LongType) - 1L)
      .withColumn("n", count(lit(1)).over(wAll))
    ranked
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("h", (col("n") - 1L).cast(DoubleType) * col("p"))
      .withColumn("lo", floor(col("h")))
      .withColumn("hi", ceil(col("h")))
      .where(col("rn0") === col("lo") || col("rn0") === col("hi"))
      .groupBy(kcols :+ col("p"): _*)
      .agg(CleanFunctions.round4(
        min(when(col("rn0") === col("lo"), col("v"))) +
          (max(col("h")) - max(col("lo")).cast(DoubleType)) *
          (min(when(col("rn0") === col("hi"), col("v"))) -
            min(when(col("rn0") === col("lo"), col("v"))))).as("pct"))
  }

  /** [[rankPercentiles]] for COARSE group keys (a handful of groups over
    * a corpus-scale input), where the plain version's per-group rank
    * window would sort each group's entire slice of the corpus in ONE
    * task. Same output bit-for-bit — the global v-at-rank per group is
    * identical however ranks are computed, and the h/lo/hi interpolation
    * is the same expression tree in the same order — but ranks come from
    * [[groupedGlobalRank]]'s band decomposition: per-(group, band)
    * parallel windows + a broadcast of O(groups·bands) prefix offsets,
    * so parallelism is groups×bands instead of groups. Value ties break
    * on the value itself (rank order among equal values is irrelevant to
    * the interpolated percentile).
    */
  def rankPercentilesBanded(df: DataFrame, keys: Seq[String], valueCol: String,
                            ps: Seq[Double], bands: Int = 256): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0), s"bad percentiles: $ps")
    val kcols = keys.map(col)
    val base = df
      .select(kcols :+ col(valueCol).cast(DoubleType).as("v"): _*)
      .where(col("v").isNotNull)
    val ranked = groupedGlobalRank(base, keys, col("v"), col("v"), "_rp_rn", bands)
      .withColumn("rn0", col("_rp_rn").cast(LongType) - 1L)
    val counts = base.groupBy(kcols: _*).agg(count(lit(1)).as("n"))
    ranked.join(broadcast(counts), keys)
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("h", (col("n") - 1L).cast(DoubleType) * col("p"))
      .withColumn("lo", floor(col("h")))
      .withColumn("hi", ceil(col("h")))
      .where(col("rn0") === col("lo") || col("rn0") === col("hi"))
      .groupBy(kcols :+ col("p"): _*)
      .agg(CleanFunctions.round4(
        min(when(col("rn0") === col("lo"), col("v"))) +
          (max(col("h")) - max(col("lo")).cast(DoubleType)) *
          (min(when(col("rn0") === col("hi"), col("v"))) -
            min(when(col("rn0") === col("lo"), col("v"))))).as("pct"))
  }

  /** Exact global rank by (`value`, `key`) without a single-partition
    * window: band rows by value range (bands are value-contiguous, so
    * within-band rank + count of rows in preceding bands IS the global
    * rank), rank each band in parallel, broadcast the O(bands) prefix
    * counts. `key` breaks value ties deterministically (ascending in
    * either direction, matching `ORDER BY v [DESC], key` in SQL).
    */
  def globalRank(df: DataFrame, value: Column, key: Column, asc: Boolean,
                 rankCol: String, bands: Int = 256): DataFrame = {
    val vd = value.cast(DoubleType)
    val stats = df.agg(min(vd).as("_gr_mn"), max(vd).cast(DoubleType).as("_gr_mx"))
    val banded = df.crossJoin(broadcast(stats))
      .withColumn("_gr_band",
        when(col("_gr_mx") === col("_gr_mn"), lit(0L))
          .otherwise(least(lit(bands - 1L),
            floor((vd - col("_gr_mn")) / ((col("_gr_mx") - col("_gr_mn")) / bands))))
          .cast(LongType))
      .drop("_gr_mn", "_gr_mx")
    val counts = banded.groupBy("_gr_band").agg(count(lit(1)).as("_gr_cnt"))
    // Prefix counts over O(bands) rows via a broadcast non-equi self-join
    // — not a global window, which would plan a single-partition exchange
    // (harmless at O(bands) but it's the shape PlanAudit bans outright).
    val prior = counts.select(col("_gr_band").as("_gr_b2"), col("_gr_cnt").as("_gr_c2"))
    val before = if (asc) col("_gr_b2") < col("_gr_band") else col("_gr_b2") > col("_gr_band")
    val offsets = counts.join(broadcast(prior), before, "left")
      .groupBy("_gr_band")
      .agg(coalesce(sum(col("_gr_c2")), lit(0L)).as("_gr_off"))
    val wIn = Window.partitionBy(col("_gr_band"))
      .orderBy(if (asc) vd.asc else vd.desc, key.asc)
    banded.join(broadcast(offsets), "_gr_band")
      .withColumn(rankCol, col("_gr_off") + row_number().over(wIn))
      .drop("_gr_band", "_gr_off")
  }

  /** [[globalRank]] with an independent rank per `grp` partition — lets
    * one banded pass rank SEVERAL metrics at once (stack them long-form
    * with the metric name as the group key, sign-flip any descending
    * metric so every rank is ascending). Same two-level decomposition:
    * per-(group, band) parallel windows + a broadcast of O(groups·bands)
    * prefix offsets; nothing exchanges to a single partition.
    */
  def groupedGlobalRank(df: DataFrame, grp: Seq[String], value: Column,
                        key: Column, rankCol: String,
                        bands: Int = 256): DataFrame = {
    val vd = value.cast(DoubleType)
    val gcols = grp.map(col)
    val stats = df.groupBy(gcols: _*)
      .agg(min(vd).as("_gr_mn"), max(vd).cast(DoubleType).as("_gr_mx"))
    val banded = df.join(broadcast(stats), grp)
      .withColumn("_gr_band",
        when(col("_gr_mx") === col("_gr_mn"), lit(0L))
          .otherwise(least(lit(bands - 1L),
            floor((vd - col("_gr_mn")) / ((col("_gr_mx") - col("_gr_mn")) / bands))))
          .cast(LongType))
      .drop("_gr_mn", "_gr_mx")
    val counts = banded.groupBy(gcols :+ col("_gr_band"): _*)
      .agg(count(lit(1)).as("_gr_cnt"))
    val prior = counts.select(
      gcols.zip(grp).map { case (c, n) => c.as(s"_gr_g_$n") } :+
        col("_gr_band").as("_gr_b2") :+ col("_gr_cnt").as("_gr_c2"): _*)
    val sameGrp = grp.map(n => col(s"_gr_g_$n") === col(n)).reduce(_ && _)
    val offsets = counts.join(broadcast(prior),
        sameGrp && col("_gr_b2") < col("_gr_band"), "left")
      .groupBy(gcols :+ col("_gr_band"): _*)
      .agg(coalesce(sum(col("_gr_c2")), lit(0L)).as("_gr_off"))
    val wIn = Window.partitionBy(gcols :+ col("_gr_band"): _*)
      .orderBy(vd.asc, key.asc)
    banded.join(broadcast(offsets), grp :+ "_gr_band")
      .withColumn(rankCol, col("_gr_off") + row_number().over(wIn))
      .drop("_gr_band", "_gr_off")
  }

  /** Descending cumulative share of an exact-DECIMAL `value` per `key`
    * row (Pareto / "top customers cover X% of revenue"). Same two-level
    * band trick as [[globalRank]], but accumulating DECIMAL sums instead
    * of counts — decimal addition is order-independent, so the banded
    * prefix equals the sequential scan bit-for-bit and the SQL twin can
    * be a plain global window.
    */
  def rankedCumShare(df: DataFrame, key: Column, value: Column,
                     bands: Int = 64): DataFrame = {
    // localCheckpoint (r17): the input is referenced by three branches
    // (global stats, band sums, the final banded join) whose column
    // pruning defeats exchange reuse, so an expensive input subtree ran
    // three times (both callers pass a corpus-scale grouped aggregate).
    // One materialization of the O(keys) (key, value) aggregate replaces
    // the repeats.
    val dfm = df.localCheckpoint()
    val vd = value.cast(DoubleType)
    val stats = dfm.agg(max(vd).as("_cs_mx"), sum(value).as("_cs_tot"))
    val banded = dfm.crossJoin(broadcast(stats))
      .withColumn("_cs_band",
        when(col("_cs_mx") <= lit(0.0), lit(0L))
          .otherwise(least(lit(bands - 1L), floor(vd / (col("_cs_mx") / bands))))
          .cast(LongType))
    val sums = banded.groupBy("_cs_band").agg(sum(value).as("_cs_bandsum"))
    // Prefix sums over O(bands) rows, same broadcast-join shape as
    // globalRank (decimal addition is order-independent, so summing the
    // later bands in any order equals the sequential scan exactly).
    val later = sums.select(col("_cs_band").as("_cs_b2"), col("_cs_bandsum").as("_cs_s2"))
    val offsets = sums.join(broadcast(later), col("_cs_b2") > col("_cs_band"), "left")
      .groupBy("_cs_band")
      .agg(sum(col("_cs_s2")).as("_cs_off"))
    val wIn = Window.partitionBy(col("_cs_band")).orderBy(vd.desc, key.asc)
    banded.join(broadcast(offsets), "_cs_band")
      .withColumn("_cs_cum",
        coalesce(col("_cs_off"), lit(0).cast(DecimalType(18, 2))) + sum(value).over(wIn))
      .withColumn("cum_share",
        CleanFunctions.round4(col("_cs_cum").cast(DoubleType) / col("_cs_tot").cast(DoubleType)))
      .drop("_cs_band", "_cs_off", "_cs_cum", "_cs_mx", "_cs_tot")
  }

  /** Banded prefix sums: adds `cum_<c>` = the running sum of each column
    * in `sumCols` over ascending `ord` (which must be DISTINCT per row —
    * callers feed per-distinct-key aggregates). Same two-level shape as
    * [[globalRank]]: per-band windows + a broadcast non-equi self-join
    * over O(bands) band totals — no single-partition exchange at any
    * scale. Integer/DECIMAL columns only (order-independent addition, so
    * the banded result equals a sequential scan exactly).
    */
  def bandedPrefixSums(df: DataFrame, ord: Column, sumCols: Seq[String],
                       bands: Int = 256): DataFrame = {
    val vd = ord.cast(DoubleType)
    val stats = df.agg(min(vd).as("_ps_mn"), max(vd).cast(DoubleType).as("_ps_mx"))
    val banded = df.crossJoin(broadcast(stats))
      .withColumn("_ps_band",
        when(col("_ps_mx") === col("_ps_mn"), lit(0L))
          .otherwise(least(lit(bands - 1L),
            floor((vd - col("_ps_mn")) / ((col("_ps_mx") - col("_ps_mn")) / bands))))
          .cast(LongType))
      .drop("_ps_mn", "_ps_mx")
    val aggs = sumCols.map(c => sum(col(c)).as(s"_ps_t_$c"))
    val totals = banded.groupBy("_ps_band").agg(aggs.head, aggs.tail: _*)
    val prior = totals.select(col("_ps_band").as("_ps_b2") +:
      sumCols.map(c => col(s"_ps_t_$c").as(s"_ps_p_$c")): _*)
    val offAggs = sumCols.map(c =>
      coalesce(sum(col(s"_ps_p_$c")), lit(0L)).as(s"_ps_o_$c"))
    val offsets = totals.join(broadcast(prior), col("_ps_b2") < col("_ps_band"), "left")
      .groupBy("_ps_band").agg(offAggs.head, offAggs.tail: _*)
      .select(col("_ps_band") +: sumCols.map(c => col(s"_ps_o_$c")): _*)
    val wIn = Window.partitionBy("_ps_band").orderBy(vd.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded.join(broadcast(offsets), Seq("_ps_band"))
      .select(df.columns.map(col) ++
        sumCols.map(c => (col(s"_ps_o_$c") + sum(col(c)).over(wIn)).as(s"cum_$c")): _*)
  }

  /** CUSUM change score: running sum of deviations from the per-series
    * mean, S_i = sum_{j<=i}(x_j) - i*mean. The running sum goes through
    * DECIMAL so partial order can't drift (SURVEY §4); mean and the
    * final subtraction are double ops identical to the SQL twin.
    */
  def cusum(df: DataFrame, keys: Seq[String], ord: Seq[String],
            valueCol: String): DataFrame = {
    val dec = DecimalType(18, 6)
    val part = Window.partitionBy(keys.map(col): _*)
    val wRun = part.orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mean = col("_cu_tot").cast(DoubleType) / col("_cu_n")
    df
      .withColumn("_cu_run", sum(col(valueCol).cast(dec)).over(wRun).cast(DoubleType))
      .withColumn("_cu_rn", row_number().over(part.orderBy(ord.map(col): _*)).cast(LongType))
      .withColumn("_cu_tot", sum(col(valueCol).cast(dec)).over(part))
      .withColumn("_cu_n", count(col(valueCol)).over(part))
      .withColumn("cusum",
        CleanFunctions.round4(col("_cu_run") - col("_cu_rn").cast(DoubleType) * mean))
      .drop("_cu_run", "_cu_rn", "_cu_tot", "_cu_n")
  }

  /** Page–Hinkley sequential mean-shift score per key: PH_t =
    * Σ_{i≤t}(x_i − x̄_i − δ) against the RUNNING mean x̄_i (so a slow
    * upward drift keeps contributing — deviations from the FULL-series
    * mean, [[cusum]], self-cancel around it), with the alarm raised when
    * PH_t exceeds its running minimum by λ. Appends `ph` (4dp) and
    * `is_drift` (0/1). Entirely window-expressible: exact DECIMAL
    * running mean, 6dp-quantized increments, DECIMAL prefix sum,
    * running min — keyed windows only, no global sort, no fold, and
    * order-of-addition cannot drift cross-engine hashes. Null values
    * are excluded upstream by the caller (a null x_i has no defined
    * increment).
    */
  def pageHinkley(df: DataFrame, keys: Seq[String], ord: Seq[String],
                  valueCol: String, delta: Double, lambda: Double): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(col): _*)
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_ph_mean", CleanFunctions.exactMeanOver(col(valueCol), wr))
      .withColumn("_ph_term",
        CleanFunctions.round6(col(valueCol) - col("_ph_mean") - lit(delta)))
      .withColumn("_ph_raw", CleanFunctions.exactSumOver(col("_ph_term"), wr))
      .withColumn("_ph_min", min(col("_ph_raw")).over(wr))
      .withColumn("ph", CleanFunctions.round4(col("_ph_raw")))
      .withColumn("is_drift",
        when(col("_ph_raw") - col("_ph_min") > lambda, 1L).otherwise(0L))
      .drop("_ph_mean", "_ph_term", "_ph_raw", "_ph_min")
  }

  /** Per-key ordinary-least-squares fit of `y` on `x`: slope, intercept
    * and R² from one pass of DECIMAL-exact raw moments (n, Σx, Σy, Σxy,
    * Σx², Σy²). The closed form keeps every double op in the same order
    * as the SQL twin, so results are bit-identical; a zero x-variance
    * group (single distinct x) yields null slope/intercept/r2 via the
    * nullif-guarded denominator. Inputs are expected few-decimal (the
    * DECIMAL(18,6) exact-sum contract, SURVEY §4).
    *
    * Reference semantics: the linear-trend probe of the EDA notebooks
    * (trend line over the load series); at engine level this is the
    * grouped-regression primitive (one map-side-partial aggregate, no
    * window, no data movement beyond the group shuffle).
    */
  def olsTrend(df: DataFrame, keys: Seq[String], x: Column, y: Column): DataFrame = {
    val kcols = keys.map(col)
    val d = df
      .select(kcols :+ x.cast(DoubleType).as("_ot_x") :+ y.cast(DoubleType).as("_ot_y"): _*)
      .where(col("_ot_x").isNotNull && col("_ot_y").isNotNull)
    val agg = d.groupBy(kcols: _*).agg(
      count(lit(1)).cast(DoubleType).as("_ot_n"),
      CleanFunctions.exactSum(col("_ot_x")).as("_ot_sx"),
      CleanFunctions.exactSum(col("_ot_y")).as("_ot_sy"),
      CleanFunctions.exactSum(col("_ot_x") * col("_ot_y")).as("_ot_sxy"),
      CleanFunctions.exactSum(col("_ot_x") * col("_ot_x")).as("_ot_sxx"),
      CleanFunctions.exactSum(col("_ot_y") * col("_ot_y")).as("_ot_syy"))
    val n  = col("_ot_n"); val sx = col("_ot_sx"); val sy = col("_ot_sy")
    val slope = CleanFunctions.safeDiv(
      n * col("_ot_sxy") - sx * sy, n * col("_ot_sxx") - sx * sx)
    val r = CleanFunctions.momentCorr(n, sx, sy,
      col("_ot_sxy"), col("_ot_sxx"), col("_ot_syy"))
    agg
      .withColumn("_ot_slope", slope)
      .select(kcols ++ Seq(
        n.cast(LongType).as("n_obs"),
        CleanFunctions.round4(col("_ot_slope")).as("slope"),
        CleanFunctions.round4((sy - col("_ot_slope") * sx) / n).as("intercept"),
        CleanFunctions.round4(r * r).as("r2")): _*)
  }

  /** Trailing-`frameRows` rolling skewness and excess kurtosis per key —
    * the distribution-shape monitor (a regime change shows up in shape
    * before it moves the mean). One bounded ROWS window carrying four
    * DECIMAL power sums (each vᵖ term rounded to 4dp first so both
    * engines cast the identical 4dp double into DECIMAL); population
    * moments m₂..m₄ then skew = m₃/m₂^1.5, kurt = m₄/m₂² − 3 in
    * IEEE-identical op order. Constant frames (m₂ = 0, incl. n = 1)
    * yield nulls on both engines via the nullif guard; the ^1.5 goes
    * through sqrt(m₂³) — never libm pow, which is not correctly rounded
    * and may differ across engines.
    */
  def rollingSkewKurt(df: DataFrame, keys: Seq[String], ord: Seq[String],
                      valueCol: String, frameRows: Int): DataFrame = {
    require(frameRows >= 2, s"frameRows must be >= 2: $frameRows")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(col): _*)
      .rowsBetween(-(frameRows - 1), Window.currentRow)
    // DECIMAL(38,6): v^4 at the DQ bound |v| <= 1e6 is 1e24 — a (28,6)
    // cast (1e22 cap) would silently null on Spark and ERROR on DuckDB,
    // an in-range engine divergence (code-review finding).
    val dec = DecimalType(38, 6)
    val v = col(valueCol)
    def powSum(p: Column): Column =
      sum(CleanFunctions.round4(p).cast(dec)).over(w).cast(DoubleType)
    val mean = col("_rs_s1") / col("_rs_n")
    val m2   = col("_rs_s2") / col("_rs_n") - mean * mean
    val m3   = col("_rs_s3") / col("_rs_n") - lit(3.0) * mean * (col("_rs_s2") / col("_rs_n")) +
      lit(2.0) * mean * mean * mean
    val m4   = col("_rs_s4") / col("_rs_n") - lit(4.0) * mean * (col("_rs_s3") / col("_rs_n")) +
      lit(6.0) * (mean * mean) * (col("_rs_s2") / col("_rs_n")) -
      lit(3.0) * (mean * mean) * (mean * mean)
    df.where(v.isNotNull)
      .withColumn("_rs_n", count(lit(1)).over(w).cast(DoubleType))
      .withColumn("_rs_s1", sum(v.cast(DecimalType(18, 6))).over(w).cast(DoubleType))
      .withColumn("_rs_s2", powSum(v * v))
      .withColumn("_rs_s3", powSum(v * v * v))
      .withColumn("_rs_s4", powSum(v * v * v * v))
      .withColumn("_rs_m2", greatest(m2, lit(0.0)))
      .withColumn("roll_skew", CleanFunctions.round4(
        m3 / nullif(sqrt(col("_rs_m2") * col("_rs_m2") * col("_rs_m2")), lit(0.0))))
      .withColumn("roll_kurt", CleanFunctions.round4(
        m4 / nullif(col("_rs_m2") * col("_rs_m2"), lit(0.0)) - lit(3.0)))
      .withColumn("n_frame", col("_rs_n").cast(LongType))
      .drop("_rs_n", "_rs_s1", "_rs_s2", "_rs_s3", "_rs_s4", "_rs_m2")
  }

  /** Theil-Sen robust trend: per-key MEDIAN of all pairwise slopes
    * (vⱼ−vᵢ)/(tⱼ−tᵢ) over pre-bucketed observations — one outlier bucket
    * shifts OLS arbitrarily but moves the pairwise-slope median by one
    * rank. `bucketCol` must be an integral time index (e.g. day number)
    * with one `valueCol` observation per (key, bucket) — callers
    * aggregate first, which is also the scale contract: the pair join is
    * O(buckets²) per key, so the bucket granularity (daily here, weekly
    * at longer horizons) bounds it to O(10³)/key independent of raw row
    * count. The median reuses [[rankPercentiles]] (interpolated,
    * engine-exact).
    */
  def theilSen(df: DataFrame, keys: Seq[String], bucketCol: String,
               valueCol: String): DataFrame = {
    val kcols = keys.map(col)
    val a = df.select(kcols :+ col(bucketCol).cast(LongType).as("_th_b1") :+
      col(valueCol).cast(DoubleType).as("_th_m1"): _*)
    val b = df.select(kcols :+ col(bucketCol).cast(LongType).as("_th_b2") :+
      col(valueCol).cast(DoubleType).as("_th_m2"): _*)
    val pairs = a.join(b, keys)
      .where(col("_th_b1") < col("_th_b2"))
      .select(kcols :+ ((col("_th_m2") - col("_th_m1")) /
        (col("_th_b2") - col("_th_b1")).cast(DoubleType)).as("_th_slope"): _*)
    rankPercentiles(pairs, keys, "_th_slope", Seq(0.5))
      .select(kcols :+ col("pct").as("theil_slope"): _*)
  }

  /** Shannon entropy (nats) of the integer-bucketed value distribution
    * per key group: H = -sum_b p_b ln p_b over buckets b = floor(value).
    * Each p*ln(p) term is rounded to 6dp and summed as DECIMAL, making
    * the reduction order-independent and engine-exact; ln itself agrees
    * to the last ulp across libm implementations at 6dp rounding.
    */
  def bucketEntropy(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val kcols = keys.map(col)
    val cnt = df
      .select(kcols :+ floor(col(valueCol)).cast(LongType).as("_be_bucket"): _*)
      .groupBy(kcols :+ col("_be_bucket"): _*)
      .agg(count(lit(1)).as("_be_cnt"))
    val p = col("_be_cnt") / sum(col("_be_cnt")).over(Window.partitionBy(kcols: _*))
    cnt
      .withColumn("_be_term", CleanFunctions.round6(p * log(p)).cast(DecimalType(18, 6)))
      .groupBy(kcols: _*)
      .agg((-sum(col("_be_term"))).cast(DoubleType).as("entropy"))
  }
}
