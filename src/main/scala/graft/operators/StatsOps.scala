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

  /** Descending cumulative share of an exact-DECIMAL `value` per `key`
    * row (Pareto / "top customers cover X% of revenue"). Same two-level
    * band trick as [[globalRank]], but accumulating DECIMAL sums instead
    * of counts — decimal addition is order-independent, so the banded
    * prefix equals the sequential scan bit-for-bit and the SQL twin can
    * be a plain global window.
    */
  def rankedCumShare(df: DataFrame, key: Column, value: Column,
                     bands: Int = 64): DataFrame = {
    val vd = value.cast(DoubleType)
    val stats = df.agg(max(vd).as("_cs_mx"), sum(value).as("_cs_tot"))
    val banded = df.crossJoin(broadcast(stats))
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
