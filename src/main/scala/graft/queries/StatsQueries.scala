package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.CleanFunctions
import graft.functions.CleanFunctions.{exactSum, exactSumSql, round4, round4Sql, round6, round6Sql}
import graft.operators.StatsOps
import graft.sources.Tables

/** Order-statistics / segmentation queries built on [[StatsOps]] —
  * exact percentiles, global ranks, cumulative share, CUSUM, entropy,
  * mode, grouping sets — each with an IEEE-identical DuckDB twin.
  *
  * Scale notes: every window here is partitioned ([[StatsOps]] replaces
  * the global-ORDER-BY shapes with banded two-level decompositions whose
  * only single-partition stage is an O(bands) aggregate output); the
  * grouped aggregates are map-side partial; the one cross join is a
  * broadcast of a 2-row scalar aggregate.
  */
object StatsQueries {

  private val Ps = Seq(0.25, 0.5, 0.9)

  /** Lead-time SLA percentiles (lineitem_lead_time). */
  private val LeadTimePs = Seq(0.5, 0.9, 0.99)

  /** QTE percentile grid (adds the p75/p90 tail view). */
  private val QtePs = Seq(0.25, 0.5, 0.75, 0.9)

  /** Compaction target-file capacity (rows). */
  private val CompactCap = 20000L

  /** Exact-double literal shared with the SQL twin. */
  private def dlit(x: Double): String = CleanFunctions.dlitSql(x)

  /** Pettitt significance bound on the exponent: p ≈ 2e^(−q) < 0.05 ⟺
    * q > ln(2/0.05) = ln 40 — baked as one shared literal so neither
    * engine evaluates exp()/ln() in the significance decision.
    */
  private val PettittSigQ = math.log(40.0)

  /** Page–Hinkley magnitude tolerance δ and alarm threshold λ, sized to
    * the events value scale (mean ≈ 50, σ ≈ 49): δ ≈ σ/10, λ ≈ 4σ.
    */
  private val PhDelta = 5.0
  private val PhLambda = 200.0

  /** ts_page_hinkley's oracle, shared VERBATIM with streaming_page_hinkley
    * (the streaming fold replays to the identical running-mean/DECIMAL-
    * cumsum/running-min pipeline — the streaming_kalman shared-body rule).
    */
  private lazy val PageHinkleyOracleSql: String = {
    val wrw = "WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""WITH e AS (SELECT user_id, ts, event_id, value FROM events WHERE value IS NOT NULL),
       |m AS (SELECT user_id, ts, event_id, value,
       |  ${CleanFunctions.exactMeanSql("value", "OVER wr")} AS rmean
       |  FROM e $wrw),
       |t AS (SELECT user_id, ts, event_id,
       |  ${CleanFunctions.round6Sql(s"value - rmean - ${dlit(PhDelta)}")} AS term FROM m),
       |p AS (SELECT user_id, ts, event_id,
       |  ${exactSumSql("term", "OVER wr")} AS ph
       |  FROM t $wrw),
       |q AS (SELECT event_id, ph, min(ph) OVER wr AS mn FROM p $wrw)
       |SELECT event_id, ${round4Sql("ph")} AS ph,
       |  CAST(CASE WHEN ph - mn > ${dlit(PhLambda)} THEN 1 ELSE 0 END AS BIGINT) AS is_drift
       |FROM q ORDER BY event_id""".stripMargin
  }

  /** Benford expected first-digit shares log10(1 + 1/d), d = 1..9 —
    * computed ONCE here and baked as literals into both engines.
    */
  private val BenfordExp: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Count-min sketch geometry + hash constants (events_cms_topk):
    * d rows x w counters, h_i(x) = ((a_i*x + b_i) mod p) mod w with
    * p = 2^31-1. a_i stays ~1e6 so a_i * (x mod p) < 2^52 — exact in
    * BIGINT on both engines with headroom.
    */
  private val CmsD = 3
  private val CmsW = 64L
  private val CmsP = 2147483647L
  private val CmsA = Seq(1103633L, 700001L, 900007L)
  private val CmsB = Seq(12345L, 67891L, 33533L)
  private val CmsTopN = 20

  /** DuckDB replica of the full CMS build + [[cmsAudit]] — one string,
    * shared by the batch and streaming entries (same counters by
    * construction, so the same oracle).
    */
  private lazy val CmsOracleSql: String = {
    def hSql(i: Int) =
      s"(((${CmsA(i)} * (user_id % $CmsP) + ${CmsB(i)}) % $CmsP) % $CmsW)"
    val exRows = (0 until CmsD)
      .map(i => s"SELECT $i AS r, ${hSql(i)} AS b FROM events")
      .mkString("\n  UNION ALL ")
    val joins = (0 until CmsD)
      .map(i => s"JOIN counters c$i ON c$i.r = $i AND c$i.b = t.b$i")
      .mkString("\n  ")
    s"""WITH ex AS ($exRows),
       |counters AS (SELECT r, b, count(*) AS cnt FROM ex GROUP BY 1, 2),
       |t AS (SELECT user_id, count(*) AS true_cnt,
       |  ${(0 until CmsD).map(i => s"${hSql(i)} AS b$i").mkString(", ")}
       |  FROM events GROUP BY user_id),
       |e AS (SELECT t.user_id, t.true_cnt,
       |  least(${(0 until CmsD).map(i => s"c$i.cnt").mkString(", ")}) AS cms_est
       |  FROM t
       |  $joins)
       |SELECT user_id, true_cnt, cms_est, cms_est - true_cnt AS overestimate
       |FROM e ORDER BY cms_est DESC, user_id LIMIT $CmsTopN""".stripMargin
  }

  /** Row-i CMS hash of `user_id` — one Column expression, shared by the
    * batch counter scan, the truth-side audit join, and the streaming
    * cell explosion so all three land in the same buckets.
    */
  private def cmsHash(i: Int) =
    ((lit(CmsA(i)) * pmod(col("user_id"), lit(CmsP)) + lit(CmsB(i))) % CmsP) % CmsW

  /** Top-k audit downstream of a CMS counter table (r, b, cnt) — shared
    * by the batch scan build and the streaming fold emission: per-key
    * true counts, the d broadcast counter lookups, estimate = min over
    * rows, TakeOrdered top-k (never a global sort).
    */
  private def cmsAudit(s: SparkSession, d: String,
                       counters: DataFrame): DataFrame = {
    val truth = Tables.events(s, d).select(col("user_id"))
      .groupBy("user_id").agg(count(lit(1)).as("true_cnt"))
    val withB = (0 until CmsD).foldLeft(truth) { (df, i) =>
      df.withColumn(s"b$i", cmsHash(i))
    }
    val est = (0 until CmsD).foldLeft(withB) { (df, i) =>
      df.join(broadcast(counters.where(col("r") === i)
        .select(col("b").as(s"b$i"), col("cnt").as(s"c$i"))), Seq(s"b$i"))
    }
    est.select(col("user_id"), col("true_cnt"),
        least((0 until CmsD).map(i => col(s"c$i")): _*).as("cms_est"))
      .withColumn("overestimate", col("cms_est") - col("true_cnt"))
      .orderBy(desc("cms_est"), col("user_id")).limit(CmsTopN)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact PERCENTILE_CONT per series via rank interpolation — no
    // per-group value buffering (Spark's percentile UDAF would hold every
    // group value in memory; this is a sort window + bounded agg).
    "events_percentiles" -> { (s, d) =>
      StatsOps.rankPercentiles(Tables.events(s, d), Seq("user_id"), "value", Ps)
        .orderBy("user_id", "p")
    },

    // Fulfillment lead-time percentiles per return flag (p50/p90/p99 of
    // ship − order days — the logistics SLA readout; do returned lines
    // ship slower?): l_returnflag has 3 values over the whole corpus,
    // the canonical COARSE-key percentile where a plain per-group rank
    // window would sort a third of 100 TB in one task — routed through
    // the banded two-level rank decomposition instead (per-(flag, band)
    // parallel windows + broadcast prefix offsets). Integer day deltas,
    // exact rank interpolation; the orders dim join shuffles on the
    // fact's own key.
    "lineitem_lead_time" -> { (s, d) =>
      // localCheckpoint (r17): rankPercentilesBanded reads its input in
      // four branches (group counts, band stats, band counts, final
      // rank join) whose differing column pruning defeats exchange
      // reuse — the lineitem⋈orders join ran 3-4x (three ~0.5-1 s
      // parallel job pairs profiled at sf0.1). Materializing the
      // post-join projection once replaces those repeat corpus joins
      // with local reads of a 2-column (flag, lead_days) table — ~10
      // bytes/row, far cheaper at any scale than re-running the join.
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_returnflag"), col("l_shipdate"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_returnflag"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast(DoubleType)
            .as("lead_days"))
        .localCheckpoint()
      StatsOps.rankPercentilesBanded(li, Seq("l_returnflag"), "lead_days",
          LeadTimePs)
        .orderBy("l_returnflag", "p")
    },

    // Stationarity battery per series: the ADF (H0: unit root) and
    // KPSS (H0: stationary) verdicts CROSSED — the two tests have
    // opposite nulls, so only the combination is decisive: both pass =
    // stationary, both fail = difference it (unit root), ADF-pass +
    // KPSS-fail = trend-stationary (detrend instead), ADF-fail +
    // KPSS-pass = underpowered/inconclusive. Reuses both production
    // entries verbatim; one O(series) join.
    "ts_stationarity_battery" -> { (s, d) =>
      val adf = queries("ts_adf")(s, d)
        .select(col("user_id"), col("adf_t"), col("unit_root"))
      val kpss = queries("ts_kpss")(s, d)
        .select(col("user_id"), col("kpss"), col("nonstationary"))
      adf.join(kpss, "user_id")
        .withColumn("verdict",
          when(col("unit_root") === 0L && col("nonstationary") === 0L, "stationary")
            .when(col("unit_root") === 1L && col("nonstationary") === 1L, "unit_root")
            .when(col("unit_root") === 0L && col("nonstationary") === 1L, "trend_stationary")
            .otherwise("inconclusive"))
        .orderBy("user_id")
    },

    // Compaction plan for the (day × type) layout: first-fit pack each
    // type's daily partitions (in day order) into ~20k-row target
    // files — the actionable half of events_partition_skew (the audit
    // says "too many small files"; this emits WHICH partitions merge
    // into WHICH file, with row offsets, so the rewrite job is pure
    // execution). Reuses the LayoutOps.packFirstFit fold (O(1) state
    // per stream, keyed repartition) with its recursive-CTE exact
    // oracle; the plan runs over the O(days × types) aggregate, never
    // raw events.
    "events_compaction_plan" -> { (s, d) =>
      val parts = Tables.events(s, d).groupBy(
          CleanFunctions.epochUs(date_trunc("day", col("ts"))).as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_rows"))
      graft.operators.LayoutOps.packFirstFit(parts, Seq("event_type"), Seq("day"),
          "n_rows", CompactCap)
        .select(col("event_type"), col("day"), col("n_rows"),
          col("shard_file").as("target_file"), col("byte_offset").as("row_offset"))
        .orderBy("event_type", "day")
    },

    // Partition-layout skew audit for the (day × type) write key: rows
    // per would-be partition, max/mean skew factor, and the
    // small-partition count — the report that decides whether a
    // partitioned write needs key coarsening or salting BEFORE it
    // produces a million tiny files (the #1 operational failure of
    // partitioned data lakes). One grouped count + one 1-row broadcast;
    // the audit itself never materializes the layout.
    "events_partition_skew" -> { (s, d) =>
      val parts = Tables.events(s, d).groupBy(
          CleanFunctions.epochUs(date_trunc("day", col("ts"))).as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_rows"))
      val stats = parts.agg(
          count(lit(1)).as("n_partitions"),
          sum(col("n_rows")).as("total_rows"),
          max(col("n_rows")).as("max_rows"))
        .withColumn("mean_rows",
          col("total_rows").cast(DoubleType) / col("n_partitions").cast(DoubleType))
      parts.crossJoin(broadcast(stats))
        .agg(
          max(col("n_partitions")).as("n_partitions"),
          max(col("total_rows")).as("total_rows"),
          max(col("max_rows")).as("max_rows"),
          round4(max(col("mean_rows"))).as("mean_rows"),
          round4(max(col("max_rows")).cast(DoubleType) / max(col("mean_rows")))
            .as("skew_factor"),
          count(when(col("n_rows").cast(DoubleType) < lit(0.5) * col("mean_rows"), 1))
            .as("n_small_parts"))
    },

    // Lognormal fit + KS goodness-of-fit per order priority: MLE
    // (μ, σ) of ln(total price) from one grouped DECIMAL moment pass,
    // then the one-sample Kolmogorov-Smirnov distance between the
    // empirical CDF and Φ((ln x − μ)/σ) — parametric distribution
    // fitting with a verdict, the capacity-planning question ("are
    // order sizes lognormal enough to extrapolate tail quantiles
    // from?") that raw percentiles can't answer. ECDF ranks ride the
    // banded groupedGlobalRank (no per-segment global sort); the CDF
    // is the shared portable normal approximation, so D and the
    // α=.05 rejection agree bit-for-bit.
    "orders_lognormal_fit" -> { (s, d) =>
      val base = Tables.orders(s, d).where(col("o_totalprice") > 0.0)
        .select(col("o_orderpriority").as("seg"), col("o_orderkey"),
          CleanFunctions.round6(log(col("o_totalprice"))).as("lx"))
      val mom = base.groupBy("seg").agg(
          count(lit(1)).as("n"),
          exactSum(col("lx")).as("sx"),
          exactSum(CleanFunctions.round6(col("lx") * col("lx"))).as("sxx"))
        .withColumn("mu", CleanFunctions.round6(col("sx") / col("n")))
        .withColumn("sigma", CleanFunctions.round6(CleanFunctions.momentStd(
          col("n").cast(DoubleType), col("sx"), col("sxx"))))
      val ranked = StatsOps.groupedGlobalRank(base, Seq("seg"), col("lx"),
        col("o_orderkey"), "rn")
      val gaps = ranked.join(mom.select("seg", "n", "mu", "sigma"), "seg")
        .withColumn("cdf", CleanFunctions.normalCdf(
          (col("lx") - col("mu")) / nullif(col("sigma"), lit(0.0))))
        .withColumn("dplus", col("rn").cast(DoubleType) / col("n").cast(DoubleType) - col("cdf"))
        .withColumn("dminus", col("cdf") - (col("rn") - 1L).cast(DoubleType) / col("n").cast(DoubleType))
      gaps.groupBy("seg").agg(
          max(col("n")).as("n"), max(col("mu")).as("mu"),
          max(col("sigma")).as("sigma"),
          round4(max(greatest(col("dplus"), col("dminus")))).as("ks_d"))
        .withColumn("reject_95",
          (col("ks_d") > lit(1.358) / sqrt(col("n").cast(DoubleType))).cast(LongType))
        .select("seg", "n", "mu", "sigma", "ks_d", "reject_95")
        .orderBy("seg")
    },

    // Quantile treatment effects: weekend-vs-weekday difference at the
    // 25/50/75/90th percentiles of the value distribution — the
    // DISTRIBUTIONAL readout mean-based tests (uplift, DiD, ratio
    // delta) can't give (a treatment that fattens the upper tail while
    // leaving the median alone shows qte≈0 at p50 and large at p90).
    // Reuses the exact rank-interpolated percentile operator keyed by
    // arm; the pivot+delta runs over O(|ps|) rows.
    "events_qte" -> { (s, d) =>
      val ev = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("arm", (weekday(col("ts")) >= 5).cast(LongType))
      StatsOps.rankPercentilesBanded(ev, Seq("arm"), "value", QtePs)
        .groupBy("p").agg(
          max(when(col("arm") === 1L, col("pct"))).as("q_weekend"),
          max(when(col("arm") === 0L, col("pct"))).as("q_weekday"))
        .select(col("p"), col("q_weekend"), col("q_weekday"),
          round4(col("q_weekend") - col("q_weekday")).as("qte"))
        .orderBy("p")
    },

    // Deterministic per-series mode of a categorical column: max count,
    // ties to the lexicographically smallest value.
    "events_mode_type" -> { (s, d) =>
      val cnt = Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id").orderBy(desc("cnt"), col("event_type"))
      cnt.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("cnt"))
        .orderBy("user_id")
    },

    // CUSUM change score per series: running deviation from the series
    // mean (DECIMAL running sum, SURVEY §4).
    "ts_cusum" -> { (s, d) =>
      StatsOps.cusum(Tables.events(s, d), Seq("user_id"), Seq("ts", "event_id"), "value")
        .select("event_id", "cusum").orderBy("event_id")
    },

    // Page–Hinkley drift test per series — the sequential mean-shift
    // detector ts_cusum's fixed-mean deviation isn't: PH accumulates
    // (x_i − x̄_i − δ) against the RUNNING mean (so slow drifts don't
    // self-cancel the way they do against the full-series mean) and
    // alarms when PH falls λ above its running minimum. Entirely
    // window-expressible: running exact mean (DECIMAL sum / count),
    // 6dp-quantized terms, DECIMAL prefix sum, running min — no
    // recursion, no fold, and order-of-addition can't drift the hash.
    "ts_page_hinkley" -> { (s, d) =>
      StatsOps.pageHinkley(Tables.events(s, d).where(col("value").isNotNull),
          Seq("user_id"), Seq("ts", "event_id"), "value", PhDelta, PhLambda)
        .select("event_id", "ph", "is_drift")
        .orderBy("event_id")
    },

    // Streaming Page–Hinkley — the stateful twin of ts_page_hinkley (PH
    // against the RUNNING mean is inherently sequential, the natural
    // always-on drift monitor): DECIMAL-exact running sums + round6Jvm
    // terms inside a flatMapGroupsWithState fold, O(1) state per key.
    // DRIVER-VERIFIED: the oracle is the batch twin's window pipeline,
    // verbatim.
    "streaming_page_hinkley" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      StreamingAnomaly.replayToSink(s, rows, "graft_streaming_ph", None)(
          ds => StreamingAnomaly.pageHinkley(ds, PhDelta, PhLambda).toDF())
        .select(col("event_id"), round4(col("ph")).as("ph"), col("is_drift"))
        .orderBy("event_id")
    },

    // Shannon entropy of each series' bucketed value distribution —
    // low-entropy series are near-constant (prime drop candidates in a
    // training-data quality pass).
    "events_value_entropy" -> { (s, d) =>
      StatsOps.bucketEntropy(Tables.events(s, d), Seq("user_id"), "value")
        .orderBy("user_id")
    },

    // GROUPING SETS surface through spark.sql — mixed granularities in
    // one pass (Spark expands to a single Expand + hash agg, no re-scan).
    "events_grouping_sets" -> { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("graft_events")
      s.sql(s"""
        |SELECT coalesce(event_type, 'ALL') AS etype,
        |       coalesce(CAST(hr AS STRING), 'ALL') AS hour_label,
        |       count(*) AS cnt,
        |       ${exactSumSql("value")} AS sum_value
        |FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, value FROM graft_events)
        |GROUP BY GROUPING SETS ((event_type), (event_type, hr), ())
        |ORDER BY etype, hour_label""".stripMargin)
    },

    // Argmin-per-group join shape (TPC-H Q2's min-cost-supplier core):
    // cheapest supplier per part by unit price, rank on the ROUNDED price
    // so last-ulp division drift can't reorder, suppkey tiebreak.
    "lineitem_cheapest_supplier" -> { (s, d) =>
      val unit = round4(col("l_extendedprice") / col("l_quantity"))
      val w = Window.partitionBy("l_partkey")
        .orderBy(col("unit_price").asc, col("l_suppkey").asc)
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), unit.as("unit_price"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1).drop("rk")
        .orderBy("l_partkey")
    },

    // RFM segmentation: per-customer recency/frequency/monetary, each
    // scored into exact global quartiles by rank. ONE banded rank pass
    // for all three metrics (StatsOps.groupedGlobalRank over the
    // long-form (metric, value) stack — descending metrics sign-flipped
    // so every rank is ascending with the same custkey tiebreak), then a
    // single conditional-agg pivot joins the ranks back: 1 rank + 1 join
    // where the naive shape ranks the base three separate times.
    "customer_rfm" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val maxd = o.agg(max(to_date(col("o_orderdate"))).as("_rfm_maxd"))
      val n = o.select(col("o_custkey")).distinct().agg(count(lit(1)).as("_rfm_n"))
      val base = o.groupBy("o_custkey")
        .agg(max(to_date(col("o_orderdate"))).as("_rfm_lastd"),
          count(lit(1)).as("frequency"),
          round4(exactSum(col("o_totalprice"))).as("monetary"))
        .crossJoin(broadcast(maxd))
        .withColumn("recency_days",
          datediff(col("_rfm_maxd"), col("_rfm_lastd")).cast(LongType))
        .drop("_rfm_maxd", "_rfm_lastd")
        .crossJoin(broadcast(n))
        .cache()
      // Sign flip keeps ranks identical to ORDER BY v DESC, custkey ASC:
      // the metric values are integers / 4dp decimals, so IEEE negation
      // is exact and cannot reorder ties.
      val long = base.select(col("o_custkey"),
        explode(map(
          lit("r"), col("recency_days").cast(DoubleType),
          lit("f"), -col("frequency").cast(DoubleType),
          lit("m"), -col("monetary").cast(DoubleType))).as(Seq("_metric", "_v")))
      val ranks = StatsOps
        .groupedGlobalRank(long, Seq("_metric"), col("_v"), col("o_custkey"), "_rank")
        .groupBy("o_custkey")
        .agg(max(when(col("_metric") === "r", col("_rank"))).as("_r_rank"),
          max(when(col("_metric") === "f", col("_rank"))).as("_f_rank"),
          max(when(col("_metric") === "m", col("_rank"))).as("_m_rank"))
      def score(rank: String) =
        lit(1L) + floor(lit(4.0) * (col(rank) - 1L).cast(DoubleType) / col("_rfm_n"))
      base.join(ranks, "o_custkey")
        .select(col("o_custkey"), col("recency_days"), col("frequency"),
          col("monetary"), score("_r_rank").as("r_score"),
          score("_f_rank").as("f_score"), score("_m_rank").as("m_score"))
        .withColumn("rfm", col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .orderBy("o_custkey")
    },

    // Pareto / cumulative-revenue share: which customers cover the top
    // 80% of revenue. Exact-DECIMAL banded prefix sum — the oracle's
    // plain global window cumsum matches bit-for-bit because decimal
    // addition is order-independent.
    "orders_pareto" -> { (s, d) =>
      val rev = Tables.orders(s, d).groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).as("rev"))
      StatsOps.rankedCumShare(rev, col("o_custkey"), col("rev"))
        .select(col("o_custkey"), col("rev").cast(DoubleType).as("revenue"),
          col("cum_share"),
          (col("cum_share") <= 0.8).cast(LongType).as("in_top80"))
        .orderBy("o_custkey")
    },

    // ABC × XYZ inventory classification matrix: parts banded by
    // cumulative revenue share (A ≤ 80%, B ≤ 95%, C rest — the Pareto
    // axis) crossed with monthly-demand variability (CV < 0.5 = X
    // steady, < 1.0 = Y, else Z erratic) — the planning matrix that
    // decides which SKUs get safety stock vs make-to-order. Revenue
    // ranks ride the banded rankedCumShare (no global sort); CV comes
    // from one grouped DECIMAL moment pass over the O(parts × months)
    // aggregate; the 3×3 cell rollup re-aggregates O(parts) rows.
    "part_abc_xyz" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      // MEASURED NEGATIVE (r17, kept so it isn't re-tried): fusing rev +
      // monthly into one (part, month) partial with a localCheckpoint
      // made this entry 2.9 -> 4.4 s — the partial has parts x months
      // rows (bigger than either original aggregate's output), so the
      // materialization barrier costs more than the saved lineitem scan.
      val rev = li.groupBy("l_partkey")
        .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("rev"))
      val abc = StatsOps.rankedCumShare(rev, col("l_partkey"), col("rev"))
        .withColumn("abc", when(col("cum_share") <= 0.8, "A")
          .when(col("cum_share") <= 0.95, "B").otherwise("C"))
      val monthly = li.groupBy(col("l_partkey"),
          date_trunc("month", col("l_shipdate")).as("m"))
        .agg(exactSum(col("l_quantity")).as("q"))
      val cv = monthly.groupBy("l_partkey").agg(
          count(lit(1)).cast(DoubleType).as("nm"),
          exactSum(round4(col("q"))).as("sq"),
          exactSum(round4(col("q") * col("q"))).as("sqq"))
        .withColumn("cv", round4(
          CleanFunctions.momentStd(col("nm"), col("sq"), col("sqq")) /
            nullif(col("sq") / col("nm"), lit(0.0))))
        .withColumn("xyz", when(col("cv") < 0.5, "X")
          .when(col("cv") < 1.0, "Y").otherwise("Z"))
      val tot = rev.agg(sum(col("rev")).as("tot"))
      abc.join(cv.select("l_partkey", "xyz"), "l_partkey")
        .groupBy("abc", "xyz").agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).as("cell_rev"))
        .crossJoin(broadcast(tot))
        .select(col("abc"), col("xyz"), col("n_parts"),
          CleanFunctions.round6(col("cell_rev").cast(DoubleType) /
            col("tot").cast(DoubleType)).as("revenue_share"))
        .orderBy("abc", "xyz")
    },

    // Benford first-significant-digit chi-square per event_type — the
    // fraud/data-fabrication screen in the DQ toolbox. The digit comes
    // from INTEGER cents (round(value*100) → BIGINT → first char), never
    // log10 of the value, so digit boundaries can't flip in the last
    // ulp; expected shares are literal doubles baked into both engines;
    // zero-observation digits enter the statistic via a digit spine.
    "events_benford" -> { (s, d) =>
      // cents >= 1, not value > 0: a sub-cent value rounds to 0 cents and
      // has no first digit at 2dp resolution — it would otherwise count
      // in n but in no spine cell, silently inflating chi2
      // (code-review finding).
      val e = Tables.events(s, d).where(round(col("value") * 100.0) >= 1.0)
        .withColumn("digit",
          substring(round(col("value") * 100.0).cast(LongType).cast("string"), 1, 1)
            .cast(LongType))
      val obs = e.groupBy("event_type", "digit").agg(count(lit(1)).as("obs"))
      val tot = e.groupBy("event_type").agg(count(lit(1)).as("n"))
      val spine = tot.select(col("event_type"), col("n"),
        explode(array((1 to 9).map(i => lit(i.toLong)): _*)).as("digit"))
      val exp9 = element_at(array(BenfordExp.map(lit): _*), col("digit").cast("int"))
      val term = {
        val o = coalesce(col("obs"), lit(0L)).cast(DoubleType)
        val ne = col("n").cast(DoubleType) * col("e")
        CleanFunctions.round6((o - ne) * (o - ne) / ne)
      }
      spine.join(obs, Seq("event_type", "digit"), "left")
        .withColumn("e", exp9)
        .withColumn("term", term.cast(DecimalType(18, 6)))
        .groupBy("event_type")
        .agg(max(col("n")).as("n"),
          round4(sum(col("term")).cast(DoubleType)).as("chi2"))
        .orderBy("event_type")
    },

    // Chi-square test of independence between event_type and time-of-day
    // (four 6h dayparts) — "does behavior depend on daypart?". The
    // contingency table is O(R×C) after one grouped count; expected
    // counts rt*ct/n and every term derive from INTEGERS, so both
    // engines compute identical doubles; missing cells enter via the
    // (types × dayparts) spine cross join (both sides tiny aggregates).
    "events_chi2_independence" -> { (s, d) =>
      val e = Tables.events(s, d)
        .withColumn("part", expr("CAST(hour(ts) AS BIGINT) DIV 6"))
      val obs = e.groupBy("event_type", "part").agg(count(lit(1)).as("obs"))
      val rt = e.groupBy("event_type").agg(count(lit(1)).as("rt"))
      val ct = e.groupBy("part").agg(count(lit(1)).as("ct"))
      val n = e.agg(count(lit(1)).as("n"))
      val exp9 = col("rt").cast(DoubleType) * col("ct").cast(DoubleType) /
        col("n").cast(DoubleType)
      val o = coalesce(col("obs"), lit(0L)).cast(DoubleType)
      rt.crossJoin(broadcast(ct)).crossJoin(broadcast(n))
        .join(obs, Seq("event_type", "part"), "left")
        .withColumn("e", exp9)
        .withColumn("term",
          CleanFunctions.round6((o - col("e")) * (o - col("e")) / col("e"))
            .cast(DecimalType(18, 6)))
        .agg(max(col("n")).as("n"),
          ((countDistinct(col("event_type")) - 1) *
            (countDistinct(col("part")) - 1)).as("dof"),
          round4(sum(col("term")).cast(DoubleType)).as("chi2"))
    },

    // Mann-Whitney U / rank-sum test between click and view value
    // distributions — the nonparametric A/B sibling of
    // events_two_sample_z (no normality assumption). Global ranks come
    // from StatsOps.globalRank (banded two-level decomposition — no
    // single-partition window at any scale); tie handling is the
    // standard average-rank + tie-corrected variance, all decisions
    // INTEGER-derived so both engines agree exactly.
    "events_mannwhitney" -> { (s, d) =>
      val e = Tables.events(s, d)
        .where(col("value").isNotNull && col("event_type").isin("click", "view"))
        .select(col("event_id"), col("event_type"), col("value"))
      val ranked = StatsOps.globalRank(e, col("value"), col("event_id"),
        asc = true, "rk")
      val ties = ranked.groupBy("value").agg(
        ((min(col("rk")) + max(col("rk"))).cast(DoubleType) / 2.0).as("ar"),
        count(lit(1)).as("t"))
      val tsum = ties.agg(
        sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      val agg = ranked.join(ties.select("value", "ar"), "value")
        .agg(count(when(col("event_type") === "click", 1)).cast(DoubleType).as("n1"),
          count(when(col("event_type") === "view", 1)).cast(DoubleType).as("n2"),
          CleanFunctions.exactSum(when(col("event_type") === "click", col("ar"))).as("r1"))
        .crossJoin(broadcast(tsum))
      val n  = agg("n1") + agg("n2")
      val u1 = col("r1") - col("n1") * (col("n1") + 1.0) / 2.0
      val mu = col("n1") * col("n2") / 2.0
      val sig2 = (col("n1") * col("n2") / 12.0) *
        ((n + 1.0) - col("tsum").cast(DoubleType) / (n * (n - 1.0)))
      agg.select(col("n1").cast(LongType).as("n1"), col("n2").cast(LongType).as("n2"),
        round4(u1).as("u1"),
        // nullif guard: a fully-tied sample cancels sig2 to exactly 0 and
        // an unguarded divide would emit NaN instead of the codebase's
        // null convention (code-review finding).
        round4(CleanFunctions.safeDiv(u1 - mu, sqrt(sig2))).as("z"))
    },

    // Wilcoxon SIGNED-RANK test — the PAIRED companion of the unpaired
    // Mann-Whitney above: each user is their own control (weekend mean
    // vs weekday mean of the same user), so between-user variance drops
    // out of the comparison entirely. Differences are 6dp-pinned before
    // the zero-exclusion and tie grouping (boundary-stable on both
    // engines), |d| ranked via the banded globalRank (no single-task
    // corpus sort), midranks from the (min+max)/2 tie trick, normal
    // approximation with the exact tie-corrected variance. One grouped
    // pass per user + one rank pass over O(#users) rows.
    "events_wilcoxon" -> { (s, d) =>
      val byUser = Tables.events(s, d).where(col("value").isNotNull)
        .groupBy("user_id").agg(
          exactSum(when(weekday(col("ts")) < 5, col("value"))).as("sx"),
          count(when(weekday(col("ts")) < 5, col("value"))).as("nx"),
          exactSum(when(weekday(col("ts")) >= 5, col("value"))).as("sy"),
          count(when(weekday(col("ts")) >= 5, col("value"))).as("ny"))
        .where(col("nx") > 0 && col("ny") > 0)
        .select(col("user_id"), round6(
          col("sy") / col("ny").cast(DoubleType) -
            col("sx") / col("nx").cast(DoubleType)).as("dd"))
        .where(col("dd") =!= 0.0)
        .withColumn("absd", abs(col("dd")))
      val ranked = StatsOps.globalRank(byUser, col("absd"), col("user_id"),
        asc = true, "rk")
      val ties = ranked.groupBy("absd").agg(
        ((min(col("rk")) + max(col("rk"))).cast(DoubleType) / 2.0).as("ar"),
        count(lit(1)).as("t"))
      val tsum = ties.agg(
        sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      val agg = ranked.join(ties.select("absd", "ar"), "absd")
        .agg(count(lit(1)).as("n"),
          CleanFunctions.exactSum(when(col("dd") > 0.0, col("ar"))).as("wplus"))
        .crossJoin(broadcast(tsum))
      val nD = col("n").cast(DoubleType)
      val mu = nD * (nD + 1.0) / lit(4.0)
      val sig2 = nD * (nD + 1.0) * (lit(2.0) * nD + 1.0) / lit(24.0) -
        col("tsum").cast(DoubleType) / lit(48.0)
      agg.select(col("n").as("n_pairs"),
        round4(col("wplus")).as("w_plus"),
        round4(CleanFunctions.safeDiv(col("wplus") - mu, sqrt(sig2))).as("z"))
    },

    // McNemar test — the paired BINARY companion (Wilcoxon pairs
    // continuous outcomes; this pairs yes/no): did each user purchase
    // on weekdays vs on weekends, with only the DISCORDANT users (b =
    // weekday-only, c = weekend-only) carrying information. χ² =
    // (b−c)²/(b+c), all exact integers until two IEEE ops; the
    // concordant counts are reported because their size is the context
    // for the test's power. One grouped boolean pass per user + one
    // 4-cell fold.
    "events_mcnemar" -> { (s, d) =>
      val byUser = Tables.events(s, d)
        .groupBy("user_id").agg(
          max(when(col("event_type") === "purchase" &&
            weekday(col("ts")) < 5, 1L).otherwise(0L)).as("wd"),
          max(when(col("event_type") === "purchase" &&
            weekday(col("ts")) >= 5, 1L).otherwise(0L)).as("we"))
      byUser.agg(
          count(lit(1)).as("n_users"),
          count(when(col("wd") === 1L && col("we") === 1L, 1)).as("n_both"),
          count(when(col("wd") === 1L && col("we") === 0L, 1)).as("b"),
          count(when(col("wd") === 0L && col("we") === 1L, 1)).as("c"))
        .select(col("n_users"), col("n_both"), col("b"), col("c"),
          round4(CleanFunctions.safeDiv(
            ((col("b") - col("c")) * (col("b") - col("c"))).cast(DoubleType),
            (col("b") + col("c")).cast(DoubleType))).as("chi2"))
    },

    // Per-series OLS trend of value on the hour index since series start
    // — slope/intercept/R² from one exact-moment grouped pass
    // (StatsOps.olsTrend): the linear-trend probe of the reference's EDA
    // notebooks, as a map-side-partial aggregate.
    "ts_ols_trend" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("mn", min(col("tsu")).over(Window.partitionBy("user_id")))
        .withColumn("x", expr("(tsu - mn) DIV 3600000000").cast(DoubleType))
      StatsOps.olsTrend(e, Seq("user_id"), col("x"), col("value"))
        .orderBy("user_id")
    },

    // Trailing-24 rolling skewness + excess kurtosis per series — the
    // shape-change monitor (StatsOps.rollingSkewKurt): four DECIMAL
    // power sums on one bounded ROWS window.
    "ts_rolling_skew" -> { (s, d) =>
      StatsOps.rollingSkewKurt(
        Tables.events(s, d).withColumn("tsu", CleanFunctions.epochUs(col("ts"))),
        Seq("user_id"), Seq("tsu", "event_id"), "value", 24)
        .select("event_id", "n_frame", "roll_skew", "roll_kurt")
        .orderBy("event_id")
    },

    // Rolling lag-1 autocorrelation over the trailing 24 samples — the
    // local-persistence / regime indicator (white noise ~0, trending ~1,
    // mean-reverting < 0). Six DECIMAL window sums on one bounded ROWS
    // frame + the shared momentCorr closed form; constant frames null
    // out via the clamped variance.
    "ts_rolling_corr" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w0 = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val wf = w0.rowsBetween(-23, Window.currentRow)
      def decSum(c: org.apache.spark.sql.Column) =
        sum(c.cast(DecimalType(18, 6))).over(wf).cast(DoubleType)
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("y", lag(col("value"), 1).over(w0))
        .where(col("y").isNotNull)
      e.withColumn("n", count(lit(1)).over(wf).cast(DoubleType))
        .withColumn("sx", decSum(col("value")))
        .withColumn("sy", decSum(col("y")))
        .withColumn("sxy", decSum(round4(col("value") * col("y"))))
        .withColumn("sxx", decSum(round4(col("value") * col("value"))))
        .withColumn("syy", decSum(round4(col("y") * col("y"))))
        .select(col("event_id"),
          // n=1 frames are 0/0 on independently-rounded moments (junk
          // like sqrt(2)); near-constant frames can breach |1| by a
          // rounding hair. Null the former, clamp the latter — the
          // moments are engine-identical, so both decisions agree.
          round4(when(col("n") > 1.0,
            least(greatest(CleanFunctions.momentCorr(col("n"), col("sx"), col("sy"),
              col("sxy"), col("sxx"), col("syy")), lit(-1.0)), lit(1.0))))
            .as("roll_corr"))
        .orderBy("event_id")
    },

    // 10%-trimmed mean per series — the robust location estimate (drop
    // the k = floor(n/10) smallest and largest samples by rank, average
    // the rest). Rank/keep decisions are pure INTEGER arithmetic so both
    // engines trim the identical multiset; the mean is DECIMAL-exact.
    "ts_trimmed_mean" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wSort = Window.partitionBy("user_id").orderBy("value", "event_id")
      val wAll  = Window.partitionBy("user_id")
      Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("rn", row_number().over(wSort).cast(LongType))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("k", expr("n DIV 10"))
        .where(col("rn") > col("k") && col("rn") <= col("n") - col("k"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_used"),
          round4(CleanFunctions.exactMean(col("value"))).as("trimmed_mean"))
        .orderBy("user_id")
    },

    // Bandt-Pompe permutation entropy over ordinal triples: the ranks of
    // (x₋₂, x₋₁, x) encoded by three integer comparisons → entropy of
    // the 6-pattern distribution, normalized by ln 6 into [0,1] — the
    // series-complexity score (periodic ≈ 0, white noise ≈ 1) that is
    // immune to monotone transforms of the values. Pattern codes are
    // pure integer decisions; entropy terms 6dp-rounded DECIMAL sums
    // (the bucketEntropy contract); ln 6 is one literal double.
    "ts_perm_entropy" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w0 = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("a", lag(col("value"), 2).over(w0))
        .withColumn("b", lag(col("value"), 1).over(w0))
        .where(col("a").isNotNull && col("b").isNotNull)
        .withColumn("code",
          (col("a") < col("b")).cast(LongType) * 4 +
            (col("b") < col("value")).cast(LongType) * 2 +
            (col("a") < col("value")).cast(LongType))
      val cnt = e.groupBy("user_id", "code").agg(count(lit(1)).as("cnt"))
      val p = col("cnt") / sum(col("cnt")).over(Window.partitionBy("user_id"))
      cnt
        .withColumn("term", CleanFunctions.round6(p * log(p)).cast(DecimalType(18, 6)))
        .groupBy("user_id")
        .agg(sum(col("cnt")).as("n_triples"),
          round4((-sum(col("term"))).cast(DoubleType) / lit(math.log(6.0)))
            .as("perm_entropy"))
        .orderBy("user_id")
    },

    // Lo-MacKinlay variance-ratio test per series: VR(4) =
    // Var(x_t − x_{t−4}) / (4·Var(x_t − x_{t−1})) — ≈1 random walk,
    // <1 mean-reverting, >1 trending. Two lag diffs (exact 2dp), one
    // grouped DECIMAL moment pass, clamped momentVar.
    "ts_variance_ratio" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w0 = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("d1", col("value") - lag(col("value"), 1).over(w0))
        .withColumn("dk", col("value") - lag(col("value"), 4).over(w0))
      val agg = e.groupBy("user_id").agg(
        count(col("d1")).cast(DoubleType).as("n1"),
        exactSum(col("d1")).as("s1"),
        exactSum(round4(col("d1") * col("d1"))).as("s11"),
        count(col("dk")).cast(DoubleType).as("nk"),
        exactSum(col("dk")).as("sk"),
        exactSum(round4(col("dk") * col("dk"))).as("skk"))
      agg.select(col("user_id"), col("nk").cast(LongType).as("n_diffs"),
          round4(CleanFunctions.safeDiv(
            CleanFunctions.momentVar(col("nk"), col("sk"), col("skk")),
            lit(4.0) * CleanFunctions.momentVar(col("n1"), col("s1"), col("s11"))))
            .as("vr"))
        .orderBy("user_id")
    },

    // Split-conformal prediction interval for the seasonal-naive
    // forecaster: the p90 of |x_t − x_{t−24}| per series IS the
    // distribution-free ±width that covers ~90% of future errors
    // (calibration = the series' own history; interpolated quantile as
    // the split-conformal approximation). Forecast uncertainty without
    // any model assumption — one lag window + the rank-interpolation
    // percentile.
    "ts_conformal_width" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val resid = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("pred", lag(col("value"), 24).over(w))
        .where(col("pred").isNotNull)
        .withColumn("ar", abs(col("value") - col("pred")))
      StatsOps.rankPercentiles(resid, Seq("user_id"), "ar", Seq(0.9))
        .select(col("user_id"), col("pct").as("q90_width"))
        .orderBy("user_id")
    },

    // Join-key skew profile: the distribution of per-key row counts
    // (p50/p90/p99/max + the hottest key's share) — what you run BEFORE
    // choosing between plain shuffle, AQE skew-join and saltedJoin.
    // Order statistics via the banded globalRank; percentile targets are
    // INTEGER ceiling ranks, so both engines pick identical rows.
    "events_skew_profile" -> { (s, d) =>
      val cnt = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
      val ranked = StatsOps.globalRank(cnt, col("cnt"), col("user_id"),
        asc = true, "rk")
      val nTot = cnt.agg(count(lit(1)).as("nk"), sum(col("cnt")).as("total"))
      ranked.crossJoin(broadcast(nTot))
        .agg(max(col("nk")).as("n_keys"),
          max(col("total")).as("total_rows"),
          max(col("cnt")).as("max_cnt"),
          min(when(col("rk") === expr("(nk + 1) DIV 2"), col("cnt"))).as("p50_cnt"),
          min(when(col("rk") === expr("(9 * nk + 9) DIV 10"), col("cnt"))).as("p90_cnt"),
          min(when(col("rk") === expr("(99 * nk + 99) DIV 100"), col("cnt"))).as("p99_cnt"))
        .withColumn("top_share",
          round4(col("max_cnt").cast(DoubleType) / col("total_rows").cast(DoubleType)))
    },

    // WEIGHTED median unit price per return flag, weighted by quantity —
    // the order statistic where each row counts `w` times (exact
    // percentile machinery can't express it). Lower weighted median: the
    // first value whose DECIMAL cumulative weight crosses half the total
    // — the crossing test is 2·cumw >= total on EXACT decimals, so both
    // engines pick the identical row; value pre-rounded (division noise
    // would otherwise reorder ties).
    "lineitem_weighted_median" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dec = DecimalType(18, 6)
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          round4(col("l_extendedprice") / col("l_quantity")).as("unit_price"),
          col("l_quantity").cast(dec).as("w"),
          col("l_orderkey"), col("l_linenumber"))
      val wCum = Window.partitionBy("l_returnflag")
        .orderBy(col("unit_price"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("l_returnflag")
      li.withColumn("cumw", sum(col("w")).over(wCum))
        .withColumn("tot", sum(col("w")).over(wAll))
        .where(col("cumw") * 2 >= col("tot"))
        .groupBy("l_returnflag")
        .agg(min(col("unit_price")).as("weighted_median"))
        .orderBy("l_returnflag")
    },

    // Gini coefficient of customer revenue concentration — the scalar
    // summary of orders_pareto's curve: G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n
    // on ascending-revenue ranks. Ranks from the banded globalRank (no
    // single-partition window); Σ(rank·x) in exact DECIMAL.
    "orders_gini" -> { (s, d) =>
      val rev = Tables.orders(s, d).groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).as("rev"))
      val ranked = StatsOps.globalRank(rev, col("rev"), col("o_custkey"),
        asc = true, "rk")
      val agg = ranked.agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("rev")).as("tot"),
        sum(col("rk") * col("rev")).as("rs"))
      agg.select(col("n").cast(LongType).as("n_customers"),
        round4((lit(2.0) * col("rs").cast(DoubleType)) /
          (col("n") * col("tot").cast(DoubleType)) -
          (col("n") + 1.0) / col("n")).as("gini"))
    },

    // Theil-T inequality index of order revenue, DECOMPOSED by nation —
    // Gini's additive sibling: T = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ)
    // splits total concentration into WITHIN-nation and BETWEEN-nation
    // parts, which Gini cannot do (the decomposition is why economists
    // reach for Theil). One row per nation: order count, revenue share
    // s_g = n_g·μ_g/(n·μ), within-group T_g, and the between-group
    // term. Group/global means 6dp-rounded so every downstream ratio
    // and ln is engine-identical; per-row entropy terms 6dp-quantized
    // then DECIMAL-summed (ONE ln per row, codegen'd).
    "orders_theil" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.table(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_totalprice").as("x"))
      val glob = o.agg(count(lit(1)).cast(DoubleType).as("n"),
        round6(CleanFunctions.exactMean(col("x"))).as("mu"))
      val grp = o.groupBy("n_name").agg(
        count(lit(1)).as("n_g"),
        round6(CleanFunctions.exactMean(col("x"))).as("mu_g"))
      val within = o.join(broadcast(grp), "n_name")
        .withColumn("term", round6((col("x") / col("mu_g")) *
          log(col("x") / col("mu_g"))))
        .groupBy("n_name")
        .agg(round4(exactSum(col("term")) / count(lit(1))).as("theil_within"))
      grp.join(within, "n_name").crossJoin(broadcast(glob))
        .withColumn("share",
          round6(col("n_g").cast(DoubleType) * col("mu_g") / (col("n") * col("mu"))))
        .select(col("n_name"), col("n_g").as("n_orders"),
          round4(col("mu_g")).as("mean_price"), col("share"), col("theil_within"),
          round4(col("share") * log(col("mu_g") / col("mu"))).as("between_term"))
        .orderBy("n_name")
    },

    // Durbin-Watson statistic on the OLS-trend residuals: DW =
    // Σ(e_t − e_{t−1})² / Σe_t² ∈ [0,4] — ≈2 means the trend fit left
    // white noise, ≪2 means serially-correlated residuals (the fit
    // missed structure, e.g. seasonality). The model-diagnostics
    // companion of ts_ols_trend: same exact moments, residuals rounded
    // 4dp before the DECIMAL sums.
    "ts_durbin_watson" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e0 = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("mn", min(col("tsu")).over(Window.partitionBy("user_id")))
        .withColumn("x", expr("(tsu - mn) DIV 3600000000").cast(DoubleType))
      val m = e0.groupBy("user_id").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        exactSum(col("x")).as("sx"), exactSum(col("value")).as("sy"),
        exactSum(col("x") * col("value")).as("sxy"),
        exactSum(col("x") * col("x")).as("sxx"))
      val slope = CleanFunctions.safeDiv(
        col("n") * col("sxy") - col("sx") * col("sy"),
        col("n") * col("sxx") - col("sx") * col("sx"))
      val joined = e0.join(m, "user_id")
        .withColumn("slope", slope)
        .withColumn("b", (col("sy") - col("slope") * col("sx")) / col("n"))
        .withColumn("res",
          round4(col("value") - (col("b") + col("slope") * col("x"))))
        .withColumn("dd", col("res") - lag(col("res"), 1).over(wOrd))
      joined.groupBy("user_id").agg(
          count(col("res")).as("n_obs"),
          round4(CleanFunctions.safeDiv(
            exactSum(round4(col("dd") * col("dd"))),
            exactSum(round4(col("res") * col("res"))))).as("dw"))
        .orderBy("user_id")
    },

    // Theil-Sen robust trend per series over daily-mean buckets: median
    // pairwise slope (StatsOps.theilSen) — one outlier day cannot drag
    // it the way it drags ts_ols_trend. Bucketing first is the scale
    // contract (pairs are O(days²)/series, not O(rows²)).
    "ts_theilsen" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("day", expr("tsu DIV 86400000000"))
      val daily = e.groupBy("user_id", "day")
        .agg(CleanFunctions.exactMean(col("value")).as("m"))
      StatsOps.theilSen(daily, Seq("user_id"), "day", "m")
        .orderBy("user_id")
    },

    // Bollinger bands over the trailing 24 samples: mid = frame mean,
    // bands = mid ± 2·population-σ, breach flag (+1 above / -1 below).
    // Two DECIMAL power sums on one bounded ROWS window (SURVEY §4);
    // band edges rounded BEFORE the breach comparison so both engines
    // compare the identical doubles.
    "ts_bollinger" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w0 = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val wf = w0.rowsBetween(-23, Window.currentRow)
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
      e.withColumn("n", count(lit(1)).over(wf).cast(DoubleType))
        .withColumn("s1", sum(col("value").cast(DecimalType(18, 6))).over(wf).cast(DoubleType))
        .withColumn("s2", sum(round4(col("value") * col("value")).cast(DecimalType(38, 6))).over(wf).cast(DoubleType))
        .withColumn("mean", col("s1") / col("n"))
        .withColumn("sd", sqrt(greatest(col("s2") / col("n") - col("mean") * col("mean"), lit(0.0))))
        .withColumn("bb_upper", round4(col("mean") + lit(2.0) * col("sd")))
        .withColumn("bb_lower", round4(col("mean") - lit(2.0) * col("sd")))
        .select(col("event_id"), round4(col("mean")).as("bb_mid"),
          col("bb_upper"), col("bb_lower"),
          when(col("value") > col("bb_upper"), lit(1L))
            .when(col("value") < col("bb_lower"), lit(-1L))
            .otherwise(lit(0L)).as("breach"))
        .orderBy("event_id")
    },

    // SMA-RSI over the trailing 14 deltas: gains/losses split from the
    // lag-1 difference, RSI = 100·Σgain / (Σgain + Σloss) — the closed
    // form of 100 - 100/(1+RS) for simple-average RS. Deltas rounded to
    // 4dp before the DECIMAL frame sums; flat frames (both sums 0) null.
    "ts_rsi" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w0 = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val wf = w0.rowsBetween(-13, Window.currentRow)
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("diff", col("value") - lag(col("value"), 1).over(w0))
        .where(col("diff").isNotNull)
        .withColumn("g", round4(greatest(col("diff"), lit(0.0))))
        .withColumn("l", round4(greatest(-col("diff"), lit(0.0))))
      e.withColumn("n_diff", count(lit(1)).over(wf))
        .withColumn("sg", sum(col("g").cast(DecimalType(18, 6))).over(wf).cast(DoubleType))
        .withColumn("sl", sum(col("l").cast(DecimalType(18, 6))).over(wf).cast(DoubleType))
        .select(col("event_id"), col("n_diff"),
          round4(lit(100.0) * col("sg") / nullif(col("sg") + col("sl"), lit(0.0))).as("rsi"))
        .orderBy("event_id")
    },

    // Spearman rank correlation between each sample and its lag-1
    // neighbour — the robust (rank-based) twin of ts_acf's lag-1
    // Pearson. Tie-averaged fractional ranks kept INTEGER by doubling
    // (2·minrank + ties - 1), so all five moments are exact BIGINT sums
    // and the closed-form corr is IEEE-identical on both engines.
    "ts_spearman" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w0 = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("y", lag(col("value"), 1).over(w0))
        .where(col("y").isNotNull)
      val ranked = e
        .withColumn("fx", lit(2L) * rank().over(Window.partitionBy("user_id").orderBy("value")).cast(LongType)
          + count(lit(1)).over(Window.partitionBy("user_id", "value")).cast(LongType) - lit(1L))
        .withColumn("fy", lit(2L) * rank().over(Window.partitionBy("user_id").orderBy("y")).cast(LongType)
          + count(lit(1)).over(Window.partitionBy("user_id", "y")).cast(LongType) - lit(1L))
      ranked.groupBy("user_id").agg(
          count(lit(1)).as("n_pairs"),
          sum(col("fx")).as("sx"), sum(col("fy")).as("sy"),
          sum(col("fx") * col("fy")).as("sxy"),
          sum(col("fx") * col("fx")).as("sxx"),
          sum(col("fy") * col("fy")).as("syy"))
        .select(col("user_id"), col("n_pairs"),
          round4(when(col("n_pairs") > 1,
            least(greatest(CleanFunctions.momentCorr(
              col("n_pairs").cast(DoubleType), col("sx").cast(DoubleType),
              col("sy").cast(DoubleType), col("sxy").cast(DoubleType),
              col("sxx").cast(DoubleType), col("syy").cast(DoubleType)),
              lit(-1.0)), lit(1.0)))).as("spearman_lag1"))
        .orderBy("user_id")
    },

    // Mann-Kendall trend test per series over daily-mean buckets — the
    // nonparametric did-it-trend gate (Theil-Sen's significance twin):
    // S = Σ_{i<j} sign(m_j − m_i), tie-corrected variance, continuity-
    // corrected z. Daily bucketing first is the scale contract (pairs
    // O(days²)/series, never O(rows²)); daily means are DECIMAL-exact so
    // every sign comparison and tie group is engine-identical, S and the
    // tie correction are pure BIGINTs, and the only float ops are one
    // division and one sqrt.
    "ts_mann_kendall" -> { (s, d) =>
      val daily = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("day", expr("tsu DIV 86400000000"))
        .groupBy("user_id", "day")
        .agg(CleanFunctions.exactMean(col("value")).as("m"))
      val a = daily.select(col("user_id"), col("day").as("di"), col("m").as("mi"))
      val b = daily.select(col("user_id"), col("day").as("dj"), col("m").as("mj"))
      val sStat = a.join(b, "user_id").where(col("di") < col("dj"))
        .select(col("user_id"),
          when(col("mj") > col("mi"), lit(1L)).when(col("mj") < col("mi"), lit(-1L))
            .otherwise(lit(0L)).as("sg"))
        .groupBy("user_id").agg(sum(col("sg")).as("s_stat"))
      val nD = daily.groupBy("user_id").agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy("user_id", "m").agg(count(lit(1)).as("t"))
        .groupBy("user_id")
        .agg(sum(col("t") * (col("t") - lit(1L)) * (lit(2L) * col("t") + lit(5L))).as("tcorr"))
      sStat.join(nD, "user_id").join(ties, "user_id")
        .withColumn("var_s",
          (col("n_days") * (col("n_days") - lit(1L)) * (lit(2L) * col("n_days") + lit(5L))
            - col("tcorr")).cast(DoubleType) / 18.0)
        .select(col("user_id"), col("n_days"), col("s_stat"),
          round4(col("var_s")).as("var_s"),
          round4(when(col("s_stat") > 0L,
              (col("s_stat") - lit(1L)).cast(DoubleType) / sqrt(col("var_s")))
            .when(col("s_stat") < 0L,
              (col("s_stat") + lit(1L)).cast(DoubleType) / sqrt(col("var_s")))
            .otherwise(lit(0.0))).as("mk_z"))
        .orderBy("user_id")
    },

    // Pettitt nonparametric changepoint test per series (Pettitt 1979)
    // — the RANK-based member of the changepoint family: the mean-shift
    // score / segmentation / ICSS entries are moment-based and one
    // spike drags them arbitrarily, while Pettitt's U_k = Σ_{i≤k}
    // Σ_{j>k} sign(m_i − m_j) moves exactly one unit per pair. Built on
    // the Mann-Kendall pairs machinery (its single-changepoint
    // LOCALIZER: MK answers "is there a monotone trend", Pettitt
    // answers "WHERE does the level shift"): per-day V_t = Σ_{j≠t}
    // sign(m_t − m_j) from the O(days²)-per-series equi-join (bounded
    // by the time span, never O(rows²)), U_k as the integer cumulative
    // sum of V in day order, K = max|U_k| over k = 1..T−1 with the
    // earliest-day tie-break. Significance WITHOUT engine libm exp():
    // p ≈ 2e^{−q}, q = 6K²/(T³+T²) — all integer-derived, ONE double
    // division, compared against the baked ln(2/0.05) literal (q >
    // ln(40) ⟺ p < 0.05), so no transcendental enters the hash.
    "ts_pettitt" -> { (s, d) =>
      val daily = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("day", expr("tsu DIV 86400000000"))
        .groupBy("user_id", "day")
        .agg(CleanFunctions.exactMean(col("value")).as("m"))
      val a = daily.select(col("user_id"), col("day").as("di"), col("m").as("mi"))
      val b = daily.select(col("user_id"), col("day").as("dj"), col("m").as("mj"))
      val v = a.join(b, "user_id").where(col("di") =!= col("dj"))
        .select(col("user_id"), col("di"),
          when(col("mi") > col("mj"), lit(1L)).when(col("mi") < col("mj"), lit(-1L))
            .otherwise(lit(0L)).as("sg"))
        .groupBy("user_id", "di").agg(sum(col("sg")).as("v_t"))
      val wOrd = Window.partitionBy("user_id").orderBy("di")
      val u = v
        .withColumn("u_k", sum(col("v_t")).over(wOrd))
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("t_days", count(lit(1)).over(Window.partitionBy("user_id")))
        .where(col("rn") < col("t_days"))
      val wPick = Window.partitionBy("user_id")
        .orderBy(abs(col("u_k")).desc, col("di").asc)
      u.withColumn("pk", row_number().over(wPick)).where(col("pk") === 1)
        .withColumn("pettitt_q", round6(
          (lit(6.0) * (abs(col("u_k")) * abs(col("u_k"))).cast(DoubleType)) /
            (col("t_days") * col("t_days") * col("t_days")
              + col("t_days") * col("t_days")).cast(DoubleType)))
        .select(col("user_id"), col("t_days").as("n_days"),
          abs(col("u_k")).as("k_stat"), col("di").as("cp_day"),
          col("pettitt_q"),
          (col("pettitt_q") > lit(PettittSigQ)).cast(LongType).as("significant"))
        .orderBy("user_id")
    },

    // CUPED variance reduction (Deng et al., WSDM 2013): each user's
    // pre-period mean is the covariate, θ = cov(x,y)/var(x) from ONE
    // exact-moment pass over the per-user aggregates, adjusted post
    // metric y − θ(x − x̄) — THE modern A/B precision primitive. The
    // heavy stages are two grouped means over events; θ is a 1-row
    // broadcast; per-user means rounded 4dp before cross-moments so
    // every downstream IEEE op is engine-identical.
    "events_cuped" -> { (s, d) =>
      val jan15 = java.time.LocalDate.of(2024, 1, 15).toEpochDay
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("pre", expr("tsu DIV 86400000000") <= lit(jan15))
      val x = e.where(col("pre")).groupBy("user_id")
        .agg(round4(CleanFunctions.exactMean(col("value"))).as("x_pre"))
      val y = e.where(!col("pre")).groupBy("user_id")
        .agg(round4(CleanFunctions.exactMean(col("value"))).as("y_post"))
      val xy = x.join(y, "user_id")
      val mom = xy.agg(
        count(lit(1)).cast(DoubleType).as("n"),
        exactSum(col("x_pre")).as("sx"), exactSum(col("y_post")).as("sy"),
        exactSum(round4(col("x_pre") * col("y_post"))).as("sxy"),
        exactSum(round4(col("x_pre") * col("x_pre"))).as("sxx"))
      xy.crossJoin(broadcast(mom))
        .withColumn("theta", CleanFunctions.safeDiv(
          col("n") * col("sxy") - col("sx") * col("sy"),
          col("n") * col("sxx") - col("sx") * col("sx")))
        .select(col("user_id"), col("x_pre"), col("y_post"),
          round4(col("y_post") - col("theta") * (col("x_pre") - col("sx") / col("n")))
            .as("y_cuped"))
        .orderBy("user_id")
    },

    // Cohort LTV curve (revenue-weighted sibling of events_retention):
    // average cumulative spend per customer by cohort month × age —
    // cohort assignment is one grouped min, the cumulative runs over the
    // O(#cohorts × #months) grid only (DECIMAL sums, order-independent
    // so the window cumsum equals the oracle's bit-for-bit), never over
    // raw orders.
    "orders_cohort_ltv" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .withColumn("mo", (year(col("o_orderdate")) * 12
          + month(col("o_orderdate")) - 1).cast(LongType))
      val cohort = o.groupBy("o_custkey").agg(min(col("mo")).as("cohort_mo"))
      val cells = o.join(cohort, "o_custkey")
        .groupBy(col("cohort_mo"), (col("mo") - col("cohort_mo")).as("age"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      val sizes = cohort.groupBy("cohort_mo")
        .agg(count(lit(1)).as("cohort_users"))
      val wc = Window.partitionBy("cohort_mo").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.withColumn("cum_rev", sum(col("rev")).over(wc))
        .join(sizes, "cohort_mo")
        .select(col("cohort_mo"), col("age"), col("cohort_users"),
          round4(col("rev").cast(DoubleType)).as("rev"),
          round4(col("cum_rev").cast(DoubleType)
            / col("cohort_users").cast(DoubleType)).as("ltv_per_user"))
        .orderBy("cohort_mo", "age")
    },

    // A/B sample-size calculator per segment (the planning half of the
    // two_sample_z/CUPED family): n per variant = 16·σ²/δ² for 80% power
    // at α=0.05 detecting a 5%-of-mean shift — one exact moment pass,
    // closed form, ceil to integer on identical doubles.
    "events_ab_power" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
      e.groupBy("event_type").agg(
          count(lit(1)).cast(DoubleType).as("n"),
          exactSum(col("value")).as("sx"),
          exactSum(round4(col("value") * col("value"))).as("sxx"))
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("var",
          CleanFunctions.momentVar(col("n"), col("sx"), col("sxx")))
        .withColumn("delta", lit(0.05) * col("mean"))
        .select(col("event_type"), col("n").cast(LongType).as("n_obs"),
          round4(col("mean")).as("mean"), round4(col("var")).as("variance"),
          ceil(lit(16.0) * col("var") / (col("delta") * col("delta")))
            .cast(LongType).as("n_required"))
        .orderBy("event_type")
    },

    // KPSS level-stationarity statistic per series (the stationarity
    // gate before fitting AR-family models; > 0.463 rejects level-
    // stationarity at 5%): η = Σ S_t² / (n²·σ̂²) over DECIMAL partial
    // sums of the demeaned series — one moment pass + one keyed cumsum
    // window; S_t² rounded 4dp into a WIDE DECIMAL(28,6) (S_t is
    // O(n·σ), its square overflows the default 18,6 accumulator).
    "ts_kpss" -> { (s, d) =>
      val dec28 = DecimalType(28, 6)
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
      val st = e.groupBy("user_id").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        exactSum(col("value")).as("sx"),
        exactSum(col("value") * col("value")).as("sxx"))
      val wc = Window.partitionBy("user_id").orderBy("tsu", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = e.join(st, "user_id")
        .withColumn("dev", CleanFunctions.round6(col("value") - col("sx") / col("n")))
        .withColumn("cs", sum(col("dev").cast(DecimalType(18, 6))).over(wc).cast(DoubleType))
      val agg = cum.groupBy("user_id").agg(
          max(col("n")).as("nd"), max(col("sx")).as("msx"), max(col("sxx")).as("msxx"),
          sum(round4(col("cs") * col("cs")).cast(dec28)).cast(DoubleType).as("ss2"))
        .withColumn("varp", greatest(
          (col("msxx") - col("msx") * col("msx") / col("nd")) / col("nd"), lit(0.0)))
      val kp = round4(CleanFunctions.safeDiv(
        col("ss2"), col("nd") * col("nd") * col("varp")))
      agg.select(col("user_id"), col("nd").cast(LongType).as("n_obs"),
          kp.as("kpss"),
          when(kp > 0.463, lit(1L)).otherwise(lit(0L)).as("nonstationary"))
        .orderBy("user_id")
    },

    // Rescaled-range Hurst exponent per series (the long-memory /
    // trend-persistence diagnostic: H≈0.5 random walk, >0.5 trending,
    // <0.5 mean-reverting): R/S per full chunk at sizes 8/16/32 — R =
    // range of the DECIMAL-cumulative deviation from the chunk mean, S =
    // clamped chunk std — then H = (ln r̄s₃₂ − ln r̄s₈)/(2·ln 2), the
    // exact OLS slope for log2-spaced sizes (middle point drops out).
    // All windows chunk-partitioned; ln outputs rounded 6dp (psi
    // pattern) and the 2·ln2 divisor baked as ONE exact-double literal
    // on both engines — libm may differ in the last ulp.
    "ts_hurst" -> { (s, d) =>
      val wRn = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("rn", row_number().over(wRn))
      def rsOf(sz: Int) = {
        val chunks = e.withColumn("chunk", expr(s"(rn - 1) DIV $sz"))
        val stats = chunks.groupBy("user_id", "chunk").agg(
          count(lit(1)).as("cn"),
          exactSum(col("value")).as("sx"),
          exactSum(col("value") * col("value")).as("sxx"))
          .where(col("cn") === sz)
        val wc = Window.partitionBy("user_id", "chunk")
          .orderBy("rn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        chunks.join(stats, Seq("user_id", "chunk"))
          .withColumn("dev", CleanFunctions.round6(
            col("value") - col("sx") / col("cn").cast(DoubleType)))
          .withColumn("cd", sum(col("dev").cast(DecimalType(18, 6))).over(wc)
            .cast(DoubleType))
          .groupBy("user_id", "chunk")
          .agg((max(col("cd")) - min(col("cd"))).as("r"),
            max(col("cn")).cast(DoubleType).as("n"),
            max(col("sx")).as("csx"), max(col("sxx")).as("csxx"))
          .withColumn("rsv", round4(CleanFunctions.safeDiv(col("r"),
            nullif(CleanFunctions.momentStd(col("n"), col("csx"), col("csxx")), lit(0.0)))))
          .groupBy("user_id")
          .agg(round4(exactSum(col("rsv")) / count(col("rsv"))).as(s"rs_$sz"))
      }
      val twoLn2 = 2.0 * math.log(2.0)
      rsOf(8).join(rsOf(16), "user_id").join(rsOf(32), "user_id")
        .select(col("user_id"), col("rs_8"), col("rs_16"), col("rs_32"),
          round4((CleanFunctions.round6(log(col("rs_32")))
            - CleanFunctions.round6(log(col("rs_8")))) / lit(twoLn2)).as("hurst"))
        .orderBy("user_id")
    },

    // Difference-in-differences estimate (the quasi-experimental causal
    // primitive, CUPED's sibling): treated = even user ids (a
    // deterministic synthetic assignment), periods split like events_psi;
    // DiD = (T,post − T,pre) − (C,post − C,pre) over four exact group
    // means rounded 4dp before the closed-form combination — one grouped
    // pass + a 4-cell conditional pivot, no joins.
    "events_did" -> { (s, d) =>
      val jan15 = java.time.LocalDate.of(2024, 1, 15).toEpochDay
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("pre", expr("tsu DIV 86400000000") <= lit(jan15))
        .withColumn("treated", col("user_id") % 2 === 0)
      e.groupBy("treated", "pre")
        .agg(round4(CleanFunctions.exactMean(col("value"))).as("m"))
        .agg(
          min(when(col("treated") && col("pre"), col("m"))).as("t_pre"),
          min(when(col("treated") && !col("pre"), col("m"))).as("t_post"),
          min(when(!col("treated") && col("pre"), col("m"))).as("c_pre"),
          min(when(!col("treated") && !col("pre"), col("m"))).as("c_post"))
        .select(col("t_pre"), col("t_post"), col("c_pre"), col("c_post"),
          round4((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
            .as("did"))
    },

    // Lag-1 Granger-causality F test on the daily grid: does series x's
    // previous day improve the AR(1) prediction of series y? Full model
    // y_t ~ [1, y_{t-1}, x_{t-1}] solved in CLOSED FORM from centered
    // moments (2x2 normal equations — no iterative fit), restricted
    // model the plain AR(1); F = (RSS_r - RSS_f)(n-3)/RSS_f. The DAILY
    // grid keeps consecutive-lag pairs dense on irregular series (hourly
    // buckets are mostly holes) and the user sampling bounds pairs like
    // ts_cross_corr; all 9 moments are
    // DECIMAL-exact so the long IEEE chain is engine-identical; det/RSS
    // degeneracies null out via nullif, tiny negative F clamps to 0.
    "ts_granger" -> { (s, d) =>
      val dec = DecimalType(28, 6)
      val hourly = Tables.events(s, d).where(col("value").isNotNull)
        .filter(col("user_id") % 10 === 0)
        .groupBy(col("user_id"), CleanFunctions.epochUs(date_trunc("day", col("ts"))).as("b"))
        .agg(CleanFunctions.exactMean(col("value")).as("v"))
        .cache()
      val hr = lit(86400000000L)
      val rows = hourly.as("y")
        .join(hourly.as("yl"),
          col("yl.user_id") === col("y.user_id") && col("yl.b") === col("y.b") - hr)
        .join(hourly.as("xl"),
          col("xl.b") === col("y.b") - hr && col("xl.user_id") =!= col("y.user_id"))
        .select(col("y.user_id").as("yu"), col("xl.user_id").as("xu"),
          col("y.v").as("t"), col("yl.v").as("z1"), col("xl.v").as("z2"))
      val mom = rows.groupBy("yu", "xu").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("z1").cast(dec)).cast(DoubleType).as("s1"),
        sum(col("z2").cast(dec)).cast(DoubleType).as("s2"),
        sum(col("t").cast(dec)).cast(DoubleType).as("st"),
        sum((col("z1") * col("z1")).cast(dec)).cast(DoubleType).as("s11"),
        sum((col("z2") * col("z2")).cast(dec)).cast(DoubleType).as("s22"),
        sum((col("z1") * col("z2")).cast(dec)).cast(DoubleType).as("s12"),
        sum((col("z1") * col("t")).cast(dec)).cast(DoubleType).as("s1t"),
        sum((col("z2") * col("t")).cast(dec)).cast(DoubleType).as("s2t"),
        sum((col("t") * col("t")).cast(dec)).cast(DoubleType).as("stt"))
        .where(col("n") > 3.0)
      mom
        .withColumn("c11", col("s11") - col("s1") * col("s1") / col("n"))
        .withColumn("c22", col("s22") - col("s2") * col("s2") / col("n"))
        .withColumn("c12", col("s12") - col("s1") * col("s2") / col("n"))
        .withColumn("c1t", col("s1t") - col("s1") * col("st") / col("n"))
        .withColumn("c2t", col("s2t") - col("s2") * col("st") / col("n"))
        .withColumn("ctt", col("stt") - col("st") * col("st") / col("n"))
        .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
        .withColumn("b1", (col("c1t") * col("c22") - col("c2t") * col("c12"))
          / nullif(col("det"), lit(0.0)))
        .withColumn("b2", (col("c2t") * col("c11") - col("c1t") * col("c12"))
          / nullif(col("det"), lit(0.0)))
        .withColumn("rssf", col("ctt") - col("b1") * col("c1t") - col("b2") * col("c2t"))
        .withColumn("rssr", col("ctt") - col("c1t") * col("c1t") / nullif(col("c11"), lit(0.0)))
        .select(col("yu"), col("xu"), col("n").cast(LongType).as("n_obs"),
          round4(col("b2")).as("x_coef"),
          round4(greatest((col("rssr") - col("rssf")) * (col("n") - lit(3.0))
            / nullif(col("rssf"), lit(0.0)), lit(0.0))).as("granger_f"))
        .orderBy("yu", "xu")
    },

    // Order inter-arrival regularity per customer: mean gap (days) and
    // coefficient of variation over successive order dates — cv << 1 is
    // a metronome buyer, cv >> 1 bursty. One keyed lag window; gaps
    // rounded to 4dp days BEFORE the DECIMAL moment sums (raw
    // microsecond squares would overflow DECIMAL(18,6)).
    "orders_interarrival" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("tsu", "o_orderkey")
      val gaps = Tables.orders(s, d)
        .withColumn("tsu", CleanFunctions.epochUs(col("o_orderdate")))
        .withColumn("gap",
          round4((col("tsu") - lag(col("tsu"), 1).over(w)).cast(DoubleType)
            / lit(86400000000.0)))
        .where(col("gap").isNotNull)
      gaps.groupBy("o_custkey").agg(
          count(lit(1)).as("n_gaps"),
          exactSum(col("gap")).as("sg"),
          exactSum(round4(col("gap") * col("gap"))).as("sgg"))
        .where(col("n_gaps") >= 2)
        .withColumn("mean_gap", col("sg") / col("n_gaps").cast(DoubleType))
        .select(col("o_custkey"), col("n_gaps"),
          round4(col("mean_gap")).as("mean_gap_days"),
          round4(CleanFunctions.safeDiv(
            CleanFunctions.momentStd(col("n_gaps").cast(DoubleType), col("sg"), col("sgg")),
            col("mean_gap"))).as("cv"))
        .orderBy("o_custkey")
    },

    // Ljung-Box portmanteau test per series (the residual-whiteness gate
    // after any fit — the hypothesis-test companion of ts_acf/ts_pacf):
    // Q = n(n+2)·Σ_{k=1..5} ρ_k²/(n−k), ρ_k from the standard
    // full-sample-variance ACF estimator; Q > 11.07 (χ²₅ at 5%) rejects
    // whiteness. All five lags come off ONE keyed window pass (five lag()
    // calls share the sort); deviations rounded 6dp and products 4dp
    // before the DECIMAL sums; the five IEEE terms are summed in the
    // spelled-out left-assoc order on both engines.
    "ts_ljung_box" -> { (s, d) =>
      val wOrd = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val lags = 1 to 5
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
      val st = e.groupBy("user_id").agg(
        count(lit(1)).cast(DoubleType).as("n"), exactSum(col("value")).as("sx"))
      var dev = e.join(st, "user_id")
        .withColumn("dev", CleanFunctions.round6(col("value") - col("sx") / col("n")))
      for (k <- lags)
        dev = dev.withColumn(s"l$k", lag(col("dev"), k).over(wOrd))
      val agg = dev.groupBy("user_id").agg(
        max(col("n")).as("nd"),
        exactSum(round4(col("dev") * col("dev"))).as("den")
          +: lags.map(k => exactSum(round4(col("dev") * col(s"l$k"))).as(s"num$k")): _*)
      val terms = lags.map { k =>
        val rho = CleanFunctions.safeDiv(col(s"num$k"), col("den"))
        CleanFunctions.round6(rho * rho / (col("nd") - lit(k.toDouble)))
      }
      val q = round4(col("nd") * (col("nd") + lit(2.0)) * terms.reduce(_ + _))
      agg.select(col("user_id"), col("nd").cast(LongType).as("n_obs"),
          q.as("lb_q"),
          when(q > 11.07, lit(1L)).otherwise(lit(0L)).as("autocorrelated"))
        .orderBy("user_id")
    },

    // Dickey-Fuller unit-root test per series (the reject-side
    // stationarity gate pairing ts_kpss: DF rejects a unit root, KPSS
    // rejects stationarity — agreement between the two is the textbook
    // protocol): Δy_t = α + β·y_{t−1} solved in closed form from ONE
    // pass of exact-DECIMAL pair moments (no iterative fit), t(β̂) vs
    // the -2.86 DF critical value (5%, constant, no trend). Products
    // rounded 4dp before the sums; RSS clamped at 0 so sqrt never NaNs.
    "ts_adf" -> { (s, d) =>
      val wOrd = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .withColumn("xl", lag(col("value"), 1).over(wOrd))
        .withColumn("dy", col("value") - col("xl"))
        .where(col("xl").isNotNull)
      val m = e.groupBy("user_id").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        exactSum(col("xl")).as("sx"), exactSum(col("dy")).as("sy"),
        exactSum(round4(col("xl") * col("dy"))).as("sxy"),
        exactSum(round4(col("xl") * col("xl"))).as("sxx"),
        exactSum(round4(col("dy") * col("dy"))).as("syy"))
      val sxxC = col("sxx") - col("sx") * col("sx") / col("n")
      val sxyC = col("sxy") - col("sx") * col("sy") / col("n")
      val syyC = col("syy") - col("sy") * col("sy") / col("n")
      val beta = CleanFunctions.safeDiv(sxyC, sxxC)
      val rss  = greatest(syyC - beta * sxyC, lit(0.0))
      val t    = round4(CleanFunctions.safeDiv(beta,
        nullif(sqrt(rss / ((col("n") - 2.0) * sxxC)), lit(0.0))))
      m.select(col("user_id"), col("n").cast(LongType).as("n_pairs"),
          round4(beta).as("beta"), t.as("adf_t"),
          when(t > -2.86, lit(1L)).otherwise(lit(0L)).as("unit_root"))
        .orderBy("user_id")
    },

    // Engle-Granger two-step cointegration test on series pairs over the
    // daily grid (do two non-stationary series share a common stochastic
    // trend? THE pairs-trading / long-run-equilibrium primitive; the
    // bivariate capstone of the ts_adf/ts_kpss family): step 1 fits
    // y~[1,x] in closed form from one exact-DECIMAL moment pass; step 2
    // runs the NO-CONSTANT Dickey-Fuller regression on the 4dp-rounded
    // residuals over CONSECUTIVE days only (a calendar gap contributes
    // no Δe pair), t(γ̂) vs the −3.37 Engle-Granger 5% critical value
    // (2 variables). Same user sampling as ts_granger bounds pairs; the
    // residual pass joins the O(pairs) moment table back on the pair key
    // (shuffle, NOT broadcast — pairs are corpus-proportional).
    "ts_coint" -> { (s, d) =>
      val dec = DecimalType(28, 6)
      val day = lit(86400000000L)
      val daily = Tables.events(s, d).where(col("value").isNotNull)
        .filter(col("user_id") % 10 === 0)
        .groupBy(col("user_id"), CleanFunctions.epochUs(date_trunc("day", col("ts"))).as("b"))
        .agg(CleanFunctions.exactMean(col("value")).as("v"))
        .cache()
      val rows = daily.as("y")
        .join(daily.as("x"),
          col("x.b") === col("y.b") && col("x.user_id") =!= col("y.user_id"))
        .select(col("y.user_id").as("yu"), col("x.user_id").as("xu"),
          col("y.b").as("b"), col("y.v").as("yv"), col("x.v").as("xv"))
      val m = rows.groupBy("yu", "xu").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("xv").cast(dec)).cast(DoubleType).as("sx"),
        sum(col("yv").cast(dec)).cast(DoubleType).as("sy"),
        sum((col("xv") * col("yv")).cast(dec)).cast(DoubleType).as("sxy"),
        sum((col("xv") * col("xv")).cast(dec)).cast(DoubleType).as("sxx"))
        .where(col("n") > 4.0)
      val beta  = (col("sxy") - col("sx") * col("sy") / col("n")) /
        nullif(col("sxx") - col("sx") * col("sx") / col("n"), lit(0.0))
      val wOrd = Window.partitionBy("yu", "xu").orderBy("b")
      val res = rows.join(m, Seq("yu", "xu"))
        .withColumn("beta", beta)
        .withColumn("alpha", (col("sy") - col("beta") * col("sx")) / col("n"))
        .withColumn("e", round4(col("yv") - (col("alpha") + col("beta") * col("xv"))))
        .withColumn("el", lag(col("e"), 1).over(wOrd))
        .withColumn("bl", lag(col("b"), 1).over(wOrd))
        .where(col("bl") === col("b") - day)
        .withColumn("de", col("e") - col("el"))
      val df = res.groupBy("yu", "xu").agg(
        max(col("beta")).as("mb"),
        count(lit(1)).cast(DoubleType).as("np"),
        exactSum(round4(col("el") * col("de"))).as("sg"),
        exactSum(round4(col("el") * col("el"))).as("sll"),
        exactSum(round4(col("de") * col("de"))).as("sdd"))
        .where(col("np") > 3.0)
      val gam = CleanFunctions.safeDiv(col("sg"), col("sll"))
      val rss = greatest(col("sdd") - gam * col("sg"), lit(0.0))
      val t   = round4(CleanFunctions.safeDiv(gam,
        nullif(sqrt(rss / ((col("np") - 1.0) * col("sll"))), lit(0.0))))
      df.select(col("yu"), col("xu"), col("np").cast(LongType).as("n_obs"),
          round4(col("mb")).as("beta"), t.as("eg_t"),
          when(t < -3.37, lit(1L)).otherwise(lit(0L)).as("cointegrated"))
        .orderBy("yu", "xu")
    },

    // Wald-Wolfowitz runs test per series: are the above/below-median
    // signs randomly ordered, or do they clump (trend / regime drift)
    // or alternate (overdifferenced / oscillating)? The nonparametric
    // randomness screen run BEFORE trusting any iid-threshold detector
    // (ref pipeline thresholds assume exchangeable residuals,
    // main.py:208-233). Median via the rank-interpolation percentile
    // (no per-group value buffering), exact integer run/side counts on
    // one keyed lag window, closed-form normal approximation. Values
    // equal to the median are excluded (standard treatment), so every
    // surviving sign is +/- and both engines count identical runs.
    "ts_runs_test" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
      val med = StatsOps.rankPercentiles(e, Seq("user_id"), "value", Seq(0.5))
        .select(col("user_id"), col("pct").as("med"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val signed = e.join(med, "user_id")
        .where(col("value") =!= col("med"))
        .withColumn("sgn", (col("value") > col("med")).cast(LongType))
        .withColumn("prev", lag(col("sgn"), 1).over(w))
      val g = signed.groupBy("user_id").agg(
        count(when(col("sgn") === 1L, 1)).as("n_pos"),
        count(when(col("sgn") === 0L, 1)).as("n_neg"),
        (count(when(col("prev").isNotNull && col("prev") =!= col("sgn"), 1)) + 1L)
          .as("n_runs"))
      val n1 = col("n_pos").cast(DoubleType)
      val n2 = col("n_neg").cast(DoubleType)
      val mu = lit(2.0) * n1 * n2 / (n1 + n2) + lit(1.0)
      val z4 = round4((col("n_runs").cast(DoubleType) - mu) /
        nullif(sqrt((mu - 1.0) * (mu - 2.0) / (n1 + n2 - 1.0)), lit(0.0)))
      g.select(col("user_id"), col("n_pos"), col("n_neg"), col("n_runs"),
          z4.as("z"), (abs(z4) <= 1.96).cast(LongType).as("is_random"))
        .orderBy("user_id")
    },

    // Yule-Walker AR(2) fit + one-step forecast per series: the
    // closed-form autoregressive forecaster (phi1, phi2 from the lag-1/2
    // autocorrelations — the same Durbin-Levinson level-2 coefficients
    // ts_pacf exposes, here USED to forecast). Output also carries the
    // innovation-variance fraction 1 - phi1*r1 - phi2*r2 (how much
    // variance the AR structure explains). One keyed lag window +
    // DECIMAL-exact moment pass + a tiny last-two-rows window; the
    // downstream algebra runs on 4dp-rounded correlations so both
    // engines compute on identical doubles.
    "ts_ar2_forecast" -> { (s, d) =>
      val dec = DecimalType(28, 6)
      val e = Tables.events(s, d).where(col("value").isNotNull)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      def moments(k: Int): Seq[org.apache.spark.sql.Column] = {
        val x = col("value"); val y = col(s"y$k"); val valid = y.isNotNull
        Seq(
          count(when(valid, 1)).cast(DoubleType).as(s"n$k"),
          sum(when(valid, x).cast(dec)).cast(DoubleType).as(s"sx$k"),
          sum(when(valid, y).cast(dec)).cast(DoubleType).as(s"sy$k"),
          sum(when(valid, x * y).cast(dec)).cast(DoubleType).as(s"sxy$k"),
          sum(when(valid, x * x).cast(dec)).cast(DoubleType).as(s"sxx$k"),
          sum(when(valid, y * y).cast(dec)).cast(DoubleType).as(s"syy$k"))
      }
      def corrOf(k: Int) = round4(CleanFunctions.momentCorr(
        col(s"n$k"), col(s"sx$k"), col(s"sy$k"),
        col(s"sxy$k"), col(s"sxx$k"), col(s"syy$k")))
      val aggs = moments(1) ++ moments(2) ++ Seq(
        CleanFunctions.exactSum(col("value")).as("sx0"),
        count(lit(1)).cast(DoubleType).as("n0"))
      val m = e
        .withColumn("y1", lag(col("value"), 1).over(w))
        .withColumn("y2", lag(col("value"), 2).over(w))
        .groupBy("user_id").agg(aggs.head, aggs.tail: _*)
        .withColumn("r1", corrOf(1)).withColumn("r2", corrOf(2))
        .withColumn("phi2", (col("r2") - col("r1") * col("r1")) /
          nullif(lit(1.0) - col("r1") * col("r1"), lit(0.0)))
        .withColumn("phi1", col("r1") * (lit(1.0) - col("phi2")))
      val wDesc = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
      val lastv = e.withColumn("rk", row_number().over(wDesc)).where(col("rk") <= 2)
        .groupBy("user_id").agg(
          max(when(col("rk") === 1, col("value"))).as("x1"),
          max(when(col("rk") === 2, col("value"))).as("x2"))
      val mean = col("sx0") / col("n0")
      m.join(lastv, "user_id")
        .select(col("user_id"), col("n0").cast(LongType).as("n_rows"),
          round4(col("phi1")).as("phi1"), round4(col("phi2")).as("phi2"),
          round4(mean + col("phi1") * (col("x1") - mean) +
            col("phi2") * (col("x2") - mean)).as("forecast_1"),
          round4(lit(1.0) - col("phi1") * col("r1") - col("phi2") * col("r2"))
            .as("innov_var_frac"))
        .orderBy("user_id")
    },

    // Kaplan-Meier product-limit survival curve over per-user activity
    // lifetimes (hours from first to last event), right-censored for
    // users still active within 12 h of the corpus end — the
    // time-to-churn estimator that a naive "mean lifetime of churned
    // users" biases low. The at-risk counts and the cumulative
    // log-survival both come from a TRIANGULAR SELF-JOIN of the
    // O(#distinct-durations) aggregate with itself (the duration domain
    // is bounded by the time span, NOT corpus-proportional, so the
    // broadcast is legitimate and there is no single-partition global
    // window); per-step ln factors are 6dp-rounded then DECIMAL-summed
    // so the product is order-independent on both engines.
    "events_survival_km" -> { (s, d) =>
      val eu = CleanFunctions.epochUs(col("ts"))
      val du = Tables.events(s, d).groupBy("user_id")
        .agg(min(eu).as("first_us"), max(eu).as("last_us"))
      val g = du.agg(max(col("last_us")).as("gmax"))
      val d0 = du.crossJoin(broadcast(g))
        .select(expr("(last_us - first_us) div 3600000000").as("dur_h"),
          when(col("last_us") <= col("gmax") - lit(43200000000L), 1L)
            .otherwise(0L).as("observed"))
      val t = d0.groupBy("dur_h").agg(
        count(when(col("observed") === 1L, 1)).as("d"),
        count(lit(1)).as("m"))
      val tb = t.select(col("dur_h").as("t2"), col("m").as("m2"))
      val r = t.join(broadcast(tb), col("t2") >= col("dur_h"))
        .groupBy("dur_h", "d", "m").agg(sum(col("m2")).as("n_risk"))
      val f = r
        .withColumn("lnf", when(col("d") < col("n_risk"),
          CleanFunctions.round6(log(lit(1.0) -
            col("d").cast(DoubleType) / col("n_risk").cast(DoubleType)))
            .cast(DecimalType(18, 6))))
        .withColumn("iszero", when(col("d") >= col("n_risk"), 1L).otherwise(0L))
      val fb = f.select(col("dur_h").as("t2"), col("lnf").as("lnf2"),
        col("iszero").as("iszero2"))
      val sdf = f.join(broadcast(fb), col("t2") <= col("dur_h"))
        .groupBy("dur_h", "d", "m", "n_risk")
        .agg(sum(col("lnf2")).as("lnsum"), sum(col("iszero2")).as("zc"))
      sdf.where(col("d") > 0)
        .select(col("dur_h").as("t_hours"), col("n_risk").cast(LongType).as("n_risk"),
          col("d").as("d_events"), (col("m") - col("d")).as("censored"),
          when(col("zc") > 0, lit(0.0))
            .otherwise(round4(exp(col("lnsum").cast(DoubleType)))).as("survival"))
        .orderBy("t_hours")
    },

    // Nelson–Aalen cumulative hazard over the same duration/censoring
    // framing as events_survival_km — the estimator survival analysis
    // reaches for when the HAZARD (instantaneous churn intensity) is
    // the decision quantity, not the survival curve: H(t) = Σ_{tᵢ≤t}
    // dᵢ/nᵢ with Poisson variance Σ dᵢ/nᵢ². Same risk-set non-equi
    // broadcast joins over the O(#distinct durations) aggregate (never
    // over users); hazard increments 6dp-quantized then DECIMAL-summed
    // so the cumulative is order-free.
    "events_nelson_aalen" -> { (s, d) =>
      val eu = CleanFunctions.epochUs(col("ts"))
      val du = Tables.events(s, d).groupBy("user_id")
        .agg(min(eu).as("first_us"), max(eu).as("last_us"))
      val g = du.agg(max(col("last_us")).as("gmax"))
      val d0 = du.crossJoin(broadcast(g))
        .select(expr("(last_us - first_us) div 3600000000").as("dur_h"),
          when(col("last_us") <= col("gmax") - lit(43200000000L), 1L)
            .otherwise(0L).as("observed"))
      val t = d0.groupBy("dur_h").agg(
        count(when(col("observed") === 1L, 1)).as("d"),
        count(lit(1)).as("m"))
      val tb = t.select(col("dur_h").as("t2"), col("m").as("m2"))
      val r = t.join(broadcast(tb), col("t2") >= col("dur_h"))
        .groupBy("dur_h", "d", "m").agg(sum(col("m2")).as("n_risk"))
      val f = r
        .withColumn("hterm", CleanFunctions.round6(
            col("d").cast(DoubleType) / col("n_risk").cast(DoubleType))
          .cast(DecimalType(18, 6)))
        .withColumn("vterm", CleanFunctions.round6(
            col("d").cast(DoubleType) /
              (col("n_risk").cast(DoubleType) * col("n_risk").cast(DoubleType)))
          .cast(DecimalType(18, 6)))
      val fb = f.select(col("dur_h").as("t2"),
        col("hterm").as("h2"), col("vterm").as("v2"))
      f.join(broadcast(fb), col("t2") <= col("dur_h"))
        .groupBy("dur_h", "d", "m", "n_risk")
        .agg(sum(col("h2")).as("hsum"), sum(col("v2")).as("vsum"))
        .where(col("d") > 0)
        .select(col("dur_h").as("t_hours"), col("n_risk").cast(LongType).as("n_risk"),
          col("d").as("d_events"),
          round4(col("hsum").cast(DoubleType)).as("cum_hazard"),
          round4(col("vsum").cast(DoubleType)).as("hazard_var"))
        .orderBy("t_hours")
    },

    // Count-min sketch heavy hitters (Cormode-Muthukrishnan): d=3
    // pairwise-independent integer hash rows x w=64 counters over the
    // event key stream, estimate = min over rows, reported for the top
    // keys next to the true count and the sketch's overestimate. The
    // hashes are fixed ((a*x + b) mod p mod w, p = 2^31-1) and every
    // value is a BIGINT, so the sketch state is bit-identical on both
    // engines — a sketch entry with an EXACT oracle, unlike the
    // engine-internal HLL of events_approx_stats. Scale shape: the
    // counter table is d*w rows no matter the input (that is the point
    // of a sketch); it broadcast-joins back to the per-key table, and
    // the top-k is a TakeOrdered, never a global sort.
    "events_cms_topk" -> { (s, d) =>
      val keys = Tables.events(s, d).select(col("user_id"))
      val counters = keys
        .select(explode(array((0 until CmsD).map(i =>
          struct(lit(i).as("r"), cmsHash(i).as("b"))): _*)).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      cmsAudit(s, d, counters)
    },

    // STREAMING twin of events_cms_topk (SURVEY §2.12): the counter build
    // runs as the emit-once flatMapGroupsWithState fold keyed by the
    // (row, bucket) CELL — one long of state per counter, merged by sum,
    // finalized at event-time timeout (StreamingAnomaly.cmsCounters).
    // The per-row cell explosion uses the SAME Catalyst hash expressions
    // as the batch scan, and the top-k audit downstream of the counters
    // is the shared cmsAudit — so the streaming answer hash-matches the
    // batch entry's DuckDB oracle verbatim.
    "streaming_cms_topk" -> { (s, d) =>
      import s.implicits._
      val rows = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[graft.streaming.KeyEvent].collect().toSeq
      val counters =
        if (rows.isEmpty) s.emptyDataset[graft.streaming.CmsCounter].toDF()
        else {
          val maxUs = rows.iterator
            .map(e => graft.streaming.StreamingAnomaly.tsUs(e.ts)).max
          graft.streaming.StreamingAnomaly.replayToSink(
            s, rows, "graft_streaming_cms",
            Some(graft.streaming.StreamingAnomaly.punctuationKeyEvent(
              maxUs + 10L * 86400L * 1000000L))) { ds =>
            // The punctuation marker must advance the watermark (a
            // pre-fold FILTER would be pushed below the watermark node
            // and the final no-data batch would never fire) yet must not
            // increment real counters — unlike the keyed sketches, CMS
            // cells are shared across the whole stream. So the marker's
            // rows are ROUTED to a dedicated sentinel cell (−1, −1)
            // whose timeout lies beyond the replay's final watermark: it
            // never reaches the output.
            val realCells = array((0 until CmsD).map(i =>
              struct(lit(i).as("r"), cmsHash(i).as("b"))): _*)
            val punctCell = array(struct(lit(-1).as("r"), lit(-1L).as("b")))
            val cells = ds.toDF()
              .withWatermark("ts", "1 hour")
              .select(explode(when(col("user_id") >= 0L, realCells)
                .otherwise(punctCell)).as("rb"), col("ts"))
              .select(col("rb.r").as("r"), col("rb.b").as("b"), col("ts"))
              .as[(Int, Long, java.sql.Timestamp)]
            graft.streaming.StreamingAnomaly.cmsCounters(cells).toDF()
          }
        }
      cmsAudit(s, d, counters)
    },

    // Two-sample Kolmogorov–Smirnov test (click vs view, the
    // distribution-shape companion to the rank-based Mann–Whitney):
    // D = max |F̂1 − F̂2| over the pooled support. ECDF gaps come from
    // cumulative per-DISTINCT-value counts — the prefix sum runs over
    // the distinct-value table, not the events (at 100 TB that table is
    // the banded two-level prefix-sum shape of StatsOps; the measure's
    // support is bounded long before the event count is). Gaps are
    // integer-ratio doubles (k/n) — bit-identical, so the max and the
    // rejection flag agree exactly; the α=.05 critical constant 1.358
    // is baked as the same literal in both engines.
    "events_ks_test" -> { (s, d) =>
      val e = Tables.events(s, d)
        .where(col("value").isNotNull && col("event_type").isin("click", "view"))
      val per = e.groupBy("value").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
      val tot = e.agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n2"))
      val gaps = StatsOps.bandedPrefixSums(per, col("value"), Seq("c1", "c2"))
        .select(col("value"), col("cum_c1").as("k1"), col("cum_c2").as("k2"))
        .crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          abs(col("k1").cast(DoubleType) / col("n1").cast(DoubleType) -
            col("k2").cast(DoubleType) / col("n2").cast(DoubleType)).as("gap"))
      val crit = lit(1.358) *
        sqrt((col("n1") + col("n2")).cast(DoubleType) /
          (col("n1") * col("n2")).cast(DoubleType))
      gaps.groupBy("n1", "n2").agg(max(col("gap")).as("d"))
        .select(col("n1"), col("n2"),
          CleanFunctions.round6(col("d")).as("ks_d"),
          CleanFunctions.round6(crit).as("crit"),
          (CleanFunctions.round6(col("d")) > CleanFunctions.round6(crit))
            .cast(LongType).as("reject"))
    },

    // Markov entropy rate of the event-type process: H = −Σ π_i p_ij
    // ln p_ij over per-series transition pairs pooled corpus-wide (with
    // π p_ij = c_ij/N), next to the marginal entropy H0 = −Σ π_i ln π_i;
    // info_gain = H0 − H is how much the previous state predicts the
    // next (0 = memoryless stream). Transition counts are one lag window
    // + one grouped agg (states × states rows); ln terms 6dp-quantized
    // then DECIMAL-summed (the psi pattern), counts integer.
    "events_entropy_rate" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = Tables.events(s, d)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNotNull)
        .groupBy("prev", "event_type").agg(count(lit(1)).as("cij"))
      val fromTot = pairs.groupBy("prev").agg(sum(col("cij")).as("ci"))
      val tot = pairs.agg(sum(col("cij")).cast(LongType).as("n"))
      val hTerm = CleanFunctions.round6(
        (col("cij").cast(DoubleType) / col("n").cast(DoubleType)) *
          log(col("cij").cast(DoubleType) / col("ci").cast(DoubleType)))
      val h = pairs.join(fromTot, Seq("prev")).crossJoin(broadcast(tot))
        .select(hTerm.as("t"), col("n"))
        .groupBy("n").agg((-exactSum(col("t"))).as("entropy_rate"))
      val h0Term = CleanFunctions.round6(
        (col("ci").cast(DoubleType) / col("n").cast(DoubleType)) *
          log(col("ci").cast(DoubleType) / col("n").cast(DoubleType)))
      val h0 = fromTot.crossJoin(broadcast(tot))
        .select(h0Term.as("t0"))
        .agg((-exactSum(col("t0"))).as("marginal_entropy"))
      h.crossJoin(broadcast(h0))
        .select(col("n").as("n_transitions"),
          CleanFunctions.round6(col("entropy_rate")).as("entropy_rate"),
          CleanFunctions.round6(col("marginal_entropy")).as("marginal_entropy"),
          CleanFunctions.round6(
            CleanFunctions.round6(col("marginal_entropy")) -
              CleanFunctions.round6(col("entropy_rate"))).as("info_gain"))
    },

    // One-way ANOVA: does mean line revenue differ by return flag?
    // F = (SSB/(k−1)) / (SSW/(N−k)) from per-group DECIMAL-exact moments
    // (one map-side-combined agg; the grand pass re-sums the k group
    // scalars through DECIMAL so 3-term double addition order can't
    // drift). Price scaled to thousands before squaring — F is
    // scale-invariant and the squares stay far inside DECIMAL(18,6) at
    // any SF; each squared term 6dp-quantized (psi pattern).
    "lineitem_anova" -> { (s, d) =>
      val y = col("l_extendedprice") / 1000.0
      val g = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"), y.as("y"))
        .groupBy("grp").agg(
          count(lit(1)).cast(LongType).as("ng"),
          CleanFunctions.exactSum(col("y")).as("sg"),
          CleanFunctions.exactSum(CleanFunctions.round6(col("y") * col("y"))).as("ssg"))
      val grand = g.agg(
        count(lit(1)).cast(LongType).as("k"),
        sum(col("ng")).cast(LongType).as("n"),
        CleanFunctions.exactSum(col("sg")).as("s"),
        CleanFunctions.exactSum(col("ssg")).as("ss"),
        CleanFunctions.exactSum(CleanFunctions.round6(
          col("sg") * col("sg") / col("ng").cast(DoubleType))).as("b"))
      val ssb = col("b") - col("s") * col("s") / col("n").cast(DoubleType)
      val ssw = col("ss") - col("b")
      val f = (ssb / (col("k") - 1L).cast(DoubleType)) /
        (ssw / (col("n") - col("k")).cast(DoubleType))
      grand.select(col("k"), col("n"),
        CleanFunctions.round4(ssb).as("ssb"),
        CleanFunctions.round4(ssw).as("ssw"),
        CleanFunctions.round6(f).as("f_stat"))
    })

  private val PsSqlList =
    Ps.map(p => s"CAST($p AS DOUBLE)").mkString("[", ", ", "]")

  private val QtePsSqlList =
    QtePs.map(p => s"CAST($p AS DOUBLE)").mkString("[", ", ", "]")

  private val baseOracleSql: Map[String, String] = Map(
    "events_compaction_plan" ->
      s"""WITH RECURSIVE parts AS (
         |  SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day,
         |    event_type, count(*) AS n_rows
         |  FROM events GROUP BY 1, 2),
         |v AS (SELECT day, event_type, CAST(n_rows AS BIGINT) AS n_rows,
         |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
         |  FROM parts),
         |p AS (
         |  SELECT day, event_type, n_rows, rn,
         |    CAST(0 AS BIGINT) AS target_file, CAST(0 AS BIGINT) AS row_offset,
         |    n_rows AS free
         |  FROM v WHERE rn = 1
         |  UNION ALL
         |  SELECT v.day, v.event_type, v.n_rows, v.rn,
         |    CASE WHEN p.free > 0 AND p.free + v.n_rows > $CompactCap
         |         THEN p.target_file + 1 ELSE p.target_file END,
         |    CASE WHEN p.free > 0 AND p.free + v.n_rows > $CompactCap
         |         THEN 0 ELSE p.free END,
         |    CASE WHEN p.free > 0 AND p.free + v.n_rows > $CompactCap
         |         THEN v.n_rows ELSE p.free + v.n_rows END
         |  FROM p JOIN v ON v.event_type = p.event_type AND v.rn = p.rn + 1)
         |SELECT event_type, day, n_rows, target_file, row_offset
         |FROM p ORDER BY event_type, day""".stripMargin,

    "events_partition_skew" ->
      s"""WITH parts AS (
         |  SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day,
         |    event_type, count(*) AS n_rows
         |  FROM events GROUP BY 1, 2),
         |st AS (
         |  SELECT count(*) AS n_partitions, sum(n_rows) AS total_rows,
         |    max(n_rows) AS max_rows,
         |    CAST(sum(n_rows) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_rows
         |  FROM parts)
         |SELECT max(st.n_partitions) AS n_partitions,
         |  CAST(max(st.total_rows) AS BIGINT) AS total_rows,
         |  CAST(max(st.max_rows) AS BIGINT) AS max_rows,
         |  ${round4Sql("max(st.mean_rows)")} AS mean_rows,
         |  ${round4Sql("CAST(max(st.max_rows) AS DOUBLE) / max(st.mean_rows)")} AS skew_factor,
         |  count(CASE WHEN CAST(parts.n_rows AS DOUBLE) < 0.5 * st.mean_rows THEN 1 END) AS n_small_parts
         |FROM parts, st""".stripMargin,

    "orders_lognormal_fit" -> {
      val sd = CleanFunctions.momentStdSql("CAST(n AS DOUBLE)", "sx", "sxx")
      val cdf = CleanFunctions.normalCdfSql("(lx - mu) / nullif(sigma, 0.0)")
      s"""WITH base AS (
         |  SELECT o_orderpriority AS seg, o_orderkey,
         |    ${CleanFunctions.round6Sql("ln(o_totalprice)")} AS lx
         |  FROM orders WHERE o_totalprice > 0.0),
         |mom AS (
         |  SELECT seg, count(*) AS n, ${exactSumSql("lx")} AS sx,
         |    ${exactSumSql(CleanFunctions.round6Sql("lx * lx"))} AS sxx
         |  FROM base GROUP BY 1),
         |ms AS (
         |  SELECT seg, n, ${CleanFunctions.round6Sql("sx / n")} AS mu,
         |    ${CleanFunctions.round6Sql(sd)} AS sigma
         |  FROM mom),
         |r AS (
         |  SELECT seg, lx,
         |    row_number() OVER (PARTITION BY seg ORDER BY lx, o_orderkey) AS rn
         |  FROM base),
         |g AS (
         |  SELECT r.seg, ms.n, ms.mu, ms.sigma,
         |    CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) - $cdf AS dplus,
         |    $cdf - CAST(rn - 1 AS DOUBLE) / CAST(n AS DOUBLE) AS dminus
         |  FROM r JOIN ms ON r.seg = ms.seg),
         |f AS (
         |  SELECT seg, max(n) AS n, max(mu) AS mu, max(sigma) AS sigma,
         |    ${round4Sql("max(greatest(dplus, dminus))")} AS ks_d
         |  FROM g GROUP BY 1)
         |SELECT seg, CAST(n AS BIGINT) AS n, mu, sigma, ks_d,
         |  CAST(CASE WHEN ks_d > 1.358 / sqrt(CAST(n AS DOUBLE)) THEN 1
         |       ELSE 0 END AS BIGINT) AS reject_95
         |FROM f ORDER BY seg""".stripMargin
    },

    "events_qte" ->
      s"""WITH e AS (
         |  SELECT CASE WHEN isodow(ts)-1 >= 5 THEN CAST(1 AS BIGINT)
         |              ELSE CAST(0 AS BIGINT) END AS arm, value
         |  FROM events WHERE value IS NOT NULL),
         |r AS (
         |  SELECT arm, value AS v,
         |         row_number() OVER (PARTITION BY arm ORDER BY value) - 1 AS rn0,
         |         count(*) OVER (PARTITION BY arm) AS n
         |  FROM e),
         |f AS (
         |  SELECT arm, p, v, rn0,
         |         CAST(n - 1 AS DOUBLE) * p AS h,
         |         floor(CAST(n - 1 AS DOUBLE) * p) AS lo,
         |         ceil(CAST(n - 1 AS DOUBLE) * p) AS hi
         |  FROM r, (SELECT unnest($QtePsSqlList) AS p) px
         |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * p)
         |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * p)),
         |g AS (
         |  SELECT arm, p,
         |    ${round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(h) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS pct
         |  FROM f GROUP BY arm, p)
         |SELECT p,
         |  max(CASE WHEN arm = 1 THEN pct END) AS q_weekend,
         |  max(CASE WHEN arm = 0 THEN pct END) AS q_weekday,
         |  ${round4Sql("max(CASE WHEN arm = 1 THEN pct END) - max(CASE WHEN arm = 0 THEN pct END)")} AS qte
         |FROM g GROUP BY p ORDER BY p""".stripMargin,

    "lineitem_lead_time" -> {
      val ps = LeadTimePs.map(p => s"CAST($p AS DOUBLE)").mkString("[", ", ", "]")
      s"""WITH ld AS (
         |  SELECT l_returnflag,
         |    CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE) AS v
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |r AS (
         |  SELECT l_returnflag, v,
         |         row_number() OVER (PARTITION BY l_returnflag ORDER BY v) - 1 AS rn0,
         |         count(*) OVER (PARTITION BY l_returnflag) AS n
         |  FROM ld),
         |f AS (
         |  SELECT l_returnflag, p, v, rn0,
         |         CAST(n - 1 AS DOUBLE) * p AS h,
         |         floor(CAST(n - 1 AS DOUBLE) * p) AS lo,
         |         ceil(CAST(n - 1 AS DOUBLE) * p) AS hi
         |  FROM r, (SELECT unnest($ps) AS p) px
         |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * p)
         |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * p))
         |SELECT l_returnflag, p,
         |  ${round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(h) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS pct
         |FROM f GROUP BY l_returnflag, p ORDER BY l_returnflag, p""".stripMargin
    },

    "events_percentiles" ->
      s"""WITH r AS (
         |  SELECT user_id, value AS v,
         |         row_number() OVER (PARTITION BY user_id ORDER BY value) - 1 AS rn0,
         |         count(*) OVER (PARTITION BY user_id) AS n
         |  FROM events WHERE value IS NOT NULL),
         |f AS (
         |  SELECT user_id, p, v, rn0,
         |         CAST(n - 1 AS DOUBLE) * p AS h,
         |         floor(CAST(n - 1 AS DOUBLE) * p) AS lo,
         |         ceil(CAST(n - 1 AS DOUBLE) * p) AS hi
         |  FROM r, (SELECT unnest($PsSqlList) AS p) px
         |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * p)
         |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * p))
         |SELECT user_id, p,
         |  ${round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(h) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS pct
         |FROM f GROUP BY user_id, p ORDER BY user_id, p""".stripMargin,

    "events_mode_type" ->
      """SELECT user_id, event_type AS mode_type, cnt FROM (
        |  SELECT user_id, event_type, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rk
        |  FROM events GROUP BY user_id, event_type)
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "ts_cusum" ->
      s"""SELECT event_id,
         |${round4Sql(s"${exactSumSql("value", "OVER wr")} - CAST(row_number() OVER w AS BIGINT) * ${CleanFunctions.exactMeanSql("value", "OVER u")}")} AS cusum
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
         |  wr AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  u AS (PARTITION BY user_id)
         |ORDER BY event_id""".stripMargin,

    "ts_page_hinkley" -> PageHinkleyOracleSql,

    // The streaming fold replays to the identical windows (same shared
    // body rule as streaming_kalman).
    "streaming_page_hinkley" -> PageHinkleyOracleSql,

    "events_value_entropy" ->
      """WITH c AS (
        |  SELECT user_id, CAST(floor(value) AS BIGINT) AS b, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT user_id,
        |    CAST(round(((cnt / (sum(cnt) OVER (PARTITION BY user_id))) * ln(cnt / (sum(cnt) OVER (PARTITION BY user_id)))) * 1000000.0) / 1000000.0 + 0.0 AS DECIMAL(18,6)) AS term
        |  FROM c)
        |SELECT user_id, CAST(-sum(term) AS DOUBLE) AS entropy
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_grouping_sets" ->
      s"""SELECT coalesce(event_type, 'ALL') AS etype,
         |       coalesce(CAST(hr AS VARCHAR), 'ALL') AS hour_label,
         |       count(*) AS cnt,
         |       ${exactSumSql("value")} AS sum_value
         |FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, value FROM events)
         |GROUP BY GROUPING SETS ((event_type), (event_type, hr), ())
         |ORDER BY etype, hour_label""".stripMargin,

    "lineitem_cheapest_supplier" ->
      s"""SELECT l_partkey, l_suppkey, unit_price FROM (
         |  SELECT l_partkey, l_suppkey,
         |    ${round4Sql("l_extendedprice / l_quantity")} AS unit_price,
         |    row_number() OVER (PARTITION BY l_partkey
         |      ORDER BY ${round4Sql("l_extendedprice / l_quantity")}, l_suppkey) AS rk
         |  FROM lineitem)
         |WHERE rk = 1 ORDER BY l_partkey""".stripMargin,

    "customer_rfm" ->
      s"""WITH base AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
         |      (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT) AS recency_days,
         |    count(*) AS frequency,
         |    ${round4Sql(exactSumSql("o_totalprice"))} AS monetary
         |  FROM orders GROUP BY o_custkey),
         |r AS (
         |  SELECT *,
         |    row_number() OVER (ORDER BY recency_days, o_custkey) AS r_rank,
         |    row_number() OVER (ORDER BY frequency DESC, o_custkey) AS f_rank,
         |    row_number() OVER (ORDER BY monetary DESC, o_custkey) AS m_rank,
         |    count(*) OVER () AS n
         |  FROM base)
         |SELECT o_custkey, recency_days, frequency, monetary,
         |  1 + CAST(floor(4.0 * (r_rank - 1) / n) AS BIGINT) AS r_score,
         |  1 + CAST(floor(4.0 * (f_rank - 1) / n) AS BIGINT) AS f_score,
         |  1 + CAST(floor(4.0 * (m_rank - 1) / n) AS BIGINT) AS m_score,
         |  (1 + CAST(floor(4.0 * (r_rank - 1) / n) AS BIGINT)) * 100
         |    + (1 + CAST(floor(4.0 * (f_rank - 1) / n) AS BIGINT)) * 10
         |    + (1 + CAST(floor(4.0 * (m_rank - 1) / n) AS BIGINT)) AS rfm
         |FROM r ORDER BY o_custkey""".stripMargin,

    "orders_pareto" ->
      s"""WITH rev AS (
         |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
         |  FROM orders GROUP BY 1),
         |c AS (
         |  SELECT o_custkey, rev,
         |    ${round4Sql("CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / CAST((SELECT sum(rev) FROM rev) AS DOUBLE)")} AS cum_share
         |  FROM rev)
         |SELECT o_custkey, CAST(rev AS DOUBLE) AS revenue, cum_share,
         |  CAST(CASE WHEN cum_share <= 0.8 THEN 1 ELSE 0 END AS BIGINT) AS in_top80
         |FROM c ORDER BY o_custkey""".stripMargin,

    "part_abc_xyz" -> {
      val sd = CleanFunctions.momentStdSql("nm", "sq", "sqq")
      s"""WITH rev AS (
         |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
         |  FROM lineitem GROUP BY 1),
         |cs AS (
         |  SELECT l_partkey, rev,
         |    ${round4Sql("CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / CAST((SELECT sum(rev) FROM rev) AS DOUBLE)")} AS cum_share
         |  FROM rev),
         |abc AS (
         |  SELECT l_partkey, rev,
         |    CASE WHEN cum_share <= 0.8 THEN 'A'
         |         WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc
         |  FROM cs),
         |monthly AS (
         |  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
         |    ${exactSumSql("l_quantity")} AS q
         |  FROM lineitem GROUP BY 1, 2),
         |mv AS (
         |  SELECT l_partkey, CAST(count(*) AS DOUBLE) AS nm,
         |    ${exactSumSql(round4Sql("q"))} AS sq,
         |    ${exactSumSql(round4Sql("q * q"))} AS sqq
         |  FROM monthly GROUP BY 1),
         |xyz AS (
         |  SELECT l_partkey,
         |    CASE WHEN ${round4Sql(s"$sd / nullif(sq / nm, 0.0)")} < 0.5 THEN 'X'
         |         WHEN ${round4Sql(s"$sd / nullif(sq / nm, 0.0)")} < 1.0 THEN 'Y'
         |         ELSE 'Z' END AS xyz
         |  FROM mv),
         |tot AS (SELECT sum(rev) AS tot FROM rev)
         |SELECT abc.abc, xyz.xyz, count(*) AS n_parts,
         |  ${CleanFunctions.round6Sql("CAST(sum(abc.rev) AS DOUBLE) / CAST(max(tot.tot) AS DOUBLE)")} AS revenue_share
         |FROM abc JOIN xyz ON abc.l_partkey = xyz.l_partkey, tot
         |GROUP BY 1, 2 ORDER BY abc, xyz""".stripMargin
    },

    "events_benford" -> {
      val el = BenfordExp.map(dlit).mkString("[", ", ", "]")
      def ed = s"($el)[CAST(digit AS INT)]"
      s"""WITH e AS (
         |  SELECT event_type,
         |    CAST(substring(CAST(CAST(round(value * 100.0) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM events WHERE round(value * 100.0) >= 1.0),
         |obs AS (SELECT event_type, digit, count(*) AS obs FROM e GROUP BY 1, 2),
         |tot AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1),
         |spine AS (SELECT event_type, n, unnest(generate_series(1, 9)) AS digit FROM tot),
         |j AS (SELECT s.event_type, s.n, s.digit, coalesce(o.obs, 0) AS obs
         |      FROM spine s LEFT JOIN obs o
         |        ON s.event_type = o.event_type AND s.digit = o.digit),
         |t AS (SELECT event_type, n,
         |  CAST(round(((CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * $ed) * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * $ed) / (CAST(n AS DOUBLE) * $ed)) * 1000000.0) / 1000000.0 + 0.0 AS DECIMAL(18,6)) AS term
         |  FROM j)
         |SELECT event_type, max(n) AS n,
         |  ${round4Sql("CAST(sum(term) AS DOUBLE)")} AS chi2
         |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    "events_chi2_independence" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(hour(ts) AS BIGINT) // 6 AS part FROM events),
         |obs AS (SELECT event_type, part, count(*) AS obs FROM e GROUP BY 1, 2),
         |rt AS (SELECT event_type, count(*) AS rt FROM e GROUP BY 1),
         |ct AS (SELECT part, count(*) AS ct FROM e GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM e),
         |j AS (
         |  SELECT rt.event_type, ct.part, rt.rt, ct.ct, n.n,
         |    coalesce(obs.obs, 0) AS obs,
         |    CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE) AS e
         |  FROM rt CROSS JOIN ct CROSS JOIN n
         |  LEFT JOIN obs ON obs.event_type = rt.event_type AND obs.part = ct.part),
         |t AS (
         |  SELECT n, event_type, part,
         |    CAST(round(((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e) * 1000000.0) / 1000000.0 + 0.0 AS DECIMAL(18,6)) AS term
         |  FROM j)
         |SELECT max(n) AS n,
         |  (count(DISTINCT event_type) - 1) * (count(DISTINCT part) - 1) AS dof,
         |  ${round4Sql("CAST(sum(term) AS DOUBLE)")} AS chi2
         |FROM t""".stripMargin,

    "events_mannwhitney" -> {
      val n  = "(n1 + n2)"
      val u1 = "(r1 - n1 * (n1 + 1.0) / 2.0)"
      val mu = "(n1 * n2 / 2.0)"
      val sig2 = s"((n1 * n2 / 12.0) * (($n + 1.0) - CAST(tsum AS DOUBLE) / ($n * ($n - 1.0))))"
      s"""WITH e AS (
         |  SELECT event_id, event_type, value FROM events
         |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
         |r AS (
         |  SELECT event_id, event_type, value,
         |    row_number() OVER (ORDER BY value, event_id) AS rk
         |  FROM e),
         |tg AS (
         |  SELECT value, CAST(min(rk) + max(rk) AS DOUBLE) / 2.0 AS ar, count(*) AS t
         |  FROM r GROUP BY value),
         |ts AS (SELECT sum(t * t * t - t) AS tsum FROM tg),
         |a AS (
         |  SELECT
         |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS n1,
         |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE) AS n2,
         |    ${exactSumSql("CASE WHEN event_type = 'click' THEN ar END")} AS r1
         |  FROM r JOIN (SELECT value, ar FROM tg) USING (value))
         |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  ${round4Sql(u1)} AS u1,
         |  ${round4Sql(s"($u1 - $mu) / nullif(sqrt($sig2), 0.0)")} AS z
         |FROM a, ts""".stripMargin
    },

    "events_wilcoxon" -> {
      val mu = "(nd * (nd + 1.0) / 4.0)"
      val sig2 = "(nd * (nd + 1.0) * (2.0 * nd + 1.0) / 24.0 - CAST(tsum AS DOUBLE) / 48.0)"
      s"""WITH u AS (
         |  SELECT user_id,
         |    ${exactSumSql("CASE WHEN isodow(ts)-1 < 5 THEN value END")} AS sx,
         |    count(CASE WHEN isodow(ts)-1 < 5 THEN value END) AS nx,
         |    ${exactSumSql("CASE WHEN isodow(ts)-1 >= 5 THEN value END")} AS sy,
         |    count(CASE WHEN isodow(ts)-1 >= 5 THEN value END) AS ny
         |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
         |dd0 AS (
         |  SELECT user_id,
         |    ${CleanFunctions.round6Sql(
              "sy / CAST(ny AS DOUBLE) - sx / CAST(nx AS DOUBLE)")} AS dd
         |  FROM u WHERE nx > 0 AND ny > 0),
         |dd1 AS (SELECT user_id, dd, abs(dd) AS absd FROM dd0 WHERE dd <> 0),
         |r AS (SELECT user_id, dd, absd,
         |  row_number() OVER (ORDER BY absd, user_id) AS rk FROM dd1),
         |tg AS (SELECT absd, CAST(min(rk) + max(rk) AS DOUBLE) / 2.0 AS ar,
         |  count(*) AS t FROM r GROUP BY absd),
         |ts AS (SELECT sum(t * t * t - t) AS tsum FROM tg),
         |a AS (SELECT count(*) AS n,
         |  ${exactSumSql("CASE WHEN dd > 0 THEN ar END")} AS wplus
         |  FROM r JOIN (SELECT absd, ar FROM tg) USING (absd)),
         |b AS (SELECT n, wplus, CAST(n AS DOUBLE) AS nd FROM a)
         |SELECT n AS n_pairs, ${round4Sql("wplus")} AS w_plus,
         |  ${round4Sql(s"(wplus - $mu) / nullif(sqrt($sig2), 0.0)")} AS z
         |FROM b, ts""".stripMargin
    },

    "events_mcnemar" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' AND isodow(ts)-1 < 5 THEN 1 ELSE 0 END) AS wd,
         |    max(CASE WHEN event_type = 'purchase' AND isodow(ts)-1 >= 5 THEN 1 ELSE 0 END) AS we
         |  FROM events GROUP BY user_id)
         |SELECT count(*) AS n_users,
         |  count(CASE WHEN wd = 1 AND we = 1 THEN 1 END) AS n_both,
         |  count(CASE WHEN wd = 1 AND we = 0 THEN 1 END) AS b,
         |  count(CASE WHEN wd = 0 AND we = 1 THEN 1 END) AS c,
         |  ${round4Sql(
            "CAST((count(CASE WHEN wd = 1 AND we = 0 THEN 1 END) - count(CASE WHEN wd = 0 AND we = 1 THEN 1 END)) * " +
            "(count(CASE WHEN wd = 1 AND we = 0 THEN 1 END) - count(CASE WHEN wd = 0 AND we = 1 THEN 1 END)) AS DOUBLE) / " +
            "nullif(CAST(count(CASE WHEN wd = 1 AND we = 0 THEN 1 END) + count(CASE WHEN wd = 0 AND we = 1 THEN 1 END) AS DOUBLE), 0.0)")} AS chi2
         |FROM u""".stripMargin,

    "ts_ols_trend" -> {
      val slope = "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)"
      val corr  = CleanFunctions.momentCorrSql("n", "sx", "sy", "sxy", "sxx", "syy")
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |x AS (
         |  SELECT user_id,
         |    CAST((tsu - min(tsu) OVER (PARTITION BY user_id)) // 3600000000 AS DOUBLE) AS x,
         |    value AS y
         |  FROM e),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("x")} AS sx, ${exactSumSql("y")} AS sy,
         |    ${exactSumSql("x * y")} AS sxy, ${exactSumSql("x * x")} AS sxx,
         |    ${exactSumSql("y * y")} AS syy
         |  FROM x GROUP BY user_id)
         |SELECT user_id, CAST(n AS BIGINT) AS n_obs,
         |  ${round4Sql(slope)} AS slope,
         |  ${round4Sql(s"(sy - ($slope) * sx) / n")} AS intercept,
         |  ${round4Sql(s"($corr) * ($corr)")} AS r2
         |FROM m ORDER BY user_id""".stripMargin
    },

    "ts_rolling_skew" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |s AS (
         |  SELECT event_id,
         |    CAST(count(*) OVER w AS DOUBLE) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
         |    CAST(sum(CAST(${round4Sql("value * value")} AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2,
         |    CAST(sum(CAST(${round4Sql("value * value * value")} AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s3,
         |    CAST(sum(CAST(${round4Sql("value * value * value * value")} AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s4
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
         |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
         |m AS (SELECT event_id, n, s1 / n AS mean, s2, s3, s4 FROM s),
         |g AS (SELECT *, greatest(s2 / n - mean * mean, 0.0) AS m2 FROM m)
         |SELECT event_id, CAST(n AS BIGINT) AS n_frame,
         |  ${round4Sql("(s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean) / nullif(sqrt(m2 * m2 * m2), 0.0)")} AS roll_skew,
         |  ${round4Sql("(s4 / n - 4.0 * mean * (s3 / n) + 6.0 * (mean * mean) * (s2 / n) - 3.0 * (mean * mean) * (mean * mean)) / nullif(m2 * m2, 0.0) - 3.0")} AS roll_kurt
         |FROM g ORDER BY event_id""".stripMargin,

    "ts_rolling_corr" -> {
      val corr = CleanFunctions.momentCorrSql("n", "sx", "sy", "sxy", "sxx", "syy")
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT event_id, user_id, tsu, value,
         |    lag(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS y
         |  FROM e),
         |f AS (SELECT * FROM l WHERE y IS NOT NULL),
         |s AS (
         |  SELECT event_id,
         |    CAST(count(*) OVER w AS DOUBLE) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
         |    CAST(sum(CAST(${round4Sql("value * y")} AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(${round4Sql("value * value")} AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(${round4Sql("y * y")} AS DECIMAL(18,6))) OVER w AS DOUBLE) AS syy
         |  FROM f
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
         |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
         |SELECT event_id,
         |  ${round4Sql(s"CASE WHEN n > 1.0 THEN least(greatest($corr, -1.0), 1.0) END")} AS roll_corr
         |FROM s ORDER BY event_id""".stripMargin
    },

    "ts_trimmed_mean" ->
      s"""WITH r AS (
         |  SELECT user_id, value,
         |    row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM events WHERE value IS NOT NULL)
         |SELECT user_id, count(*) AS n_used,
         |  ${round4Sql(CleanFunctions.exactMeanSql("value"))} AS trimmed_mean
         |FROM r WHERE rn > n // 10 AND rn <= n - n // 10
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_perm_entropy" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS tsu, event_id, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT user_id, value,
         |    lag(value, 2) OVER w AS a, lag(value, 1) OVER w AS b
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |t AS (
         |  SELECT user_id,
         |    CAST(a < b AS BIGINT) * 4 + CAST(b < value AS BIGINT) * 2
         |      + CAST(a < value AS BIGINT) AS code
         |  FROM l WHERE a IS NOT NULL AND b IS NOT NULL),
         |c AS (SELECT user_id, code, count(*) AS cnt FROM t GROUP BY 1, 2),
         |g AS (
         |  SELECT user_id, cnt,
         |    CAST(round(((cnt / (sum(cnt) OVER (PARTITION BY user_id))) * ln(cnt / (sum(cnt) OVER (PARTITION BY user_id)))) * 1000000.0) / 1000000.0 + 0.0 AS DECIMAL(18,6)) AS term
         |  FROM c)
         |SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_triples,
         |  ${round4Sql(s"CAST(-sum(term) AS DOUBLE) / ${dlit(math.log(6.0))}")} AS perm_entropy
         |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_variance_ratio" -> {
      val mv1 = CleanFunctions.momentVarSql("n1", "s1", "s11")
      val mvk = CleanFunctions.momentVarSql("nk", "sk", "skk")
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS tsu, event_id, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT user_id,
         |    value - lag(value, 1) OVER w AS d1,
         |    value - lag(value, 4) OVER w AS dk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |a AS (
         |  SELECT user_id,
         |    CAST(count(d1) AS DOUBLE) AS n1, ${exactSumSql("d1")} AS s1,
         |    ${exactSumSql(round4Sql("d1 * d1"))} AS s11,
         |    CAST(count(dk) AS DOUBLE) AS nk, ${exactSumSql("dk")} AS sk,
         |    ${exactSumSql(round4Sql("dk * dk"))} AS skk
         |  FROM l GROUP BY user_id)
         |SELECT user_id, CAST(nk AS BIGINT) AS n_diffs,
         |  ${round4Sql(s"($mvk) / nullif(4.0 * ($mv1), 0.0)")} AS vr
         |FROM a ORDER BY user_id""".stripMargin
    },

    "ts_conformal_width" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS tsu, event_id, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT user_id, abs(value - lag(value, 24)
         |    OVER (PARTITION BY user_id ORDER BY tsu, event_id)) AS v
         |  FROM e),
         |r AS (
         |  SELECT user_id, v,
         |    row_number() OVER (PARTITION BY user_id ORDER BY v) - 1 AS rn0,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM l WHERE v IS NOT NULL),
         |f AS (
         |  SELECT user_id, v, rn0,
         |    CAST(n - 1 AS DOUBLE) * 0.9 AS h,
         |    floor(CAST(n - 1 AS DOUBLE) * 0.9) AS lo,
         |    ceil(CAST(n - 1 AS DOUBLE) * 0.9) AS hi
         |  FROM r
         |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * 0.9)
         |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * 0.9))
         |SELECT user_id,
         |  ${round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(h) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS q90_width
         |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_skew_profile" ->
      s"""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
         |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rk FROM c),
         |t AS (SELECT count(*) AS nk, sum(cnt) AS total FROM c)
         |SELECT max(nk) AS n_keys, CAST(max(total) AS BIGINT) AS total_rows,
         |  max(cnt) AS max_cnt,
         |  min(CASE WHEN rk = (nk + 1) // 2 THEN cnt END) AS p50_cnt,
         |  min(CASE WHEN rk = (9 * nk + 9) // 10 THEN cnt END) AS p90_cnt,
         |  min(CASE WHEN rk = (99 * nk + 99) // 100 THEN cnt END) AS p99_cnt,
         |  ${round4Sql("CAST(max(cnt) AS DOUBLE) / CAST(max(total) AS DOUBLE)")} AS top_share
         |FROM r, t""".stripMargin,

    "lineitem_weighted_median" ->
      s"""WITH li AS (
         |  SELECT l_returnflag, ${round4Sql("l_extendedprice / l_quantity")} AS unit_price,
         |    CAST(l_quantity AS DECIMAL(18,6)) AS w, l_orderkey, l_linenumber
         |  FROM lineitem),
         |c AS (
         |  SELECT l_returnflag, unit_price,
         |    sum(w) OVER (PARTITION BY l_returnflag
         |      ORDER BY unit_price, l_orderkey, l_linenumber
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
         |  FROM li)
         |SELECT l_returnflag, min(unit_price) AS weighted_median
         |FROM c WHERE cumw * 2 >= tot
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "orders_gini" ->
      s"""WITH rev AS (
         |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
         |  FROM orders GROUP BY 1),
         |r AS (
         |  SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS rk FROM rev),
         |a AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(rev) AS tot,
         |    sum(rk * rev) AS rs
         |  FROM r)
         |SELECT CAST(n AS BIGINT) AS n_customers,
         |  ${round4Sql("(2.0 * CAST(rs AS DOUBLE)) / (n * CAST(tot AS DOUBLE)) - (n + 1.0) / n")} AS gini
         |FROM a""".stripMargin,

    "orders_theil" ->
      s"""WITH o AS (
         |  SELECT n_name, o_totalprice AS x
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey),
         |gtot AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |    ${round6Sql(CleanFunctions.exactMeanSql("x"))} AS mu
         |  FROM o),
         |grp AS (
         |  SELECT n_name, count(*) AS n_g,
         |    ${round6Sql(CleanFunctions.exactMeanSql("x"))} AS mu_g
         |  FROM o GROUP BY 1),
         |w AS (
         |  SELECT o.n_name,
         |    ${round4Sql(s"${CleanFunctions.exactSumSql(
            round6Sql("(x / mu_g) * ln(x / mu_g)"))} / count(*)")} AS theil_within
         |  FROM o JOIN grp ON o.n_name = grp.n_name GROUP BY 1),
         |j AS (
         |  SELECT grp.n_name, n_g, mu_g, theil_within,
         |    ${round6Sql("CAST(n_g AS DOUBLE) * mu_g / (n * mu)")} AS share, mu
         |  FROM grp JOIN w ON grp.n_name = w.n_name CROSS JOIN gtot)
         |SELECT n_name, n_g AS n_orders, ${round4Sql("mu_g")} AS mean_price,
         |  share, theil_within,
         |  ${round4Sql("share * ln(mu_g / mu)")} AS between_term
         |FROM j ORDER BY n_name""".stripMargin,

    "ts_durbin_watson" -> {
      val slope = "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)"
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |x AS (
         |  SELECT user_id, event_id, tsu, value,
         |    CAST((tsu - min(tsu) OVER (PARTITION BY user_id)) // 3600000000 AS DOUBLE) AS x
         |  FROM e),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("x")} AS sx, ${exactSumSql("value")} AS sy,
         |    ${exactSumSql("x * value")} AS sxy, ${exactSumSql("x * x")} AS sxx
         |  FROM x GROUP BY user_id),
         |j AS (
         |  SELECT x.user_id, x.event_id, x.tsu,
         |    ${round4Sql(s"x.value - (((sy - ($slope) * sx) / n) + ($slope) * x.x)")} AS res
         |  FROM x JOIN m USING (user_id)),
         |dd AS (
         |  SELECT user_id, res,
         |    res - lag(res) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS d
         |  FROM j)
         |SELECT user_id, count(res) AS n_obs,
         |  ${round4Sql(s"${exactSumSql(round4Sql("d * d"))} / nullif(${exactSumSql(round4Sql("res * res"))}, 0.0)")} AS dw
         |FROM dd GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "ts_theilsen" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, value FROM events
         |  WHERE value IS NOT NULL),
         |d AS (
         |  SELECT user_id, day, ${CleanFunctions.exactMeanSql("value")} AS m
         |  FROM e GROUP BY user_id, day),
         |p AS (
         |  SELECT a.user_id AS user_id, (b.m - a.m) / CAST(b.day - a.day AS DOUBLE) AS v
         |  FROM d a JOIN d b ON a.user_id = b.user_id AND a.day < b.day),
         |r AS (
         |  SELECT user_id, v,
         |    row_number() OVER (PARTITION BY user_id ORDER BY v) - 1 AS rn0,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM p),
         |f AS (
         |  SELECT user_id, v, rn0,
         |    CAST(n - 1 AS DOUBLE) * 0.5 AS h,
         |    floor(CAST(n - 1 AS DOUBLE) * 0.5) AS lo,
         |    ceil(CAST(n - 1 AS DOUBLE) * 0.5) AS hi
         |  FROM r
         |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * 0.5)
         |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * 0.5))
         |SELECT user_id,
         |  ${round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(h) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS theil_slope
         |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_bollinger" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |s AS (
         |  SELECT event_id, value,
         |    CAST(count(*) OVER w AS DOUBLE) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
         |    CAST(sum(CAST(${round4Sql("value * value")} AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
         |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
         |m AS (
         |  SELECT event_id, value, n, s1 / n AS mean,
         |    sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS sd
         |  FROM s),
         |b AS (
         |  SELECT event_id, value, ${round4Sql("mean")} AS bb_mid,
         |    ${round4Sql("mean + 2.0 * sd")} AS bb_upper,
         |    ${round4Sql("mean - 2.0 * sd")} AS bb_lower
         |  FROM m)
         |SELECT event_id, bb_mid, bb_upper, bb_lower,
         |  CAST(CASE WHEN value > bb_upper THEN 1 WHEN value < bb_lower THEN -1
         |       ELSE 0 END AS BIGINT) AS breach
         |FROM b ORDER BY event_id""".stripMargin,

    "ts_rsi" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT event_id, user_id, tsu, value,
         |    value - lag(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS diff
         |  FROM e),
         |f AS (
         |  SELECT event_id, user_id, tsu,
         |    ${round4Sql("greatest(diff, 0.0)")} AS g,
         |    ${round4Sql("greatest(-diff, 0.0)")} AS l
         |  FROM l WHERE diff IS NOT NULL),
         |s AS (
         |  SELECT event_id,
         |    count(*) OVER w AS n_diff,
         |    CAST(sum(CAST(g AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sg,
         |    CAST(sum(CAST(l AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sl
         |  FROM f
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
         |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT event_id, n_diff,
         |  ${round4Sql("100.0 * sg / nullif(sg + sl, 0.0)")} AS rsi
         |FROM s ORDER BY event_id""".stripMargin,

    "ts_spearman" -> {
      val corr = CleanFunctions.momentCorrSql("n", "sx", "sy", "sxy", "sxx", "syy")
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |l AS (
         |  SELECT user_id, value,
         |    lag(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS y
         |  FROM e),
         |f AS (SELECT user_id, value, y FROM l WHERE y IS NOT NULL),
         |r AS (
         |  SELECT user_id,
         |    2 * rank() OVER (PARTITION BY user_id ORDER BY value)
         |      + count(*) OVER (PARTITION BY user_id, value) - 1 AS fx,
         |    2 * rank() OVER (PARTITION BY user_id ORDER BY y)
         |      + count(*) OVER (PARTITION BY user_id, y) - 1 AS fy
         |  FROM f),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(fx) AS DOUBLE) AS sx, CAST(sum(fy) AS DOUBLE) AS sy,
         |    CAST(sum(fx * fy) AS DOUBLE) AS sxy,
         |    CAST(sum(fx * fx) AS DOUBLE) AS sxx,
         |    CAST(sum(fy * fy) AS DOUBLE) AS syy
         |  FROM r GROUP BY user_id)
         |SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
         |  ${round4Sql(s"CASE WHEN n > 1.0 THEN least(greatest($corr, -1.0), 1.0) END")} AS spearman_lag1
         |FROM m ORDER BY user_id""".stripMargin
    },

    "ts_mann_kendall" ->
      s"""WITH daily AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |    ${CleanFunctions.exactMeanSql("value")} AS m
         |  FROM events WHERE value IS NOT NULL GROUP BY user_id, day),
         |s AS (
         |  SELECT a.user_id,
         |    sum(CASE WHEN b.m > a.m THEN 1 WHEN b.m < a.m THEN -1 ELSE 0 END) AS s_stat
         |  FROM daily a JOIN daily b ON a.user_id = b.user_id AND a.day < b.day
         |  GROUP BY a.user_id),
         |nd AS (SELECT user_id, count(*) AS n_days FROM daily GROUP BY user_id),
         |tg AS (SELECT user_id, m, count(*) AS t FROM daily GROUP BY user_id, m),
         |tc AS (SELECT user_id, sum(t * (t - 1) * (2 * t + 5)) AS tcorr FROM tg GROUP BY user_id),
         |v AS (
         |  SELECT s.user_id, n_days, s_stat,
         |    CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tcorr AS DOUBLE) / 18.0 AS var_s
         |  FROM s JOIN nd ON s.user_id = nd.user_id JOIN tc ON s.user_id = tc.user_id)
         |SELECT user_id, n_days, CAST(s_stat AS BIGINT) AS s_stat,
         |  ${round4Sql("var_s")} AS var_s,
         |  ${round4Sql("""CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
         |       WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
         |       ELSE 0.0 END""")} AS mk_z
         |FROM v ORDER BY user_id""".stripMargin,

    "ts_pettitt" ->
      s"""WITH daily AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |    ${CleanFunctions.exactMeanSql("value")} AS m
         |  FROM events WHERE value IS NOT NULL GROUP BY user_id, day),
         |v AS (
         |  SELECT a.user_id, a.day AS di,
         |    sum(CASE WHEN a.m > b.m THEN 1 WHEN a.m < b.m THEN -1 ELSE 0 END) AS v_t
         |  FROM daily a JOIN daily b ON a.user_id = b.user_id AND a.day <> b.day
         |  GROUP BY a.user_id, a.day),
         |u AS (
         |  SELECT user_id, di,
         |    sum(v_t) OVER (PARTITION BY user_id ORDER BY di) AS u_k,
         |    row_number() OVER (PARTITION BY user_id ORDER BY di) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS t_days
         |  FROM v),
         |p AS (
         |  SELECT user_id, di, u_k, t_days,
         |    row_number() OVER (PARTITION BY user_id ORDER BY abs(u_k) DESC, di ASC) AS pk
         |  FROM u WHERE rn < t_days),
         |q AS (
         |  SELECT user_id, t_days, u_k, di,
         |    ${round6Sql("""(6.0 * CAST(abs(u_k) * abs(u_k) AS DOUBLE))
         |      / CAST(t_days * t_days * t_days + t_days * t_days AS DOUBLE)""")} AS pettitt_q
         |  FROM p WHERE pk = 1)
         |SELECT user_id, t_days AS n_days, CAST(abs(u_k) AS BIGINT) AS k_stat,
         |  di AS cp_day, pettitt_q,
         |  CAST(pettitt_q > ${dlit(PettittSigQ)} AS BIGINT) AS significant
         |FROM q ORDER BY user_id""".stripMargin,

    "events_cuped" ->
      s"""WITH e AS (
         |  SELECT user_id, value,
         |    epoch_us(ts) // 86400000000 <= ${java.time.LocalDate.of(2024, 1, 15).toEpochDay} AS pre
         |  FROM events WHERE value IS NOT NULL),
         |x AS (SELECT user_id, ${round4Sql(CleanFunctions.exactMeanSql("value"))} AS x_pre
         |      FROM e WHERE pre GROUP BY user_id),
         |y AS (SELECT user_id, ${round4Sql(CleanFunctions.exactMeanSql("value"))} AS y_post
         |      FROM e WHERE NOT pre GROUP BY user_id),
         |xy AS (SELECT x.user_id, x_pre, y_post FROM x JOIN y ON x.user_id = y.user_id),
         |m AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |    ${CleanFunctions.exactSumSql("x_pre")} AS sx,
         |    ${CleanFunctions.exactSumSql("y_post")} AS sy,
         |    ${CleanFunctions.exactSumSql(round4Sql("x_pre * y_post"))} AS sxy,
         |    ${CleanFunctions.exactSumSql(round4Sql("x_pre * x_pre"))} AS sxx
         |  FROM xy),
         |t AS (
         |  SELECT xy.*, (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS theta,
         |    sx / n AS mx
         |  FROM xy, m)
         |SELECT user_id, x_pre, y_post,
         |  ${round4Sql("y_post - theta * (x_pre - mx)")} AS y_cuped
         |FROM t ORDER BY user_id""".stripMargin,

    "orders_cohort_ltv" ->
      s"""WITH o AS (
         |  SELECT o_custkey, o_totalprice,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mo
         |  FROM orders),
         |coh AS (SELECT o_custkey, min(mo) AS cohort_mo FROM o GROUP BY 1),
         |cells AS (
         |  SELECT cohort_mo, mo - cohort_mo AS age,
         |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
         |  FROM o JOIN coh USING (o_custkey) GROUP BY 1, 2),
         |sz AS (SELECT cohort_mo, count(*) AS cohort_users FROM coh GROUP BY 1),
         |cum AS (
         |  SELECT cohort_mo, age, rev,
         |    sum(rev) OVER (PARTITION BY cohort_mo ORDER BY age
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
         |  FROM cells)
         |SELECT cohort_mo, age, cohort_users,
         |  ${round4Sql("CAST(rev AS DOUBLE)")} AS rev,
         |  ${round4Sql("CAST(cum_rev AS DOUBLE) / CAST(cohort_users AS DOUBLE)")} AS ltv_per_user
         |FROM cum JOIN sz USING (cohort_mo)
         |ORDER BY cohort_mo, age""".stripMargin,

    "events_ab_power" ->
      s"""WITH m AS (
         |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("value")} AS sx,
         |    ${exactSumSql(round4Sql("value * value"))} AS sxx
         |  FROM events WHERE value IS NOT NULL GROUP BY 1),
         |v AS (
         |  SELECT event_type, n, sx / n AS mean,
         |    ${CleanFunctions.momentVarSql("n", "sx", "sxx")} AS var
         |  FROM m)
         |SELECT event_type, CAST(n AS BIGINT) AS n_obs,
         |  ${round4Sql("mean")} AS mean, ${round4Sql("var")} AS variance,
         |  CAST(ceil(16.0 * var / ((0.05 * mean) * (0.05 * mean))) AS BIGINT) AS n_required
         |FROM v ORDER BY event_type""".stripMargin,

    "ts_kpss" -> {
      val kp = round4Sql("ss2 / nullif(nd * nd * varp, 0.0)")
      s"""WITH st AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("value")} AS sx,
         |    ${exactSumSql("value * value")} AS sxx
         |  FROM events WHERE value IS NOT NULL GROUP BY 1),
         |cum AS (
         |  SELECT e.user_id, st.n, st.sx, st.sxx,
         |    CAST(sum(CAST((round((e.value - st.sx / st.n) * 1000000.0) / 1000000.0) AS DECIMAL(18,6)))
         |      OVER (PARTITION BY e.user_id ORDER BY epoch_us(e.ts), e.event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cs
         |  FROM events e JOIN st ON e.user_id = st.user_id
         |  WHERE e.value IS NOT NULL),
         |a AS (
         |  SELECT user_id, max(n) AS nd, max(sx) AS msx, max(sxx) AS msxx,
         |    CAST(sum(CAST(${round4Sql("cs * cs")} AS DECIMAL(28,6))) AS DOUBLE) AS ss2
         |  FROM cum GROUP BY 1),
         |v AS (
         |  SELECT user_id, nd, ss2,
         |    greatest((msxx - msx * msx / nd) / nd, 0.0) AS varp
         |  FROM a)
         |SELECT user_id, CAST(nd AS BIGINT) AS n_obs, $kp AS kpss,
         |  CAST(CASE WHEN $kp > 0.463 THEN 1 ELSE 0 END AS BIGINT) AS nonstationary
         |FROM v ORDER BY user_id""".stripMargin
    },

    "ts_hurst" -> {
      val round6 = (x: String) => s"(round(($x) * 1000000.0) / 1000000.0 + 0.0)"
      def rsCte(sz: Int) =
        s"""ch$sz AS (SELECT user_id, rn, value, (rn - 1) // $sz AS chunk FROM base),
           |st$sz AS (
           |  SELECT user_id, chunk, count(*) AS cn,
           |    ${exactSumSql("value")} AS sx,
           |    ${exactSumSql("value * value")} AS sxx
           |  FROM ch$sz GROUP BY 1, 2 HAVING count(*) = $sz),
           |cd$sz AS (
           |  SELECT c.user_id, c.chunk, s.cn, s.sx, s.sxx,
           |    CAST(sum(CAST(${round6("c.value - s.sx / CAST(s.cn AS DOUBLE)")} AS DECIMAL(18,6)))
           |      OVER (PARTITION BY c.user_id, c.chunk ORDER BY c.rn
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cd
           |  FROM ch$sz c JOIN st$sz s ON c.user_id = s.user_id AND c.chunk = s.chunk),
           |rs$sz AS (
           |  SELECT user_id,
           |    ${round4Sql(s"${exactSumSql("rsv")} / count(rsv)")} AS rs_$sz
           |  FROM (
           |    SELECT user_id, chunk,
           |      ${round4Sql(s"(max(cd) - min(cd)) / nullif(${CleanFunctions.momentStdSql("CAST(max(cn) AS DOUBLE)", "max(sx)", "max(sxx)")}, 0.0)")} AS rsv
           |    FROM cd$sz GROUP BY user_id, chunk)
           |  GROUP BY user_id)""".stripMargin
      s"""WITH base AS (
         |  SELECT user_id, event_id, value,
         |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
         |  FROM events WHERE value IS NOT NULL),
         |${rsCte(8)},
         |${rsCte(16)},
         |${rsCte(32)}
         |SELECT r8.user_id, rs_8, rs_16, rs_32,
         |  ${round4Sql(s"(${round6("ln(rs_32)")} - ${round6("ln(rs_8)")}) / ${dlit(2.0 * math.log(2.0))}")} AS hurst
         |FROM rs8 r8 JOIN rs16 ON r8.user_id = rs16.user_id
         |JOIN rs32 ON r8.user_id = rs32.user_id
         |ORDER BY r8.user_id""".stripMargin
    },

    "events_did" ->
      s"""WITH e AS (
         |  SELECT value,
         |    epoch_us(ts) // 86400000000 <= ${java.time.LocalDate.of(2024, 1, 15).toEpochDay} AS pre,
         |    user_id % 2 = 0 AS treated
         |  FROM events WHERE value IS NOT NULL),
         |g AS (
         |  SELECT treated, pre, ${round4Sql(CleanFunctions.exactMeanSql("value"))} AS m
         |  FROM e GROUP BY 1, 2),
         |p AS (
         |  SELECT
         |    min(CASE WHEN treated AND pre THEN m END) AS t_pre,
         |    min(CASE WHEN treated AND NOT pre THEN m END) AS t_post,
         |    min(CASE WHEN NOT treated AND pre THEN m END) AS c_pre,
         |    min(CASE WHEN NOT treated AND NOT pre THEN m END) AS c_post
         |  FROM g)
         |SELECT t_pre, t_post, c_pre, c_post,
         |  ${round4Sql("(t_post - t_pre) - (c_post - c_pre)")} AS did
         |FROM p""".stripMargin,

    "ts_granger" -> {
      def dsum(x: String) = s"CAST(sum(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
      s"""WITH h AS (
         |  SELECT user_id, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS b,
         |    ${CleanFunctions.exactMeanSql("value")} AS v
         |  FROM events WHERE value IS NOT NULL AND user_id % 10 = 0 GROUP BY 1, 2),
         |r AS (
         |  SELECT y.user_id AS yu, xl.user_id AS xu,
         |    y.v AS t, yl.v AS z1, xl.v AS z2
         |  FROM h y
         |  JOIN h yl ON yl.user_id = y.user_id AND yl.b = y.b - 86400000000
         |  JOIN h xl ON xl.b = y.b - 86400000000 AND xl.user_id <> y.user_id),
         |m AS (
         |  SELECT yu, xu, CAST(count(*) AS DOUBLE) AS n,
         |    ${dsum("z1")} AS s1, ${dsum("z2")} AS s2, ${dsum("t")} AS st,
         |    ${dsum("z1 * z1")} AS s11, ${dsum("z2 * z2")} AS s22,
         |    ${dsum("z1 * z2")} AS s12, ${dsum("z1 * t")} AS s1t,
         |    ${dsum("z2 * t")} AS s2t, ${dsum("t * t")} AS stt
         |  FROM r GROUP BY 1, 2 HAVING CAST(count(*) AS DOUBLE) > 3.0),
         |c AS (
         |  SELECT yu, xu, n,
         |    s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
         |    s12 - s1 * s2 / n AS c12, s1t - s1 * st / n AS c1t,
         |    s2t - s2 * st / n AS c2t, stt - st * st / n AS ctt
         |  FROM m),
         |bb AS (
         |  SELECT *, c11 * c22 - c12 * c12 AS det FROM c),
         |b AS (
         |  SELECT *,
         |    (c1t * c22 - c2t * c12) / nullif(det, 0.0) AS b1,
         |    (c2t * c11 - c1t * c12) / nullif(det, 0.0) AS b2
         |  FROM bb),
         |f AS (
         |  SELECT *, ctt - b1 * c1t - b2 * c2t AS rssf,
         |    ctt - c1t * c1t / nullif(c11, 0.0) AS rssr
         |  FROM b)
         |SELECT yu, xu, CAST(n AS BIGINT) AS n_obs,
         |  ${round4Sql("b2")} AS x_coef,
         |  ${round4Sql("greatest((rssr - rssf) * (n - 3.0) / nullif(rssf, 0.0), 0.0)")} AS granger_f
         |FROM f ORDER BY yu, xu""".stripMargin
    },

    "orders_interarrival" ->
      s"""WITH g AS (
         |  SELECT o_custkey,
         |    ${round4Sql(
              """CAST(epoch_us(o_orderdate) - lag(epoch_us(o_orderdate)) OVER (
         |      PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey) AS DOUBLE)
         |      / 86400000000.0""")} AS gap
         |  FROM orders),
         |m AS (
         |  SELECT o_custkey, count(*) AS n_gaps,
         |    ${exactSumSql("gap")} AS sg,
         |    ${exactSumSql(round4Sql("gap * gap"))} AS sgg
         |  FROM g WHERE gap IS NOT NULL GROUP BY 1 HAVING count(*) >= 2),
         |t AS (SELECT *, sg / CAST(n_gaps AS DOUBLE) AS mean_gap FROM m)
         |SELECT o_custkey, n_gaps, ${round4Sql("mean_gap")} AS mean_gap_days,
         |  ${round4Sql(s"${CleanFunctions.momentStdSql("CAST(n_gaps AS DOUBLE)", "sg", "sgg")} / nullif(mean_gap, 0.0)")} AS cv
         |FROM t ORDER BY o_custkey""".stripMargin,

    "ts_ljung_box" -> {
      val round6 = (x: String) => s"(round(($x) * 1000000.0) / 1000000.0 + 0.0)"
      val term = (k: Int) =>
        round6(s"(num$k / nullif(den, 0.0)) * (num$k / nullif(den, 0.0)) / (nd - $k.0)")
      val q = round4Sql(s"nd * (nd + 2.0) * (${(1 to 5).map(term).mkString(" + ")})")
      s"""WITH st AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("value")} AS sx
         |  FROM events WHERE value IS NOT NULL GROUP BY 1),
         |dv AS (
         |  SELECT e.user_id, st.n, epoch_us(e.ts) AS tsu, e.event_id,
         |    ${round6("e.value - st.sx / st.n")} AS dev
         |  FROM events e JOIN st USING (user_id) WHERE e.value IS NOT NULL),
         |lg AS (
         |  SELECT user_id, n, dev,
         |    ${(1 to 5).map(k => s"lag(dev, $k) OVER w AS l$k").mkString(", ")}
         |  FROM dv WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |a AS (
         |  SELECT user_id, max(n) AS nd,
         |    ${exactSumSql(round4Sql("dev * dev"))} AS den,
         |    ${(1 to 5).map(k => s"${exactSumSql(round4Sql(s"dev * l$k"))} AS num$k").mkString(", ")}
         |  FROM lg GROUP BY 1)
         |SELECT user_id, CAST(nd AS BIGINT) AS n_obs, $q AS lb_q,
         |  CAST(CASE WHEN $q > 11.07 THEN 1 ELSE 0 END AS BIGINT) AS autocorrelated
         |FROM a ORDER BY user_id""".stripMargin
    },

    "ts_adf" -> {
      val sxxC = "(sxx - sx * sx / n)"
      val sxyC = "(sxy - sx * sy / n)"
      val syyC = "(syy - sy * sy / n)"
      val beta = s"($sxyC / nullif($sxxC, 0.0))"
      val rss  = s"greatest($syyC - $beta * $sxyC, 0.0)"
      val t    = round4Sql(s"$beta / nullif(sqrt($rss / ((n - 2.0) * $sxxC)), 0.0)")
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS tsu, event_id, value FROM events
         |  WHERE value IS NOT NULL),
         |p AS (
         |  SELECT user_id, value,
         |    lag(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS xl
         |  FROM e),
         |pp AS (SELECT user_id, xl, value - xl AS dy FROM p WHERE xl IS NOT NULL),
         |m AS (
         |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${exactSumSql("xl")} AS sx, ${exactSumSql("dy")} AS sy,
         |    ${exactSumSql(round4Sql("xl * dy"))} AS sxy,
         |    ${exactSumSql(round4Sql("xl * xl"))} AS sxx,
         |    ${exactSumSql(round4Sql("dy * dy"))} AS syy
         |  FROM pp GROUP BY 1)
         |SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
         |  ${round4Sql(beta)} AS beta, $t AS adf_t,
         |  CAST(CASE WHEN $t > -2.86 THEN 1 ELSE 0 END AS BIGINT) AS unit_root
         |FROM m ORDER BY user_id""".stripMargin
    },

    "ts_coint" -> {
      val dsum = (x: String) => s"CAST(sum(CAST(($x) AS DECIMAL(28,6))) AS DOUBLE)"
      val gam  = "(sg / nullif(sll, 0.0))"
      val rss  = s"greatest(sdd - $gam * sg, 0.0)"
      val t    = round4Sql(s"$gam / nullif(sqrt($rss / ((np - 1.0) * sll)), 0.0)")
      s"""WITH h AS (
         |  SELECT user_id, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS b,
         |    ${CleanFunctions.exactMeanSql("value")} AS v
         |  FROM events WHERE value IS NOT NULL AND user_id % 10 = 0 GROUP BY 1, 2),
         |r AS (
         |  SELECT y.user_id AS yu, x.user_id AS xu, y.b AS b,
         |    y.v AS yv, x.v AS xv
         |  FROM h y JOIN h x ON x.b = y.b AND x.user_id <> y.user_id),
         |m AS (
         |  SELECT yu, xu, CAST(count(*) AS DOUBLE) AS n,
         |    ${dsum("xv")} AS sx, ${dsum("yv")} AS sy,
         |    ${dsum("xv * yv")} AS sxy, ${dsum("xv * xv")} AS sxx
         |  FROM r GROUP BY 1, 2 HAVING CAST(count(*) AS DOUBLE) > 4.0),
         |j AS (
         |  SELECT r.yu, r.xu, r.b, r.yv, r.xv, n, sx, sy,
         |    (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0.0) AS beta
         |  FROM r JOIN m USING (yu, xu)),
         |e AS (
         |  SELECT yu, xu, b, beta,
         |    ${round4Sql("yv - (((sy - beta * sx) / n) + beta * xv)")} AS e
         |  FROM j),
         |l AS (
         |  SELECT yu, xu, b, beta, e, lag(e) OVER w AS el, lag(b) OVER w AS bl
         |  FROM e WINDOW w AS (PARTITION BY yu, xu ORDER BY b)),
         |p AS (
         |  SELECT yu, xu, beta, el, e - el AS de
         |  FROM l WHERE bl = b - 86400000000),
         |df AS (
         |  SELECT yu, xu, max(beta) AS mb, CAST(count(*) AS DOUBLE) AS np,
         |    ${exactSumSql(round4Sql("el * de"))} AS sg,
         |    ${exactSumSql(round4Sql("el * el"))} AS sll,
         |    ${exactSumSql(round4Sql("de * de"))} AS sdd
         |  FROM p GROUP BY 1, 2 HAVING CAST(count(*) AS DOUBLE) > 3.0)
         |SELECT yu, xu, CAST(np AS BIGINT) AS n_obs,
         |  ${round4Sql("mb")} AS beta, $t AS eg_t,
         |  CAST(CASE WHEN $t < -3.37 THEN 1 ELSE 0 END AS BIGINT) AS cointegrated
         |FROM df ORDER BY yu, xu""".stripMargin
    },

    "ts_runs_test" -> {
      val z = "((CAST(n_runs AS DOUBLE) - mu) / nullif(sqrt((mu - 1.0) * (mu - 2.0) / (nn - 1.0)), 0.0))"
      val z4 = round4Sql(z)
      s"""WITH r AS (
         |  SELECT user_id, value AS v,
         |         row_number() OVER (PARTITION BY user_id ORDER BY value) - 1 AS rn0,
         |         count(*) OVER (PARTITION BY user_id) AS n
         |  FROM events WHERE value IS NOT NULL),
         |f AS (
         |  SELECT user_id, v, rn0,
         |         CAST(n - 1 AS DOUBLE) * 0.5 AS h,
         |         floor(CAST(n - 1 AS DOUBLE) * 0.5) AS lo,
         |         ceil(CAST(n - 1 AS DOUBLE) * 0.5) AS hi
         |  FROM r
         |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * 0.5)
         |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * 0.5)),
         |med AS (
         |  SELECT user_id,
         |    ${round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(h) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS med
         |  FROM f GROUP BY user_id),
         |sg AS (
         |  SELECT e.user_id, CAST(e.value > m.med AS BIGINT) AS sgn,
         |         lag(CAST(e.value > m.med AS BIGINT))
         |           OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS prev
         |  FROM events e JOIN med m USING (user_id)
         |  WHERE e.value IS NOT NULL AND e.value <> m.med),
         |g AS (
         |  SELECT user_id,
         |    count(CASE WHEN sgn = 1 THEN 1 END) AS n_pos,
         |    count(CASE WHEN sgn = 0 THEN 1 END) AS n_neg,
         |    count(CASE WHEN prev IS NOT NULL AND prev <> sgn THEN 1 END) + 1 AS n_runs
         |  FROM sg GROUP BY user_id),
         |zz AS (
         |  SELECT user_id, n_pos, n_neg, n_runs,
         |    2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) /
         |      (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE)) + 1.0 AS mu,
         |    CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE) AS nn
         |  FROM g)
         |SELECT user_id, n_pos, n_neg, n_runs, $z4 AS z,
         |  CAST((abs($z4) <= 1.96) AS BIGINT) AS is_random
         |FROM zz ORDER BY user_id""".stripMargin
    },

    "ts_ar2_forecast" -> {
      def mom(k: Int) =
        s"""CAST(count(CASE WHEN y$k IS NOT NULL THEN 1 END) AS DOUBLE) AS n$k,
           |    CAST(sum(CASE WHEN y$k IS NOT NULL THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS sx$k,
           |    CAST(sum(CASE WHEN y$k IS NOT NULL THEN CAST(y$k AS DECIMAL(28,6)) END) AS DOUBLE) AS sy$k,
           |    CAST(sum(CASE WHEN y$k IS NOT NULL THEN CAST(value * y$k AS DECIMAL(28,6)) END) AS DOUBLE) AS sxy$k,
           |    CAST(sum(CASE WHEN y$k IS NOT NULL THEN CAST(value * value AS DECIMAL(28,6)) END) AS DOUBLE) AS sxx$k,
           |    CAST(sum(CASE WHEN y$k IS NOT NULL THEN CAST(y$k * y$k AS DECIMAL(28,6)) END) AS DOUBLE) AS syy$k""".stripMargin
      def corrOf(k: Int) = round4Sql(CleanFunctions.momentCorrSql(
        s"n$k", s"sx$k", s"sy$k", s"sxy$k", s"sxx$k", s"syy$k"))
      s"""WITH e AS (
         |  SELECT user_id, ts, event_id, value,
         |    lag(value) OVER w AS y1, lag(value, 2) OVER w AS y2
         |  FROM events WHERE value IS NOT NULL
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |m AS (
         |  SELECT user_id,
         |    CAST(count(*) AS DOUBLE) AS n0,
         |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sx0,
         |    ${mom(1)},
         |    ${mom(2)}
         |  FROM e GROUP BY user_id),
         |rr AS (
         |  SELECT user_id, n0, sx0, ${corrOf(1)} AS r1, ${corrOf(2)} AS r2
         |  FROM m),
         |ph AS (
         |  SELECT user_id, n0, sx0, r1, r2,
         |    (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0) AS phi2
         |  FROM rr),
         |p2 AS (SELECT *, r1 * (1.0 - phi2) AS phi1 FROM ph),
         |lv AS (
         |  SELECT user_id,
         |    max(CASE WHEN rk = 1 THEN value END) AS x1,
         |    max(CASE WHEN rk = 2 THEN value END) AS x2
         |  FROM (SELECT user_id, value, row_number() OVER
         |          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
         |        FROM events WHERE value IS NOT NULL)
         |  WHERE rk <= 2 GROUP BY user_id)
         |SELECT p.user_id, CAST(p.n0 AS BIGINT) AS n_rows,
         |  ${round4Sql("p.phi1")} AS phi1, ${round4Sql("p.phi2")} AS phi2,
         |  ${round4Sql("p.sx0 / p.n0 + p.phi1 * (l.x1 - p.sx0 / p.n0) + p.phi2 * (l.x2 - p.sx0 / p.n0)")} AS forecast_1,
         |  ${round4Sql("1.0 - p.phi1 * p.r1 - p.phi2 * p.r2")} AS innov_var_frac
         |FROM p2 p JOIN lv l USING (user_id) ORDER BY p.user_id""".stripMargin
    },

    "events_survival_km" ->
      s"""WITH du AS (
         |  SELECT user_id, min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY user_id),
         |g AS (SELECT max(last_us) AS gmax FROM du),
         |d0 AS (
         |  SELECT (last_us - first_us) // 3600000000 AS dur_h,
         |         CASE WHEN last_us <= gmax - 43200000000 THEN 1 ELSE 0 END AS observed
         |  FROM du, g),
         |t AS (
         |  SELECT dur_h, count(CASE WHEN observed = 1 THEN 1 END) AS d, count(*) AS m
         |  FROM d0 GROUP BY dur_h),
         |r AS (
         |  SELECT a.dur_h, a.d, a.m, CAST(sum(b.m) AS BIGINT) AS n_risk
         |  FROM t a JOIN t b ON b.dur_h >= a.dur_h
         |  GROUP BY a.dur_h, a.d, a.m),
         |f AS (
         |  SELECT dur_h, d, m, n_risk,
         |    CASE WHEN d < n_risk THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) * 1000000.0) / 1000000.0 + 0.0 AS DECIMAL(18,6)) END AS lnf,
         |    CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS iszero
         |  FROM r),
         |s AS (
         |  SELECT a.dur_h, a.d, a.m, a.n_risk,
         |    sum(b.lnf) AS lnsum, sum(b.iszero) AS zc
         |  FROM f a JOIN f b ON b.dur_h <= a.dur_h
         |  GROUP BY a.dur_h, a.d, a.m, a.n_risk)
         |SELECT dur_h AS t_hours, n_risk, d AS d_events, m - d AS censored,
         |  CASE WHEN zc > 0 THEN 0.0
         |       ELSE ${round4Sql("exp(CAST(lnsum AS DOUBLE))")} END AS survival
         |FROM s WHERE d > 0 ORDER BY t_hours""".stripMargin,

    "events_nelson_aalen" ->
      s"""WITH du AS (
         |  SELECT user_id, min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY user_id),
         |g AS (SELECT max(last_us) AS gmax FROM du),
         |d0 AS (
         |  SELECT (last_us - first_us) // 3600000000 AS dur_h,
         |         CASE WHEN last_us <= gmax - 43200000000 THEN 1 ELSE 0 END AS observed
         |  FROM du, g),
         |t AS (
         |  SELECT dur_h, count(CASE WHEN observed = 1 THEN 1 END) AS d, count(*) AS m
         |  FROM d0 GROUP BY dur_h),
         |r AS (
         |  SELECT a.dur_h, a.d, a.m, CAST(sum(b.m) AS BIGINT) AS n_risk
         |  FROM t a JOIN t b ON b.dur_h >= a.dur_h
         |  GROUP BY a.dur_h, a.d, a.m),
         |f AS (
         |  SELECT dur_h, d, m, n_risk,
         |    CAST(${CleanFunctions.round6Sql("CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)")} AS DECIMAL(18,6)) AS hterm,
         |    CAST(${CleanFunctions.round6Sql("CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))")} AS DECIMAL(18,6)) AS vterm
         |  FROM r),
         |s AS (
         |  SELECT a.dur_h, a.d, a.m, a.n_risk,
         |    sum(b.hterm) AS hsum, sum(b.vterm) AS vsum
         |  FROM f a JOIN f b ON b.dur_h <= a.dur_h
         |  GROUP BY a.dur_h, a.d, a.m, a.n_risk)
         |SELECT dur_h AS t_hours, n_risk, d AS d_events,
         |  ${round4Sql("CAST(hsum AS DOUBLE)")} AS cum_hazard,
         |  ${round4Sql("CAST(vsum AS DOUBLE)")} AS hazard_var
         |FROM s WHERE d > 0 ORDER BY t_hours""".stripMargin,

    "events_cms_topk" -> CmsOracleSql,

    // The streaming cell fold builds the SAME counters as the batch scan
    // (shared Catalyst hash expressions + shared cmsAudit downstream), so
    // its oracle is the batch oracle verbatim.
    "streaming_cms_topk" -> CmsOracleSql,

    "events_ks_test" -> {
      val r6 = CleanFunctions.round6Sql _
      val crit = "CAST('1.358' AS DOUBLE) * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE))"
      s"""WITH e AS (SELECT event_type, value FROM events
         |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
         |per AS (SELECT value,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM e GROUP BY value),
         |tot AS (SELECT
         |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |  FROM e),
         |cdf AS (SELECT
         |  sum(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS k1,
         |  sum(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS k2
         |  FROM per),
         |g AS (SELECT n1, n2,
         |  max(abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |          CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS d
         |  FROM cdf, tot GROUP BY n1, n2)
         |SELECT n1, n2, ${r6("d")} AS ks_d, ${r6(crit)} AS crit,
         |  CAST(CASE WHEN ${r6("d")} > ${r6(crit)} THEN 1 ELSE 0 END AS BIGINT) AS reject
         |FROM g""".stripMargin
    },

    "events_entropy_rate" -> {
      val r6 = CleanFunctions.round6Sql _
      s"""WITH p AS (SELECT user_id,
         |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         |  event_type AS cur FROM events),
         |c AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cij
         |  FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
         |f AS (SELECT prev, CAST(sum(cij) AS BIGINT) AS ci FROM c GROUP BY 1),
         |nn AS (SELECT CAST(sum(cij) AS BIGINT) AS n FROM c),
         |ht AS (SELECT ${r6("(CAST(cij AS DOUBLE) / CAST(nn.n AS DOUBLE)) * ln(CAST(cij AS DOUBLE) / CAST(ci AS DOUBLE))")} AS t
         |  FROM c JOIN f ON c.prev = f.prev, nn),
         |h0t AS (SELECT ${r6("(CAST(ci AS DOUBLE) / CAST(nn.n AS DOUBLE)) * ln(CAST(ci AS DOUBLE) / CAST(nn.n AS DOUBLE))")} AS t0
         |  FROM f, nn)
         |SELECT (SELECT n FROM nn) AS n_transitions,
         |  ${r6(s"-(SELECT ${CleanFunctions.exactSumSql("t")} FROM ht)")} AS entropy_rate,
         |  ${r6(s"-(SELECT ${CleanFunctions.exactSumSql("t0")} FROM h0t)")} AS marginal_entropy,
         |  ${r6(s"${r6(s"-(SELECT ${CleanFunctions.exactSumSql("t0")} FROM h0t)")} - ${r6(s"-(SELECT ${CleanFunctions.exactSumSql("t")} FROM ht)")}")} AS info_gain""".stripMargin
    },

    "lineitem_anova" -> {
      val r6 = CleanFunctions.round6Sql _
      val ssb = "(b - s * s / CAST(n AS DOUBLE))"
      val ssw = "(ss - b)"
      val f = s"(($ssb / CAST(k - 1 AS DOUBLE)) / ($ssw / CAST(n - k AS DOUBLE)))"
      s"""WITH g AS (SELECT l_returnflag AS grp,
         |  CAST(count(*) AS BIGINT) AS ng,
         |  ${CleanFunctions.exactSumSql("l_extendedprice / 1000.0")} AS sg,
         |  ${CleanFunctions.exactSumSql(r6("(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)"))} AS ssg
         |  FROM lineitem GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |  CAST(sum(ng) AS BIGINT) AS n,
         |  ${CleanFunctions.exactSumSql("sg")} AS s,
         |  ${CleanFunctions.exactSumSql("ssg")} AS ss,
         |  ${CleanFunctions.exactSumSql(r6("sg * sg / CAST(ng AS DOUBLE)"))} AS b
         |  FROM g)
         |SELECT k, n,
         |  ${CleanFunctions.round4Sql(ssb)} AS ssb,
         |  ${CleanFunctions.round4Sql(ssw)} AS ssw,
         |  ${r6(f)} AS f_stat
         |FROM t""".stripMargin
    }
    )

  /** The battery oracle composes the two production test oracles
    * verbatim (each referenced once, so plain subqueries suffice).
    */
  val oracleSql: Map[String, String] = baseOracleSql +
    ("ts_stationarity_battery" ->
      s"""WITH adf AS (SELECT user_id, adf_t, unit_root
         |  FROM (${baseOracleSql("ts_adf")}) qa),
         |kp AS (SELECT user_id, kpss, nonstationary
         |  FROM (${baseOracleSql("ts_kpss")}) qk)
         |SELECT adf.user_id, adf_t, unit_root, kpss, nonstationary,
         |  CASE WHEN unit_root = 0 AND nonstationary = 0 THEN 'stationary'
         |       WHEN unit_root = 1 AND nonstationary = 1 THEN 'unit_root'
         |       WHEN unit_root = 0 AND nonstationary = 1 THEN 'trend_stationary'
         |       ELSE 'inconclusive' END AS verdict
         |FROM adf JOIN kp ON adf.user_id = kp.user_id
         |ORDER BY adf.user_id""".stripMargin)
}
