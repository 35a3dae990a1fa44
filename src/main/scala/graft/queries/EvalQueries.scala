package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.CleanFunctions
import graft.functions.CleanFunctions.{exactSum, exactSumSql, round4, round4Sql, round6, round6Sql}
import graft.operators.StatsOps
import graft.sources.Tables
import graft.streaming.StreamingAnomaly

/** Model-evaluation and association diagnostics — the metrics layer a
  * training-data pipeline runs over scored/labelled events: ROC AUC,
  * probability calibration, mutual information, Cramér's V, weighted
  * HITS, and declared-functional-dependency audits. The reference stops
  * at detection (main.py:221-230 is a placeholder); evaluating a
  * detector's scores against outcomes is the step a production pipeline
  * adds next, so these are first-class engine operators here.
  *
  * Scale notes: every metric reduces to grouped integer counts plus a
  * bounded ordered pass — the AUC rank prefix runs through
  * [[StatsOps.bandedPrefixSums]] (two-level, no single-partition
  * exchange), the association matrices are O(cells) aggregates, and the
  * HITS iterations touch O(edges) per round with O(nodes) state.
  * Parity: rank arithmetic stays in INTEGERS until one final division
  * (2x-scaled average ranks are exact longs); chi-square / MI terms are
  * 6dp-quantized before their DECIMAL sum, so partial order never
  * drifts.
  */
object EvalQueries {

  /** One-vs-rest positive/negative counts don't change with banding:
    * banded prefix sums of integers equal the sequential scan exactly.
    */
  private val AucScoreCol = "value"

  /** GARCH(1,1) pinned parameters for ts_garch_vol: persistence
    * α+β=0.95, unconditional variance ω/(1−α−β)=4000 ≈ the events
    * return variance (value is ~exp(50), diffs have σ≈65).
    */
  private val GarchOmega = 200.0
  private val GarchAlpha = 0.10
  private val GarchBeta = 0.85
  private val GarchUncond = GarchOmega / (1.0 - GarchAlpha - GarchBeta)

  /** (pair name, column A expr, column B expr) for the association
    * matrices — both engines derive the same integer categories.
    */
  private def assocPairs: Seq[(String, Column, Column)] = Seq(
    ("type_x_dow", col("event_type"), weekday(col("ts")).cast(LongType).cast("string")),
    ("type_x_hourband", col("event_type"), (hour(col("ts")).cast(LongType) / 6L).cast(LongType).cast("string")),
    ("dow_x_hourband", weekday(col("ts")).cast(LongType).cast("string"),
      (hour(col("ts")).cast(LongType) / 6L).cast(LongType).cast("string")))

  private val assocPairsSql: Seq[(String, String, String)] = Seq(
    ("type_x_dow", "event_type", "CAST(isodow(ts)-1 AS VARCHAR)"),
    ("type_x_hourband", "event_type", "CAST(hour(ts)//6 AS VARCHAR)"),
    ("dow_x_hourband", "CAST(isodow(ts)-1 AS VARCHAR)", "CAST(hour(ts)//6 AS VARCHAR)"))

  /** Declared functional-dependency candidates audited by dq_fd_audit:
    * (fd name, table, lhs column, rhs column). Declared-set audit (the
    * production shape: schema contracts name the FDs to enforce), not
    * open discovery — discovery is this same aggregate over the lattice.
    */
  private val FdCandidates: Seq[(String, String, String, String)] = Seq(
    ("orderkey_determines_custkey", "orders", "o_orderkey", "o_custkey"),
    ("custkey_determines_priority", "orders", "o_custkey", "o_orderpriority"),
    ("partkey_determines_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("suppkey_determines_returnflag", "lineitem", "l_suppkey", "l_returnflag"))

  private val HitsIters = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROC AUC per event type, one-vs-rest, scored by `value` — the
    // rank-statistic identity AUC = (R+ - nP(nP+1)/2)/(nP*nN) with
    // midrank tie handling, which is how AUC is computed at scale (no
    // threshold sweep, no per-point curve). The global rank prefix runs
    // over DISTINCT score values (one grouped agg first), through the
    // banded two-level prefix — never a single-partition window. ALL
    // rank arithmetic is integer: rank2 = 2*midrank = 2*(cum-n)+(n+1)
    // is a BIGINT, the per-type rank sum is a BIGINT, and AUC is ONE
    // division of integers — bit-exact on any engine, any partitioning.
    "events_roc_auc" -> { (s, d) =>
      val ev = Tables.events(s, d).where(col(AucScoreCol).isNotNull)
      val byVal = ev.groupBy(col(AucScoreCol).as("v")).agg(count(lit(1)).as("n"))
      val pref = StatsOps.bandedPrefixSums(byVal, col("v"), Seq("n"))
        .select(col("v"), (lit(2L) * (col("cum_n") - col("n")) + col("n") + 1L).as("rank2"))
      val joint = ev.groupBy(col(AucScoreCol).as("v"), col("event_type"))
        .agg(count(lit(1)).as("n_vt"))
      val perType = joint.join(pref, "v")
        .groupBy("event_type")
        .agg(sum(col("n_vt") * col("rank2")).as("rs2"), sum(col("n_vt")).as("n_pos"))
      val nn = ev.agg(count(lit(1)).as("n_tot"))
      perType.crossJoin(broadcast(nn))
        .select(col("event_type"), col("n_pos"), (col("n_tot") - col("n_pos")).as("n_neg"),
          round6((col("rs2") - col("n_pos") * (col("n_pos") + 1L)).cast(DoubleType) /
            (lit(2.0) * col("n_pos").cast(DoubleType) *
              (col("n_tot") - col("n_pos")).cast(DoubleType))).as("auc"))
        .orderBy("event_type")
    },

    // Average precision (area under the precision–recall curve) per
    // event_type, one-vs-rest on the same score column as
    // events_roc_auc — the metric that matters when positives are rare
    // (ROC AUC saturates under class imbalance; AP weights every recall
    // increment by the precision AT that threshold). Over distinct
    // descending score thresholds t: AP = Σ (ΔTP/n_pos)·(TP/PP), which
    // needs the overall cum-≥ count (banded prefix sums — no global
    // window) and the per-type cum-≥ count (a window partitioned by
    // type whose partitions are bounded by the 2dp SCORE DOMAIN, not
    // the row count — the distinct-value table stays small at any
    // scale). All-integer counts; one double product each side of the
    // division, 6dp-quantized terms, DECIMAL sum.
    "events_pr_auc" -> { (s, d) =>
      val ev = Tables.events(s, d).where(col(AucScoreCol).isNotNull)
      val byVal = ev.groupBy(col(AucScoreCol).as("v")).agg(count(lit(1)).as("n"))
      val nn = ev.agg(count(lit(1)).as("n_tot"))
      val geAll = StatsOps.bandedPrefixSums(byVal, col("v"), Seq("n"))
        .crossJoin(broadcast(nn))
        .select(col("v"), (col("n_tot") - col("cum_n") + col("n")).as("pp"))
      val joint = ev.groupBy(col(AucScoreCol).as("v"), col("event_type"))
        .agg(count(lit(1)).as("n_vt"))
      val wt = Window.partitionBy("event_type").orderBy(col("v").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tp = joint.withColumn("tp", sum(col("n_vt")).over(wt))
      val npos = joint.groupBy("event_type").agg(sum(col("n_vt")).as("n_pos"))
      tp.join(geAll, "v").join(broadcast(npos), "event_type")
        .select(col("event_type"), col("n_pos"),
          round6((col("n_vt").cast(DoubleType) * col("tp").cast(DoubleType)) /
            (col("n_pos").cast(DoubleType) * col("pp").cast(DoubleType)))
            .cast(DecimalType(18, 6)).as("term"))
        .groupBy("event_type", "n_pos")
        .agg(sum(col("term")).cast(DoubleType).as("ap"))
        .select(col("event_type"), col("n_pos"), round4(col("ap")).as("ap"))
        .orderBy("event_type")
    },

    // Jensen–Shannon divergence of each user's event-type mix from the
    // corpus-wide mix — the bounded, symmetric sibling of events_psi
    // (PSI blows up on zero cells; JSD's mixture M=(P+Q)/2 is always
    // positive wherever either side is). The user×type spine comes from
    // a broadcast cross join against the TINY type table, so users with
    // missing types contribute their q·ln(q/m) mass exactly. All
    // probabilities are integer ratios; ln terms 6dp-quantized then
    // DECIMAL-summed per user.
    "events_js_divergence" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val ut = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val un = ut.groupBy("user_id").agg(sum(col("c")).as("un"))
      val gt = ev.groupBy("event_type").agg(count(lit(1)).as("gc"))
      val nn = ev.agg(count(lit(1)).as("n_tot"))
      val spine = un.crossJoin(broadcast(gt.crossJoin(nn)))
      val p = coalesce(col("c"), lit(0L)).cast(DoubleType) / col("un").cast(DoubleType)
      val q = col("gc").cast(DoubleType) / col("n_tot").cast(DoubleType)
      val m = (col("p") + col("q")) / lit(2.0)
      spine.join(ut, Seq("user_id", "event_type"), "left")
        .select(col("user_id"), p.as("p"), q.as("q"))
        .select(col("user_id"),
          round6(when(col("p") > 0.0, col("p") * log(col("p") / m)).otherwise(lit(0.0)) +
            col("q") * log(col("q") / m))
            .cast(DecimalType(18, 6)).as("term"))
        .groupBy("user_id")
        .agg(sum(col("term")).cast(DoubleType).as("jsum"))
        .select(col("user_id"), round4(lit(0.5) * col("jsum")).as("jsd"))
        .orderBy("user_id")
    },

    // Cramér's V association matrix over declared categorical pairs —
    // the "which columns move together" screen run before any feature
    // is trusted. One grouped count per pair (map-side partial), cells
    // joined to broadcast margins; chi-square terms 6dp-quantized then
    // DECIMAL-summed so the cell order can't drift the statistic.
    "events_cramers_v" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val perPair = assocPairs.map { case (nm, a, b) =>
        val cells = ev.select(a.as("ca"), b.as("cb"))
          .groupBy("ca", "cb").agg(count(lit(1)).as("o"))
        val ra = cells.groupBy("ca").agg(sum(col("o")).as("na"))
        val rb = cells.groupBy("cb").agg(sum(col("o")).as("nb"))
        val tot = cells.agg(sum(col("o")).as("n"),
          countDistinct(col("ca")).as("r"), countDistinct(col("cb")).as("c"))
        val e = col("na").cast(DoubleType) * col("nb").cast(DoubleType) / col("n").cast(DoubleType)
        cells.join(broadcast(ra), "ca").join(broadcast(rb), "cb")
          .crossJoin(broadcast(tot))
          .select(round6((col("o").cast(DoubleType) - e) * (col("o").cast(DoubleType) - e) / e)
              .cast(DecimalType(18, 6)).as("term"),
            col("n"), col("r"), col("c"))
          .groupBy("n", "r", "c")
          .agg(sum(col("term")).cast(DoubleType).as("chi2"))
          .select(lit(nm).as("pair"), col("chi2"),
            ((col("r") - 1L) * (col("c") - 1L)).as("dof"),
            round4(sqrt(col("chi2") / (col("n").cast(DoubleType) *
              least(col("r") - 1L, col("c") - 1L).cast(DoubleType)))).as("cramers_v"))
      }
      perPair.reduce(_ unionByName _).orderBy("pair")
    },

    // Mutual information between the bucketed value and the event type
    // — the nonlinear dependence screen (feature selection at corpus
    // scale runs exactly this: joint counts, margin counts, one log per
    // CELL, never per row). Output is the PMI cell table plus the
    // summed MI (same value on every row via broadcast, so the oracle
    // checks both granularities in one frame). ln inputs are ratios of
    // exact BIGINTs; each cell term is 6dp-quantized before the DECIMAL
    // total.
    "events_mutual_info" -> { (s, d) =>
      val ev = Tables.events(s, d).where(col("value").isNotNull)
        .select(floor(col("value")).cast(LongType).as("bin"), col("event_type"))
      val joint = ev.groupBy("bin", "event_type").agg(count(lit(1)).as("n_xy"))
      val mx = ev.groupBy("bin").agg(count(lit(1)).as("n_x"))
      val my = ev.groupBy("event_type").agg(count(lit(1)).as("n_y"))
      val nn = ev.agg(count(lit(1)).as("n_tot"))
      val cells = joint.join(mx, "bin").join(broadcast(my), "event_type")
        .crossJoin(broadcast(nn))
        .withColumn("pmi", round6(log(col("n_xy").cast(DoubleType) * col("n_tot").cast(DoubleType) /
          (col("n_x").cast(DoubleType) * col("n_y").cast(DoubleType)))))
        .withColumn("term", round6(col("n_xy").cast(DoubleType) / col("n_tot").cast(DoubleType) * col("pmi"))
          .cast(DecimalType(18, 6)))
      val total = cells.agg(sum(col("term")).cast(DoubleType).as("mi_total"))
      cells.crossJoin(broadcast(total))
        .select(col("bin"), col("event_type"), col("n_xy"), col("n_x"), col("n_y"),
          col("pmi"), col("mi_total"))
        .orderBy("bin", "event_type")
    },

    // Weighted HITS hubs/authorities on the nation trade graph — the
    // directed sibling of nation_pagerank (buyers that concentrate
    // trade vs suppliers trade concentrates on). 3 unrolled iterations,
    // L1 normalization each half-step (the L2 variant needs a sqrt per
    // step; L1 keeps every normalizer an exact DECIMAL sum of
    // 6dp-quantized scores — documented delta, fixpoint direction
    // identical). O(edges) per half-step, O(nations) state.
    "nation_hits" -> { (s, d) =>
      // localCheckpoint the aggregated edge table (≤ |nations|² rows —
      // bounded by the fixed nation dimension at any corpus scale): the
      // iteration below references it 2×HitsIters times, and without
      // lineage truncation the final plan re-scans the corpus-scale
      // lineitem join chain once per reference (r16 optimization, guide
      // §2.4/§3.3 — materialize the small intermediate, scan the corpus
      // once).
      val ew = tradeEdges(s, d).localCheckpoint()
      val nodes = Tables.nation(s, d).select(col("n_nationkey").as("node"))
      val nn = nodes.agg(count(lit(1)).cast(DoubleType).as("nd"))
      var hub = nodes.crossJoin(broadcast(nn))
        .select(col("node"), round6(lit(1.0) / col("nd")).as("h"))
      var auth = nodes.crossJoin(broadcast(nn))
        .select(col("node"), round6(lit(1.0) / col("nd")).as("a"))
      // hub/auth deliberately NOT checkpointed per iteration (r16
      // measurement note): the deep 3-iteration plan over the tiny
      // checkpointed ew scans re-plans fast enough that adding 6 more
      // materialization barriers measured SLOWER (3.53 s vs 3.16 s).
      for (_ <- 1 to HitsIters) {
        val aRaw = ew.join(hub, ew("src") === hub("node"))
          .select(col("dst"), round6(col("h") * col("w").cast(DoubleType)).cast(DecimalType(18, 6)).as("c"))
          .groupBy("dst").agg(sum(col("c")).as("m"))
        val aTot = aRaw.agg(sum(col("m")).as("t"))
        auth = nodes.join(aRaw, col("node") === col("dst"), "left")
          .crossJoin(broadcast(aTot))
          .select(col("node"),
            round6(coalesce(col("m"), lit(0)).cast(DoubleType) / col("t").cast(DoubleType)).as("a"))
        val hRaw = ew.join(auth, ew("dst") === auth("node"))
          .select(col("src"), round6(col("a") * col("w").cast(DoubleType)).cast(DecimalType(18, 6)).as("c"))
          .groupBy("src").agg(sum(col("c")).as("m"))
        val hTot = hRaw.agg(sum(col("m")).as("t"))
        hub = nodes.join(hRaw, col("node") === col("src"), "left")
          .crossJoin(broadcast(hTot))
          .select(col("node"),
            round6(coalesce(col("m"), lit(0)).cast(DoubleType) / col("t").cast(DoubleType)).as("h"))
      }
      hub.join(auth, "node")
        .join(broadcast(Tables.nation(s, d)), col("node") === col("n_nationkey"))
        .select(col("node").as("nationkey"), col("n_name"),
          col("h").as("hub"), col("a").as("authority"))
        .orderBy("nationkey")
    },

    // Declared functional-dependency audit — the schema-contract check
    // a warehouse runs before trusting a key ("does l_partkey determine
    // l_suppkey?"). Per FD: one grouped countDistinct on the LHS
    // (map-side partial dedup), violation = any LHS group with >1 RHS
    // value. Output one verdict row per declared FD.
    "dq_fd_audit" -> { (s, d) =>
      val verdicts = FdCandidates.map { case (nm, tbl, lhs, rhs) =>
        Tables.table(s, d, tbl)
          .groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("n_rhs"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("n_rhs") > 1L, 1L).otherwise(0L)).as("n_violating"),
            max(col("n_rhs")).as("max_rhs_per_lhs"))
          .select(lit(nm).as("fd"), col("n_groups"), col("n_violating"),
            col("max_rhs_per_lhs"),
            (col("n_violating") === 0L).as("holds"),
            round4(col("n_violating").cast(DoubleType) / col("n_groups").cast(DoubleType))
              .as("violation_rate"))
      }
      verdicts.reduce(_ unionByName _).orderBy("fd")
    },

    // Probability-calibration report + Brier score — the companion to
    // events_roc_auc (AUC ranks, calibration checks the probabilities
    // themselves). The score→probability link is the RATIONAL sigmoid
    // 0.5 + 0.5·z/(1+|z|) — one add/divide, no libm exp whose last-ulp
    // behavior engines may disagree on — 4dp-quantized, so every
    // downstream term starts engine-identical. Per decile bin: count,
    // exact-DECIMAL mean prediction, outcome rate, gap; overall Brier
    // broadcast onto each row. Pure grouped-aggregate shape.
    // Isotonic calibration (PAVA) over the reliability bins: the
    // monotone fit ŷᵢ = max_{j≤i} min_{k≥i} avg(j..k) of observed
    // outcome rate on predicted-probability bins — the standard
    // post-hoc calibrator (Platt's parametric rival) whose minimax
    // closed form turns the sequential pool-adjacent-violators loop
    // into three joins over the O(bins) aggregate (10 bins → ≤ 550
    // span rows; bin count is fixed, so this never scales with the
    // corpus). Shares events_calibration's exact binning; span
    // averages are integer-count ratios, 6dp-pinned before min/max.
    "events_isotonic_calibration" -> { (s, d) =>
      val z = (col("value") - lit(50.0)) / lit(25.0)
      val ev = Tables.events(s, d).where(col("value").isNotNull)
        .select(round4(lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))).as("pred"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .withColumn("bin", least(lit(9L), floor(col("pred") * 10.0).cast(LongType)))
      val bins = ev.groupBy("bin").agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
      val jk = bins.select(col("bin").as("j"))
        .join(bins.select(col("bin").as("k")), col("j") <= col("k"))
      val spans = jk.join(bins, col("bin").between(col("j"), col("k")))
        .groupBy("j", "k").agg(sum(col("n")).as("nn"), sum(col("npos")).as("pp"))
        .withColumn("avgjk",
          round6(col("pp").cast(DoubleType) / col("nn").cast(DoubleType)))
      val fit = bins.select(col("bin").as("i"))
        .join(spans, col("j") <= col("i") && col("k") >= col("i"))
        .groupBy("i", "j").agg(min(col("avgjk")).as("mn"))
        .groupBy("i").agg(round6(max(col("mn"))).as("iso_fit"))
      bins.join(fit, col("bin") === col("i"))
        .select(col("bin"), col("n"),
          round6(col("npos").cast(DoubleType) / col("n").cast(DoubleType)).as("frac_pos"),
          col("iso_fit"))
        .orderBy("bin")
    },

    "events_calibration" -> { (s, d) =>
      val z = (col("value") - lit(50.0)) / lit(25.0)
      val ev = Tables.events(s, d).where(col("value").isNotNull)
        .select(round4(lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))).as("pred"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .withColumn("bin", least(lit(9L), floor(col("pred") * 10.0).cast(LongType)))
        .withColumn("sq", round6((col("pred") - col("y")) * (col("pred") - col("y")))
          .cast(DecimalType(18, 6)))
      val bins = ev.groupBy("bin").agg(count(lit(1)).as("n"),
        sum(col("pred").cast(DecimalType(18, 6))).as("psum"),
        sum(col("y")).as("npos"), sum(col("sq")).as("sqsum"))
      val tot = bins.agg(sum(col("sqsum")).as("sqall"), sum(col("n")).as("nall"))
      bins.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"), col("npos"),
          round6(col("psum").cast(DoubleType) / col("n").cast(DoubleType)).as("mean_pred"),
          round6(col("npos").cast(DoubleType) / col("n").cast(DoubleType)).as("frac_pos"),
          round6(col("sqsum").cast(DoubleType) / col("n").cast(DoubleType)).as("brier_bin"),
          round6(col("sqall").cast(DoubleType) / col("nall").cast(DoubleType)).as("brier_total"))
        .orderBy("bin")
    },

    // Quantile normalization — cross-series distribution alignment (the
    // batch-effect remover: every series' values are remapped onto the
    // GLOBAL value distribution at the same within-series quantile).
    // Within-series rank is a keyed window; the global order statistics
    // come from the banded two-level global rank (no single-partition
    // sort at any scale); each row then equi-joins its two bracketing
    // order statistics on the INTEGER rank key. The interpolation
    // position 1+p(N−1) is the same IEEE expression on both engines, so
    // floor() can't straddle — and tied values make v[k] well-defined
    // under any tie order.
    "ts_quantile_norm" -> { (s, d) =>
      val ev = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("value"))
      val wq = Window.partitionBy("user_id").orderBy("value", "event_id")
      val wa = Window.partitionBy("user_id")
      val withP = ev
        .withColumn("rn", row_number().over(wq).cast(LongType))
        .withColumn("n", count(lit(1)).over(wa))
        .withColumn("p", when(col("n") === 1L, lit(0.5))
          .otherwise((col("rn") - 1L).cast(DoubleType) / (col("n") - 1L).cast(DoubleType)))
      val nn = ev.agg(count(lit(1)).as("n_tot"))
      val pos = withP.crossJoin(broadcast(nn))
        .withColumn("posn", lit(1.0) + col("p") * (col("n_tot") - 1L).cast(DoubleType))
        .withColumn("k0", floor(col("posn")).cast(LongType))
        .withColumn("k1", least(col("k0") + 1L, col("n_tot")))
        .withColumn("frac", col("posn") - col("k0").cast(DoubleType))
      val ranked = StatsOps.globalRank(ev.select(col("value").as("gv"), col("event_id").as("gid")),
        col("gv"), col("gid"), asc = true, "grk")
      val v0 = ranked.select(col("grk").as("k0"), col("gv").as("v0"))
      val v1 = ranked.select(col("grk").as("k1"), col("gv").as("v1"))
      pos.join(v0, "k0").join(v1, "k1")
        .select(col("event_id"), col("value"),
          round4(col("v0") + col("frac") * (col("v1") - col("v0"))).as("qnorm_value"))
        .orderBy("event_id")
    },

    // EWMA volatility (RiskMetrics λ=0.94) + vol-standardized spike flag
    // — the financial-monitoring anomaly shape (a fixed z-threshold on
    // raw diffs misses regime changes; standardizing by the CURRENT
    // volatility adapts). Truncated 20-term lag kernel over 6dp-squared
    // returns (the ts_ewma contract: exact weights, null-aware
    // renormalization), vol = √EWMA rounded BEFORE the z division so
    // both engines divide identical inputs; z uses the PRIOR row's vol
    // (no look-ahead).
    "ts_ewma_vol" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val base = Tables.events(s, d)
        .withColumn("ret", col("value") - lag(col("value"), 1).over(w))
        .withColumn("r2", round6(col("ret") * col("ret")))
      val vol2 = graft.operators.TimeSeriesOps.ewma(
        base, Seq("user_id"), Seq("ts", "event_id"), "r2",
        alpha = 0.06, span = 20, outCol = "vol2")
      vol2
        .withColumn("vol", round4(sqrt(col("vol2"))))
        .withColumn("vol_prev", lag(col("vol"), 1).over(w))
        .select(col("event_id"), round4(col("ret")).as("ret"), col("vol"),
          round4(col("ret") / nullif(col("vol_prev"), lit(0.0))).as("z"),
          when(abs(col("ret") / nullif(col("vol_prev"), lit(0.0))) > 3.0, 1L)
            .otherwise(0L).as("is_spike"))
        .orderBy("event_id")
    },

    // GARCH(1,1) conditional volatility path + standardized shock — the
    // mean-reverting big sibling of ts_ewma_vol (EWMA variance is the
    // ω=0, α+β=1 corner; GARCH's ω pulls quiet stretches back toward the
    // unconditional level ω/(1−α−β)=4000, sized to the events return
    // variance). Fixed pinned params (production shape: offline MLE
    // refit, online scoring), recursive keyed fold in TimeSeriesOps
    // replayed exactly by the oracle's recursive CTE. σ²_t sees only
    // PAST returns, so z=r/σ is look-ahead-free; σ² ≥ ω > 0 makes the
    // division total.
    "ts_garch_vol" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val rets = Tables.events(s, d)
        .withColumn("ret", col("value") - lag(col("value"), 1).over(w))
        .where(col("ret").isNotNull)
      graft.operators.TimeSeriesOps.garchPath(
          rets, Seq("user_id"), Seq("ts", "event_id"), "ret",
          omega = GarchOmega, alpha = GarchAlpha, beta = GarchBeta)
        .select(col("event_id"), round4(col("ret")).as("ret"),
          round4(sqrt(col("sigma2"))).as("vol"),
          round4(col("ret") / sqrt(col("sigma2"))).as("z"))
        .orderBy("event_id")
    },

    // Streaming GARCH(1,1) via flatMapGroupsWithState — the streaming
    // twin of ts_garch_vol over the same pre-differenced returns (TWO
    // doubles of state per key; see StreamingAnomaly.garch for the
    // bit-for-bit in-batch ordering contract; in production the
    // differencing is its own one-value-of-state stage upstream).
    // DRIVER-VERIFIED: oracle = the batch twin's recursive CTE, verbatim.
    "streaming_garch" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.RetSample
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val rows = Tables.events(s, d)
        .withColumn("ret", col("value") - lag(col("value"), 1).over(w))
        .where(col("ret").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("ret").cast(DoubleType).as("ret"))
        .as[RetSample].collect().toSeq
      StreamingAnomaly.replayToSink(s, rows, "graft_streaming_garch", None)(
          ds => StreamingAnomaly.garch(ds,
            GarchOmega, GarchAlpha, GarchBeta).toDF())
        .select(col("event_id"), round4(col("ret")).as("ret"),
          round4(sqrt(col("sigma2"))).as("vol"),
          round4(col("ret") / sqrt(col("sigma2"))).as("z"))
        .orderBy("event_id")
    },

    // Hierarchical forecast reconciliation (total → per-type) — the
    // coherence step every hierarchical pipeline needs: independent
    // child forecasts (seasonal-naive lag-7 on the complete day×type
    // spine) don't sum to the parent forecast (trailing-7-day mean of
    // the total), so children are scaled proportionally (top-down
    // shares × parent). All forecasts derive from INTEGER daily counts;
    // the two divisions are single IEEE ops rounded 4dp. The spine is a
    // cross join of two TINY aggregates (days × types), never of facts.
    "events_forecast_reconcile" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val days = daily.select("day").distinct()
      val types = daily.select("event_type").distinct()
      val spine = days.crossJoin(broadcast(types))
      val full = spine.join(daily, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val wt = Window.partitionBy("event_type").orderBy("day")
      val child = full.withColumn("child_fc", lag(col("cnt"), 7).over(wt))
      val totals = full.groupBy("day").agg(sum(col("cnt")).as("tot"))
      // Trailing-7-day parent mean via a broadcast non-equi self-join on
      // the O(#days) aggregate — a global trailing window would funnel
      // the grid through one partition; the join shape stays parallel
      // however long the calendar gets.
      val prior = totals.select(col("day").as("pday"), col("tot").as("ptot"))
      val parent = totals.join(broadcast(prior),
          col("pday") >= date_sub(col("day"), 7) && col("pday") < col("day"), "left")
        .groupBy("day")
        .agg(when(count(col("ptot")) === 7L,
          round4(sum(col("ptot")).cast(DoubleType) / 7.0)).as("parent_fc"))
      val bu = child.groupBy("day").agg(sum(col("child_fc")).as("bu_total"))
      child.join(broadcast(parent), "day").join(broadcast(bu), "day")
        .where(col("child_fc").isNotNull && col("parent_fc").isNotNull)
        .select(col("day"), col("event_type"), col("cnt").as("actual"),
          col("child_fc"), col("parent_fc"),
          round4(col("child_fc").cast(DoubleType) * col("parent_fc") /
            nullif(col("bu_total").cast(DoubleType), lit(0.0))).as("reconciled_fc"))
        .orderBy("day", "event_type")
    },

    // k-anonymity / l-diversity audit — the privacy gate next to PII
    // scrubbing (text_pii_scrub removes direct identifiers; this
    // measures RE-identification risk from quasi-identifiers): rows
    // grouped by the declared QI tuple, k = class size, l = distinct
    // sensitive values (user_id) in the class. One grouped aggregate +
    // a broadcast risk summary (share of rows in classes below k=5) —
    // map-side partial all the way.
    "dq_k_anonymity" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), weekday(col("ts")).cast(LongType).as("dow"),
          floor(col("value") / 50.0).cast(LongType).as("value_band"), col("user_id"))
      val classes = ev.groupBy("event_type", "dow", "value_band")
        .agg(count(lit(1)).as("k"), countDistinct(col("user_id")).as("l_distinct"))
      val risk = classes.agg(
        sum(when(col("k") < 5L, col("k")).otherwise(0L)).as("rows_at_risk"),
        sum(col("k")).as("rows_total"))
      classes.crossJoin(broadcast(risk))
        .select(col("event_type"), col("dow"), col("value_band"), col("k"),
          col("l_distinct"), (col("k") < 5L).as("at_risk"),
          round4(col("rows_at_risk").cast(DoubleType) / col("rows_total").cast(DoubleType))
            .as("corpus_risk_share"))
        .orderBy("event_type", "dow", "value_band")
    },

    // l-diversity audit — the sensitive-attribute companion of
    // dq_k_anonymity (k alone is not enough: a 100-row equivalence
    // class whose rows all belong to ONE user still re-identifies).
    // Same quasi-identifier classes; per class the distinct-count l,
    // the Shannon entropy of the sensitive-value (user) distribution
    // (entropy l-diversity: ln l is the ceiling, a skewed class scores
    // far below it), and the l >= 3 verdict. Two grouped aggregates,
    // entropy terms 6dp-quantized into a DECIMAL sum.
    "dq_l_diversity" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), weekday(col("ts")).cast(LongType).as("dow"),
          floor(col("value") / 50.0).cast(LongType).as("value_band"), col("user_id"))
      val cell = ev.groupBy("event_type", "dow", "value_band", "user_id")
        .agg(count(lit(1)).as("c"))
      val p = col("c").cast(DoubleType) /
        sum(col("c")).over(Window.partitionBy("event_type", "dow", "value_band"))
      cell.withColumn("term", round6(p * log(p)).cast(DecimalType(18, 6)))
        .groupBy("event_type", "dow", "value_band")
        .agg(sum(col("c")).as("k"), count(lit(1)).as("l_distinct"),
          (-sum(col("term"))).cast(DoubleType).as("hh"))
        .select(col("event_type"), col("dow"), col("value_band"), col("k"),
          col("l_distinct"), round4(col("hh")).as("entropy_l"),
          when(col("l_distinct") >= 3L, lit(1L)).otherwise(lit(0L)).as("is_diverse"))
        .orderBy("event_type", "dow", "value_band")
    },

    // t-closeness audit — the distributional third of the privacy
    // triad (dq_k_anonymity: class size; dq_l_diversity: distinct
    // sensitive values; this: how far each class's sensitive-value
    // DISTRIBUTION sits from the corpus-wide one, as total variation
    // distance t = ½Σ|p_class − p_global|, absent values folded in via
    // ½(1 − Σ_present q)). A class can pass k AND l yet leak through a
    // skewed mix — t catches that. Global user shares are one grouped
    // count joined in by user (shuffle equi-join, corpus-proportional);
    // |p−q| terms are 6dp-quantized into per-class DECIMAL sums.
    "dq_t_closeness" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), weekday(col("ts")).cast(LongType).as("dow"),
          floor(col("value") / 50.0).cast(LongType).as("value_band"), col("user_id"))
      val cell = ev.groupBy("event_type", "dow", "value_band", "user_id")
        .agg(count(lit(1)).as("c"))
      val total = ev.agg(count(lit(1)).as("nt"))
      val glob = ev.groupBy("user_id").agg(count(lit(1)).as("g"))
        .crossJoin(broadcast(total))
      val wc = Window.partitionBy("event_type", "dow", "value_band")
      val j = cell.join(glob, Seq("user_id"))
        .withColumn("k", sum(col("c")).over(wc))
        .withColumn("pdiff", round6(abs(col("c").cast(DoubleType) / col("k") -
          col("g").cast(DoubleType) / col("nt"))))
        .withColumn("q6", round6(col("g").cast(DoubleType) / col("nt")))
      j.groupBy("event_type", "dow", "value_band")
        .agg(max(col("k")).as("k"), count(lit(1)).as("l_distinct"),
          exactSum(col("pdiff")).as("sad"), exactSum(col("q6")).as("sq"))
        .select(col("event_type"), col("dow"), col("value_band"), col("k"),
          col("l_distinct"),
          round4(lit(0.5) * (col("sad") + lit(1.0) - col("sq"))).as("t_closeness"))
        .withColumn("is_close",
          when(col("t_closeness") <= 0.375, lit(1L)).otherwise(lit(0L)))
        .orderBy("event_type", "dow", "value_band")
    },

    // Sequential pattern support (PrefixSpan-lite, length 2 with gaps):
    // for each ordered event-type pair (A, B), the number of users with
    // SOME A occurrence strictly before SOME B occurrence — existential
    // precedence, which contiguous-path mining (events_top_paths) and
    // the first-order Markov matrix both miss when noise events sit
    // between A and B. Reduced exactly to per-(user, type) first/last
    // timestamps (one grouped agg, corpus-proportional), so the pair
    // stage joins O(users × |types|) rows, never raw events; the type
    // domain is enumerable, so per-user pairs are bounded.
    "events_seq_patterns" -> { (s, d) =>
      val ut = Tables.events(s, d)
        .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
        .groupBy("user_id", "event_type")
        .agg(min(col("tsu")).as("first_ts"), max(col("tsu")).as("last_ts"))
      val tcount = ut.groupBy("event_type").agg(count(lit(1)).as("users_with_a"))
        .withColumnRenamed("event_type", "antecedent")
      val pairs = ut.as("a")
        .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
          col("a.event_type") =!= col("b.event_type"))
        .groupBy(col("a.event_type").as("antecedent"),
          col("b.event_type").as("consequent"))
        .agg(count(when(col("a.first_ts") < col("b.last_ts"), 1)).as("support_users"),
          count(lit(1)).as("users_with_both"))
      pairs.join(broadcast(tcount), Seq("antecedent"))
        .select(col("antecedent"), col("consequent"), col("support_users"),
          col("users_with_both"), col("users_with_a"),
          round4(col("support_users").cast(DoubleType) /
            col("users_with_a").cast(DoubleType)).as("confidence"))
        .orderBy("antecedent", "consequent")
    },

    // Degree assortativity of the trade graph: Pearson correlation of
    // endpoint degrees over every directed edge instance of the
    // undirected graph — "do well-connected nations trade with each
    // other or with the periphery" (one scalar that distinguishes
    // hub-and-spoke from core-core topologies). Degrees are INTEGER
    // counts, so all six moments are exact longs; one final
    // momentCorr division.
    "nation_assortativity" -> { (s, d) =>
      val e = tradeEdges(s, d).where(col("src") =!= col("dst"))
      val und = e.select(col("src").as("a"), col("dst").as("b"))
        .union(e.select(col("dst").as("a"), col("src").as("b"))).distinct()
      val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
      val da = deg.select(col("a"), col("deg").as("dega"))
      val db = deg.select(col("a").as("b"), col("deg").as("degb"))
      val pairs = und.join(broadcast(da), "a").join(broadcast(db), "b")
      pairs.agg(
          count(lit(1)).cast(DoubleType).as("n"),
          sum(col("dega")).cast(DoubleType).as("sx"),
          sum(col("degb")).cast(DoubleType).as("sy"),
          sum(col("dega") * col("degb")).cast(DoubleType).as("sxy"),
          sum(col("dega") * col("dega")).cast(DoubleType).as("sxx"),
          sum(col("degb") * col("degb")).cast(DoubleType).as("syy"))
        .select(col("n").cast(LongType).as("n_endpoints"),
          round4(CleanFunctions.momentCorr(col("n"), col("sx"), col("sy"),
            col("sxy"), col("sxx"), col("syy"))).as("assortativity"))
    },

    // Modularity of the REGION partition on the trade graph: Q = Σ_c
    // (e_cc/m − (a_c/2m)²) — does the geographic community structure
    // explain who trades with whom, the quantitative answer to "are
    // regions trade blocs". Communities come from the region dimension
    // (no detection loop — this scores a GIVEN partition, the
    // warehouse-common case); all counts integer-exact, per-community
    // terms 6dp-quantized into the DECIMAL sum.
    "nation_modularity" -> { (s, d) =>
      val e = tradeEdges(s, d).where(col("src") =!= col("dst"))
      val und = e.select(col("src").as("a"), col("dst").as("b"))
        .union(e.select(col("dst").as("a"), col("src").as("b"))).distinct()
        .where(col("a") < col("b"))
      val reg = Tables.nation(s, d)
        .select(col("n_nationkey").as("nk"), col("n_regionkey").as("rg"))
      val withR = und
        .join(broadcast(reg.select(col("nk").as("a"), col("rg").as("ra"))), "a")
        .join(broadcast(reg.select(col("nk").as("b"), col("rg").as("rb"))), "b")
      val mEdges = withR.agg(count(lit(1)).as("m"))
      val ecc = withR.where(col("ra") === col("rb"))
        .groupBy(col("ra").as("rg")).agg(count(lit(1)).as("ecc"))
      val degs = withR.select(col("ra").as("rg"))
        .union(withR.select(col("rb").as("rg")))
        .groupBy("rg").agg(count(lit(1)).as("ac"))
      val md = col("m").cast(DoubleType)
      val frac = col("ac").cast(DoubleType) / (lit(2.0) * md)
      val terms = degs.join(ecc, Seq("rg"), "left")
        .withColumn("ecc", coalesce(col("ecc"), lit(0L)))
        .crossJoin(broadcast(mEdges))
        .withColumn("term", round6(col("ecc").cast(DoubleType) / md - frac * frac))
      terms.agg(max(col("m")).as("m_edges"), count(lit(1)).as("n_communities"),
          CleanFunctions.exactSum(col("term")).as("q"))
        .select(col("m_edges"), col("n_communities"),
          round4(col("q")).as("q_modularity"))
    },

    // Cross-source vocabulary overlap: pairwise Jaccard of the distinct
    // word-type sets per document source — the corpus-mixing diagnostic
    // (two sources sharing 95% of their vocabulary are near-redundant
    // for training-mix purposes; one sharing 20% brings new coverage).
    // Type sets never materialize per pair: common counts come from the
    // tok equi-join, sizes from one distinct aggregate (the
    // nation_similarity shape on text).
    "text_source_overlap" -> { (s, d) =>
      val toks = Tables.spread(Tables.documents(s, d), col("doc_id"))
        .select(col("source"),
          explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("tok"))
        .distinct()
      val sizes = toks.groupBy("source").agg(count(lit(1)).as("sz"))
      val common = toks.as("x").join(toks.as("y"),
          col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("common"))
      common
        .join(broadcast(sizes.select(col("source").as("src_a"), col("sz").as("size_a"))), "src_a")
        .join(broadcast(sizes.select(col("source").as("src_b"), col("sz").as("size_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("common"), col("size_a"), col("size_b"),
          round4(col("common").cast(DoubleType) /
            (col("size_a") + col("size_b") - col("common")).cast(DoubleType)).as("jaccard"))
        .orderBy("src_a", "src_b")
    },

    // Weighted-set node similarity on the trade graph: Jaccard of each
    // nation pair's trading-partner sets — the "find me a comparable
    // node" primitive (completes the graph family: rank, components,
    // triangles, BFS, hubs, similarity). Partner sets never materialize
    // per pair: common counts come from the equi-join on the shared
    // partner, sizes from one degree aggregate — O(Σ deg²) bounded by
    // the ≤N² edge aggregate, all INTEGER counts, one division.
    "nation_similarity" -> { (s, d) =>
      val e = tradeEdges(s, d).where(col("src") =!= col("dst"))
      val und = e.select(col("src").as("a"), col("dst").as("b"))
        .union(e.select(col("dst").as("a"), col("src").as("b"))).distinct()
      val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
      val common = und.as("x").join(und.as("y"),
          col("x.b") === col("y.b") && col("x.a") < col("y.a"))
        .groupBy(col("x.a").as("na"), col("y.a").as("nb"))
        .agg(count(lit(1)).as("common"))
      common
        .join(deg.select(col("a").as("na"), col("deg").as("da")), "na")
        .join(deg.select(col("a").as("nb"), col("deg").as("db")), "nb")
        .select(col("na"), col("nb"), col("common"), col("da"), col("db"),
          round4(col("common").cast(DoubleType) /
            (col("da") + col("db") - col("common")).cast(DoubleType)).as("jaccard"))
        .orderBy("na", "nb")
    },

    // Log-log price elasticity of demand per part brand — the pooled
    // OLS slope of ln(quantity) on ln(unit price), the econ twin of
    // ts_ols_trend's time regression. One broadcast dim join (part →
    // brand), one grouped exact-moment pass (6dp-quantized logs and
    // cross-products, DECIMAL sums), closed-form slope + R² from the
    // five sums — no per-group value buffering at any scale.
    // Classical seasonal index per brand (ratio-to-moving-average):
    // monthly revenue ÷ the centered 12-month MA (complete windows
    // only), averaged by calendar month — the retail/econ "December is
    // 1.3× trend" deseasonalization table that ts_seasonal_adjust's
    // per-series hour profile doesn't cover (calendar-month granularity
    // over a multi-year span, per product line). One dim join + one
    // monthly aggregate; the MA is a 12-row keyed window over the
    // O(brands × months) AGGREGATE, never raw lineitems; revenue and
    // ratios DECIMAL-quantized at each stage.
    //
    // Window semantics: the "centered 12-month MA" is rowsBetween(-6,5)
    // over the brand's PRESENT month rows gated on nw==12 — i.e. 12
    // observed months, not 12 consecutive CALENDAR months (a brand with
    // a gap contributes a ratio whose MA spans >12 calendar months),
    // and not the classic 2x12 half-weighted centered MA. Both engines
    // compute the identical row-window quantity.
    "lineitem_seasonality_index" -> { (s, d) =>
      val monthly = Tables.lineitem(s, d)
        .join(Tables.part(s, d).select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          CleanFunctions.epochUs(date_trunc("month", col("l_shipdate"))).as("m"),
          month(col("l_shipdate")).cast(LongType).as("month_num"))
        .agg(CleanFunctions.exactSum(col("l_extendedprice")).as("rev"))
      val wm = Window.partitionBy("p_brand").orderBy("m").rowsBetween(-6, 5)
      val ratio = monthly
        .withColumn("nw", count(col("rev")).over(wm))
        .withColumn("ma", CleanFunctions.exactMeanOver(col("rev"), wm))
        .where(col("nw") === 12L)
        .withColumn("ratio", round6(col("rev") / col("ma")))
      ratio.groupBy("p_brand", "month_num")
        .agg(count(lit(1)).as("n_obs"),
          round4(CleanFunctions.exactMean(col("ratio"))).as("seasonal_index"))
        .orderBy("p_brand", "month_num")
    },

    "lineitem_price_elasticity" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .where(col("l_quantity") > 0.0 && col("l_extendedprice") > 0.0)
        .join(broadcast(Tables.table(s, d, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          round6(log(col("l_extendedprice") / col("l_quantity"))).as("x"),
          round6(log(col("l_quantity"))).as("y"))
        .withColumn("xy", round6(col("x") * col("y")))
        .withColumn("xx", round6(col("x") * col("x")))
        .withColumn("yy", round6(col("y") * col("y")))
      def dsum(c: String) = sum(col(c).cast(DecimalType(18, 6))).cast(DoubleType)
      li.groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum("x").as("sx"), dsum("y").as("sy"),
          dsum("xy").as("sxy"), dsum("xx").as("sxx"), dsum("yy").as("syy"))
        .select(col("p_brand"), col("n"),
          round4((col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0))).as("elasticity"),
          round4(((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            nullif((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy")), lit(0.0))).as("r2"))
        .orderBy("p_brand")
    },

    // Stationary distribution of the event-type Markov chain — the
    // long-run answer events_markov's one-step matrix only implies:
    // where does the journey SPEND its time. 4 unrolled power-iteration
    // rounds on the O(types²) transition aggregate, each round a
    // broadcast join + DECIMAL sum + renormalize (the pagerank/HITS
    // discipline: 6dp-quantized contributions so per-state sums are
    // order-independent).
    "events_markov_stationary" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = Tables.events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("cnt"))
      val p = trans.withColumn("p", round6(col("cnt").cast(DoubleType) /
        sum(col("cnt")).over(Window.partitionBy("from_type")).cast(DoubleType)))
      val states = trans.select(col("from_type").as("state")).distinct()
      val ns = states.agg(count(lit(1)).cast(DoubleType).as("nd"))
      var pi = states.crossJoin(broadcast(ns))
        .select(col("state"), round6(lit(1.0) / col("nd")).as("pi"))
      for (_ <- 1 to 4) {
        val m = p.join(pi, col("from_type") === col("state"))
          .select(col("to_type"), round6(col("pi") * col("p")).cast(DecimalType(18, 6)).as("c"))
          .groupBy("to_type").agg(sum(col("c")).as("m"))
        val tot = m.agg(sum(col("m")).as("t"))
        pi = states.join(m, col("state") === col("to_type"), "left")
          .crossJoin(broadcast(tot))
          .select(col("state"),
            round6(coalesce(col("m"), lit(0)).cast(DoubleType) / col("t").cast(DoubleType)).as("pi"))
      }
      pi.select(col("state").as("event_type"), col("pi").as("stationary_p"))
        .orderBy("event_type")
    },

    // Expected steps to conversion (absorbing-chain hitting time) per
    // starting event type: h(i) = 1 + Σⱼ p(i→j)·h(j) with 'purchase'
    // absorbing at 0 — the journey-length answer events_markov's
    // one-step matrix and events_markov_stationary's long-run mix both
    // leave open ("how many clicks away is checkout from an error
    // page"). Solved by 12 unrolled value-iteration rounds (a TRUNCATED
    // hitting time: monotone from below, the defined quantity — exact
    // on both engines) on the O(types²) transition aggregate; each
    // round is one broadcast-scale join with 6dp-quantized DECIMAL
    // contribution sums, the pagerank/stationary discipline.
    "events_hitting_time" -> { (s, d) =>
      val target = "purchase"
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = Tables.events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("cnt"))
      val p = trans.withColumn("p", round6(col("cnt").cast(DoubleType) /
          sum(col("cnt")).over(Window.partitionBy("from_type")).cast(DoubleType)))
        .select("from_type", "to_type", "p")
      val states = p.select(col("from_type").as("state")).distinct()
      var h = states.select(col("state"), lit(0.0).as("h"))
      for (_ <- 1 to 12) {
        val m = p.where(col("to_type") =!= target)
          .join(h, col("to_type") === col("state"))
          .select(col("from_type"),
            round6(col("p") * col("h")).cast(DecimalType(18, 6)).as("c"))
          .groupBy("from_type").agg(sum(col("c")).as("m"))
        h = states.join(m, col("state") === col("from_type"), "left")
          .select(col("state"),
            when(col("state") === target, lit(0.0))
              .otherwise(round6(lit(1.0) + coalesce(col("m"), lit(0)).cast(DoubleType)))
              .as("h"))
      }
      h.select(col("state").as("event_type"), col("h").as("expected_steps"))
        .orderBy("event_type")
    },

    // Referential-integrity audit across the star schema: per declared
    // FK relation the child row count, orphan count (child keys with no
    // parent — one anti-join shuffled on the key, the 100 TB-safe
    // shape), and orphan share. The first DQ gate a warehouse load
    // runs; joins downstream silently DROP these rows, so the audit
    // quantifies what every inner-join query is not seeing.
    // events.user_id→customer is a declared CANDIDATE key (the audit's
    // job is exactly to measure such claims).
    "dq_referential_integrity" -> { (s, d) =>
      def audit(rel: String, child: DataFrame, key: String,
                parent: DataFrame, pkey: String): DataFrame = {
        val c = child.select(col(key).as("k")).where(col("k").isNotNull)
        val tot = c.agg(count(lit(1)).as("n_child"))
        val orph = c.join(parent.select(col(pkey).cast(LongType).as("k")).distinct(),
            Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        tot.crossJoin(orph).select(lit(rel).as("relation"), col("n_child"),
          col("n_orphans"),
          round6(col("n_orphans").cast(DoubleType) / col("n_child").cast(DoubleType))
            .as("orphan_share"))
      }
      val li = Tables.lineitem(s, d); val or = Tables.orders(s, d)
      val cu = Tables.customer(s, d); val su = Tables.supplier(s, d)
      val na = Tables.nation(s, d)
      Seq(
        audit("customer.c_nationkey->nation", cu.select(col("c_nationkey").cast(LongType).as("c_nationkey")), "c_nationkey", na, "n_nationkey"),
        audit("events.user_id->customer", Tables.events(s, d), "user_id", cu, "c_custkey"),
        audit("lineitem.l_orderkey->orders", li, "l_orderkey", or, "o_orderkey"),
        audit("lineitem.l_partkey->part", li, "l_partkey", Tables.part(s, d), "p_partkey"),
        audit("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
        audit("nation.n_regionkey->region", na.select(col("n_regionkey").cast(LongType).as("n_regionkey")), "n_regionkey", Tables.region(s, d), "r_regionkey"),
        audit("orders.o_custkey->customer", or, "o_custkey", cu, "c_custkey"),
        audit("supplier.s_nationkey->nation", su.select(col("s_nationkey").cast(LongType).as("s_nationkey")), "s_nationkey", na, "n_nationkey")
      ).reduce(_ union _).orderBy("relation")
    },

    // Missingness-mechanism audit: is the value column's null pattern
    // random (MCAR) or systematic? Two independent signals: a χ²(23)
    // test of the null RATE across hour-of-day against the uniform
    // expectation (sensor-offline windows light this up), and the
    // longest consecutive null RUN anywhere in the corpus (block
    // outages that per-hour rates smear away). Determines whether
    // ffill/interpolation is even admissible — interpolating a 9-hour
    // outage fabricates data. Integer counts throughout; the flag
    // compares the rounded χ² to the literal df=23 critical value
    // (35.17) instead of a cross-engine p.
    "ts_missingness_audit" -> { (s, d) =>
      val e = Tables.events(s, d).withColumn("hr", hour(col("ts")).cast(LongType))
      val byHr = e.groupBy("hr").agg(count(lit(1)).as("n"),
        count(when(col("value").isNull, 1)).as("n_null"))
      val tot = byHr.agg((sum(col("n_null")).cast(DoubleType) /
        sum(col("n")).cast(DoubleType)).as("rate0"))
      val chi = byHr.crossJoin(broadcast(tot))
        .withColumn("expected", col("n").cast(DoubleType) * col("rate0"))
        .withColumn("term", round6(
          (col("n_null").cast(DoubleType) - col("expected")) *
            (col("n_null").cast(DoubleType) - col("expected")) /
            nullif(col("expected"), lit(0.0))))
        .agg(sum(col("n")).as("n_total"), round6(max(col("rate0"))).as("null_rate"),
          round4(coalesce(exactSum(col("term")), lit(0.0))).as("chi2"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wn = Window.partitionBy("user_id", "is_null").orderBy("ts", "event_id")
      val runs = Tables.events(s, d)
        .withColumn("is_null", col("value").isNull)
        .withColumn("island",
          row_number().over(w) - row_number().over(wn))
        .where(col("is_null"))
        .groupBy("user_id", "island").agg(count(lit(1)).as("run"))
        .agg(coalesce(max(col("run")), lit(0L)).as("longest_null_run"))
      chi.crossJoin(broadcast(runs))
        .select(col("n_total"), col("null_rate"), col("chi2"),
          (col("chi2") > lit(35.17)).cast(LongType).as("systematic_flag"),
          col("longest_null_run"))
    },

    // Order-total reconciliation: recompute every order's total from
    // its lines as Σ price·(1−disc)·(1+tax) and compare to the stated
    // o_totalprice — the financial-close audit (and the honest check
    // of the generator's own invariants): reconciled share, orders
    // with NO lines at all, and the mean/max relative error. One
    // grouped DECIMAL recompute + one keyed left join; never trusts
    // the header without the detail.
    "dq_order_reconciliation" -> { (s, d) =>
      val recomputed = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(exactSum(round4(col("l_extendedprice") *
          (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("recalc"))
      // relerr stays NULL for orders with no lines: "missing detail
      // rows" is its own signal (n_no_lines), not a 100% "mismatch" —
      // folding it in as relerr=1.0 would pin max_rel_err at 1.0
      // whenever any order lacks lines and mask real error magnitudes.
      Tables.orders(s, d)
        .join(recomputed, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("relerr", round6(abs(col("recalc") -
          col("o_totalprice")) / col("o_totalprice")))
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("recalc").isNull, 1)).as("n_no_lines"),
          count(when(col("relerr") <= 0.0001, 1)).as("n_reconciled"),
          round6(CleanFunctions.exactMean(col("relerr"))).as("mean_rel_err"),
          round4(max(col("relerr"))).as("max_rel_err"))
    },

    // KMV (k-minimum-values / bottom-k) sketch Jaccard between event
    // types' user sets, audited against the exact overlap: each type
    // keeps its k=64 smallest md5 user-hashes; a PAIR's similarity is
    // estimated from the k smallest of the union (share of union-sketch
    // values present in both sides) — the bottom-k trick that estimates
    // set RESEMBLANCE from mergeable constant-size state, completing
    // the sketch family (HLL: cardinality; CMS: frequency; Bloom:
    // membership; KMV: similarity). Deterministic hashing makes the
    // sketch — and hence the "approximate" answer — exactly
    // reproducible on both engines; sketch windows are keyed by the
    // bounded type domain and the pair stage runs on O(types² · k)
    // rows, never users².
    "events_kmv_jaccard" -> { (s, d) =>
      // uh feeds the sketch, the per-type counts AND both sides of the
      // exact-intersection self-join; sk feeds both tag arms + types.
      // localCheckpoint each once so the distinct+hash pass doesn't
      // replay per consumer (SURVEY §5 multi-consumer rule).
      val uh = kmvUserHashes(s, d)
      val wk = Window.partitionBy("event_type").orderBy("h")
      val sk = uh.withColumn("rn", row_number().over(wk)).where(col("rn") <= KmvK)
        .select(col("event_type"), col("h")).localCheckpoint()
      kmvAudit(uh, sk)
    },

    // STREAMING twin of events_kmv_jaccard (SURVEY §2.12): the per-type
    // bottom-k distinct-hash sketch runs as the emit-once fold
    // (StreamingAnomaly.kmvBottomK — ≤ k longs of state per key, merged
    // by union-distinct-take-k), finalized at event-time timeout; the
    // pairwise union-resample estimate AND the exact-Jaccard audit
    // downstream are the shared kmvAudit, so the streaming answer
    // hash-matches the batch entry's DuckDB oracle verbatim.
    "streaming_kmv_jaccard" -> { (s, d) =>
      import s.implicits._
      val rows = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[graft.streaming.KeyEvent].collect().toSeq
      val sk =
        if (rows.isEmpty) s.emptyDataset[graft.streaming.KmvHash].toDF()
        else {
          val maxUs = rows.iterator.map(e => StreamingAnomaly.tsUs(e.ts)).max
          StreamingAnomaly.replayToSink(s, rows, "graft_streaming_kmv",
            Some(StreamingAnomaly.punctuationKeyEvent(
              maxUs + 10L * 86400L * 1000000L)))(
            ds => StreamingAnomaly.kmvBottomK(ds.toDF(), KmvK).toDF())
        }
      kmvAudit(kmvUserHashes(s, d), sk)
    },

    // Deterministic Bloom-filter accuracy audit: insert the
    // customers-with-orders key set into an m=4096-bit / k=3 filter
    // (md5-derived positions — fully reproducible, so the DuckDB twin
    // rebuilds the SAME bitset), probe EVERY customer, and report
    // measured vs theoretical (1−e^(−kn/m))^k false-positive rate plus
    // the false-NEGATIVE count, which a correct Bloom filter must pin
    // at zero — the audit that sizes the m/k of bloom_prefilter_join
    // instead of trusting the formula. Bitset = a distinct bit-position
    // table (mergeable by union, the 100 TB shape); membership = one
    // bit-key equi-join counting k hits.
    "dq_bloom_fp_audit" -> { (s, d) =>
      val members = Tables.orders(s, d)
        .where(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey").as("ck")).distinct()
      def pos(i: Int, c: Column) =
        CleanFunctions.md5Hash64(concat(lit(s"bf$i:"), c)) % BloomM
      val bits = members.select(explode(array(
        (0 until BloomK).map(i => pos(i, col("ck"))): _*)).as("bit")).distinct()
      val nIns = members.agg(count(lit(1)).cast(DoubleType).as("n_inserted"))
      val cands = Tables.customer(s, d).select(col("c_custkey").as("ck"))
      val candPos = cands.select(col("ck"), explode(array(
        (0 until BloomK).map(i => pos(i, col("ck"))): _*)).as("bit"))
      val hits = candPos.join(bits, "bit").groupBy("ck").agg(count(lit(1)).as("nbits"))
      val truth = cands
        .join(members.withColumnRenamed("ck", "mk"), col("ck") === col("mk"), "left")
        .join(hits, Seq("ck"), "left")
        .select(col("ck"), col("mk").isNotNull.cast(LongType).as("is_member"),
          (coalesce(col("nbits"), lit(0L)) === BloomK.toLong).cast(LongType).as("in_bloom"))
      val t = lit(1.0) - exp(lit(-BloomK.toDouble) * col("n_inserted") / lit(BloomM.toDouble))
      truth.agg(
          count(lit(1)).as("n_tested"),
          sum(col("is_member")).as("n_members"),
          count(when(col("in_bloom") === 1L && col("is_member") === 0L, 1)).as("false_positives"),
          count(when(col("in_bloom") === 0L && col("is_member") === 1L, 1)).as("false_negatives"))
        .crossJoin(broadcast(nIns))
        .select(col("n_tested"), col("n_members"), col("false_positives"),
          col("false_negatives"),
          round6(col("false_positives").cast(DoubleType) /
            nullif((col("n_tested") - col("n_members")).cast(DoubleType), lit(0.0)))
            .as("fp_rate"),
          round6(t * t * t).as("theoretical_fp"))
    },

    // Deterministic HyperLogLog (p=8, md5-derived 60-bit hash) per
    // event type, WITH its own accuracy audit against the exact
    // distinct count — the mergeable-sketch primitive at 100 TB (a
    // register table is 256 small ints per group, combinable across
    // any partitioning: the map-side-partial shape countDistinct's
    // exact dedup can't keep once groups × keys stop fitting).
    // Everything is integer-exact until ONE division: ρ comes from a
    // generated comparison chain (never float log2), register sums use
    // 2^(53−r) INTEGER weights so Σ2^(−r) has no float-accumulation
    // order, and the standard linear-counting small-range correction
    // branches on the already-rounded estimate. The md5 hash makes the
    // sketch fully reproducible — the DuckDB oracle rebuilds the SAME
    // registers, so this "approximate" operator still hash-matches.
    "events_hll_distinct" -> { (s, d) =>
      val (bucket, rho) = CleanFunctions.hll60BucketRho(
        CleanFunctions.md5Hash64(concat(lit("hll:"), col("user_id"))))
      val regs = Tables.events(s, d)
        .select(col("event_type"), bucket.as("bucket"), rho.as("rho"))
        .groupBy("event_type", "bucket").agg(max(col("rho")).as("r"))
      hllAudit(s, d, regs)
    },

    // STREAMING twin of events_hll_distinct (SURVEY §2.12): the register
    // build runs as the emit-once flatMapGroupsWithState fold keyed by
    // (type, bucket) — one long of state per register, merged by max,
    // finalized at event-time timeout (StreamingAnomaly.hllRegisters).
    // The per-row (bucket, ρ) split is the SAME Catalyst expression tree
    // as the batch scan, and the estimate/audit downstream of the
    // registers is the shared hllAudit — so the streaming answer
    // hash-matches the batch entry's DuckDB oracle verbatim.
    "streaming_hll_distinct" -> { (s, d) =>
      import s.implicits._
      val rows = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[graft.streaming.KeyEvent].collect().toSeq
      val regs =
        if (rows.isEmpty) s.emptyDataset[graft.streaming.HllRegister].toDF()
        else {
          val maxUs = rows.iterator.map(e => StreamingAnomaly.tsUs(e.ts)).max
          StreamingAnomaly.replayToSink(s, rows, "graft_streaming_hll",
            Some(StreamingAnomaly.punctuationKeyEvent(
              maxUs + 10L * 86400L * 1000000L)))(
            ds => StreamingAnomaly.hllRegisters(ds.toDF()).toDF())
        }
      hllAudit(s, d, regs)
    },

    // Bottom-k hash-sample QUANTILE sketch per event type, WITH its own
    // accuracy audit against the exact interpolated percentile — the
    // quantile member of the sketch family (HLL: cardinality, CMS:
    // frequency, Bloom: membership, KMV: similarity; this: order
    // statistics). The sample is the k rows with the SMALLEST md5 row
    // hashes — a uniform sample that is (a) deterministic, so the
    // DuckDB twin rebuilds the identical sample and the "approximate"
    // answer hash-matches, and (b) MERGEABLE: bottom-k of a union is
    // the bottom-k of the merged per-partition bottom-k's, the same
    // constant-state combine contract as KMV — at 100 TB each
    // partition keeps k rows and the combiner keeps k of the merged
    // candidates, never a global sort of the data. Estimates and exact
    // truths both come from the shared rank-interpolation percentile
    // (no per-group value buffering).
    "events_quantile_sketch" -> { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_type"), col("value"), col("event_id"),
          CleanFunctions.md5Hash64(concat(lit("qsk:"), col("event_id"))).as("h"))
      // TWO-STAGE mergeable bottom-k (the KMV combine contract the
      // streaming twin honors), not a per-event_type rank window — that
      // would sort each type's whole corpus slice in one task. Stage 1:
      // bottom-k per (type, salt) in QskSalts parallel windows (each
      // sorts 1/QskSalts of the slice). Stage 2: the combiner keeps the
      // k smallest of the ≤ salts·k survivors per type via one bounded
      // sorted-array agg (collect_list state ≤ salts·k structs — a
      // constant at any corpus size). Bottom-k of a union = bottom-k of
      // merged per-part bottom-k's, so the sample — and the oracle's
      // plain global row_number reconstruction — is identical.
      val w1 = Window.partitionBy("event_type", "salt").orderBy("h", "event_id")
      val stage1 = e.withColumn("salt", pmod(col("event_id"), lit(QskSalts)))
        .withColumn("rn1", row_number().over(w1)).where(col("rn1") <= QskK)
      val sample = stage1.groupBy("event_type")
        .agg(slice(array_sort(collect_list(struct(col("h"), col("event_id"),
          col("value")))), 1, QskK).as("items"))
        .select(col("event_type"), explode(col("items")).as("it"))
        .select(col("event_type"), col("it.value").as("value"))
      val est = StatsOps.rankPercentilesBanded(sample, Seq("event_type"), "value", QskPs)
        .withColumnRenamed("pct", "pct_est")
      val exact = StatsOps.rankPercentilesBanded(
          e.select("event_type", "value"), Seq("event_type"), "value", QskPs)
        .withColumnRenamed("pct", "pct_exact")
      est.join(exact, Seq("event_type", "p"))
        .select(col("event_type"), col("p"), col("pct_est"), col("pct_exact"),
          round4(abs(col("pct_est") - col("pct_exact"))).as("abs_err"))
        .orderBy("event_type", "p")
    },

    // Streaming bottom-k quantile sketch, DRIVER-VERIFIED: the
    // events_quantile_sketch sample/estimate path replayed through a
    // flatMapGroupsWithState fold whose final emission rides
    // GroupStateTimeout.EventTimeTimeout — the 13th §2.12 row, and the
    // first whose output is a TERMINAL STATE SUMMARY (one sketch per
    // key, emitted when the watermark passes the key's timeout) rather
    // than per-row or per-window rows. State is k (hash, id, value)
    // triples per key — constant at any volume, mergeable under any
    // arrival order — and the emitted estimates hash-match the batch
    // sample-percentile oracle because the hash is the same Catalyst
    // expression and the interpolation is round4Jvm (the bit-exact JVM
    // replica of the SQL round4).
    "streaming_quantile_sketch" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      // Empty corpus: no punctuation point exists and the batch twin
      // emits nothing — emit the same empty frame instead of letting
      // .max throw on the driver.
      if (rows.isEmpty)
        s.emptyDataset[graft.streaming.QskEstimate].toDF()
      else {
        val maxUs = rows.iterator.map(e => StreamingAnomaly.tsUs(e.ts)).max
        StreamingAnomaly.replayToSink(s, rows, "graft_streaming_qsk",
            Some(StreamingAnomaly.punctuationEvent(maxUs + 10L * 86400L * 1000000L)))(
            ds => StreamingAnomaly.bottomKQuantiles(ds.toDF(), QskK, QskPs).toDF())
          .orderBy("event_type", "p")
      }
    },

    // DDSketch-style LOG-BUCKET quantile estimate per event type, WITH
    // its accuracy audit — the deterministic-relative-error sibling of
    // events_quantile_sketch (that one samples, so error shrinks with
    // k but has no guarantee; this one buckets by γ=1.02 powers, so
    // the estimate is within 2% of the truth BY CONSTRUCTION at any
    // corpus size). State is a (bucket → count) table — O(log range)
    // rows per group, mergeable by plain count addition, the shape a
    // 100 TB percentile monitor actually keeps. The percentile is the
    // smallest bucket whose cumulative count reaches ceil(p·n) — pure
    // integer decisions off one bounded window — and the returned
    // value is the bucket's geometric midpoint γ^(b+½), 4dp-rounded
    // so libm exp can't diverge.
    "events_ddsketch_quantile" -> { (s, d) =>
      val e = ddPositiveValues(s, d)
      val bc = e.withColumn("b",
          floor(round6(log(col("v")) / lit(DdLnGamma))).cast(LongType))
        .groupBy("event_type", "b").agg(count(lit(1)).as("cnt"))
      ddAudit(s, d, bc)
    },

    // STREAMING twin of events_ddsketch_quantile (SURVEY §2.12): the
    // log-bucket count build runs as the emit-once fold keyed by the
    // (type, bucket) cell (StreamingAnomaly.ddSketchBuckets — one long
    // of state per bucket, merged by sum, O(log range) cells per key),
    // finalized at event-time timeout; the bucket expression is the SAME
    // Catalyst tree as the batch scan and the quantile walk + exact
    // audit downstream are the shared ddAudit, so the streaming answer
    // hash-matches the batch entry's DuckDB oracle verbatim.
    "streaming_ddsketch_quantile" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.Event
      val rows = Tables.events(s, d)
        .where(col("value").isNotNull && col("value") > 0.0)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      val bc =
        if (rows.isEmpty) s.emptyDataset[graft.streaming.DdBucket].toDF()
        else {
          val maxUs = rows.iterator.map(e => StreamingAnomaly.tsUs(e.ts)).max
          StreamingAnomaly.replayToSink(s, rows, "graft_streaming_dd",
            Some(StreamingAnomaly.punctuationEvent(
              maxUs + 10L * 86400L * 1000000L)))(
            ds => StreamingAnomaly.ddSketchBuckets(ds.toDF(), DdLnGamma).toDF())
        }
      ddAudit(s, d, bc.select(col("event_type"), col("b"), col("cnt")))
    },

    // Sliding-window distinct counts by MERGING daily HLL registers —
    // the operational reason sketches exist at 100 TB: exact trailing-7d
    // countDistinct must re-touch 7 days of raw rows per day, while the
    // sketch side pre-aggregates each day to ≤ m registers ONCE and
    // every window is a max-merge of 7 tiny register sets (register
    // tables explode to their 7 covering windows — pure equi-groupBy,
    // no range join, no re-scan). The exact side stays as the built-in
    // accuracy audit (its day×7 row amplification is the audit's cost,
    // not the operator's). Same integer register pipeline as
    // events_hll_distinct, so the merged estimate hash-matches DuckDB.
    "events_hll_sliding" -> { (s, d) =>
      val (bucket, rho) = CleanFunctions.hll60BucketRho(
        CleanFunctions.md5Hash64(concat(lit("hll:"), col("user_id"))))
      val ev = Tables.events(s, d).select(col("event_type"),
        to_date(col("ts")).as("day"), col("user_id"), bucket.as("bucket"), rho.as("rho"))
      val days = ev.select(col("day")).distinct()
      val daily = ev.groupBy("event_type", "day", "bucket").agg(max(col("rho")).as("r"))
      val win = daily
        .withColumn("d0", explode(sequence(col("day"), date_add(col("day"), 6))))
        .join(broadcast(days.withColumnRenamed("day", "d0")), Seq("d0"))
        .groupBy("event_type", "d0", "bucket").agg(max(col("r")).as("r"))
      val agg = win.groupBy("event_type", "d0").agg(
          count(lit(1)).as("present"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")).as("si"))
        .withColumn("zeros", lit(HllM.toLong) - col("present"))
        .withColumn("sumz", (col("si") + col("zeros") * lit(1L << 53)).cast(DoubleType))
        .withColumn("e_raw", round4(lit(HllAlphaNum) / col("sumz")))
        .withColumn("hll_est",
          when(col("e_raw") <= lit(2.5 * HllM) && col("zeros") > 0L,
            round4(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros"))))
            .otherwise(col("e_raw")))
      val exact = ev.select(col("event_type"), col("day"), col("user_id")).distinct()
        .withColumn("d0", explode(sequence(col("day"), date_add(col("day"), 6))))
        .join(broadcast(days.withColumnRenamed("day", "d0")), Seq("d0"))
        .groupBy("event_type", "d0")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      agg.join(exact, Seq("event_type", "d0"))
        .select(col("event_type"), col("d0").as("window_end"),
          col("exact_distinct"), col("hll_est"),
          round4((col("hll_est") - col("exact_distinct").cast(DoubleType)) /
            col("exact_distinct").cast(DoubleType)).as("rel_err"))
        .orderBy("event_type", "window_end")
    },

    // The bottom-k quantile sketch as ONE SQL aggregate call:
    // `approx_pct_det(hash, id, value, p, k)` is a custom Catalyst
    // TypedImperativeAggregate (org.apache.spark.sql.graft
    // .BottomKQuantile, registered via GraftExtensions) whose partial
    // state is the k-entry bottom-k heap — map-side partials combine by
    // heap merge, so the shuffle carries k triples per (group,
    // partition) and nothing sorts the corpus. Same sample + same rank
    // interpolation as events_quantile_sketch, so the DuckDB oracle
    // reconstructs it exactly; a spec additionally asserts bit-parity
    // against the DataFrame two-stage path.
    "sql_quantile_agg" -> { (s, d) =>
      graft.GraftExtensions.register(s)
      Tables.events(s, d).where(col("value").isNotNull)
        .createOrReplaceTempView("graft_events_qagg")
      val h = CleanFunctions.md5Hash64Spark("concat('qsk:', event_id)")
      s.sql(s"""
        SELECT event_type,
          approx_pct_det($h, event_id, value, CAST(0.5 AS DOUBLE), $QskK) AS p50,
          approx_pct_det($h, event_id, value, CAST(0.9 AS DOUBLE), $QskK) AS p90
        FROM graft_events_qagg GROUP BY event_type ORDER BY event_type""")
    },

    // Deterministic top-k-per-group as ONE SQL aggregate call:
    // `topk_det(score, id, k)` (org.apache.spark.sql.graft.TopKIds) —
    // the heap-aggregate alternative to the rank-window idiom. A window
    // sorts every group's full slice; this aggregate's partial state is
    // a k-entry heap and map-side partials merge by heap union, so the
    // shuffle carries k pairs per (group, partition) — the shape that
    // survives a group whose slice is a terabyte. Score ties fall to
    // the smaller id on both engines.
    "sql_topk_agg" -> { (s, d) =>
      graft.GraftExtensions.register(s)
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_topk")
      // Emission: the id list is joined to one CSV string (the
      // ts_sequences precedent) — the driver's comparator cannot hash
      // array-typed cells (its r16 record errored on this entry with
      // "unhashable type: numpy.ndarray"); the aggregate itself is
      // unchanged.
      s.sql(s"""
        SELECT o_custkey,
          array_join(transform(
            topk_det(CAST(o_totalprice AS DOUBLE), o_orderkey, 3),
            x -> CAST(x AS STRING)), ',') AS top_orders
        FROM graft_orders_topk GROUP BY o_custkey ORDER BY o_custkey""")
    },

    // STREAMING twin of the topk_det heap aggregate (SURVEY §2.12): the
    // per-customer top-3 ranked order list built as an emit-once
    // EventTimeTimeout fold whose state is the same ≤ k (price, id) heap
    // the batch TypedImperativeAggregate carries as its partial —
    // bounded per key at any volume, mergeable under any arrival order.
    // Output is the exploded (custkey, rk, orderkey, price) ranking, so
    // the DuckDB rank-window oracle reconstructs it exactly.
    "streaming_topk" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{OrderRow, StreamingAnomaly}
      val rows = Tables.orders(s, d)
        .select(col("o_orderkey").cast(LongType).as("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("ts"),
          col("o_custkey").cast(LongType).as("o_custkey"),
          col("o_totalprice").cast(DoubleType).as("price"))
        .as[OrderRow].collect().toSeq
      if (rows.isEmpty) s.emptyDataset[graft.streaming.TopOrder].toDF()
      else {
        val maxUs = rows.iterator.map(r => StreamingAnomaly.tsUs(r.ts)).max
        val punct = OrderRow(-1L,
          new java.sql.Timestamp((maxUs + 10L * 86400L * 1000000L) / 1000L),
          -1L, 0.0)
        StreamingAnomaly.replayToSink(s, rows, "graft_streaming_topk",
            Some(punct))(ds => StreamingAnomaly.topKPerKey(ds, 3).toDF())
          .orderBy("o_custkey", "rk")
      }
    },

    // Sample-ratio-mismatch gate per segment: chi-square of the
    // observed weekend/weekday row split against the DECLARED 2/7-5/7
    // calendar expectation — the first thing a trustworthy
    // experimentation stack checks before reading any metric (a
    // mis-split assignment invalidates events_uplift/events_did/
    // events_cuped downstream). Pure grouped integer counts; one
    // χ²(1df) per segment, p = 2(1−Φ(√χ²)) through the shared portable
    // normal CDF; the p<0.001 flag is computed on the already-rounded
    // p so both engines agree at the boundary.
    "events_srm_check" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), (weekday(col("ts")) >= 5).cast(LongType).as("t"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("t")).as("n_t"))
        .withColumn("n_c", col("n") - col("n_t"))
        .withColumn("e_t", col("n").cast(DoubleType) * lit(2.0) / lit(7.0))
        .withColumn("e_c", col("n").cast(DoubleType) * lit(5.0) / lit(7.0))
        .withColumn("chi2", round4(
          (col("n_t") - col("e_t")) * (col("n_t") - col("e_t")) / col("e_t") +
          (col("n_c") - col("e_c")) * (col("n_c") - col("e_c")) / col("e_c")))
        .withColumn("p_value",
          round6(lit(2.0) * (lit(1.0) - CleanFunctions.normalCdf(sqrt(col("chi2"))))))
        .withColumn("srm_flag", when(col("p_value") < 0.001, lit(1L)).otherwise(lit(0L)))
        .select("event_type", "n", "n_t", "n_c", "chi2", "p_value", "srm_flag")
        .orderBy("event_type")
    },

    // Empirical-Bayes Beta-Binomial shrinkage of per-user purchase
    // rates: method-of-moments prior (α, β) from the corpus's own
    // rate distribution, posterior mean (k+α)/(n+α+β) — the
    // rate-metric sibling of ts_james_stein (a 3-event user's 33%
    // "conversion rate" shrinks hard toward the prior; a 300-event
    // user's barely moves; ranking users by posterior instead of raw
    // rate is the difference between surfacing signal and surfacing
    // small-n noise). One grouped integer pass per user, one 1-row
    // broadcast prior, rates 6dp-pinned before the moment sums;
    // concentration floored at 0.1 (coalesce-then-greatest on BOTH
    // engines — their NULL semantics for greatest differ).
    "events_eb_shrinkage" -> { (s, d) =>
      val pu = Tables.events(s, d).groupBy("user_id").agg(
          count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("k"))
        .withColumn("r", round6(col("k").cast(DoubleType) / col("n").cast(DoubleType)))
      val pr = pu.agg(
          count(lit(1)).cast(DoubleType).as("nu"),
          exactSum(col("r")).as("sr"),
          exactSum(round6(col("r") * col("r"))).as("srr"))
        .select((col("sr") / col("nu")).as("m"),
          greatest(col("srr") / col("nu") -
            (col("sr") / col("nu")) * (col("sr") / col("nu")), lit(0.0)).as("v"))
        .select(col("m"), greatest(coalesce(
          col("m") * (lit(1.0) - col("m")) / nullif(col("v"), lit(0.0)) - lit(1.0),
          lit(0.1)), lit(0.1)).as("conc"))
        .select(round6(col("m") * col("conc")).as("alpha"),
          round6((lit(1.0) - col("m")) * col("conc")).as("beta"))
      pu.crossJoin(broadcast(pr))
        .select(col("user_id"), col("n"), col("k"), col("r").as("raw_rate"),
          round6((col("k").cast(DoubleType) + col("alpha")) /
            (col("n").cast(DoubleType) + col("alpha") + col("beta"))).as("post_rate"),
          round6(col("n").cast(DoubleType) /
            (col("n").cast(DoubleType) + col("alpha") + col("beta"))).as("shrink_w"))
        .orderBy("user_id")
    },

    // Delta-method ratio-metric comparison per value band: purchases
    // per view is a RATIO of two per-user counts, so its variance needs
    // the delta method Var(x̄/ȳ) ≈ (σx² − 2Rσxy + R²σy²)/(n·ȳ²) — the
    // standard correction events_uplift's plain rate test can't supply
    // (per-user correlation between numerator and denominator).
    // Everything reduces to six exact integer moments per (band, arm);
    // each arm's R and Var are 6dp-pinned, the z and p computed from
    // the pinned values through the shared normal CDF.
    "events_ratio_delta" -> { (s, d) =>
      val ev = Tables.events(s, d).where(col("value").isNotNull)
        .select(floor(col("value") / 50.0).cast(LongType).as("band"),
          (weekday(col("ts")) >= 5).cast(LongType).as("t"), col("user_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("x"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("y"))
      val peruser = ev.groupBy("band", "t", "user_id")
        .agg(sum(col("x")).as("x"), sum(col("y")).as("y"))
      val arm = peruser.groupBy("band", "t").agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .where(col("sy") > 0L)
        .withColumn("nd", col("n").cast(DoubleType))
        .withColumn("r", col("sx").cast(DoubleType) / col("sy").cast(DoubleType))
        .withColumn("my", col("sy").cast(DoubleType) / col("nd"))
        .withColumn("vx", (col("sxx").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sx").cast(DoubleType) / col("nd")) / col("nd"))
        .withColumn("vy", (col("syy").cast(DoubleType) -
          col("sy").cast(DoubleType) * col("sy").cast(DoubleType) / col("nd")) / col("nd"))
        .withColumn("vxy", (col("sxy").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sy").cast(DoubleType) / col("nd")) / col("nd"))
        .withColumn("r6", round6(col("r")))
        .withColumn("vr", round6(greatest(
          (col("vx") - lit(2.0) * col("r") * col("vxy") +
            col("r") * col("r") * col("vy")) / (col("nd") * col("my") * col("my")),
          lit(0.0))))
      val piv = arm.groupBy("band").agg(
          max(when(col("t") === 1L, col("n"))).as("n_t"),
          max(when(col("t") === 0L, col("n"))).as("n_c"),
          max(when(col("t") === 1L, col("r6"))).as("ratio_t"),
          max(when(col("t") === 0L, col("r6"))).as("ratio_c"),
          max(when(col("t") === 1L, col("vr"))).as("v_t"),
          max(when(col("t") === 0L, col("vr"))).as("v_c"))
        .where(col("n_t").isNotNull && col("n_c").isNotNull)
      piv.withColumn("z", round4((col("ratio_t") - col("ratio_c")) /
          nullif(sqrt(col("v_t") + col("v_c")), lit(0.0))))
        .withColumn("p_value",
          round6(lit(2.0) * (lit(1.0) - CleanFunctions.normalCdf(abs(col("z"))))))
        .select("band", "n_t", "n_c", "ratio_t", "ratio_c", "z", "p_value")
        .orderBy("band")
    },

    // Directed reciprocity of the trade graph: share of edges whose
    // REVERSE edge exists, plus the Pearson correlation between w(i→j)
    // and w(j→i) — distinguishes two-way trading partnerships from
    // one-way supply flows, the directed question the undirected
    // degree/assortativity metrics erase. One self-join of the O(N²)
    // edge aggregate on the swapped key; weight moments are exact
    // integer sums.
    "nation_reciprocity" -> { (s, d) =>
      val e = tradeEdges(s, d).where(col("src") =!= col("dst"))
      val j = e.as("a").join(e.as("b"),
          col("a.src") === col("b.dst") && col("a.dst") === col("b.src"), "left")
        .select(col("a.w").as("w"), coalesce(col("b.w"), lit(0L)).as("wr"))
      j.agg(
          count(lit(1)).as("n_edges"),
          count(when(col("wr") > 0L, 1)).as("n_reciprocated"),
          count(lit(1)).cast(DoubleType).as("n"),
          sum(col("w")).cast(DoubleType).as("sx"),
          sum(col("wr")).cast(DoubleType).as("sy"),
          sum(col("w") * col("wr")).cast(DoubleType).as("sxy"),
          sum(col("w") * col("w")).cast(DoubleType).as("sxx"),
          sum(col("wr") * col("wr")).cast(DoubleType).as("syy"))
        .select(col("n_edges"), col("n_reciprocated"),
          round6(col("n_reciprocated").cast(DoubleType) /
            col("n_edges").cast(DoubleType)).as("reciprocity"),
          round4(CleanFunctions.momentCorr(col("n"), col("sx"), col("sy"),
            col("sxy"), col("sxx"), col("syy"))).as("weight_symmetry"))
    },

    // 3-core of the trade graph by iterative peeling: repeatedly drop
    // nations with fewer than 3 distinct trade partners among the
    // SURVIVORS (8 unrolled rounds — converged long before that on any
    // graph whose degeneracy ordering shrinks geometrically; the
    // truncation is the defined quantity) — the standard "dense
    // backbone" extraction that pagerank/HITS scores imply but never
    // materialize. Each round is one grouped degree count + two keyed
    // semi-joins on the surviving-node set; the edge frame is
    // localCheckpoint'ed per round so lineage stays O(1), the
    // dedup_clusters fixpoint discipline.
    "nation_kcore" -> { (s, d) =>
      val e = tradeEdges(s, d).where(col("src") =!= col("dst"))
      var und = e.select(col("src").as("a"), col("dst").as("b"))
        .union(e.select(col("dst").as("a"), col("src").as("b"))).distinct()
        .localCheckpoint()
      // Early exit when a round removes no edge (r16 optimization):
      // peeling only ever deletes rows, so an unchanged count is the
      // fixpoint and every remaining round is a no-op — same result as
      // the full 8-round unroll (the defined quantity), typically in 2-3
      // rounds. The count is a cheap scan of the just-checkpointed
      // blocks.
      var remaining = und.count()
      var stable = false
      for (_ <- 1 to 8 if !stable) {
        val surv = und.groupBy("a").agg(count(lit(1)).as("deg"))
          .where(col("deg") >= 3L).select(col("a").as("keep"))
        und = und
          .join(surv, col("a") === col("keep")).drop("keep")
          .join(surv.withColumnRenamed("keep", "keepb"), col("b") === col("keepb"))
          .drop("keepb")
          .localCheckpoint()
        val n = und.count()
        stable = n == remaining
        remaining = n
      }
      und.groupBy("a").agg(count(lit(1)).as("core_degree"))
        .join(broadcast(Tables.nation(s, d)), col("a") === col("n_nationkey"))
        .select(col("a").as("nationkey"), col("n_name"), col("core_degree"))
        .orderBy("nationkey")
    },

    // CORPUS-SCALE connected components (the §2.7 graph machinery under
    // a graph whose edge count scales with the data, unlike the 25-node
    // nation graph): customers are linked when they bought the same part
    // in the same calendar week. Edge generation is the dedup-style
    // BLOCKED equi-join — block key (part, week), df fence (2 ≤ block
    // size ≤ CoPurchaseMaxBlock distinct customers), so pairs per block
    // are O(fence²) and block count scales with the corpus; nothing is
    // corpus². Components from GraphOps.minLabelPropagate (min-label
    // fixpoint + pointer jumping, O(log diameter) rounds, per-round
    // localCheckpoint); component id = min customer key, so the oracle's
    // recursive-CTE closure matches exactly.
    "customer_components" -> { (s, d) =>
      coPurchaseComponents(s, d)
        .select(col("id").as("c_custkey"), col("lbl").as("component_id"))
        .orderBy("c_custkey")
    },

    // Component-SIZE histogram over the same graph — the curation
    // readout (how big do co-purchase clusters get) and the convergence
    // audit (a max-rounds split would surface as two half-size
    // components here). Derived from the SHARED components frame via
    // GraphOps.componentSizes — the fixpoint runs once per (session,
    // dir), not once per entry (r10 verdict item 4: the two slowest
    // bench entries were the same fixpoint computed twice).
    "customer_component_sizes" -> { (s, d) =>
      graft.operators.GraphOps.componentSizes(coPurchaseComponents(s, d))
        .orderBy("component_size")
    },

    // COLD twin of customer_components: evicts the session memo first so
    // every run (every bench rep) pays the full fixpoint, making the
    // one-time cost machine-readable in BENCH instead of prose in
    // SCALING.md (r11 verdict item 5). Same output, same oracle; the two
    // warm entries keep measuring the amortized readout path.
    "customer_components_cold" -> { (s, d) =>
      evictCoPurchaseMemo(s, d)
      coPurchaseComponents(s, d)
        .select(col("id").as("c_custkey"), col("lbl").as("component_id"))
        .orderBy("c_custkey")
    },

    // Uplift report (T-learner on bins): difference in outcome rate
    // between treated (weekend) and control (weekday) per value band —
    // the heterogeneous-treatment-effect readout next to events_cuped /
    // events_did. Pure grouped integer counts; every rate is one IEEE
    // division; overall ATE broadcast onto each band row.
    "events_uplift" -> { (s, d) =>
      val ev = Tables.events(s, d).where(col("value").isNotNull)
        .select(floor(col("value") / 50.0).cast(LongType).as("band"),
          (weekday(col("ts")) >= 5).cast(LongType).as("t"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      val bands = ev.groupBy("band").agg(
        sum(when(col("t") === 1L, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("t") === 1L, col("y")).otherwise(0L)).as("y_t"),
        sum(when(col("t") === 0L, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("t") === 0L, col("y")).otherwise(0L)).as("y_c"))
      val ate = bands.agg(
        round6(sum(col("y_t")).cast(DoubleType) / sum(col("n_t")).cast(DoubleType) -
          sum(col("y_c")).cast(DoubleType) / sum(col("n_c")).cast(DoubleType)).as("ate"))
      bands.crossJoin(broadcast(ate))
        .select(col("band"), col("n_t"), col("n_c"),
          round6(col("y_t").cast(DoubleType) / nullif(col("n_t").cast(DoubleType), lit(0.0))).as("rate_t"),
          round6(col("y_c").cast(DoubleType) / nullif(col("n_c").cast(DoubleType), lit(0.0))).as("rate_c"),
          round6(col("y_t").cast(DoubleType) / nullif(col("n_t").cast(DoubleType), lit(0.0)) -
            col("y_c").cast(DoubleType) / nullif(col("n_c").cast(DoubleType), lit(0.0))).as("uplift"),
          col("ate"))
        .orderBy("band")
    }
  )

  /** Weighted trade edges (customer nation -> supplier nation) — the
    * same graph nation_pagerank walks; kept separate so HITS and future
    * graph ops share one definition.
    */
  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))

  /** HLL constants: p=8 → m=256 registers; hash = 60-bit md5 prefix,
    * top 8 bits bucket, low 52 bits drive ρ ∈ [1, 53]. HllAlphaNum =
    * α₂₅₆ · m² · 2⁵³ (the whole numerator as one pinned literal).
    */
  private val HllM = 256
  private val HllRestMod = 4503599627370496L // 2^52
  private val HllAlphaNum =
    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0

  /** Positive event values (event_type, v) — the DDSketch domain (a
    * log-bucket sketch is defined on v > 0), shared by both entries'
    * exact-audit sides and the batch bucket build.
    */
  private def ddPositiveValues(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("value").isNotNull && col("value") > 0.0)
      .select(col("event_type"), col("value").as("v"))

  /** Quantile walk + exact audit downstream of a DDSketch bucket-count
    * table (event_type, b, cnt) — shared by the batch scan build and the
    * streaming fold emission. The cumulative walk runs over the
    * O(log range)-row bucket table (a coarse-key window over an
    * already-aggregated bounded input, not the corpus).
    */
  private def ddAudit(s: SparkSession, d: String, bc: DataFrame): DataFrame = {
    val wb = Window.partitionBy("event_type").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bc
      .withColumn("cum", sum(col("cnt")).over(wb))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("event_type")))
    val est = cum.withColumn("p", explode(array(QskPs.map(lit): _*)))
      .where(col("cum") >= ceil(col("p") * col("n").cast(DoubleType)))
      .groupBy("event_type", "p").agg(min(col("b")).as("b"))
      .withColumn("pct_est", round4(
        exp((col("b").cast(DoubleType) + lit(0.5)) * lit(DdLnGamma))))
      .select("event_type", "p", "pct_est")
    val exact = StatsOps.rankPercentilesBanded(
        ddPositiveValues(s, d), Seq("event_type"), "v", QskPs)
      .withColumnRenamed("pct", "pct_exact")
    est.join(exact, Seq("event_type", "p"))
      .select(col("event_type"), col("p"), col("pct_est"), col("pct_exact"),
        round4((col("pct_est") - col("pct_exact")) / col("pct_exact")).as("rel_err"))
      .orderBy("event_type", "p")
  }

  /** Distinct (event_type, user_id) pairs with the KMV hash — the shared
    * input of the batch sketch window, the streaming audit's exact side,
    * and the per-type counts. localCheckpoint'ed: three consumers.
    */
  private def kmvUserHashes(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", CleanFunctions.md5Hash64(concat(lit("kmv:"), col("user_id"))))
      .localCheckpoint()

  /** Pairwise KMV union-resample Jaccard estimate + exact audit
    * downstream of a per-type bottom-k hash table `sk` (event_type, h) —
    * shared by the batch window build and the streaming fold emission.
    */
  private def kmvAudit(uh: DataFrame, sk: DataFrame): DataFrame = {
    val types = sk.select(col("event_type").as("t")).distinct()
    val tagA = sk.join(types.select(col("t").as("tb")), col("event_type") < col("tb"))
      .select(col("event_type").as("ta"), col("tb"), col("h"), lit(1L).as("from_a"))
    val tagB = sk.join(types.select(col("t").as("ta")), col("ta") < col("event_type"))
      .select(col("ta"), col("event_type").as("tb"), col("h"), lit(0L).as("from_a"))
    val ded = tagA.union(tagB).groupBy("ta", "tb", "h")
      .agg(max(col("from_a")).as("in_a"), max(lit(1L) - col("from_a")).as("in_b"))
    val wu = Window.partitionBy("ta", "tb").orderBy("h")
    val est = ded.withColumn("rn", row_number().over(wu)).where(col("rn") <= KmvK)
      .groupBy("ta", "tb").agg(
        count(lit(1)).as("k_eff"),
        count(when(col("in_a") === 1L && col("in_b") === 1L, 1)).as("n_both"))
      .withColumn("kmv_jaccard",
        round6(col("n_both").cast(DoubleType) / col("k_eff").cast(DoubleType)))
    val cnt = uh.groupBy("event_type").agg(count(lit(1)).as("nu"))
    val inter = uh.as("x").join(uh.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("ni"))
    // LEFT join + ni→0: a type pair with ZERO exact overlap (where a
    // sketch false-positive is exactly what this audit should surface)
    // must appear with exact_jaccard = 0, not vanish from the report.
    est.join(inter, Seq("ta", "tb"), "left")
      .withColumn("ni", coalesce(col("ni"), lit(0L)))
      .join(cnt.select(col("event_type").as("ta"), col("nu").as("na")), "ta")
      .join(cnt.select(col("event_type").as("tb"), col("nu").as("nb")), "tb")
      .withColumn("exact_jaccard", round6(col("ni").cast(DoubleType) /
        (col("na") + col("nb") - col("ni")).cast(DoubleType)))
      .select(col("ta"), col("tb"), col("kmv_jaccard"), col("exact_jaccard"),
        round4(abs(col("kmv_jaccard") - col("exact_jaccard"))).as("abs_err"))
      .orderBy("ta", "tb")
  }

  /** DuckDB replica of the full HLL build + [[hllAudit]] — one string,
    * shared by the batch and streaming entries (same registers by
    * construction, so the same oracle).
    */
  private lazy val HllOracleSql: String = {
    val rhoCase = "CASE " + (51 to 0 by -1).map(k =>
      s"WHEN rest >= ${1L << k} THEN ${52 - k}").mkString(" ") + " ELSE 53 END"
    val an = CleanFunctions.dlitSql(HllAlphaNum)
    s"""WITH e AS (SELECT event_type,
       |  ${CleanFunctions.md5Hash64Sql("'hll:' || user_id")} AS h FROM events),
       |b AS (SELECT event_type, h // $HllRestMod AS bucket,
       |  h % $HllRestMod AS rest FROM e),
       |rh AS (SELECT event_type, bucket, $rhoCase AS rho FROM b),
       |regs AS (SELECT event_type, bucket, max(rho) AS r FROM rh GROUP BY 1, 2),
       |ag AS (SELECT event_type, count(*) AS present,
       |  sum(CAST(1 AS BIGINT) << CAST(53 - r AS INT)) AS si
       |  FROM regs GROUP BY 1),
       |z AS (SELECT event_type, $HllM - present AS zeros,
       |  CAST(si + ($HllM - present) * ${1L << 53} AS DOUBLE) AS sumz FROM ag),
       |er AS (SELECT event_type, zeros, ${round4Sql(s"$an / sumz")} AS e_raw FROM z),
       |est AS (SELECT event_type,
       |  CASE WHEN e_raw <= ${2.5 * HllM} AND zeros > 0
       |       THEN ${round4Sql(s"$HllM.0 * ln($HllM.0 / zeros)")}
       |       ELSE e_raw END AS hll_est FROM er),
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
       |  FROM events GROUP BY 1)
       |SELECT est.event_type, exact_distinct, hll_est,
       |  ${round4Sql("(hll_est - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE)")} AS rel_err
       |FROM est JOIN ex USING (event_type) ORDER BY est.event_type""".stripMargin
  }

  /** Estimate + accuracy audit downstream of an HLL register table
    * (event_type, bucket, r) — shared by the batch scan build and the
    * streaming fold emission so both produce the identical frame.
    * Everything is integer-exact until ONE division: register sums use
    * 2^(53−r) INTEGER weights so Σ2^(−r) has no float-accumulation
    * order, and the standard linear-counting small-range correction
    * branches on the already-rounded estimate.
    */
  private def hllAudit(s: SparkSession, d: String, regs: DataFrame): DataFrame = {
    val agg = regs.groupBy("event_type").agg(
        count(lit(1)).as("present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")).as("si"))
      .withColumn("zeros", lit(HllM.toLong) - col("present"))
      .withColumn("sumz", (col("si") + col("zeros") * lit(1L << 53)).cast(DoubleType))
      .withColumn("e_raw", round4(lit(HllAlphaNum) / col("sumz")))
      .withColumn("hll_est",
        when(col("e_raw") <= lit(2.5 * HllM) && col("zeros") > 0L,
          round4(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros"))))
          .otherwise(col("e_raw")))
    val exact = Tables.events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    agg.join(exact, "event_type")
      .select(col("event_type"), col("exact_distinct"), col("hll_est"),
        round4((col("hll_est") - col("exact_distinct").cast(DoubleType)) /
          col("exact_distinct").cast(DoubleType)).as("rel_err"))
      .orderBy("event_type")
  }

  /** Bloom audit geometry: m bits, k hash functions. */
  private val BloomM = 4096L
  private val BloomK = 3

  /** KMV sketch size (bottom-k hashes per set). */
  private val KmvK = 64

  /** Quantile sketch: sample size per group + probed percentiles;
    * QskSalts = stage-1 fan-out of the two-stage bottom-k sample. */
  private val QskK = 128
  private val QskSalts = 32
  private val QskPs = Seq(0.5, 0.9)
  private val QskPsSqlList =
    QskPs.map(p => s"CAST($p AS DOUBLE)").mkString("[", ", ", "]")

  /** DDSketch-style log-bucket base: gamma = 1.02 ⇒ ≤2% relative error
    * by construction. ln(gamma) is baked as ONE exact-double literal on
    * both engines (dlitSql), and the bucket quotient ln(v)/ln(γ) is
    * 6dp-rounded BEFORE floor so a last-ulp libm difference at an exact
    * bucket boundary (e.g. v = γ^k) cannot flip the bucket.
    */
  private val DdGamma = 1.02
  private val DdLnGamma = math.log(DdGamma)

  /** Rank-interpolation percentile CTE block (StatsOps.rankPercentiles
    * replica) over a relation with (event_type, v) — shared by the
    * sketch-audit oracles. Emits `{pfx}o(event_type, p, outCol)`.
    */
  private def rankPctBlockSql(src: String, pfx: String, outCol: String): String =
    s"""${pfx}r AS (
       |  SELECT event_type, v,
       |    row_number() OVER (PARTITION BY event_type ORDER BY v) - 1 AS rn0,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM $src),
       |${pfx}f AS (
       |  SELECT event_type, p, v, rn0,
       |    CAST(n - 1 AS DOUBLE) * p AS hh,
       |    floor(CAST(n - 1 AS DOUBLE) * p) AS lo,
       |    ceil(CAST(n - 1 AS DOUBLE) * p) AS hi
       |  FROM ${pfx}r, (SELECT unnest($QskPsSqlList) AS p) px
       |  WHERE rn0 = floor(CAST(n - 1 AS DOUBLE) * p)
       |     OR rn0 = ceil(CAST(n - 1 AS DOUBLE) * p)),
       |${pfx}o AS (
       |  SELECT event_type, p,
       |    ${CleanFunctions.round4Sql("min(CASE WHEN rn0 = lo THEN v END) + (max(hh) - max(lo)) * (min(CASE WHEN rn0 = hi THEN v END) - min(CASE WHEN rn0 = lo THEN v END))")} AS $outCol
       |  FROM ${pfx}f GROUP BY event_type, p)""".stripMargin

  /** Co-purchase block fence: max distinct customers per (part, week)
    * block admitted to the pair join (observed block sizes at the
    * current generator top out at ~4; the fence is the 100-TB guard
    * against a hot part×week turning the blocked join quadratic).
    */
  private val CoPurchaseMaxBlock = 10

  /** Undirected customer co-purchase edges (x, y), x < y: customers who
    * bought the same part in the same Monday-start week, blocks df-fenced
    * to ≤ [[CoPurchaseMaxBlock]]. Shared by the component entries.
    */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    // One explicit (p, w) repartition feeds the WHOLE block pipeline
    // (r16, guide §2.4): HashPartitioning(p, w) satisfies the (c, p, w)
    // distinct (subset clustering), the fence group-by, the fence join
    // and the blocked self-join, so all five previously separate
    // exchanges collapse into this one; only the final pair distinct
    // still shuffles (by (x, y) — unavoidable, it dedups across blocks).
    // Same rows at every step — distinct/group-by results don't depend
    // on which partition a key lands in.
    // localCheckpoint (r17): the self-join below references cp in BOTH
    // branches, so without materialization the lineitem⋈orders + distinct
    // subtree runs twice (profiled as two ~1.3 s duplicate jobs at sf0.1;
    // two corpus scans at 100 TB). The checkpoint pins the (p, w) layout,
    // so everything downstream still reuses the one exchange.
    val cp = Tables.spreadKeyed(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p"),
            date_trunc("week", col("o_orderdate")).as("w")),
        col("p"), col("w"))
      .distinct()
      .localCheckpoint()
    val fence = cp.groupBy("p", "w").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2L && col("n") <= CoPurchaseMaxBlock.toLong)
      .select("p", "w")
    val blocked = cp.join(fence, Seq("p", "w"))
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.p") === col("b.p") && col("a.w") === col("b.w") &&
          col("a.c") < col("b.c"))
      .select(col("a.c").as("x"), col("b.c").as("y"))
      .distinct()
  }

  /** Co-purchase components, computed ONCE per (session, sf dir) and
    * shared by `customer_components` / `customer_component_sizes` — the
    * composed "components in, readouts derived" API shape the r10
    * verdict asked for (its two slowest bench entries were the same
    * fixpoint run twice). Safe to memoize: minLabelPropagate returns a
    * localCheckpoint'ed frame (pinned RDD, immune to
    * spark.catalog.clearCache() between Verify entries), the inputs are
    * immutable parquet keyed by dir, and the cache holds one O(#customers)
    * label frame per (session, dir) — model-state-sized, never corpus-
    * sized. Entries stay standalone per the driver contract; the memo is
    * a session-scoped performance detail, not a correctness dependency.
    */
  private val coPurchaseMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def coPurchaseComponents(s: SparkSession, d: String): DataFrame = {
    // Purge entries owned by STOPPED sessions on every access (ADVICE
    // r11): without this the map pins localCheckpoint'ed RDD blocks for
    // the JVM lifetime after their session is gone. Live-session entries
    // stay — that amortization is the point of the memo.
    val it = coPurchaseMemo.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    coPurchaseMemo.computeIfAbsent((s, d), _ =>
      graft.operators.GraphOps.minLabelPropagate(coPurchaseEdges(s, d)))
  }

  /** Drop the memoized components fixpoint for (s, d) so the next
    * [[coPurchaseComponents]] call pays the FULL cold cost. Exists for
    * the `customer_components_cold` bench entry (r11 verdict item 5: the
    * memo made the components pair's BENCH numbers readout-only, hiding
    * the one-time fixpoint cost from the machine-readable artifact).
    */
  private[graft] def evictCoPurchaseMemo(s: SparkSession, d: String): Unit =
    coPurchaseMemo.remove((s, d))

  /** DuckDB CTE block shared by the co-purchase component oracles:
    * emits `lab(id, lbl)` — the min-reachable-id closure over the same
    * fenced edge set.
    */
  private lazy val coPurchaseLabCte: String =
    s"""WITH RECURSIVE cp AS (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p,
       |    date_trunc('week', o.o_orderdate) AS w
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |ok AS (SELECT p, w FROM (
       |  SELECT p, w, count(*) AS n FROM cp GROUP BY p, w)
       |  WHERE n BETWEEN 2 AND $CoPurchaseMaxBlock),
       |pairs AS (
       |  SELECT DISTINCT a.c AS x, b.c AS y
       |  FROM cp a
       |  JOIN cp b ON a.p = b.p AND a.w = b.w AND a.c < b.c
       |  JOIN ok ON a.p = ok.p AND a.w = ok.w),
       |e AS (SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs),
       |reach(id, lbl) AS (
       |  SELECT DISTINCT x AS id, x AS lbl FROM e
       |  UNION
       |  SELECT e.y AS id, r.lbl FROM reach r JOIN e ON e.x = r.id),
       |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id)""".stripMargin

  private val tradeEdgesSql: String =
    """SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2""".stripMargin

  /** One HITS iteration as SQL: reads hub/auth state `st(node, h, a)`,
    * emits the next state. Mirrors the Spark loop exactly.
    */
  private def hitsIterSql(st: String): String =
    s"""SELECT n.n_nationkey AS node,
       |  ${round6Sql("CAST(coalesce(hr.m, 0) AS DOUBLE) / CAST(ht.t AS DOUBLE)")} AS h,
       |  ${round6Sql("CAST(coalesce(ar.m, 0) AS DOUBLE) / CAST(at2.t AS DOUBLE)")} AS a
       |FROM nation n
       |LEFT JOIN (SELECT e.dst, sum(CAST(${round6Sql("st.h * CAST(e.w AS DOUBLE)")} AS DECIMAL(18,6))) AS m
       |           FROM e JOIN $st st ON e.src = st.node GROUP BY 1) ar ON n.n_nationkey = ar.dst
       |CROSS JOIN (SELECT sum(m) AS t FROM (SELECT e.dst, sum(CAST(${round6Sql("st.h * CAST(e.w AS DOUBLE)")} AS DECIMAL(18,6))) AS m
       |           FROM e JOIN $st st ON e.src = st.node GROUP BY 1)) at2
       |LEFT JOIN (SELECT e.src, sum(CAST(${round6Sql(s"a2.a * CAST(e.w AS DOUBLE)")} AS DECIMAL(18,6))) AS m
       |           FROM e JOIN (
       |             SELECT n2.n_nationkey AS node, ${round6Sql("CAST(coalesce(ar2.m, 0) AS DOUBLE) / CAST(at3.t AS DOUBLE)")} AS a
       |             FROM nation n2
       |             LEFT JOIN (SELECT e.dst, sum(CAST(${round6Sql("st.h * CAST(e.w AS DOUBLE)")} AS DECIMAL(18,6))) AS m
       |                        FROM e JOIN $st st ON e.src = st.node GROUP BY 1) ar2 ON n2.n_nationkey = ar2.dst
       |             CROSS JOIN (SELECT sum(m) AS t FROM (SELECT e.dst, sum(CAST(${round6Sql("st.h * CAST(e.w AS DOUBLE)")} AS DECIMAL(18,6))) AS m
       |                        FROM e JOIN $st st ON e.src = st.node GROUP BY 1)) at3
       |           ) a2 ON e.dst = a2.node GROUP BY 1) hr ON n.n_nationkey = hr.src
       |CROSS JOIN (SELECT sum(m) AS t FROM (SELECT e.src, sum(CAST(${round6Sql(s"a2.a * CAST(e.w AS DOUBLE)")} AS DECIMAL(18,6))) AS m
       |           FROM e JOIN (
       |             SELECT n2.n_nationkey AS node, ${round6Sql("CAST(coalesce(ar2.m, 0) AS DOUBLE) / CAST(at3.t AS DOUBLE)")} AS a
       |             FROM nation n2
       |             LEFT JOIN (SELECT e.dst, sum(CAST(${round6Sql("st.h * CAST(e.w AS DOUBLE)")} AS DECIMAL(18,6))) AS m
       |                        FROM e JOIN $st st ON e.src = st.node GROUP BY 1) ar2 ON n2.n_nationkey = ar2.dst
       |             CROSS JOIN (SELECT sum(m) AS t FROM (SELECT e.dst, sum(CAST(${round6Sql("st.h * CAST(e.w AS DOUBLE)")} AS DECIMAL(18,6))) AS m
       |                        FROM e JOIN $st st ON e.src = st.node GROUP BY 1)) at3
       |           ) a2 ON e.dst = a2.node GROUP BY 1)) ht""".stripMargin

  /** Recursive-CTE replay of the exact garchPath fold — shared by the
    * batch `ts_garch_vol` and the streaming replay `streaming_garch`
    * oracles so the two checks can never drift apart: same
    * left-associated update omega + alpha*r^2 + beta*sigma^2, same
    * unconditional-variance init, every constant dlit'd so both engines
    * fold the same doubles.
    */
  private lazy val GarchOracleSql: String = {
    val W2 = "PARTITION BY user_id ORDER BY ts, event_id"
    val w0 = CleanFunctions.dlitSql(GarchOmega)
    val a0 = CleanFunctions.dlitSql(GarchAlpha)
    val b0 = CleanFunctions.dlitSql(GarchBeta)
    val u0 = CleanFunctions.dlitSql(GarchUncond)
    s"""WITH RECURSIVE v AS (
       |  SELECT user_id, event_id, ret,
       |    row_number() OVER ($W2) AS rn
       |  FROM (SELECT user_id, ts, event_id,
       |          value - lag(value, 1) OVER ($W2) AS ret FROM events)
       |  WHERE ret IS NOT NULL),
       |g AS (
       |  SELECT user_id, event_id, rn, ret, $u0 AS s2
       |  FROM v WHERE rn = 1
       |  UNION ALL
       |  SELECT v.user_id, v.event_id, v.rn, v.ret,
       |    $w0 + $a0 * (h.ret * h.ret) + $b0 * h.s2
       |  FROM g h JOIN v ON v.user_id = h.user_id AND v.rn = h.rn + 1)
       |SELECT event_id, ${round4Sql("ret")} AS ret,
       |  ${round4Sql("sqrt(s2)")} AS vol,
       |  ${round4Sql("ret / sqrt(s2)")} AS z
       |FROM g ORDER BY event_id""".stripMargin
  }

  private val baseOracleSql: Map[String, String] = Map(

    "events_roc_auc" ->
      s"""WITH ev AS (SELECT value AS v, event_type FROM events WHERE value IS NOT NULL),
         |tot AS (SELECT v, count(*) AS n FROM ev GROUP BY 1),
         |pr AS (SELECT v, n, sum(n) OVER (ORDER BY v) AS cum FROM tot),
         |rk AS (SELECT v, 2*(cum - n) + n + 1 AS rank2 FROM pr),
         |j AS (SELECT v, event_type, count(*) AS n_vt FROM ev GROUP BY 1, 2),
         |s AS (SELECT event_type, sum(n_vt * rank2) AS rs2, sum(n_vt) AS n_pos
         |      FROM j JOIN rk USING (v) GROUP BY 1),
         |nn AS (SELECT count(*) AS n_tot FROM ev)
         |SELECT event_type, CAST(n_pos AS BIGINT) AS n_pos,
         |  CAST(n_tot - n_pos AS BIGINT) AS n_neg,
         |  ${round6Sql("CAST(rs2 - n_pos*(n_pos+1) AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_tot - n_pos AS DOUBLE))")} AS auc
         |FROM s, nn ORDER BY event_type""".stripMargin,

    "events_pr_auc" ->
      s"""WITH ev AS (SELECT value AS v, event_type FROM events WHERE value IS NOT NULL),
         |byv AS (SELECT v, count(*) AS n FROM ev GROUP BY 1),
         |nn AS (SELECT count(*) AS n_tot FROM ev),
         |ge AS (SELECT v,
         |  (SELECT n_tot FROM nn) - sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + n AS pp
         |  FROM byv),
         |jt AS (SELECT v, event_type, count(*) AS n_vt FROM ev GROUP BY 1, 2),
         |tp AS (SELECT v, event_type, n_vt,
         |  sum(n_vt) OVER (PARTITION BY event_type ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
         |  FROM jt),
         |np AS (SELECT event_type, sum(n_vt) AS n_pos FROM jt GROUP BY 1),
         |terms AS (SELECT t.event_type, np.n_pos,
         |  CAST(${round6Sql(
              "(CAST(n_vt AS DOUBLE) * CAST(tp AS DOUBLE)) / (CAST(n_pos AS DOUBLE) * CAST(pp AS DOUBLE))")} AS DECIMAL(18,6)) AS term
         |  FROM tp t JOIN ge USING (v) JOIN np ON np.event_type = t.event_type)
         |SELECT event_type, CAST(n_pos AS BIGINT) AS n_pos,
         |  ${round4Sql("CAST(sum(term) AS DOUBLE)")} AS ap
         |FROM terms GROUP BY event_type, n_pos ORDER BY event_type""".stripMargin,

    "events_js_divergence" ->
      s"""WITH ut AS (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2),
         |un AS (SELECT user_id, sum(c) AS un FROM ut GROUP BY 1),
         |gt AS (SELECT event_type, count(*) AS gc FROM events GROUP BY 1),
         |nn AS (SELECT count(*) AS n_tot FROM events),
         |sp AS (SELECT un.user_id, un.un, gt.event_type, gt.gc, nn.n_tot
         |  FROM un CROSS JOIN gt CROSS JOIN nn),
         |pq AS (SELECT sp.user_id,
         |  CAST(coalesce(ut.c, 0) AS DOUBLE) / CAST(sp.un AS DOUBLE) AS p,
         |  CAST(sp.gc AS DOUBLE) / CAST(sp.n_tot AS DOUBLE) AS q
         |  FROM sp LEFT JOIN ut ON ut.user_id = sp.user_id AND ut.event_type = sp.event_type),
         |t AS (SELECT user_id,
         |  CAST(${round6Sql(
              "(CASE WHEN p > 0.0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END) + q * ln(q / ((p + q) / 2.0))")} AS DECIMAL(18,6)) AS term
         |  FROM pq)
         |SELECT user_id, ${round4Sql("0.5 * CAST(sum(term) AS DOUBLE)")} AS jsd
         |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_cramers_v" -> {
      val per = assocPairsSql.map { case (nm, a, b) =>
        s"""SELECT '$nm' AS pair, chi2, (r-1)*(c-1) AS dof,
           |  ${round4Sql("sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(r-1, c-1) AS DOUBLE)))")} AS cramers_v
           |FROM (
           |  SELECT CAST(sum(CAST(${round6Sql(
                  "(CAST(o AS DOUBLE) - CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)/CAST(n AS DOUBLE)) " +
                  "* (CAST(o AS DOUBLE) - CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)/CAST(n AS DOUBLE)) " +
                  "/ (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)/CAST(n AS DOUBLE))")} AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
           |    any_value(n) AS n, any_value(r) AS r, any_value(c) AS c
           |  FROM (
           |    SELECT o, na, nb, n, r, c FROM
           |      (SELECT $a AS ca, $b AS cb, count(*) AS o FROM events GROUP BY 1, 2) cells
           |      JOIN (SELECT $a AS ca, count(*) AS na FROM events GROUP BY 1) ra USING (ca)
           |      JOIN (SELECT $b AS cb, count(*) AS nb FROM events GROUP BY 1) rb USING (cb)
           |      CROSS JOIN (SELECT count(*) AS n, count(DISTINCT $a) AS r, count(DISTINCT $b) AS c FROM events) t
           |  ))""".stripMargin
      }
      per.mkString("", "\nUNION ALL\n", "\nORDER BY pair")
    },

    "events_mutual_info" ->
      s"""WITH ev AS (SELECT CAST(floor(value) AS BIGINT) AS bin, event_type
         |            FROM events WHERE value IS NOT NULL),
         |j AS (SELECT bin, event_type, count(*) AS n_xy FROM ev GROUP BY 1, 2),
         |mx AS (SELECT bin, count(*) AS n_x FROM ev GROUP BY 1),
         |my AS (SELECT event_type, count(*) AS n_y FROM ev GROUP BY 1),
         |nn AS (SELECT count(*) AS n_tot FROM ev),
         |cells AS (
         |  SELECT bin, event_type, n_xy, n_x, n_y,
         |    ${round6Sql("ln(CAST(n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE) / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))")} AS pmi,
         |    CAST(${round6Sql(
              s"CAST(n_xy AS DOUBLE) / CAST(n_tot AS DOUBLE) * ${round6Sql("ln(CAST(n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE) / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))")}")} AS DECIMAL(18,6)) AS term
         |  FROM j JOIN mx USING (bin) JOIN my USING (event_type), nn),
         |tt AS (SELECT CAST(sum(term) AS DOUBLE) AS mi_total FROM cells)
         |SELECT bin, event_type, n_xy, n_x, n_y, pmi, mi_total
         |FROM cells, tt ORDER BY bin, event_type""".stripMargin,

    "nation_hits" -> {
      s"""WITH e AS ($tradeEdgesSql),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM nation),
         |s0 AS (SELECT n_nationkey AS node, ${round6Sql("1.0 / nd")} AS h,
         |       ${round6Sql("1.0 / nd")} AS a FROM nation CROSS JOIN nn),
         |s1 AS (${hitsIterSql("s0")}),
         |s2 AS (${hitsIterSql("s1")}),
         |s3 AS (${hitsIterSql("s2")})
         |SELECT s3.node AS nationkey, n.n_name, s3.h AS hub, s3.a AS authority
         |FROM s3 JOIN nation n ON s3.node = n.n_nationkey
         |ORDER BY nationkey""".stripMargin
    },

    "dq_fd_audit" -> {
      val per = FdCandidates.map { case (nm, tbl, lhs, rhs) =>
        s"""SELECT '$nm' AS fd, count(*) AS n_groups,
           |  CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           |  max(n_rhs) AS max_rhs_per_lhs,
           |  sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds,
           |  ${round4Sql("CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS violation_rate
           |FROM (SELECT $lhs, count(DISTINCT $rhs) AS n_rhs FROM $tbl GROUP BY 1)""".stripMargin
      }
      per.mkString("", "\nUNION ALL\n", "\nORDER BY fd")
    },

    "events_isotonic_calibration" -> {
      val predSql = round4Sql(
        "0.5 + 0.5 * ((value - 50.0) / 25.0) / (1.0 + abs((value - 50.0) / 25.0))")
      s"""WITH ev AS (
         |  SELECT $predSql AS pred,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |bins AS (
         |  SELECT CAST(least(9.0, floor(pred * 10.0)) AS BIGINT) AS bin,
         |    count(*) AS n, CAST(sum(y) AS BIGINT) AS npos
         |  FROM ev GROUP BY 1),
         |jk AS (SELECT a.bin AS j, b.bin AS k FROM bins a JOIN bins b
         |  ON a.bin <= b.bin),
         |spans AS (
         |  SELECT jk.j, jk.k, sum(bins.n) AS nn, sum(bins.npos) AS pp
         |  FROM jk JOIN bins ON bins.bin BETWEEN jk.j AND jk.k
         |  GROUP BY 1, 2),
         |sa AS (SELECT j, k,
         |  ${round6Sql("CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)")} AS avgjk
         |  FROM spans),
         |mj AS (
         |  SELECT i.bin AS i, sa.j, min(sa.avgjk) AS mn
         |  FROM bins i JOIN sa ON sa.j <= i.bin AND sa.k >= i.bin
         |  GROUP BY 1, 2),
         |fit AS (SELECT i, ${round6Sql("max(mn)")} AS iso_fit FROM mj GROUP BY 1)
         |SELECT bins.bin, bins.n,
         |  ${round6Sql("CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)")} AS frac_pos,
         |  iso_fit
         |FROM bins JOIN fit ON bins.bin = fit.i ORDER BY bins.bin""".stripMargin
    },

    "events_calibration" -> {
      val predSql = round4Sql(
        "0.5 + 0.5 * ((value - 50.0) / 25.0) / (1.0 + abs((value - 50.0) / 25.0))")
      s"""WITH ev AS (
         |  SELECT $predSql AS pred,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |b AS (
         |  SELECT CAST(least(9.0, floor(pred * 10.0)) AS BIGINT) AS bin, pred, y,
         |    CAST(${round6Sql("(pred - y) * (pred - y)")} AS DECIMAL(18,6)) AS sq
         |  FROM ev),
         |bins AS (
         |  SELECT bin, count(*) AS n, sum(CAST(pred AS DECIMAL(18,6))) AS psum,
         |    sum(y) AS npos, sum(sq) AS sqsum
         |  FROM b GROUP BY 1),
         |tt AS (SELECT sum(sqsum) AS sqall, sum(n) AS nall FROM bins)
         |SELECT bin, n, CAST(npos AS BIGINT) AS npos,
         |  ${round6Sql("CAST(psum AS DOUBLE) / CAST(n AS DOUBLE)")} AS mean_pred,
         |  ${round6Sql("CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)")} AS frac_pos,
         |  ${round6Sql("CAST(sqsum AS DOUBLE) / CAST(n AS DOUBLE)")} AS brier_bin,
         |  ${round6Sql("CAST(sqall AS DOUBLE) / CAST(nall AS DOUBLE)")} AS brier_total
         |FROM bins, tt ORDER BY bin""".stripMargin
    },

    "ts_quantile_norm" ->
      s"""WITH ev AS (SELECT user_id, event_id, value FROM events WHERE value IS NOT NULL),
         |wp AS (SELECT user_id, event_id, value,
         |  row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
         |  count(*) OVER (PARTITION BY user_id) AS n FROM ev),
         |nn AS (SELECT count(*) AS n_tot FROM ev),
         |q AS (SELECT event_id, value,
         |  1.0 + (CASE WHEN n = 1 THEN 0.5
         |         ELSE CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END)
         |    * CAST(n_tot - 1 AS DOUBLE) AS posn
         |  FROM wp, nn),
         |k AS (SELECT event_id, value, CAST(floor(posn) AS BIGINT) AS k0,
         |  least(CAST(floor(posn) AS BIGINT) + 1, (SELECT n_tot FROM nn)) AS k1,
         |  posn - floor(posn) AS frac FROM q),
         |g AS (SELECT value AS gv,
         |  row_number() OVER (ORDER BY value, event_id) AS grk FROM ev)
         |SELECT k.event_id, k.value,
         |  ${round4Sql("v0.gv + frac * (v1.gv - v0.gv)")} AS qnorm_value
         |FROM k JOIN g v0 ON k.k0 = v0.grk JOIN g v1 ON k.k1 = v1.grk
         |ORDER BY event_id""".stripMargin,

    "ts_ewma_vol" -> {
      val W2 = "PARTITION BY user_id ORDER BY ts, event_id"
      val terms = (0 until 20).map { j =>
        val wt = CleanFunctions.dlitSql(math.pow(1 - 0.06, j))
        val v = if (j == 0) "r2" else s"lag(r2, $j) OVER ($W2)"
        (s"coalesce(CASE WHEN $v IS NOT NULL THEN $wt * $v END, 0.0)",
          s"coalesce(CASE WHEN $v IS NOT NULL THEN $wt END, 0.0)")
      }
      s"""WITH b AS (SELECT user_id, ts, event_id,
         |  value - lag(value, 1) OVER ($W2) AS ret FROM events),
         |r AS (SELECT user_id, ts, event_id, ret,
         |  ${round6Sql("ret * ret")} AS r2 FROM b),
         |k AS (SELECT user_id, ts, event_id, ret,
         |  (${terms.map(_._1).mkString(" + ")}) /
         |    nullif(${terms.map(_._2).mkString(" + ")}, 0.0) AS vol2 FROM r),
         |v AS (SELECT user_id, ts, event_id, ret,
         |  ${round4Sql("sqrt(vol2)")} AS vol FROM k),
         |z AS (SELECT event_id, ret, vol,
         |  ret / nullif(lag(vol, 1) OVER ($W2), 0.0) AS zraw FROM v)
         |SELECT event_id, ${round4Sql("ret")} AS ret, vol,
         |  ${round4Sql("zraw")} AS z,
         |  CAST(CASE WHEN abs(zraw) > 3.0 THEN 1 ELSE 0 END AS BIGINT) AS is_spike
         |FROM z ORDER BY event_id""".stripMargin
    },

    // Recursive-CTE replay of the exact garchPath fold: same
    // left-associated update ω + α·r² + β·σ², same unconditional-
    // variance init, every constant dlit'd so both engines fold the
    // same doubles.
    "ts_garch_vol" -> GarchOracleSql,

    // The streaming fold replays to the identical recursion.
    "streaming_garch" -> GarchOracleSql,

    "events_forecast_reconcile" ->
      s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt
         |  FROM events GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day FROM daily),
         |types AS (SELECT DISTINCT event_type FROM daily),
         |f AS (SELECT d.day, t.event_type, coalesce(x.cnt, 0) AS cnt
         |  FROM days d CROSS JOIN types t
         |  LEFT JOIN daily x ON x.day = d.day AND x.event_type = t.event_type),
         |child AS (SELECT day, event_type, cnt,
         |  lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day) AS child_fc FROM f),
         |tot AS (SELECT day, sum(cnt) AS tot FROM f GROUP BY 1),
         |parent AS (SELECT a.day,
         |  CASE WHEN count(b.tot) = 7 THEN ${round4Sql("CAST(sum(b.tot) AS DOUBLE) / 7.0")} END AS parent_fc
         |  FROM tot a LEFT JOIN tot b ON b.day >= a.day - 7 AND b.day < a.day
         |  GROUP BY a.day),
         |bu AS (SELECT day, sum(child_fc) AS bu_total FROM child GROUP BY 1)
         |SELECT c.day, c.event_type, c.cnt AS actual, c.child_fc, p.parent_fc,
         |  ${round4Sql("CAST(c.child_fc AS DOUBLE) * p.parent_fc / nullif(CAST(bu.bu_total AS DOUBLE), 0.0)")} AS reconciled_fc
         |FROM child c JOIN parent p USING (day) JOIN bu USING (day)
         |WHERE c.child_fc IS NOT NULL AND p.parent_fc IS NOT NULL
         |ORDER BY day, event_type""".stripMargin,

    "dq_k_anonymity" ->
      s"""WITH ev AS (SELECT event_type, CAST(isodow(ts)-1 AS BIGINT) AS dow,
         |  CAST(floor(value / 50.0) AS BIGINT) AS value_band, user_id FROM events),
         |cl AS (SELECT event_type, dow, value_band, count(*) AS k,
         |  count(DISTINCT user_id) AS l_distinct FROM ev GROUP BY 1, 2, 3),
         |risk AS (SELECT sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS rows_at_risk,
         |  sum(k) AS rows_total FROM cl)
         |SELECT event_type, dow, value_band, k, l_distinct, k < 5 AS at_risk,
         |  ${round4Sql("CAST(rows_at_risk AS DOUBLE) / CAST(rows_total AS DOUBLE)")} AS corpus_risk_share
         |FROM cl, risk ORDER BY event_type, dow, value_band""".stripMargin,

    "dq_l_diversity" ->
      s"""WITH ev AS (SELECT event_type, CAST(isodow(ts)-1 AS BIGINT) AS dow,
         |  CAST(floor(value / 50.0) AS BIGINT) AS value_band, user_id FROM events),
         |cell AS (SELECT event_type, dow, value_band, user_id, count(*) AS c
         |  FROM ev GROUP BY 1, 2, 3, 4),
         |pt AS (SELECT event_type, dow, value_band, c,
         |  CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY event_type, dow, value_band) AS p
         |  FROM cell),
         |cl AS (SELECT event_type, dow, value_band, sum(c) AS k, count(*) AS l_distinct,
         |  CAST(-sum(CAST(${round6Sql("p * ln(p)")} AS DECIMAL(18,6))) AS DOUBLE) AS hh
         |  FROM pt GROUP BY 1, 2, 3)
         |SELECT event_type, dow, value_band, CAST(k AS BIGINT) AS k, l_distinct,
         |  ${round4Sql("hh")} AS entropy_l,
         |  CASE WHEN l_distinct >= 3 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS is_diverse
         |FROM cl ORDER BY event_type, dow, value_band""".stripMargin,

    "dq_t_closeness" ->
      s"""WITH ev AS (SELECT event_type, CAST(isodow(ts)-1 AS BIGINT) AS dow,
         |  CAST(floor(value / 50.0) AS BIGINT) AS value_band, user_id FROM events),
         |cell AS (SELECT event_type, dow, value_band, user_id, count(*) AS c
         |  FROM ev GROUP BY 1, 2, 3, 4),
         |tot AS (SELECT count(*) AS nt FROM ev),
         |gl AS (SELECT user_id, count(*) AS g FROM ev GROUP BY 1),
         |j AS (SELECT cell.event_type, cell.dow, cell.value_band, c, g, nt,
         |  sum(c) OVER (PARTITION BY cell.event_type, cell.dow, cell.value_band) AS k
         |  FROM cell JOIN gl USING (user_id), tot),
         |t AS (SELECT event_type, dow, value_band, k,
         |  ${round6Sql("abs(CAST(c AS DOUBLE) / k - CAST(g AS DOUBLE) / nt)")} AS pdiff,
         |  ${round6Sql("CAST(g AS DOUBLE) / nt")} AS q6
         |  FROM j),
         |cl AS (SELECT event_type, dow, value_band,
         |  CAST(max(k) AS BIGINT) AS k, count(*) AS l_distinct,
         |  ${exactSumSql("pdiff")} AS sad, ${exactSumSql("q6")} AS sq
         |  FROM t GROUP BY 1, 2, 3),
         |f AS (SELECT event_type, dow, value_band, k, l_distinct,
         |  ${round4Sql("0.5 * (sad + 1.0 - sq)")} AS t_closeness FROM cl)
         |SELECT event_type, dow, value_band, k, l_distinct, t_closeness,
         |  CASE WHEN t_closeness <= 0.375 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS is_close
         |FROM f ORDER BY event_type, dow, value_band""".stripMargin,

    "events_seq_patterns" ->
      s"""WITH ut AS (
         |  SELECT user_id, event_type, min(epoch_us(ts)) AS first_ts,
         |    max(epoch_us(ts)) AS last_ts
         |  FROM events GROUP BY 1, 2),
         |tc AS (SELECT event_type AS antecedent, count(*) AS users_with_a
         |  FROM ut GROUP BY 1),
         |p AS (
         |  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         |    count(CASE WHEN a.first_ts < b.last_ts THEN 1 END) AS support_users,
         |    count(*) AS users_with_both
         |  FROM ut a JOIN ut b
         |    ON a.user_id = b.user_id AND a.event_type <> b.event_type
         |  GROUP BY 1, 2)
         |SELECT antecedent, consequent, support_users, users_with_both,
         |  users_with_a,
         |  ${round4Sql("CAST(support_users AS DOUBLE) / CAST(users_with_a AS DOUBLE)")} AS confidence
         |FROM p JOIN tc USING (antecedent)
         |ORDER BY antecedent, consequent""".stripMargin,

    "nation_assortativity" -> {
      val corr = CleanFunctions.momentCorrSql("n", "sx", "sy", "sxy", "sxx", "syy")
      s"""WITH e AS ($tradeEdgesSql),
         |ed AS (SELECT src, dst FROM e WHERE src <> dst),
         |und AS (SELECT DISTINCT a, b FROM (
         |  SELECT src AS a, dst AS b FROM ed UNION ALL SELECT dst AS a, src AS b FROM ed)),
         |deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1),
         |pr AS (SELECT da.deg AS dega, db.deg AS degb
         |  FROM und JOIN deg da ON und.a = da.a JOIN deg db ON und.b = db.a),
         |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(dega) AS DOUBLE) AS sx, CAST(sum(degb) AS DOUBLE) AS sy,
         |  CAST(sum(dega * degb) AS DOUBLE) AS sxy,
         |  CAST(sum(dega * dega) AS DOUBLE) AS sxx,
         |  CAST(sum(degb * degb) AS DOUBLE) AS syy
         |  FROM pr)
         |SELECT CAST(n AS BIGINT) AS n_endpoints,
         |  ${round4Sql(corr)} AS assortativity
         |FROM m""".stripMargin
    },

    "nation_modularity" ->
      s"""WITH e AS ($tradeEdgesSql),
         |ed AS (SELECT src, dst FROM e WHERE src <> dst),
         |und AS (SELECT a, b FROM (SELECT DISTINCT a, b FROM (
         |  SELECT src AS a, dst AS b FROM ed UNION ALL SELECT dst AS a, src AS b FROM ed))
         |  WHERE a < b),
         |wr AS (
         |  SELECT und.a, und.b, na.n_regionkey AS ra, nb.n_regionkey AS rb
         |  FROM und JOIN nation na ON und.a = na.n_nationkey
         |           JOIN nation nb ON und.b = nb.n_nationkey),
         |mm AS (SELECT count(*) AS m FROM wr),
         |ecc AS (SELECT ra AS rg, count(*) AS ecc FROM wr WHERE ra = rb GROUP BY ra),
         |degs AS (SELECT rg, count(*) AS ac FROM (
         |  SELECT ra AS rg FROM wr UNION ALL SELECT rb AS rg FROM wr) GROUP BY rg),
         |t AS (
         |  SELECT degs.rg, coalesce(ecc.ecc, 0) AS ecc, degs.ac, mm.m
         |  FROM degs LEFT JOIN ecc ON degs.rg = ecc.rg, mm),
         |tt AS (
         |  SELECT m, ${round6Sql("CAST(ecc AS DOUBLE) / CAST(m AS DOUBLE) - (CAST(ac AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))) * (CAST(ac AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))")} AS term
         |  FROM t)
         |SELECT max(m) AS m_edges, count(*) AS n_communities,
         |  ${round4Sql(CleanFunctions.exactSumSql("term"))} AS q_modularity
         |FROM tt""".stripMargin,

    "text_source_overlap" ->
      s"""WITH t AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
         |    FROM documents)),
         |sz AS (SELECT source, count(*) AS sz FROM t GROUP BY source),
         |cm AS (
         |  SELECT x.source AS src_a, y.source AS src_b, count(*) AS common
         |  FROM t x JOIN t y ON x.tok = y.tok AND x.source < y.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, common, sa.sz AS size_a, sb.sz AS size_b,
         |  ${round4Sql("CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE)")} AS jaccard
         |FROM cm JOIN sz sa ON cm.src_a = sa.source
         |        JOIN sz sb ON cm.src_b = sb.source
         |ORDER BY src_a, src_b""".stripMargin,

    "nation_similarity" ->
      s"""WITH e AS ($tradeEdgesSql),
         |ed AS (SELECT src, dst FROM e WHERE src <> dst),
         |und AS (SELECT DISTINCT a, b FROM (
         |  SELECT src AS a, dst AS b FROM ed UNION ALL SELECT dst AS a, src AS b FROM ed)),
         |deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1),
         |cm AS (SELECT x.a AS na, y.a AS nb, count(*) AS common
         |  FROM und x JOIN und y ON x.b = y.b AND x.a < y.a GROUP BY 1, 2)
         |SELECT na, nb, common, da.deg AS da, db.deg AS db,
         |  ${round4Sql("CAST(common AS DOUBLE) / CAST(da.deg + db.deg - common AS DOUBLE)")} AS jaccard
         |FROM cm JOIN deg da ON cm.na = da.a JOIN deg db ON cm.nb = db.a
         |ORDER BY na, nb""".stripMargin,

    "lineitem_seasonality_index" ->
      s"""WITH monthly AS (
         |  SELECT p.p_brand,
         |    CAST(epoch_us(date_trunc('month', l.l_shipdate)) AS BIGINT) AS m,
         |    CAST(month(l.l_shipdate) AS BIGINT) AS month_num,
         |    ${exactSumSql("l.l_extendedprice")} AS rev
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  GROUP BY 1, 2, 3),
         |ma AS (
         |  SELECT p_brand, m, month_num, rev,
         |    count(rev) OVER w AS nw,
         |    ${CleanFunctions.exactMeanSql("rev", "OVER w")} AS mav
         |  FROM monthly WINDOW w AS (PARTITION BY p_brand ORDER BY m
         |    ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)),
         |r AS (
         |  SELECT p_brand, month_num, ${round6Sql("rev / mav")} AS ratio
         |  FROM ma WHERE nw = 12)
         |SELECT p_brand, month_num, count(*) AS n_obs,
         |  ${round4Sql(CleanFunctions.exactMeanSql("ratio"))} AS seasonal_index
         |FROM r GROUP BY 1, 2 ORDER BY p_brand, month_num""".stripMargin,

    "lineitem_price_elasticity" -> {
      def ds(x: String) = s"CAST(sum(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"
      s"""WITH li AS (SELECT p.p_brand,
         |  ${round6Sql("ln(l_extendedprice / l_quantity)")} AS x,
         |  ${round6Sql("ln(l_quantity)")} AS y
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  WHERE l_quantity > 0 AND l_extendedprice > 0),
         |m AS (SELECT p_brand, x, y, ${round6Sql("x * y")} AS xy,
         |  ${round6Sql("x * x")} AS xx, ${round6Sql("y * y")} AS yy FROM li),
         |a AS (SELECT p_brand, count(*) AS n, ${ds("x")} AS sx, ${ds("y")} AS sy,
         |  ${ds("xy")} AS sxy, ${ds("xx")} AS sxx, ${ds("yy")} AS syy
         |  FROM m GROUP BY 1)
         |SELECT p_brand, n,
         |  ${round4Sql("(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)")} AS elasticity,
         |  ${round4Sql("((n * sxy - sx * sy) * (n * sxy - sx * sy)) / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0)")} AS r2
         |FROM a ORDER BY p_brand""".stripMargin
    },

    "events_markov_stationary" -> {
      def iter(st: String): String = {
        val m = s"""SELECT to_type, sum(CAST(${round6Sql("st.pi * pm.p")} AS DECIMAL(18,6))) AS m
                   |    FROM pm JOIN $st st ON pm.from_type = st.state GROUP BY 1""".stripMargin
        s"""SELECT s.state,
           |  ${round6Sql("CAST(coalesce(m.m, 0) AS DOUBLE) / CAST(t.t AS DOUBLE)")} AS pi
           |FROM states s
           |LEFT JOIN ($m) m ON s.state = m.to_type
           |CROSS JOIN (SELECT sum(m) AS t FROM ($m)) t""".stripMargin
      }
      s"""WITH tr AS (SELECT event_type AS from_type,
         |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |c AS (SELECT from_type, to_type, count(*) AS cnt FROM tr
         |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |pm AS (SELECT from_type, to_type,
         |  ${round6Sql("CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE)")} AS p
         |  FROM c),
         |states AS (SELECT DISTINCT from_type AS state FROM c),
         |ns AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM states),
         |pi0 AS (SELECT state, ${round6Sql("1.0 / nd")} AS pi FROM states, ns),
         |pi1 AS (${iter("pi0")}),
         |pi2 AS (${iter("pi1")}),
         |pi3 AS (${iter("pi2")}),
         |pi4 AS (${iter("pi3")})
         |SELECT state AS event_type, pi AS stationary_p FROM pi4
         |ORDER BY event_type""".stripMargin
    },

    "events_hitting_time" -> {
      def iter(prev: String): String =
        s"""SELECT s.state,
           |  CASE WHEN s.state = 'purchase' THEN 0.0
           |       ELSE ${round6Sql("1.0 + CAST(coalesce(m.m, 0) AS DOUBLE)")} END AS h
           |FROM states s LEFT JOIN (
           |  SELECT from_type, sum(CAST(${round6Sql("pm.p * pr.h")} AS DECIMAL(18,6))) AS m
           |  FROM pm JOIN $prev pr
           |    ON pm.to_type = pr.state AND pm.to_type <> 'purchase'
           |  GROUP BY 1) m ON s.state = m.from_type""".stripMargin
      val chain = (1 to 12).map(i => s"h$i AS (${iter(s"h${i - 1}")})").mkString(",\n")
      s"""WITH tr AS (SELECT event_type AS from_type,
         |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |c AS (SELECT from_type, to_type, count(*) AS cnt FROM tr
         |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |pm AS (SELECT from_type, to_type,
         |  ${round6Sql("CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE)")} AS p
         |  FROM c),
         |states AS (SELECT DISTINCT from_type AS state FROM c),
         |h0 AS (SELECT state, 0.0 AS h FROM states),
         |$chain
         |SELECT state AS event_type, h AS expected_steps FROM h12
         |ORDER BY event_type""".stripMargin
    },

    "dq_referential_integrity" -> {
      def arm(rel: String, childTable: String, key: String,
              parentTable: String, pkey: String): String =
        s"""SELECT '$rel' AS relation,
           |  (SELECT count(*) FROM $childTable WHERE $key IS NOT NULL) AS n_child,
           |  (SELECT count(*) FROM $childTable c
           |   WHERE c.$key IS NOT NULL AND NOT EXISTS
           |     (SELECT 1 FROM $parentTable p WHERE CAST(p.$pkey AS BIGINT) = c.$key)) AS n_orphans""".stripMargin
      val arms = Seq(
        arm("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        arm("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
        arm("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        arm("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        arm("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        arm("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
        arm("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        arm("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey")
      ).mkString("\nUNION ALL\n")
      s"""WITH a AS (
         |$arms)
         |SELECT relation, n_child, n_orphans,
         |  ${round6Sql("CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE)")} AS orphan_share
         |FROM a ORDER BY relation""".stripMargin
    },

    "ts_missingness_audit" ->
      s"""WITH e AS (SELECT user_id, ts, event_id, value,
         |  CAST(hour(ts) AS BIGINT) AS hr FROM events),
         |byhr AS (SELECT hr, count(*) AS n,
         |  count(CASE WHEN value IS NULL THEN 1 END) AS n_null
         |  FROM e GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_null) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS rate0
         |  FROM byhr),
         |chi AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
         |  ${round6Sql("max(rate0)")} AS null_rate,
         |  ${round4Sql(s"coalesce(${exactSumSql(round6Sql(
             "(CAST(n_null AS DOUBLE) - CAST(n AS DOUBLE) * rate0) * (CAST(n_null AS DOUBLE) - CAST(n AS DOUBLE) * rate0) / nullif(CAST(n AS DOUBLE) * rate0, 0.0)"))}, 0.0)")} AS chi2
         |  FROM byhr, tot),
         |r AS (SELECT user_id, value IS NULL AS isn,
         |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) -
         |  row_number() OVER (PARTITION BY user_id, (value IS NULL) ORDER BY ts, event_id) AS island
         |  FROM events),
         |rr AS (SELECT CAST(coalesce(max(run), 0) AS BIGINT) AS longest_null_run FROM
         |  (SELECT user_id, island, count(*) AS run FROM r WHERE isn GROUP BY 1, 2) q)
         |SELECT n_total, null_rate, chi2,
         |  CAST(CASE WHEN chi2 > 35.17 THEN 1 ELSE 0 END AS BIGINT) AS systematic_flag,
         |  longest_null_run
         |FROM chi, rr""".stripMargin,

    "dq_order_reconciliation" ->
      s"""WITH rc AS (
         |  SELECT l_orderkey,
         |    ${exactSumSql(round4Sql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)"))} AS recalc
         |  FROM lineitem GROUP BY 1),
         |j AS (
         |  SELECT o_totalprice, recalc,
         |    ${round6Sql("abs(recalc - o_totalprice) / o_totalprice")} AS relerr
         |  FROM orders LEFT JOIN rc ON o_orderkey = l_orderkey)
         |SELECT count(*) AS n_orders,
         |  CAST(count(CASE WHEN recalc IS NULL THEN 1 END) AS BIGINT) AS n_no_lines,
         |  CAST(count(CASE WHEN relerr <= 0.0001 THEN 1 END) AS BIGINT) AS n_reconciled,
         |  ${round6Sql(CleanFunctions.exactMeanSql("relerr"))} AS mean_rel_err,
         |  ${round4Sql("max(relerr)")} AS max_rel_err
         |FROM j""".stripMargin,

    "events_kmv_jaccard" ->
      s"""WITH uh AS (
         |  SELECT DISTINCT event_type, user_id FROM events),
         |uh2 AS (
         |  SELECT event_type, ${CleanFunctions.md5Hash64Sql("'kmv:' || user_id")} AS h
         |  FROM uh),
         |sk AS (
         |  SELECT event_type, h FROM (
         |    SELECT event_type, h,
         |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |    FROM uh2) q WHERE rn <= $KmvK),
         |ty AS (SELECT DISTINCT event_type AS t FROM sk),
         |tagged AS (
         |  SELECT s.event_type AS ta, y.t AS tb, s.h, CAST(1 AS BIGINT) AS from_a
         |  FROM sk s JOIN ty y ON s.event_type < y.t
         |  UNION ALL
         |  SELECT y.t AS ta, s.event_type AS tb, s.h, CAST(0 AS BIGINT) AS from_a
         |  FROM sk s JOIN ty y ON y.t < s.event_type),
         |ded AS (
         |  SELECT ta, tb, h, max(from_a) AS in_a, max(1 - from_a) AS in_b
         |  FROM tagged GROUP BY 1, 2, 3),
         |us AS (
         |  SELECT ta, tb, in_a, in_b FROM (
         |    SELECT ta, tb, in_a, in_b,
         |      row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
         |    FROM ded) q WHERE rn <= $KmvK),
         |est AS (
         |  SELECT ta, tb, count(*) AS k_eff,
         |    count(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 END) AS n_both
         |  FROM us GROUP BY 1, 2),
         |cnt AS (SELECT event_type, count(*) AS nu FROM uh GROUP BY 1),
         |inter AS (
         |  SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS ni
         |  FROM uh x JOIN uh y
         |    ON x.user_id = y.user_id AND x.event_type < y.event_type
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT e.ta, e.tb,
         |    ${round6Sql("CAST(n_both AS DOUBLE) / CAST(k_eff AS DOUBLE)")} AS kmv_jaccard,
         |    ${round6Sql("CAST(coalesce(ni, 0) AS DOUBLE) / CAST(ca.nu + cb.nu - coalesce(ni, 0) AS DOUBLE)")} AS exact_jaccard
         |  FROM est e LEFT JOIN inter i ON e.ta = i.ta AND e.tb = i.tb
         |  JOIN cnt ca ON e.ta = ca.event_type
         |  JOIN cnt cb ON e.tb = cb.event_type)
         |SELECT ta, tb, kmv_jaccard, exact_jaccard,
         |  ${round4Sql("abs(kmv_jaccard - exact_jaccard)")} AS abs_err
         |FROM j ORDER BY ta, tb""".stripMargin,

    "dq_bloom_fp_audit" -> {
      def pos(i: Int, c: String) =
        s"${CleanFunctions.md5Hash64Sql(s"'bf$i:' || $c")} % $BloomM"
      val insArms = (0 until BloomK).map(i =>
        s"SELECT ${pos(i, "ck")} AS bit FROM members").mkString(" UNION ALL ")
      val candArms = (0 until BloomK).map(i =>
        s"SELECT ck, ${pos(i, "ck")} AS bit FROM cands").mkString(" UNION ALL ")
      s"""WITH members AS (SELECT DISTINCT o_custkey AS ck FROM orders
         |  WHERE year(o_orderdate) = 1995),
         |bits AS (SELECT DISTINCT bit FROM ($insArms) u),
         |ni AS (SELECT CAST(count(*) AS DOUBLE) AS n_inserted FROM members),
         |cands AS (SELECT c_custkey AS ck FROM customer),
         |cp AS ($candArms),
         |hits AS (SELECT cp.ck, count(*) AS nbits FROM cp JOIN bits USING (bit)
         |  GROUP BY cp.ck),
         |truth AS (SELECT c.ck,
         |  CASE WHEN m.ck IS NOT NULL THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS is_member,
         |  CASE WHEN coalesce(h.nbits, 0) = $BloomK THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS in_bloom
         |  FROM cands c LEFT JOIN members m ON c.ck = m.ck
         |  LEFT JOIN hits h ON c.ck = h.ck),
         |ag AS (SELECT count(*) AS n_tested,
         |  CAST(sum(is_member) AS BIGINT) AS n_members,
         |  CAST(count(CASE WHEN in_bloom = 1 AND is_member = 0 THEN 1 END) AS BIGINT) AS false_positives,
         |  CAST(count(CASE WHEN in_bloom = 0 AND is_member = 1 THEN 1 END) AS BIGINT) AS false_negatives
         |  FROM truth),
         |th AS (SELECT 1.0 - exp(-$BloomK.0 * n_inserted / $BloomM.0) AS t FROM ni)
         |SELECT n_tested, n_members, false_positives, false_negatives,
         |  ${round6Sql("CAST(false_positives AS DOUBLE) / nullif(CAST(n_tested - n_members AS DOUBLE), 0.0)")} AS fp_rate,
         |  ${round6Sql("t * t * t")} AS theoretical_fp
         |FROM ag, th""".stripMargin
    },

    "events_hll_distinct" -> HllOracleSql,

    // The SQL-surface aggregate keeps the SAME deterministic bottom-k
    // hash sample as events_quantile_sketch; the oracle reconstructs it
    // with a plain rank window (exactness at sf-oracle scale; the Spark
    // side never sorts — that is the aggregate's point) and pivots the
    // two probed percentiles wide.
    "sql_quantile_agg" -> {
      s"""WITH e AS (
         |  SELECT event_type, value AS v, event_id,
         |    ${CleanFunctions.md5Hash64Sql("'qsk:' || event_id")} AS h
         |  FROM events WHERE value IS NOT NULL),
         |smp AS (SELECT event_type, v FROM (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
         |  FROM e) WHERE rn <= $QskK),
         |${rankPctBlockSql("smp", "q", "pct")}
         |SELECT event_type,
         |  max(CASE WHEN p = 0.5 THEN pct END) AS p50,
         |  max(CASE WHEN p = 0.9 THEN pct END) AS p90
         |FROM qo GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    // The streaming register fold builds the SAME registers as the batch
    // scan (shared Catalyst expressions + shared hllAudit downstream), so
    // its oracle is the batch oracle verbatim.
    "streaming_hll_distinct" -> HllOracleSql,

    "events_hll_sliding" -> {
      val rhoCase = "CASE " + (51 to 0 by -1).map(k =>
        s"WHEN rest >= ${1L << k} THEN ${52 - k}").mkString(" ") + " ELSE 53 END"
      val an = CleanFunctions.dlitSql(HllAlphaNum)
      s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, user_id,
         |  ${CleanFunctions.md5Hash64Sql("'hll:' || user_id")} AS h FROM events),
         |days AS (SELECT DISTINCT day FROM e),
         |b AS (SELECT event_type, day, h // $HllRestMod AS bucket,
         |  h % $HllRestMod AS rest FROM e),
         |rh AS (SELECT event_type, day, bucket, $rhoCase AS rho FROM b),
         |daily AS (SELECT event_type, day, bucket, max(rho) AS r
         |  FROM rh GROUP BY 1, 2, 3),
         |win AS (SELECT event_type, d0, bucket, max(r) AS r FROM (
         |  SELECT event_type,
         |    CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS d0,
         |    bucket, r FROM daily) x
         |  JOIN days ON x.d0 = days.day GROUP BY 1, 2, 3),
         |ag AS (SELECT event_type, d0, count(*) AS present,
         |  sum(CAST(1 AS BIGINT) << CAST(53 - r AS INT)) AS si
         |  FROM win GROUP BY 1, 2),
         |z AS (SELECT event_type, d0, $HllM - present AS zeros,
         |  CAST(si + ($HllM - present) * ${1L << 53} AS DOUBLE) AS sumz FROM ag),
         |er AS (SELECT event_type, d0, zeros, ${round4Sql(s"$an / sumz")} AS e_raw FROM z),
         |est AS (SELECT event_type, d0,
         |  CASE WHEN e_raw <= ${2.5 * HllM} AND zeros > 0
         |       THEN ${round4Sql(s"$HllM.0 * ln($HllM.0 / zeros)")}
         |       ELSE e_raw END AS hll_est FROM er),
         |ex AS (SELECT event_type, d0, count(DISTINCT user_id) AS exact_distinct FROM (
         |  SELECT event_type,
         |    CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS d0,
         |    user_id FROM (SELECT DISTINCT event_type, day, user_id FROM e)) du
         |  JOIN days ON du.d0 = days.day GROUP BY 1, 2)
         |SELECT est.event_type, est.d0 AS window_end, exact_distinct, hll_est,
         |  ${round4Sql("(hll_est - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE)")} AS rel_err
         |FROM est JOIN ex ON est.event_type = ex.event_type AND est.d0 = ex.d0
         |ORDER BY est.event_type, window_end""".stripMargin
    },

    // The window reconstruction of the heap aggregate's answer: list in
    // (score DESC, id) order, sliced to k.
    "sql_topk_agg" ->
      """SELECT o_custkey,
        |  array_to_string(list_transform(
        |    (list(o_orderkey ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey))[1:3],
        |    x -> CAST(x AS VARCHAR)), ',') AS top_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // The same window reconstruction, exploded to one row per rank —
    // the streaming fold's terminal emission shape.
    "streaming_topk" ->
      """SELECT o_custkey, CAST(rk AS BIGINT) AS rk,
        |  CAST(o_orderkey AS BIGINT) AS o_orderkey, price
        |FROM (
        |  SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS rk
        |  FROM orders) q
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "customer_components" ->
      s"""$coPurchaseLabCte
         |SELECT id AS c_custkey, lbl AS component_id FROM lab
         |ORDER BY c_custkey""".stripMargin,

    "customer_components_cold" ->
      s"""$coPurchaseLabCte
         |SELECT id AS c_custkey, lbl AS component_id FROM lab
         |ORDER BY c_custkey""".stripMargin,

    "customer_component_sizes" ->
      s"""$coPurchaseLabCte,
         |sz AS (SELECT lbl, count(*) AS component_size FROM lab GROUP BY lbl)
         |SELECT component_size, count(*) AS n_components
         |FROM sz GROUP BY component_size ORDER BY component_size""".stripMargin,

    "events_quantile_sketch" -> {
      def pctBlock(src: String, pfx: String, outCol: String) =
        rankPctBlockSql(src, pfx, outCol)
      s"""WITH e AS (
         |  SELECT event_type, value AS v, event_id,
         |    ${CleanFunctions.md5Hash64Sql("'qsk:' || event_id")} AS h
         |  FROM events WHERE value IS NOT NULL),
         |smp AS (SELECT event_type, v FROM (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
         |  FROM e) q WHERE rn <= $QskK),
         |${pctBlock("smp", "s", "pct_est")},
         |${pctBlock("e", "x", "pct_exact")}
         |SELECT so.event_type, so.p, pct_est, pct_exact,
         |  ${round4Sql("abs(pct_est - pct_exact)")} AS abs_err
         |FROM so JOIN xo ON so.event_type = xo.event_type AND so.p = xo.p
         |ORDER BY so.event_type, so.p""".stripMargin
    },

    "streaming_quantile_sketch" ->
      s"""WITH e AS (
         |  SELECT event_type, value AS v, event_id,
         |    ${CleanFunctions.md5Hash64Sql("'qsk:' || event_id")} AS h
         |  FROM events WHERE value IS NOT NULL),
         |smp AS (SELECT event_type, v FROM (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
         |  FROM e) q WHERE rn <= $QskK),
         |${rankPctBlockSql("smp", "s", "pct_est")},
         |kc AS (SELECT event_type, count(*) AS k_eff FROM smp GROUP BY 1)
         |SELECT so.event_type, so.p, pct_est, k_eff
         |FROM so JOIN kc USING (event_type)
         |ORDER BY so.event_type, so.p""".stripMargin,

    "events_ddsketch_quantile" -> {
      val lg = CleanFunctions.dlitSql(DdLnGamma)
      s"""WITH e AS (
         |  SELECT event_type, value AS v FROM events
         |  WHERE value IS NOT NULL AND value > 0.0),
         |bk AS (SELECT event_type,
         |  CAST(floor(${round6Sql(s"ln(v) / $lg")}) AS BIGINT) AS b FROM e),
         |bc AS (SELECT event_type, b, count(*) AS cnt FROM bk GROUP BY 1, 2),
         |cum AS (SELECT event_type, b,
         |  sum(cnt) OVER (PARTITION BY event_type ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM bc),
         |pr AS (SELECT event_type, p, min(b) AS b
         |  FROM cum, (SELECT unnest($QskPsSqlList) AS p) px
         |  WHERE cum >= ceil(p * CAST(n AS DOUBLE))
         |  GROUP BY 1, 2),
         |est AS (SELECT event_type, p,
         |  ${round4Sql(s"exp((CAST(b AS DOUBLE) + 0.5) * $lg)")} AS pct_est
         |  FROM pr),
         |${rankPctBlockSql("e", "x", "pct_exact")}
         |SELECT est.event_type, est.p, pct_est, pct_exact,
         |  ${round4Sql("(pct_est - pct_exact) / pct_exact")} AS rel_err
         |FROM est JOIN xo ON est.event_type = xo.event_type AND est.p = xo.p
         |ORDER BY est.event_type, est.p""".stripMargin
    },

    "events_srm_check" ->
      s"""WITH ev AS (SELECT event_type,
         |  CASE WHEN isodow(ts)-1 >= 5 THEN 1 ELSE 0 END AS t FROM events),
         |g AS (SELECT event_type, count(*) AS n,
         |  CAST(sum(t) AS BIGINT) AS n_t FROM ev GROUP BY 1),
         |x AS (SELECT event_type, n, n_t, n - n_t AS n_c,
         |  CAST(n AS DOUBLE) * 2.0 / 7.0 AS e_t,
         |  CAST(n AS DOUBLE) * 5.0 / 7.0 AS e_c FROM g),
         |c AS (SELECT event_type, n, n_t, n_c,
         |  ${round4Sql("(n_t - e_t) * (n_t - e_t) / e_t + (n_c - e_c) * (n_c - e_c) / e_c")} AS chi2
         |  FROM x),
         |p AS (SELECT event_type, n, n_t, n_c, chi2,
         |  ${round6Sql(s"2.0 * (1.0 - ${CleanFunctions.normalCdfSql("sqrt(chi2)")})")} AS p_value
         |  FROM c)
         |SELECT event_type, n, n_t, n_c, chi2, p_value,
         |  CASE WHEN p_value < 0.001 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS srm_flag
         |FROM p ORDER BY event_type""".stripMargin,

    "events_eb_shrinkage" ->
      s"""WITH pu AS (
         |  SELECT user_id, count(*) AS n,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS k
         |  FROM events GROUP BY 1),
         |pr0 AS (
         |  SELECT user_id, n, k,
         |    ${round6Sql("CAST(k AS DOUBLE) / CAST(n AS DOUBLE)")} AS r
         |  FROM pu),
         |mo AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS nu,
         |    ${exactSumSql("r")} AS sr,
         |    ${exactSumSql(round6Sql("r * r"))} AS srr
         |  FROM pr0),
         |mv AS (
         |  SELECT sr / nu AS m,
         |    greatest(srr / nu - (sr / nu) * (sr / nu), 0.0) AS v
         |  FROM mo),
         |cc AS (
         |  SELECT m, greatest(coalesce(m * (1.0 - m) / nullif(v, 0.0) - 1.0, 0.1), 0.1) AS conc
         |  FROM mv),
         |ab AS (
         |  SELECT ${round6Sql("m * conc")} AS alpha,
         |    ${round6Sql("(1.0 - m) * conc")} AS beta
         |  FROM cc)
         |SELECT user_id, n, k, r AS raw_rate,
         |  ${round6Sql("(CAST(k AS DOUBLE) + alpha) / (CAST(n AS DOUBLE) + alpha + beta)")} AS post_rate,
         |  ${round6Sql("CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) + alpha + beta)")} AS shrink_w
         |FROM pr0, ab ORDER BY user_id""".stripMargin,

    "events_ratio_delta" ->
      s"""WITH ev AS (SELECT CAST(floor(value / 50.0) AS BIGINT) AS band,
         |  CASE WHEN isodow(ts)-1 >= 5 THEN 1 ELSE 0 END AS t, user_id,
         |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
         |  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |pu AS (SELECT band, t, user_id, sum(x) AS x, sum(y) AS y
         |  FROM ev GROUP BY 1, 2, 3),
         |arm AS (SELECT band, t, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |  sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
         |  FROM pu GROUP BY 1, 2 HAVING sum(y) > 0),
         |dv AS (SELECT band, t, n, CAST(n AS DOUBLE) AS nd,
         |  CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
         |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
         |  (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS vx,
         |  (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS vy,
         |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS vxy
         |  FROM arm),
         |p2 AS (SELECT band, t, n, ${round6Sql("r")} AS r6,
         |  ${round6Sql("greatest((vx - 2.0 * r * vxy + r * r * vy) / (nd * my * my), 0.0)")} AS vr
         |  FROM dv),
         |piv AS (SELECT band,
         |  max(CASE WHEN t = 1 THEN n END) AS n_t,
         |  max(CASE WHEN t = 0 THEN n END) AS n_c,
         |  max(CASE WHEN t = 1 THEN r6 END) AS ratio_t,
         |  max(CASE WHEN t = 0 THEN r6 END) AS ratio_c,
         |  max(CASE WHEN t = 1 THEN vr END) AS v_t,
         |  max(CASE WHEN t = 0 THEN vr END) AS v_c
         |  FROM p2 GROUP BY band
         |  HAVING max(CASE WHEN t = 1 THEN n END) IS NOT NULL
         |     AND max(CASE WHEN t = 0 THEN n END) IS NOT NULL),
         |z AS (SELECT band, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
         |  ratio_t, ratio_c,
         |  ${round4Sql("(ratio_t - ratio_c) / nullif(sqrt(v_t + v_c), 0.0)")} AS z
         |  FROM piv)
         |SELECT band, n_t, n_c, ratio_t, ratio_c, z,
         |  ${round6Sql(s"2.0 * (1.0 - ${CleanFunctions.normalCdfSql("abs(z)")})")} AS p_value
         |FROM z ORDER BY band""".stripMargin,

    "nation_reciprocity" -> {
      val corr = CleanFunctions.momentCorrSql("n", "sx", "sy", "sxy", "sxx", "syy")
      s"""WITH e AS ($tradeEdgesSql),
         |d AS (SELECT src, dst, w FROM e WHERE src <> dst),
         |j AS (
         |  SELECT a.w AS w, coalesce(b.w, 0) AS wr
         |  FROM d a LEFT JOIN d b ON a.src = b.dst AND a.dst = b.src),
         |m AS (
         |  SELECT count(*) AS n_edges,
         |    CAST(count(CASE WHEN wr > 0 THEN 1 END) AS BIGINT) AS n_reciprocated,
         |    CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(w) AS DOUBLE) AS sx, CAST(sum(wr) AS DOUBLE) AS sy,
         |    CAST(sum(w * wr) AS DOUBLE) AS sxy,
         |    CAST(sum(w * w) AS DOUBLE) AS sxx,
         |    CAST(sum(wr * wr) AS DOUBLE) AS syy
         |  FROM j)
         |SELECT n_edges, n_reciprocated,
         |  ${round6Sql("CAST(n_reciprocated AS DOUBLE) / CAST(n_edges AS DOUBLE)")} AS reciprocity,
         |  ${round4Sql(corr)} AS weight_symmetry
         |FROM m""".stripMargin
    },

    "nation_kcore" -> {
      // Each round's frame is MATERIALIZED: the survivor set is
      // referenced twice and the prior frame three times, so inlined
      // CTEs would expand to 3^rounds copies of the base scan.
      val chain = (1 to 8).map { i =>
        val p = s"u${i - 1}"
        s"""s$i AS MATERIALIZED (
           |  SELECT a AS keep FROM $p GROUP BY a HAVING count(*) >= 3),
           |u$i AS MATERIALIZED (
           |  SELECT u.a, u.b FROM $p u
           |  JOIN s$i x ON u.a = x.keep JOIN s$i y ON u.b = y.keep)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS ($tradeEdgesSql),
         |u0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
         |  SELECT src AS a, dst AS b FROM e WHERE src <> dst
         |  UNION ALL SELECT dst AS a, src AS b FROM e WHERE src <> dst)),
         |$chain
         |SELECT u.a AS nationkey, n.n_name, count(*) AS core_degree
         |FROM u8 u JOIN nation n ON u.a = n.n_nationkey
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    },

    "events_uplift" ->
      s"""WITH ev AS (SELECT CAST(floor(value / 50.0) AS BIGINT) AS band,
         |  CASE WHEN isodow(ts)-1 >= 5 THEN 1 ELSE 0 END AS t,
         |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |b AS (SELECT band,
         |  sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n_t,
         |  sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS y_t,
         |  sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n_c,
         |  sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS y_c
         |  FROM ev GROUP BY 1),
         |ate AS (SELECT ${round6Sql(
            "CAST(sum(y_t) AS DOUBLE) / CAST(sum(n_t) AS DOUBLE) - CAST(sum(y_c) AS DOUBLE) / CAST(sum(n_c) AS DOUBLE)")} AS ate FROM b)
         |SELECT band, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
         |  ${round6Sql("CAST(y_t AS DOUBLE) / nullif(CAST(n_t AS DOUBLE), 0.0)")} AS rate_t,
         |  ${round6Sql("CAST(y_c AS DOUBLE) / nullif(CAST(n_c AS DOUBLE), 0.0)")} AS rate_c,
         |  ${round6Sql(
            "CAST(y_t AS DOUBLE) / nullif(CAST(n_t AS DOUBLE), 0.0) - CAST(y_c AS DOUBLE) / nullif(CAST(n_c AS DOUBLE), 0.0)")} AS uplift,
         |  ate
         |FROM b, ate ORDER BY band""".stripMargin
  )

  // The streaming sketch twins share their batch oracles verbatim: the
  // folds build the SAME sketch state (shared Catalyst expressions) and
  // the audits downstream are the shared helpers.
  val oracleSql: Map[String, String] = baseOracleSql ++ Map(
    "streaming_kmv_jaccard" -> baseOracleSql("events_kmv_jaccard"),
    "streaming_ddsketch_quantile" -> baseOracleSql("events_ddsketch_quantile"))
}
