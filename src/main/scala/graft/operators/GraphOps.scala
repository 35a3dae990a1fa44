package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-graph primitives for near-duplicate clustering
  * (SURVEY.md §2.8: near-dup cluster ids over simhash/minhash pair edges).
  */
object GraphOps {

  /** Min-label propagation to FIXPOINT: connected components where the
    * cluster id is the minimum node id in the component. Each round is one
    * shuffled join + grouped min over the edges PLUS a pointer-jumping
    * step (lbl <- lbl(lbl), the classic doubling trick), so label distance
    * doubles per round and convergence needs O(log diameter) rounds —
    * maxRounds=10 covers diameter ~2^10, where edge-only propagation needs
    * diameter rounds and silently mislabels longer chains at the cap
    * (observed at sf0.1: a >10-hop near-dup chain). Convergence is a
    * changed-label count hitting zero; the fixpoint is unique (min
    * reachable id), so the oracle's recursive closure matches exactly.
    * Pointer jumping is sound because labels only ever move to ids
    * reachable over the symmetrized edges: lbl(v) is reachable from v,
    * hence lbl(lbl(v)) is too.
    *
    * Scale: per-round state is one (id, lbl) row per node — tiny next to
    * the corpus. Each round `localCheckpoint()`s its labels: the round-t
    * plan references round t-1 THREE times (nb join + least + changed
    * check), so without lineage truncation the logical plan grows 3^t —
    * a gigabyte-scale plan string by round 10 (observed: a 2 GB plan blew
    * the driver heap). Checkpointing collapses each round to a LogicalRDD.
    * On a cluster, swap localCheckpoint for reliable `checkpoint` if
    * executor loss during the loop must be survivable.
    *
    * @param edges DataFrame with long columns `x`, `y` (undirected pairs;
    *              symmetrized internally).
    * @return DataFrame (id, lbl): every node appearing in edges, labeled
    *         with the min id reachable from it.
    */
  def minLabelPropagate(edges: DataFrame, maxRounds: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    val sym0 = edges.select(col("x"), col("y"))
      .union(edges.select(col("y").as("x"), col("x").as("y")))
      .localCheckpoint()
    // Size the ROUND shuffles to the materialized edge volume, not the
    // session's batch width: each round schedules `shuffle.partitions`
    // tasks per exchange regardless of data size — on a few-thousand-edge
    // graph that is pure scheduling overhead x rounds. ~50k edges per
    // partition keeps tasks meaningfully sized; a 100 TB corpus's edge
    // set sizes this straight back up to the session width. The conf is
    // restored in `finally`; every returned frame is localCheckpoint'ed
    // inside the window, so callers never recompile under the wrong
    // width.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      sym0.count() / 50000L + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    // MEASURED NEGATIVE (r17, kept so it isn't re-tried): disabling AQE
    // inside the loop to collapse the ~6 stage-jobs per round into one
    // job made dedup_canonical 4.9 s -> 7.3 s (7-rep medians) — AQE's
    // per-exchange stage jobs are what RE-PLANS each round's label joins
    // into runtime broadcasts; without it the rounds pay real exchanges.
    // The scheduling overhead the extra jobs cost is smaller than the
    // join re-planning they buy, even at 1 shuffle partition.
    try {
      // Pre-partition the symmetrized edges by x ONCE (r16 optimization,
      // guide §2.4): localCheckpoint preserves the hash partitioning, so
      // the seed aggregation (groupBy x) and every round's neighbor-min
      // join (on x) reuse the layout — the EDGE table, the only
      // corpus-proportional side of the loop, is never exchanged again.
      // The old shape re-shuffled sym TWICE per round (the prop subtree
      // was duplicated under the pointer-jump self-join).
      val sym = sym0.repartition(parts.toInt, col("x")).localCheckpoint()
      // Seed with min(id, min neighbor) — the result of the first
      // identity-label round, folded into one aggregate. groupBy(x) over
      // the symmetrized edges is the same relation as the old groupBy(y)
      // (every (a,b) has its mirror (b,a)) and is exchange-free on the
      // x-partitioned layout.
      var labels: DataFrame = sym.groupBy(col("x").as("id")).agg(min(col("y")).as("nbl"))
        .select(col("id"), least(col("id"), col("nbl")).as("lbl"))
        .localCheckpoint()
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        val nb = sym.join(labels, sym("x") === labels("id"))
          .groupBy(sym("y").as("id")).agg(min(col("lbl")).as("nbl"))
        // Carry the PREVIOUS label through the round so convergence is a
        // checkpoint-local filter+count instead of a per-round join of
        // two label tables (one fewer shuffle per round).
        val prop = labels.join(nb, Seq("id"), "left")
          .select(col("id"), least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("lbl"),
            col("lbl").as("prev"))
        // Pointer jumping, TWICE per round, through the PREVIOUS round's
        // materialized label table (not through prop): each jump join
        // references `labels` — an already-checkpointed RDD scan — so the
        // whole round stays ONE materialization with no duplicated
        // neighbor-min subtree, and label depth grows ~3x per round
        // (neighbor step + two chained jumps) instead of 2x
        // (measured round counts at sf0.1 stayed 8/7/6 — the win is the
        // single materialization, 121->98 jobs on customer_components).
        // Sound for the same reason as classic doubling:
        // labels(v) is reachable from v, so least() only ever moves a
        // label to a smaller reachable id; the fixpoint (min reachable
        // id) is unique, and the changed==0 exit certifies it exactly.
        val jt1 = labels.select(col("id").as("j1id"), col("lbl").as("j1lbl"))
        val j1 = prop.join(jt1, col("lbl") === col("j1id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("j1lbl"), col("lbl"))).as("lbl"),
            col("prev"))
        val jt2 = labels.select(col("id").as("j2id"), col("lbl").as("j2lbl"))
        val next = j1.join(jt2, col("lbl") === col("j2id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("j2lbl"), col("lbl"))).as("lbl"),
            col("prev"))
          .localCheckpoint()
        val changed = next.filter(col("lbl") =!= col("prev")).count()
        labels = next.select(col("id"), col("lbl"))
        converged = changed == 0
        round += 1
      }
      if (!converged)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"minLabelPropagate hit maxRounds=$maxRounds before the fixpoint: " +
            "returned labels may split components (raise maxRounds; " +
            "pointer jumping covers diameter ~3^rounds)")
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Component-size histogram DERIVED from an already-computed
    * components frame (id, lbl): (component_size, n_components). The
    * composed half of the components API — compute the fixpoint once
    * with [[minLabelPropagate]], derive every readout from the returned
    * frame. Two grouped counts over O(nodes) rows: the first keyed on
    * lbl (component count per label), the second on the count itself —
    * both shrink geometrically, nothing rescans edges.
    */
  def componentSizes(components: DataFrame): DataFrame = components
    .groupBy("lbl").agg(count(lit(1)).as("component_size"))
    .groupBy("component_size").agg(count(lit(1)).as("n_components"))
}
