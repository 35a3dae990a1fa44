package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for skew, in preference order:
  *
  *  1. `broadcast(dim)` — small side fits in memory: no shuffle at all.
  *  2. AQE skew-join (on by default in GraftSession) — Spark splits
  *     oversized partitions at runtime; handles moderate skew for free.
  *  3. [[saltedJoin]] — the explicit fallback when the build side is too
  *     big to broadcast AND a handful of keys dominate so hard that even
  *     split partitions overwhelm an executor (the classic null-key /
  *     power-law fact-fact join at 100 TB).
  */
object JoinOps {

  /** Salted equi-join: the skewed (large) side sprays each row into one
    * of `salt` sub-keys; the other side replicates `salt` ways. Each hot
    * key's rows now land on `salt` different reducers. Output equals the
    * plain inner join exactly; cost is `salt`x replication of the small
    * side — keep `salt` near the executor-count / skew factor.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt > 0, s"salt=$salt must be positive")
    val l = large.withColumn("__salt", (rand(seed = 42) * salt).cast("int"))
    val r = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Broadcast with a HARD row fence: counts the side (one cheap action —
    * use only where the side is already reduced/checkpointed) and REFUSES
    * to broadcast above `maxRows`, turning a documented small-side
    * contract into an enforced one. This is the guard for broadcast sides
    * whose lineage is invisible to the static plan audit (e.g. derived
    * from a localCheckpoint, where the corpus scan is erased from the
    * logical plan): a caller who feeds a corpus-proportional frame gets a
    * loud AnalysisException-style failure at plan time, not an executor
    * OOM at 100x scale. PlanAudit.CheckpointBroadcastContract lists
    * exactly the queries that rely on this fence.
    */
  def boundedBroadcast(side: DataFrame, maxRows: Long, what: String): DataFrame = {
    // Memoize the fence count per physical frame (RDD id): the side is a
    // localCheckpoint-derived frame, so its RDD identity pins exactly one
    // materialized dataset — re-fencing the same frame (plan audit then
    // execution, or a reused checkpoint) must not pay the count twice.
    // A NEW checkpoint gets a new RDD id and re-counts, which is the
    // correct staleness behavior for a guard. Bounded: Long values only,
    // cleared past 4096 entries. Keyed by applicationId + RDD id: RDD
    // ids RESTART at 0 with each new SparkContext (and identityHashCode
    // of a GC'd session can recur), so a session-hash key could let a
    // stale smaller count satisfy the fence across context restarts.
    val key = (side.sparkSession.sparkContext.applicationId, side.rdd.id)
    if (countMemo.size > 4096) countMemo.clear()
    val n = countMemo.computeIfAbsent(key, _ => side.count())
    require(n <= maxRows,
      s"boundedBroadcast($what): side has $n rows, above the $maxRows-row " +
        "broadcast fence — repartition to an equi-join instead of broadcasting")
    firedFences.put(what, (n, maxRows))
    broadcast(side)
  }

  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Long]()

  /** Fence tag -> (rows counted, fence) for every boundedBroadcast that
    * fired in this JVM. Exists so PlanAuditSpec can assert the fence is
    * actually ON the code path of each query listed in
    * PlanAudit.CheckpointBroadcastContract — the static audit cannot see
    * through the localCheckpoint, but a constructed query either fires
    * its fence (registry hit) or someone removed it (CI failure).
    */
  val firedFences = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** Range (interval) join: each fact row joins the interval rows whose
    * [loCol, hiCol) half-open band contains its `valueCol` — the
    * IP-geolocation / price-band / calendar-window lookup shape that a
    * plain equi-join can't express.
    *
    * Scale posture: interval tables in practice are BOUNDED (bands,
    * calendars, maintenance windows — tens to thousands of rows) while
    * the fact side is the corpus, so the right plan is a broadcast
    * nested-loop with the range predicate evaluated stream-side: zero
    * shuffle of the fact table at any scale. The `broadcast` hint here is
    * therefore a small-side CONTRACT (like AnnSearch.bruteForceTopK), not
    * an optimizer override of a corpus side — callers with a genuinely
    * huge interval set should instead quantize both sides to a common
    * bucket grid and equi-join on bucket (the as-of-join pattern in
    * TimeSeriesOps.asofJoin).
    */
  def rangeJoin(facts: DataFrame, intervals: DataFrame, valueCol: String,
                loCol: String, hiCol: String): DataFrame =
    facts.join(broadcast(intervals),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))

  /** Interval-interval OVERLAP join on a shared bucket grid — the
    * large×large interval shape where [[rangeJoin]]'s broadcast contract
    * breaks (BOTH sides corpus-proportional: sessions × sessions,
    * sessions × outages). Each side explodes its CLOSED [lo, hi]
    * interval (integral units, e.g. epoch micros) into the `span`-sized
    * grid buckets it covers, turning the overlap match into a bucket
    * equi-join — ONE shuffle on bucket — with the exact predicate
    * `lLo <= rHi && rLo <= lHi` re-checked on the joined rows. A pair
    * sharing several buckets would duplicate; the canonical-bucket guard
    * (joined bucket == the overlap's own start bucket,
    * greatest(lLo,rLo) DIV span) keeps exactly one copy with NO distinct
    * shuffle. Size `span` near the typical interval length: too small
    * explodes fan-out, too large piles pairs into few buckets (the same
    * trade as LSH band width). Column names must differ across sides.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lLo: String, lHi: String, rLo: String, rHi: String,
                  span: Long, extra: Column = lit(true)): DataFrame = {
    require(span > 0, s"span=$span must be positive")
    require(Seq(lLo, lHi, rLo, rHi).distinct.size == 4,
      s"interval column names must be distinct across sides: $lLo/$lHi vs $rLo/$rHi")
    val lb = left.withColumn("_ov_bl",
      explode(sequence(expr(s"$lLo DIV ${span}L"), expr(s"$lHi DIV ${span}L"))))
    val rb = right.withColumn("_ov_br",
      explode(sequence(expr(s"$rLo DIV ${span}L"), expr(s"$rHi DIV ${span}L"))))
    lb.join(rb,
        lb("_ov_bl") === rb("_ov_br") &&
          col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          lb("_ov_bl") === expr(s"greatest($lLo, $rLo) DIV ${span}L") &&
          extra)
      .drop("_ov_bl", "_ov_br")
  }
}
