package graft.operators

import org.apache.spark.sql.DataFrame
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
}
