package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit primitives: each check reduces a table to ONE
  * `(check, failed)` row, and [[audit]] unions them into a single DQ
  * report — the pre-flight gate a 100 TB ingest runs before publishing a
  * partition (the reference trusts its CSV blindly; an engine cannot).
  *
  * Scale posture: every check is a map-side partial aggregate over one
  * scan (count of a predicate), except [[fkOrphans]] which is a left-anti
  * join on the key — the join the optimizer already handles (broadcast if
  * the parent's keys are small, shuffled hash otherwise). The union of
  * single-row aggregates is driver-free: no collect, each leg its own
  * stage, result O(#checks) rows.
  */
object DataQuality {

  /** Rows where `c` is null. */
  def nullCount(df: DataFrame, name: String, c: String): DataFrame =
    df.agg(count(when(col(c).isNull, 1)).as("failed"))
      .select(lit(name).as("check"), col("failed"))

  /** Rows failing an arbitrary boolean predicate (nulls count as PASS —
    * pair with [[nullCount]] to flag them explicitly).
    */
  def predicateViolations(df: DataFrame, name: String, bad: Column): DataFrame =
    df.agg(count(when(bad, 1)).as("failed"))
      .select(lit(name).as("check"), col("failed"))

  /** Excess rows beyond one per key among rows whose key parts are all
    * non-null (0 = the key is unique). Null-keyed rows are EXCLUDED from
    * both sides of the subtraction — they are [[nullCount]]'s finding,
    * and counting them here would also diverge from SQL `COUNT(DISTINCT
    * col)` (which skips nulls) in single-column form.
    */
  def dupKeys(df: DataFrame, name: String, keys: Seq[String]): DataFrame = {
    val keyed = keys.map(col(_).isNotNull).reduce(_ && _)
    df.agg((count(when(keyed, 1)) -
        count_distinct(when(keyed, struct(keys.map(col): _*)))).as("failed"))
      .select(lit(name).as("check"), col("failed"))
  }

  /** Child rows whose key has no parent row (FK orphans): left-anti join
    * child→parent on the key, then count.
    */
  def fkOrphans(child: DataFrame, parent: DataFrame, name: String,
                childKey: String, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("failed"))
      .select(lit(name).as("check"), col("failed"))

  /** Union the per-check rows into one report, sorted by check name. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _).orderBy("check")
}
