package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CleanFunctions
import graft.sources.Tables

/** r16 optimization fence: ts_lttb_downsample was rewritten from
  * LttbBuckets-2 driver-coordinated window/join rounds into one keyed
  * repartition + in-partition sorted fold. This spec re-derives the OLD
  * formulation inline (verbatim round structure: row-number windows,
  * exactMean centroids, round6 areas, (tsu, event_id) argmax tiebreak,
  * per-round picks) and asserts the new entry's output is row-for-row
  * identical on the sf0.001 corpus — the same bit-equality contract the
  * DuckDB oracle checks, enforced at spec speed.
  */
class LttbEquivalenceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val LttbBuckets = 12 // pinned literal, mirrors OpsQueries

  test("per-key fold LTTB equals the round-unrolled window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val d = SparkTestSession.sfDir
    val nb = LttbBuckets - 2
    val ev = Tables.events(spark, d)
      .withColumn("tsu", CleanFunctions.epochUs(col("ts")))
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val cw = Window.partitionBy("user_id")
    val base = ev.where(col("value").isNotNull)
      .select(col("user_id"), col("tsu"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("cnt", count(lit(1)).over(cw))
      .where(col("cnt") >= LttbBuckets.toLong)
      .localCheckpoint()
    val first = base.where(col("rn") === 1L)
    val last = base.where(col("rn") === col("cnt"))
    val interior = base.where(col("rn") > 1L && col("rn") < col("cnt"))
      .withColumn("bucket",
        floor(((col("rn") - 2L) * nb).cast(DoubleType) /
          (col("cnt") - 2L).cast(DoubleType)).cast(LongType) + 1L)
    val cents = interior.groupBy("user_id", "bucket").agg(
      CleanFunctions.exactMean(col("rn").cast(DoubleType)).as("cx"),
      CleanFunctions.exactMean(col("value")).as("cy"))
    var sel = first.select(col("user_id"),
      col("rn").cast(DoubleType).as("px"), col("value").as("py"))
    val picks = (1 to nb).map { i =>
      val nxt =
        if (i < nb) cents.where(col("bucket") === (i + 1).toLong)
          .select(col("user_id"), col("cx"), col("cy"))
        else last.select(col("user_id"),
          col("rn").cast(DoubleType).as("cx"), col("value").as("cy"))
      val scored = interior.where(col("bucket") === i.toLong)
        .join(sel, "user_id").join(nxt, "user_id")
        .withColumn("area", CleanFunctions.round6(abs(
          (col("px") - col("cx")) * (col("value") - col("py")) -
            (col("px") - col("rn").cast(DoubleType)) * (col("cy") - col("py"))
        ) * lit(0.5)))
      val pick = scored.withColumn("rk", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(desc("area"), col("tsu"), col("event_id"))))
        .where(col("rk") === 1)
        .select(col("user_id"), col("tsu"), col("event_id"), col("value"),
          col("rn"), lit(i.toLong).as("bucket"))
        .localCheckpoint()
      sel = pick.select(col("user_id"),
        col("rn").cast(DoubleType).as("px"), col("value").as("py"))
      pick
    }
    val ends = first.select(col("user_id"), col("tsu"), col("event_id"),
        col("value"), col("rn"), lit(0L).as("bucket"))
      .union(last.select(col("user_id"), col("tsu"), col("event_id"),
        col("value"), col("rn"), lit((nb + 1).toLong).as("bucket")))
    val oldRows = picks.foldLeft(ends)(_ union _)
      .select(col("user_id"), col("bucket"), col("event_id"), col("value"))
      .orderBy("user_id", "bucket")
      .collect().toSeq
    val newRows = SparkEntry.queries("ts_lttb_downsample")(spark, d)
      .collect().toSeq
    assert(newRows.nonEmpty, "sf0.001 must produce LTTB output rows")
    assert(newRows === oldRows)
  }
}
