package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutOps

class LayoutOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side Morton reference. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zorderKey equals the bit-interleave reference on random buckets") {
    val rng = new scala.util.Random(71)
    val pairs = (1 to 2000).map(i =>
      (i.toLong, rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), LayoutOps.zorderKey(col("a"), col("b"), 8).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (id, a, b) =>
      assert(got(id) == morton(a, b, 8), s"morton mismatch at ($a, $b)")
    }
  }

  test("z-order layout touches fewer files than 1-D sort for a 2-D predicate") {
    // 20k rows uniform over the 256x256 bucket grid, "written" as chunks
    // of 256 rows under two layouts; a 16x16 box predicate then counts
    // how many chunks hold at least one match (= files a min/max-stats
    // scan must open).
    val rng = new scala.util.Random(73)
    val rows = (1 to 20000).map(_ => (rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    def chunksTouched(sorted: Seq[(Long, Long)]): Int =
      sorted.grouped(256).count(_.exists { case (u, h) => u < 16 && h < 16 })
    val byZ = chunksTouched(rows.sortBy { case (u, h) => morton(u, h, 8) })
    val byH = chunksTouched(rows.sortBy(_._2))
    assert(byZ * 2 < byH,
      s"z-order should at least halve touched chunks: z=$byZ vs 1-D=$byH")
  }
}
