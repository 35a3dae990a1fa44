package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Write-path data-layout primitives.
  *
  * At 100 TB the scan cost of every future query is decided when files
  * are WRITTEN: a table clustered on one column prunes only on that
  * column. A Z-ORDER (Morton) key interleaves the bits of two bucketized
  * dimensions so that sorting by the key places rows close in BOTH
  * dimensions into the same files — min/max file statistics then prune
  * 2-D predicates (the Delta/Iceberg `OPTIMIZE ZORDER BY` primitive,
  * re-expressed as a plain deterministic column).
  *
  * Reference semantics: none (the reference writes no files); this is
  * engine table stakes for the lakehouse write path, SURVEY §2.11b.
  */
object LayoutOps {

  /** Morton/Z-order key of two already-bucketized integer columns
    * (each in [0, 2^bits)): bit i of `a` lands at key bit 2i, bit i of
    * `b` at 2i+1. Pure integer codegen expressions — no UDF, engine-
    * portable by construction (the SQL twin is generated from the same
    * loop). Callers bucketize first (range or hash, their choice);
    * out-of-range inputs fold in via the masking `& 1`.
    */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB SQL twin of [[zorderKey]] — the identical bit expression. */
  def zorderKeySql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      s"(((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " + ", ")")
  }
}
