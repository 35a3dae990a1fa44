package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Constructor-level knobs on the r14 operators (r14 verdict item 7 —
  * the nbSourceConfusion precedent): each knob must actually steer the
  * operator, while the pinned default keeps the driver entry (and so
  * its oracle hashes) byte-identical — the entries themselves call
  * these defs with no arguments, so default-equality is structural.
  */
class KnobSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("dtwProfile band knob: widening the Sakoe-Chiba band never raises a user's warp cost") {
    val byUser = (b: Int) =>
      graft.queries.SpcQueries.dtwProfile(spark, sfDir, band = b)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val deft = byUser(7)
    val wide = byUser(10000) // band >= span: unbanded DTW, the lower bound
    assert(deft.keySet == wide.keySet && deft.nonEmpty)
    // round4 is monotone, so <= survives the quantization exactly.
    deft.foreach { case (u, d) =>
      assert(wide(u) <= d, s"user $u: unbanded ${wide(u)} > banded $d")
    }
  }

  test("burstProfile gamma knob: a prohibitive entry cost kills every burst; a free one only adds them") {
    def burstDays(g: Double) =
      graft.queries.TsFeatureQueries.burstProfile(spark, sfDir, gamma = g)
        .agg(sum("in_burst")).collect()(0).getLong(0)
    val deft = burstDays(2.0)
    assert(burstDays(1e9) == 0L, "gamma=1e9 must suppress all bursts")
    assert(burstDays(0.0) >= deft, "free entry must not lose burst days")
  }

  test("saxMindist breakpoint knob: a breakpoint beyond the data collapses the alphabet to {b,c} and every distance to 0") {
    val out = graft.queries.OpsQueries.saxMindist(spark, sfDir, bp = 1e9)
      .collect()
    assert(out.nonEmpty)
    // All symbols land within one letter of each other -> every cell
    // gap <= 1 -> MINDIST exactly 0.0 (the lower-bound zero case again,
    // via the knob).
    assert(out.forall(_.getDouble(3) == 0.0))
  }
}
