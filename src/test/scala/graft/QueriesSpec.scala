package graft

import org.scalatest.funsuite.AnyFunSuite

class QueriesSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("approx stats land near the exact values") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("events_approx_stats")(spark, sfDir)
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        expr("percentile(value, 0.5)").as("p50"))
    approx.join(exact, "event_type").collect().foreach { r =>
      val (au, eu) = (r.getAs[Long]("approx_users"), r.getAs[Long]("n_users"))
      assert(math.abs(au - eu) <= math.max(2, eu / 10), s"HLL off: $au vs $eu")
      val (ap, ep) = (r.getAs[Double]("approx_p50"), r.getAs[Double]("p50"))
      assert(math.abs(ap - ep) <= math.max(0.5, ep * 0.1), s"p50 off: $ap vs $ep")
    }
  }

  test("IVF ANN recall vs brute force is useful") {
    import org.apache.spark.sql.functions._
    val bf = SparkEntry.queries("ann_topk_cosine")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("ann_ivf_topk")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall@10 too low: $recall")
  }

  test("multi-probe LSH ANN recall vs brute force") {
    import org.apache.spark.sql.functions._
    val bf = SparkEntry.queries("ann_topk_cosine")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("ann_lsh_topk")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.9, s"adaptive multi-probe LSH recall@10 too low: $recall")
  }

  test("query column names match oracle aliases (driver hashes by name)") {
    // Spot-check: no generated names like sum(x) leak into output schemas.
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, sfDir).columns
      cols.foreach { c =>
        assert(!c.contains("("), s"$name leaks generated column name: $c")
      }
    }
  }
}
