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
