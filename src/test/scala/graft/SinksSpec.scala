package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sink").toString

  test("partitioned parquet: filter on partition key prunes at the source") {
    val dir = tmp() + "/part"
    val df = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "en" else "de", i * 1.0))
      .toDF("id", "lang", "v")
    Sinks.partitionedParquet(df, dir, Seq("lang"))
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(back.count() == 50)
    val scan = back.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters"), "expected partition-level pruning")
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      Sinks.bucketedTable(a, "graft_bkt_a", "k", 4)
      Sinks.bucketedTable(b, "graft_bkt_b", "k", 4)
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("bucketed_join query entry runs exchange-free with broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("bucketed_join")(spark, SparkTestSession.sfDir)
      assert(df.count() > 0)
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join+agg must not shuffle on the bucket key:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  test("csv and json writers roundtrip") {
    val dir = tmp()
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "s", "v")
    Sinks.csv(df, s"$dir/c", delimiter = ";")
    Sinks.jsonLines(df, s"$dir/j")
    val c = spark.read.option("delimiter", ";").option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/c")
    val j = spark.read.json(s"$dir/j")
    assert(c.count() == 2 && j.count() == 2)
    assert(j.select("id", "s", "v").orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }
}
