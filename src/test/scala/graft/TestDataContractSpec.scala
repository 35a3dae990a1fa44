package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Pin the engine's ingest contract against the driver-generated testdata
  * so silent environment drift (round 7: events.ts switched from INT64
  * TIMESTAMP(NANOS) parquet to plain timestamp[us] and 143 entries ERR'd)
  * becomes ONE named failing test with the offending table and column in
  * its message, instead of an opaque suite-wide failure.
  */
class TestDataContractSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  /** Column names per table, in order — the minimal surface every query
    * builder assumes. Types are checked separately only where the engine
    * branches on them.
    */
  private val expectedColumns = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  test("every testdata table has the expected columns") {
    expectedColumns.foreach { case (name, want) =>
      val got = Tables.table(spark, sfDir, name).schema.map(_.name)
      assert(got == want, s"table '$name': columns $got != expected $want")
    }
  }

  /** The types the ingest layer branches on or does arithmetic with. A
    * timestamp column may ship as nanos-as-long (legacy), TIMESTAMP, or
    * TIMESTAMP_NTZ — anything else is a new data generation the engine
    * does not know how to read.
    */
  private val timestampish: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  test("drift-prone column types are within the ingest contract") {
    val ev = Tables.table(spark, sfDir, "events").schema
    assert(timestampish(ev("ts").dataType),
      s"events.ts is ${ev("ts").dataType}; Tables.events handles $timestampish")
    assert(ev("value").dataType == DoubleType, s"events.value is ${ev("value").dataType}")
    assert(ev("user_id").dataType == LongType, s"events.user_id is ${ev("user_id").dataType}")

    val o = Tables.table(spark, sfDir, "orders").schema
    assert(timestampish(o("o_orderdate").dataType) || o("o_orderdate").dataType == DateType,
      s"orders.o_orderdate is ${o("o_orderdate").dataType}")
    val l = Tables.table(spark, sfDir, "lineitem").schema
    assert(timestampish(l("l_shipdate").dataType) || l("l_shipdate").dataType == DateType,
      s"lineitem.l_shipdate is ${l("l_shipdate").dataType}")

    val em = Tables.table(spark, sfDir, "embeddings").schema
    assert(em("embedding").dataType == ArrayType(FloatType),
      s"embeddings.embedding is ${em("embedding").dataType}")
  }

  test("Tables.events normalizes ts to TIMESTAMP under every generation") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events yields ts: ${df.schema("ts").dataType}")
    assert(df.where(org.apache.spark.sql.functions.col("ts").isNotNull).count() > 0)
  }
}
