package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the test star schema. Plain `spark.read
  * .parquet` so Catalyst drives column pruning + predicate pushdown into
  * the scan (verify with explain: ReadSchema / PushedFilters).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * outright. Read nanos as long (session conf, so it works under any
    * driver-created session) and floor-convert to microseconds — exactly
    * what DuckDB's epoch_us does on its TIMESTAMP_NS read, keeping oracle
    * parity. Integer `div`, not `/`: nanos exceed double's 53-bit mantissa.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Prefer setting this at session build (Verify/Bench/GraftSession do);
    // the fallback here only fires for driver-owned sessions that did not,
    // and is skipped once set to avoid mutating shared conf per plan build.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")
}
