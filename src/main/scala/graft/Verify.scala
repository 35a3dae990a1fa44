package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet // optional query-name filter for debugging
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER lets the same dump run under local-cluster[...]
    // (separate executor JVMs — exercises executor-side serialization and
    // broadcast lifecycle that single-JVM local[n] cannot); pair it with
    // SPARK_GRAFT_JARS pointing at the packaged repo jar so the executor
    // processes can load the engine classes.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is INT64 TIMESTAMP(NANOS); set at session build rather
      // than as a side effect of Tables.events (see Tables.scala).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val rowCounts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var dumped = 0
    SparkEntry.queries.filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Row count from the WRITTEN parquet (footer metadata — no
        // re-execution): the per-entry evidence for the second capture
        // channel below.
        rowCounts(name) = spark.read.parquet(s"$outDir/$name").count()
        dumped += 1
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
      }
      // Per-query caches (dedup shingle/signature sets) would otherwise
      // accumulate for the whole multi-query session.
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // LOUD completion record (r10 postmortem: the driver's
    // CORRECTNESS_r10.json came back `{}` with no trace of why). The
    // sentinel file + final stdout line make three failure modes
    // distinguishable after the fact: (a) Verify never ran → no
    // verify_status.json; (b) Verify ran but queries failed → "failed"
    // is non-empty; (c) Verify fully green but the record is still
    // empty → the fault is in the driver's own check step, not here.
    val status = s"""{"dumped":$dumped,"oracles":${SparkEntry.oracleSql.size},""" +
      s""""failed":${failed.map(q).mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_status.json"), status)
    // Second capture channel (r14 verdict item 5 — the driver's own
    // correctness artifact has come back empty five rounds running even
    // though this dump completes): the full per-entry row record goes to
    // a file, and ONE compact machine-readable line goes to stdout (the
    // Bench {"metric"} precedent; kept far under the ~2000-char capture
    // window — a 471-entry map would truncate mid-JSON and parse as
    // nothing).
    val rowsJson = rowCounts.map { case (k, v) => s"${q(k)}:$v" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_rows.json"),
      s"""{"correctness":{"dumped":$dumped,"failed":${failed.map(q).mkString("[", ",", "]")},"oracles":${SparkEntry.oracleSql.size},"rows":$rowsJson}}""")
    println(s"""{"correctness":{"dumped":$dumped,"n_failed":${failed.size},"failed":${failed.map(q).mkString("[", ",", "]")},"oracles":${SparkEntry.oracleSql.size},"rows_total":${rowCounts.values.sum},"rows_detail":"$outDir/verify_rows.json"}}""")
    println(s"[verify] DONE: $dumped dumped, ${failed.size} failed, " +
      s"${SparkEntry.oracleSql.size} oracles -> $outDir")
    spark.stop()
    // A run that dumped NOTHING is a harness catastrophe (bad sfDir,
    // broken session), never a per-query bug — fail the process loudly
    // rather than letting an empty round pass as silence.
    if (dumped == 0) sys.exit(2)
  }
}
