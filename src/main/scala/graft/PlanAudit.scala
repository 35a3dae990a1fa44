package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Explain-plan audit (SURVEY.md §7 step 6): for each query, dump the
  * formatted physical plan and flag scale smells — scans without column
  * pruning, joins that should broadcast but shuffle, missing whole-stage
  * codegen, single-partition window exchanges.
  *
  * Usage: sbt "runMain graft.PlanAudit /root/testdata/sf0.01 [queryName...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val qe: QueryExecution = df.queryExecution
      val plan = qe.executedPlan.toString()
      val smells = Seq(
        "SortMergeJoin where BroadcastHashJoin likely fits" ->
          (plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")),
        "single-partition Exchange (global window without keys?)" ->
          plan.contains("SinglePartition"),
        "CartesianProduct (unbounded pair blow-up)" ->
          plan.contains("CartesianProduct")
      ).collect { case (msg, true) => msg }
      println(s"\n========== $name ==========")
      println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      if (smells.nonEmpty) println(smells.mkString("!! SMELL: ", "\n!! SMELL: ", ""))
    }
    spark.stop()
  }
}
