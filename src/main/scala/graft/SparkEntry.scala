package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupQueries, EvalQueries, InferenceQueries, MultimodalQueries, OpsQueries, PipelineQueries, RelationalQueries, SimilarityQueries, SpcQueries, StatsQueries, TextQueries, TimeSeriesQueries, TsFeatureQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's full run_pipeline (main.py:58-233) over the events
    * table: index -> clean -> features -> scale -> sequence -> linear-AE
    * reconstruction scores. Lag/window set sized to the sf0.001 series
    * lengths (the full 168-lag default needs longer series).
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"),
      PipelineConfig(lags = Seq(1, 2, 3, 24), rollingWindows = Seq(3, 24)))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TimeSeriesQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ StatsQueries.queries ++ OpsQueries.queries ++ SpcQueries.queries ++
      EvalQueries.queries ++ InferenceQueries.queries ++ TsFeatureQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    TimeSeriesQueries.oracleSql ++ RelationalQueries.oracleSql ++ PipelineQueries.oracleSql ++
      TextQueries.oracleSql ++ DedupQueries.oracleSql ++ SimilarityQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ StatsQueries.oracleSql ++ OpsQueries.oracleSql ++ SpcQueries.oracleSql ++
      EvalQueries.oracleSql ++ InferenceQueries.oracleSql ++ TsFeatureQueries.oracleSql
}
