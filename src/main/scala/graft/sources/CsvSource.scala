package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.CleanFunctions

/** CSV ingestion with the reference loader's semantics
  * (reference: src/data_loader.py:8-33 load_data + initial_column_cleanup):
  * custom delimiter, header row, whitespace-stripped column names, and
  * explicit-format date parsing with inference fallback
  * (src/preprocessing.py:10-49).
  *
  * Distributed: Spark's CSV source splits files across executors; schema
  * is read once. Date parsing happens as a codegen'd expression, not a
  * per-row driver loop.
  *
  * Locale contract: month/AM-PM names in `dateFmt` ("MMM", "a") parse
  * under Spark's catalyst formatter, which pins Locale.US internally
  * (DateFormatter.defaultLocale) — NOT the JVM default locale. So
  * English month names parse identically on a de-DE or fr-FR cluster;
  * non-English source data needs pre-normalization, not a locale flag.
  * Enforced by CleanFunctionsSpec's non-English-default-locale test.
  */
object CsvSource {

  def load(spark: SparkSession, path: String, delimiter: String = ";",
           dateCols: Seq[String] = Nil, dateFmt: String = "MMM d, yyyy h:mm a"): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)
    val cleaned = cleanupColumnNames(raw)
    dateCols.foldLeft(cleaned) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, CleanFunctions.toTsFmt(df(c), dateFmt))
      else df
    }
  }

  /** Strip surrounding whitespace from column names (ref data_loader.py:28-33). */
  def cleanupColumnNames(df: DataFrame): DataFrame = {
    val renames = df.columns.map(c => c -> c.trim).filter { case (a, b) => a != b }
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }
}
