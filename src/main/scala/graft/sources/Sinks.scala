package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output side of the engine. The reference only plots (notebooks/); a
  * 100 TB pipeline needs real sinks, and HOW data lands determines the
  * cost of every downstream read:
  *
  *  - `partitionedParquet` prunes downstream scans on the partition key
  *    (date, language, source shard) — directory-level pruning, zero I/O
  *    for filtered-out partitions.
  *  - `bucketedTable` pre-shuffles on the join/agg key at write time, so
  *    repeated joins on that key skip their exchange entirely.
  *  - `csv`/`json` interop writers mirror the CSV-in contract of the
  *    reference (data_loader.py) on the way out.
  */
object Sinks {

  def parquet(df: DataFrame, path: String,
              mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Hive-style partitioned layout: one directory per distinct value of
    * `partitionCols`. Keep partition cardinality bounded (dates, enums —
    * not ids): small-file explosion is the classic 100 TB failure mode.
    */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: `numBuckets` files per partition,
    * rows hashed on `bucketCol`. A later join or groupBy on `bucketCol`
    * between co-bucketed tables runs exchange-free.
    *
    * Overwrite also clears a STALE warehouse directory left by an earlier
    * session: the in-memory catalog forgets tables on restart but the
    * location survives, and saveAsTable refuses to reuse it.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      val spark = df.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS $table")
      // Resolve the managed location through the catalog (handles db-
      // qualified names and URI encoding) and delete via the Hadoop FS
      // API (works on any filesystem, not just file:).
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def csv(df: DataFrame, path: String, delimiter: String = ",",
          header: Boolean = true, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("delimiter", delimiter).option("header", header.toString)
      .csv(path)

  def jsonLines(df: DataFrame, path: String,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC interop writer — the other columnar format a lake ingests;
    * same pushdown/pruning story as parquet on read.
    */
  def orc(df: DataFrame, path: String,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)
}
