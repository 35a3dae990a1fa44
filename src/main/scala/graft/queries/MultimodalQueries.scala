package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Opaque payload for multimodal rows: real binary column + typed
  * metadata, the schema a media pipeline would carry at 100 TB.
  */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Output of the (stubbed) decoder. */
case class MediaStats(doc_id: Long, media_type: String, n_bytes: Long,
                      width: Long, height: Long, checksum: Long)

/** Multimodal plumbing (SURVEY.md §2.11): media bytes travel as an opaque
  * `binary` column with typed metadata; decode/feature-extract runs as a
  * typed `Dataset.mapPartitions` — the Scala analogue of mapInPandas: one
  * iterator per partition, so a real decoder would amortize codec init
  * per-partition, and partitioning/schema are genuine Spark plumbing.
  *
  * The decode itself is a clearly-marked deterministic STUB (no image/
  * audio codecs in this container): "dimensions" are derived from the
  * payload's md5, which also makes the whole pipeline oracle-checkable in
  * DuckDB.
  */
object MultimodalQueries {

  /** STUB decoder: stands in for image/audio decode. Deterministic md5
    * features so the DuckDB oracle can replicate bit-for-bit; a real
    * deployment swaps only this function's body.
    */
  private def decodeStub(r: MediaRow): MediaStats = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60-bit, matches md5Hash64
    MediaStats(r.doc_id, r.media_type, r.payload.length.toLong, h % 1920, h % 1080, h)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_stats" -> { (s, d) =>
      import s.implicits._
      val rows = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          col("text").cast("binary").as("payload"))
        .as[MediaRow]
      rows.mapPartitions(_.map(decodeStub)).toDF().orderBy("doc_id")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "mm_binary_stats" -> {
      val h = graft.functions.CleanFunctions.md5Hash64Sql("text")
      s"""SELECT doc_id,
         |CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |CAST(strlen(text) AS BIGINT) AS n_bytes,
         |$h % 1920 AS width, $h % 1080 AS height, $h AS checksum
         |FROM documents ORDER BY doc_id""".stripMargin
    }
  )
}
