package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Approximate-nearest-neighbor search over `embeddings`
  * (SURVEY.md §2.9). Query set = vec_id % 50 == 0 (a stand-in for "the
  * batch of vectors being searched").
  *
  * - Brute force: broadcast the (small) query batch against the corpus —
  *   a BroadcastNestedLoopJoin, which is exactly the right plan when one
  *   side fits in memory; the corpus side streams, nothing shuffles.
  * - LSH: 6 deterministic +-1 hyperplanes -> 64 buckets; candidates are a
  *   bucket equi-join (shuffle on bucket id), exact cosine re-rank within
  *   bucket. The 100 TB path: buckets partition the corpus, each executor
  *   re-ranks only its bucket residents. Recall is probabilistic; the
  *   DuckDB oracle replicates the identical bucketing for exact parity.
  *
  * Ranking is on the 4dp-rounded score with vec_id tiebreak so both
  * engines order identically despite last-ulp float differences.
  */
object SimilarityQueries {

  private val TopK = 10
  private val AnnPlanes = 6
  private val IvfCentroids = 16
  private val IvfProbes = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_cosine" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          TextFunctions.vecNorm(col("embedding")).as("nrm"))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          graft.functions.CleanFunctions.round4(TextFunctions.cosineFromNorms(
            TextFunctions.dot(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm"))).as("score"))
      val w = Window.partitionBy("q_id").orderBy(desc("score"), col("n_id"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .orderBy("q_id", "rk")
    },

    "ann_lsh_topk" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val sb = e.select(col("vec_id"), col("embedding"),
        TextFunctions.vecNorm(col("embedding")).as("nrm"),
        TextFunctions.packBits((0 until AnnPlanes).map(p =>
          TextFunctions.lshSign(col("embedding"), p))).as("bucket"))
      val scored = sb.as("a").join(sb.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") % 50 === 0 && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
          graft.functions.CleanFunctions.round4(TextFunctions.cosineFromNorms(
            TextFunctions.dot(col("a.embedding"), col("b.embedding")),
            col("a.nrm"), col("b.nrm"))).as("score"))
      val w = Window.partitionBy("q_id").orderBy(desc("score"), col("n_id"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .orderBy("q_id", "rk")
    },

    // IVF (inverted-file) ANN — the other standard scale path: k-means
    // coarse quantizer (distributed fit, seeded = deterministic), corpus
    // partitioned by nearest-centroid cell, queries probe their nprobe
    // nearest cells and re-rank exactly inside them. At 100 TB the cell
    // id is the partition key: each executor re-ranks only its cells.
    // K-means isn't SQL-expressible -> rows-only check; recall vs brute
    // force asserted in QueriesSpec.
    "ann_ivf_topk" -> { (s, d) =>
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          TextFunctions.vecNorm(col("embedding")).as("nrm"))
        .withColumn("fv", array_to_vector(
          transform(col("embedding"), _.cast("double"))))
      val km = new KMeans().setK(IvfCentroids).setSeed(42)
        .setFeaturesCol("fv").setPredictionCol("cell").fit(e)
      val cells = km.transform(e).drop("fv").cache()

      // Model parameters (16 x 64 doubles) -> driver; queries pick their
      // nprobe nearest cells by euclidean distance, as a literal table.
      val centers = km.clusterCenters.map(_.toArray)
      val centerRows = centers.zipWithIndex.map { case (c, i) =>
        (i, c.map(_.toFloat))
      }.toSeq
      import s.implicits._
      val centersDf = centerRows.toDF("cell", "center")
      val probe = cells.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
        .crossJoin(broadcast(centersDf))
        .withColumn("dist",
          TextFunctions.dot(col("q_emb"), col("q_emb")) -
            lit(2.0) * TextFunctions.dot(col("q_emb"), col("center")) +
            TextFunctions.dot(col("center"), col("center")))
        .withColumn("crk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("dist"), col("cell"))))
        .filter(col("crk") <= IvfProbes)
        .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cell"))

      val scored = cells.join(broadcast(probe),
          cells("cell") === probe("cell") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          graft.functions.CleanFunctions.round4(TextFunctions.cosineFromNorms(
            TextFunctions.dot(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm"))).as("score"))
      val w = Window.partitionBy("q_id").orderBy(desc("score"), col("n_id"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .orderBy("q_id", "rk")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "ann_topk_cosine" ->
      s"""SELECT q_id, n_id, score, rk FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |    round((${TextFunctions.cosineSql("q.embedding", "e.embedding")}) * 10000.0) / 10000.0 AS score,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round((${TextFunctions.cosineSql("q.embedding", "e.embedding")}) * 10000.0) / 10000.0 DESC, e.vec_id) AS rk
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin,

    "ann_lsh_topk" -> {
      val bucket = (0 until AnnPlanes)
        .map(p => s"(${TextFunctions.lshSignSql("embedding", p)} << $p)").mkString(" + ")
      s"""WITH sb AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
         |SELECT q_id, n_id, score, rk FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         |    round((${TextFunctions.cosineSql("a.embedding", "b.embedding")}) * 10000.0) / 10000.0 AS score,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY round((${TextFunctions.cosineSql("a.embedding", "b.embedding")}) * 10000.0) / 10000.0 DESC, b.vec_id) AS rk
         |  FROM sb a JOIN sb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id % 50 = 0)
         |WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin
    }
  )
}
