package graft
import org.apache.spark.sql.SparkSession

// Throwaway diagnostic (not committed): candidate-stage row counts for the
// two-level blocked kNN stage, to verify the skew split kills the slope.
object DiagTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val n = graft.sources.Tables.embeddings(spark, d).count()
      val cand = graft.queries.SimilarityQueries
        .knnCandidatePairsForSpec(spark, d).count()
      println(s"DIAG dir=$d n=$n candidates=$cand perVec=${cand / n}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
