package graft.operators

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftConfig

/** Linear-autoencoder anomaly detection = PCA reconstruction error.
  *
  * The reference trains an LSTM autoencoder and flags sequences whose
  * reconstruction error is large (main.py:183-233). The faithful
  * DISTRIBUTED analog of that encode-bottleneck-decode on 100 TB is PCA:
  * a linear autoencoder with tied weights provably converges to the PCA
  * subspace, and Spark computes it scalably — one `treeAggregate` pass
  * builds the LxL covariance (L = sequence length, 24), the
  * eigendecomposition happens on the driver at O(L^3) ~ microseconds, and
  * scoring is a per-row projection. No per-epoch shuffles, no parameter
  * server, deterministic.
  *
  * Scoring uses the orthogonal-projection identity: with an orthonormal
  * component basis, reconstruction error ||xc - UU'xc||^2 =
  * ||xc||^2 - ||U'xc||^2 — no explicit decode materialized.
  *
  * Only the L-element mean vector and the LxK component matrix ever touch
  * the driver (model parameters, not data).
  */
object PcaReconstruction {

  private def dotArr(a: Column, b: Column): Column = aggregate(
    zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  /** Sequence the series, fit a global K-component PCA on the sequence
    * windows, score every window by reconstruction error, flag scores
    * above `flagFactor` x the per-series mean error (the reference's
    * threshold-on-error shape, config.py:23).
    */
  def detect(df: DataFrame, keys: Seq[String], order: Seq[String], target: String,
             seqLen: Int = GraftConfig.SequenceLength, k: Int = 4,
             flagFactor: Double = 4.0): DataFrame = {
    require(k > 0 && k <= seqLen, s"k=$k must be in [1, seqLen=$seqLen]")
    // Cache the sequenced input BEFORE the mean pass: the mean aggregate,
    // the PCA fit, and the scoring pass all reread it, and sequencing is
    // the expensive window shuffle.
    val seqs = TimeSeriesOps.sequences(df, keys, order, target, seqLen, "seq").cache()

    // Per-dimension mean: one aggregate, one L-element row to the driver.
    val meanRow = seqs.select(
      (0 until seqLen).map(i => avg(element_at(col("seq"), i + 1)).as(s"m$i")): _*).head()
    val meanArr = Array.tabulate(seqLen)(meanRow.getDouble)

    val vecs = seqs
      .withColumn("xc", zip_with(col("seq"), lit(meanArr), (x, m) => x - m))
      .withColumn("fv", array_to_vector(col("xc")))
    val model = new PCA().setInputCol("fv").setOutputCol("pv").setK(k).fit(vecs)

    val keyW = if (keys.isEmpty) Window.partitionBy()
               else Window.partitionBy(keys.map(col): _*)
    model.transform(vecs)
      .withColumn("p", vector_to_array(col("pv")))
      .withColumn("recon_err",
        greatest(dotArr(col("xc"), col("xc")) - dotArr(col("p"), col("p")), lit(0.0)))
      .withColumn("is_anomaly",
        (col("recon_err") > lit(flagFactor) * avg(col("recon_err")).over(keyW)).cast("long"))
      .drop("seq", "xc", "fv", "pv", "p")
  }
}
