package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.GraftConfig

/** Nonlinear (tied-weight MLP) autoencoder anomaly detector — the faithful
  * distributed counterpart of the reference's LSTM autoencoder
  * (reference: src/models/deep_learning_models.py:1-93 encode→bottleneck→
  * decode, main.py:21-56 training loop, main.py:183-233 sequence→score).
  *
  * Architecture: h = tanh(W xc + b1), xhat = W' h + b2 over mean-centered
  * length-L sequence windows, hidden size K < L. The tied decoder keeps the
  * parameter count at K*L + K + L — small enough that the WHOLE model is
  * driver-side state (model parameters, never data), exactly like
  * PcaReconstruction's component matrix.
  *
  * Training is mapPartitions minibatch SGD + synchronous parameter
  * averaging (one communication round per epoch — the standard data-parallel
  * scheme when the model is tiny and the data is huge):
  *   - every partition starts each epoch from the same broadcast weights,
  *     runs deterministic-order SGD over its rows, emits (params, count);
  *   - the driver averages partition results weighted by count, sorted by
  *     partition id so float accumulation order is fixed;
  *   - no parameter server, no per-batch shuffles; scales with executors.
  *
  * Determinism: seeded Xavier init, per-partition row order fixed by an
  * explicit sortWithinPartitions on (key, order), partition assignment fixed
  * by repartition(hash(key)); same data + same partitioning => identical
  * model, bit for bit.
  *
  * Scoring is a second mapPartitions pass with the final weights broadcast:
  * err = ||xc - decode(encode(xc))||^2 / L per window, flagged against
  * flagFactor x the per-series mean error (the reference's threshold-on-
  * error shape, config.py:23).
  */
object MlpAutoencoder {

  final case class Params(w: Array[Double], b1: Array[Double], b2: Array[Double]) {
    def copyOf(): Params = Params(w.clone(), b1.clone(), b2.clone())
  }

  /** Seeded Xavier-uniform init — same stream every run. */
  def init(seqLen: Int, hidden: Int, seed: Long): Params = {
    val rng = new scala.util.Random(seed)
    val lim = math.sqrt(6.0 / (seqLen + hidden))
    Params(
      Array.fill(hidden * seqLen)((rng.nextDouble() * 2 - 1) * lim),
      Array.fill(hidden)(0.0),
      Array.fill(seqLen)(0.0))
  }

  /** Forward pass: returns (h, xhat). W is row-major (hidden x seqLen). */
  private def forward(p: Params, xc: Array[Double], seqLen: Int, hidden: Int)
      : (Array[Double], Array[Double]) = {
    val h = new Array[Double](hidden)
    var i = 0
    while (i < hidden) {
      var a = p.b1(i)
      var j = 0
      while (j < seqLen) { a += p.w(i * seqLen + j) * xc(j); j += 1 }
      h(i) = math.tanh(a)
      i += 1
    }
    val xhat = new Array[Double](seqLen)
    var j = 0
    while (j < seqLen) {
      var a = p.b2(j)
      var i2 = 0
      while (i2 < hidden) { a += p.w(i2 * seqLen + j) * h(i2); i2 += 1 }
      xhat(j) = a
      j += 1
    }
    (h, xhat)
  }

  /** One SGD step on a single window (batch size 1 keeps the math obvious;
    * the JIT-fused loops are the hot path either way). Tied-weight grads:
    * dW = da x' + h e'  with e = 2(xhat - x)/L, da = (1-h^2) * (W e).
    */
  private def sgdStep(p: Params, xc: Array[Double], lr: Double,
                      seqLen: Int, hidden: Int): Unit = {
    val (h, xhat) = forward(p, xc, seqLen, hidden)
    val e = new Array[Double](seqLen)
    var j = 0
    while (j < seqLen) { e(j) = 2.0 * (xhat(j) - xc(j)) / seqLen; j += 1 }
    val da = new Array[Double](hidden)
    var i = 0
    while (i < hidden) {
      var s = 0.0
      var j2 = 0
      while (j2 < seqLen) { s += p.w(i * seqLen + j2) * e(j2); j2 += 1 }
      da(i) = (1.0 - h(i) * h(i)) * s
      i += 1
    }
    i = 0
    while (i < hidden) {
      var j3 = 0
      while (j3 < seqLen) {
        p.w(i * seqLen + j3) -= lr * (da(i) * xc(j3) + h(i) * e(j3))
        j3 += 1
      }
      p.b1(i) -= lr * da(i)
      i += 1
    }
    j = 0
    while (j < seqLen) { p.b2(j) -= lr * e(j); j += 1 }
  }

  private def meanError(p: Params, xc: Array[Double], seqLen: Int, hidden: Int): Double = {
    val (_, xhat) = forward(p, xc, seqLen, hidden)
    var s = 0.0
    var j = 0
    while (j < seqLen) { val d = xhat(j) - xc(j); s += d * d; j += 1 }
    s / seqLen
  }

  /** Train on the `seqCol` windows of `df` (array<double>, length seqLen).
    * One epoch = one mapPartitions pass + one weighted parameter average.
    */
  def fit(seqs: DataFrame, seqCol: String, seqLen: Int, hidden: Int,
          epochs: Int, lr: Double, seed: Long): Params = {
    val spark = seqs.sparkSession
    val idx = seqs.schema.fieldIndex(seqCol)
    // Materialize the training RDD ONCE: each epoch re-reads it, and
    // without the cache every epoch would replay the upstream
    // repartition+sort shuffle (the dominant cost at scale).
    val trainRdd = seqs.rdd.cache()
    var params = init(seqLen, hidden, seed)
    for (_ <- 1 to epochs) {
      val bc = spark.sparkContext.broadcast(params)
      val partResults = trainRdd.mapPartitionsWithIndex { (pid, rows) =>
        val p = bc.value.copyOf()
        var n = 0L
        rows.foreach { r =>
          val xc = r.getSeq[Double](idx).toArray
          sgdStep(p, xc, lr, seqLen, hidden)
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator.single((pid, p, n))
      }.collect().sortBy(_._1) // fixed accumulation order => deterministic
      bc.destroy() // params rebroadcast next epoch; don't accumulate blocks
      val total = partResults.map(_._3).sum.toDouble
      val acc = Params(new Array[Double](hidden * seqLen),
        new Array[Double](hidden), new Array[Double](seqLen))
      partResults.foreach { case (_, p, n) =>
        val wgt = n / total
        var k = 0
        while (k < acc.w.length) { acc.w(k) += wgt * p.w(k); k += 1 }
        k = 0
        while (k < hidden) { acc.b1(k) += wgt * p.b1(k); k += 1 }
        k = 0
        while (k < seqLen) { acc.b2(k) += wgt * p.b2(k); k += 1 }
      }
      params = acc
    }
    trainRdd.unpersist(blocking = false)
    params
  }

  /** Univariate detector: sequence the target, center, train, score every
    * window, flag scores above `flagFactor` x the per-series mean error.
    *
    * Partitioning contract: training data is repartitioned by the series
    * key and sorted within partitions by (key, order) so per-partition SGD
    * order — and therefore the model — is deterministic.
    */
  def detect(df: DataFrame, keys: Seq[String], order: Seq[String], target: String,
             seqLen: Int = GraftConfig.SequenceLength, hidden: Int = 8,
             epochs: Int = 3, lr: Double = 0.05, seed: Long = 42L,
             flagFactor: Double = 4.0, trainPartitions: Int = 8): DataFrame = {
    // Null targets are dropped BEFORE windowing (collect_list silently
    // skips nulls, which would misalign windows); fill first if the
    // series needs imputation rather than omission.
    val seqs = TimeSeriesOps.sequences(
        df.filter(col(target).isNotNull)
          .withColumn("__t", col(target).cast(DoubleType)),
        keys, order, "__t", seqLen, "seq")
      .drop("__t")
    detectOnSequences(seqs, "seq", keys, order, seqLen, hidden, epochs, lr,
      seed, flagFactor, trainPartitions)
  }

  /** Multivariate detector — the reference's literal training input
    * (main.py:183-195: sequences over the FULL scaled feature matrix,
    * shape (L, F), LSTM input_dim = F). Each row's feature vector is
    * windowed to (L, F) and flattened to an L*F input; everything else
    * (centering, SGD + averaging, scoring, flagging) is the shared path.
    */
  def detectMulti(df: DataFrame, keys: Seq[String], order: Seq[String],
                  featureCols: Seq[String],
                  seqLen: Int = GraftConfig.SequenceLength, hidden: Int = 8,
                  epochs: Int = 3, lr: Double = 0.05, seed: Long = 42L,
                  flagFactor: Double = 4.0, trainPartitions: Int = 8): DataFrame = {
    require(featureCols.nonEmpty, "detectMulti needs at least one feature column")
    // Rows with any null feature are dropped before windowing: a null
    // element would otherwise unbox to a silent 0.0 in training (the
    // plausible-but-wrong failure FloatVectorDot's length guard exists
    // to prevent). Callers wanting imputation fill first.
    val vec = array(featureCols.map(c => col(c).cast(DoubleType)): _*)
    val seqs = TimeSeriesOps.sequences(
        df.na.drop(featureCols).withColumn("__fv", vec),
        keys, order, "__fv", seqLen, "seqv")
      .drop("__fv")
      .withColumn("seq", flatten(col("seqv")))
      .drop("seqv")
    detectOnSequences(seqs, "seq", keys, order, seqLen * featureCols.length,
      hidden, epochs, lr, seed, flagFactor, trainPartitions)
  }

  /** Shared center + train + score + flag over a D-dimensional window
    * column. Only the D-element mean vector and the model parameters ever
    * touch the driver.
    */
  private def detectOnSequences(seqs: DataFrame, seqCol: String,
                                keys: Seq[String], order: Seq[String], dim: Int,
                                hidden: Int, epochs: Int, lr: Double, seed: Long,
                                flagFactor: Double, trainPartitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.CleanFunctions
    val spark = seqs.sparkSession
    // Full windows only — a partial window (possible if upstream data
    // slipped nulls past the pre-filters) would misalign every dimension
    // past the gap and score plausibly instead of failing.
    val full = seqs.filter(size(col(seqCol)) === dim)
    // Mean-center per dimension. DECIMAL-exact means: a plain double avg
    // merges partial states in shuffle-fetch order, which would break the
    // documented bit-for-bit determinism on a real cluster.
    val meanRow = full.select(
      (0 until dim).map(i =>
        CleanFunctions.exactMean(element_at(col(seqCol), i + 1)).as(s"m$i")): _*).head()
    require(!meanRow.anyNull,
      "MlpAutoencoder: no complete windows to train on (all inputs null or shorter than seqLen)")
    val meanArr = Array.tabulate(dim)(meanRow.getDouble)
    val centered = full
      .withColumn("xc", zip_with(col(seqCol), lit(meanArr), (x, m) => x - m))
      .cache()

    val ordCols = (keys ++ order).map(col)
    val train = centered
      .repartition(trainPartitions, keys.map(col): _*)
      .sortWithinPartitions(ordCols: _*)
      .select(col("xc"))
    val params = fit(train, "xc", dim, hidden, epochs, lr, seed)

    val bc = spark.sparkContext.broadcast(params)
    val schema = StructType(centered.schema.fields :+ StructField("recon_err", DoubleType))
    val xcIdx = centered.schema.fieldIndex("xc")
    val scored = spark.createDataFrame(
      centered.rdd.mapPartitions { rows =>
        val p = bc.value
        rows.map { r =>
          val err = meanError(p, r.getSeq[Double](xcIdx).toArray, dim, hidden)
          Row.fromSeq(r.toSeq :+ err)
        }
      }, schema)
    val keyW = if (keys.isEmpty) Window.partitionBy()
               else Window.partitionBy(keys.map(col): _*)
    scored
      .withColumn("is_anomaly",
        (col("recon_err") > lit(flagFactor) *
          CleanFunctions.exactMeanOver(col("recon_err"), keyW)).cast(LongType))
      .drop(seqCol, "xc")
  }
}
