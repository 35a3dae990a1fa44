package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Shared training + detection harness for the tiny-model / huge-data
  * autoencoder operators ([[MlpAutoencoder]], [[LstmAutoencoder]]).
  *
  * [[fit]] is mapPartitions minibatch SGD + synchronous parameter averaging
  * (one communication round per epoch — the standard data-parallel scheme
  * when the model is tiny and the data is huge):
  *   - every partition starts each epoch from the same broadcast weights,
  *     runs deterministic-order SGD over its rows, emits (params, count);
  *   - the driver averages partition results weighted by count, sorted by
  *     partition id so float accumulation order is fixed;
  *   - no parameter server, no per-batch shuffles; scales with executors.
  *
  * Parameters travel as one flat Array[Double] so averaging is layout-blind;
  * each model object owns its own offsets/packing.
  *
  * [[detectOnSequences]] is the shared center -> train -> score -> flag
  * shell around a window column: only the D-element mean vector and the
  * model parameters ever touch the driver.
  */
private[operators] object DistributedSgd {

  /** Run `epochs` rounds of partition-local SGD + weighted averaging.
    *
    * `partitionFit(start, windows)` must return the partition's updated
    * parameter vector after consuming ALL windows (the harness counts rows
    * as the iterator drains, and the count weights the average). `start`
    * is a private clone — implementations may mutate it in place.
    */
  def fit(seqs: DataFrame, seqCol: String, epochs: Int, init: Array[Double],
          partitionFit: (Array[Double], Iterator[Array[Double]]) => Array[Double])
      : Array[Double] = {
    val spark = seqs.sparkSession
    val idx = seqs.schema.fieldIndex(seqCol)
    // Materialize the training RDD ONCE: each epoch re-reads it, and
    // without the cache every epoch would replay the upstream
    // repartition+sort shuffle (the dominant cost at scale).
    val trainRdd = seqs.rdd.cache()
    var params = init
    for (_ <- 1 to epochs) {
      val bc = spark.sparkContext.broadcast(params)
      val partResults = trainRdd.mapPartitionsWithIndex { (pid, rows) =>
        if (rows.isEmpty) Iterator.empty
        else {
          var n = 0L
          val windows = rows.map { r => n += 1; r.getSeq[Double](idx).toArray }
          val p = partitionFit(bc.value.clone(), windows)
          Iterator.single((pid, p, n))
        }
      }.collect().sortBy(_._1) // fixed accumulation order => deterministic
      bc.destroy() // params rebroadcast next epoch; don't accumulate blocks
      val total = partResults.map(_._3).sum.toDouble
      val acc = new Array[Double](params.length)
      partResults.foreach { case (_, p, n) =>
        val wgt = n / total
        var k = 0
        while (k < acc.length) { acc(k) += wgt * p(k); k += 1 }
      }
      params = acc
    }
    trainRdd.unpersist(blocking = false)
    params
  }

  /** Shared center + train + score + flag over a D-dimensional window
    * column `seqCol`.
    *
    * `fitOnCentered` receives the repartitioned/sorted training frame
    * (single column "xc") and returns the flat trained parameters;
    * `scorer(params)` builds the per-window error function once per
    * scoring partition (so implementations can allocate reusable
    * scratch there, not per row).
    *
    * `standardize=true` also divides each dimension by its (exact,
    * population) standard deviation — required by models with saturating
    * gates (the LSTM), whose Xavier init assumes unit-scale inputs;
    * the MLP path keeps center-only for bit-compatibility.
    */
  def detectOnSequences(seqs: DataFrame, seqCol: String,
                        keys: Seq[String], order: Seq[String], dim: Int,
                        flagFactor: Double, trainPartitions: Int,
                        fitOnCentered: DataFrame => Array[Double],
                        scorer: Array[Double] => (Array[Double] => Double),
                        standardize: Boolean = false)
      : DataFrame = {
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
    val momentCols =
      (0 until dim).map(i =>
        CleanFunctions.exactMean(element_at(col(seqCol), i + 1)).as(s"m$i")) ++
      (if (standardize)
        (0 until dim).map { i =>
          val x = element_at(col(seqCol), i + 1)
          CleanFunctions.exactMean(x * x).as(s"s$i")
        }
      else Seq.empty)
    val meanRow = full.select(momentCols: _*).head()
    require(!meanRow.anyNull,
      "autoencoder detect: no complete windows to train on (all inputs null or shorter than seqLen)")
    val meanArr = Array.tabulate(dim)(meanRow.getDouble)
    // Population std from the exact moments; near-constant dims scale by 1
    // instead of exploding.
    val invSdArr = Array.tabulate(dim) { i =>
      if (!standardize) 1.0
      else {
        val v = meanRow.getDouble(dim + i) - meanArr(i) * meanArr(i)
        if (v > 1e-12) 1.0 / math.sqrt(v) else 1.0
      }
    }
    // localCheckpoint, NOT cache(): both the training pass and the caller's
    // eventual scoring materialization read this frame, but a CacheManager
    // entry pinned inside the API would leak executor memory the caller has
    // no handle to release. localCheckpoint materializes once (eagerly,
    // which fit() does anyway) and its blocks are released by the
    // ContextCleaner as soon as the returned plan is garbage-collected.
    val centered = full
      .withColumn("xc",
        zip_with(
          zip_with(col(seqCol), lit(meanArr), (x, m) => x - m),
          lit(invSdArr), (xm, is) => xm * is))
      .localCheckpoint()

    val ordCols = (keys ++ order).map(col)
    val train = centered
      .repartition(trainPartitions, keys.map(col): _*)
      .sortWithinPartitions(ordCols: _*)
      .select(col("xc"))
    val params = fitOnCentered(train)

    val bc = spark.sparkContext.broadcast(params)
    val schema = StructType(centered.schema.fields :+ StructField("recon_err", DoubleType))
    val xcIdx = centered.schema.fieldIndex("xc")
    val scored = spark.createDataFrame(
      centered.rdd.mapPartitions { rows =>
        val err = scorer(bc.value)
        rows.map { r =>
          Row.fromSeq(r.toSeq :+ err(r.getSeq[Double](xcIdx).toArray))
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
