package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CleanFunctions, TextFunctions}

/** End-to-end training-corpus curation — the composition a data-curation
  * user actually runs, as ONE user-facing call:
  *
  *   1. quality gate   (TextFunctions.qualityScore >= minQuality)
  *   2. language gate  (TextFunctions.predLang != 'und')
  *   3. exact dedup + simhash near-dup drop (CorpusDedup.run)
  *   4. deterministic train/val split (md5 bucket)
  *
  * Near-dups are REMOVED before the split (stage 3 keeps one
  * representative per near-dup cluster), so a val doc's near-copy cannot
  * leak into train — the split needs no cluster keying here, unlike
  * `leakageSafeSplit` which splits a corpus that still CONTAINS its
  * near-dups.
  *
  * Scale shape: stages 1-2 are pure per-row expressions fused into the
  * scan; stage 3 is CorpusDedup's hash-window + banded-simhash equi-join;
  * stage 4 is a pure expression. One pipeline, no collect, every shuffle
  * keyed. Fully deterministic, so the whole composition is exact-oracle
  * verifiable end to end (the `text_curation` entry).
  */
object CorpusCuration {

  /** Survivor docs with (idCol, lang_pred, quality, split). */
  def run(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
          minQuality: Double = 0.4, trainPct: Int = 90): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct=$trainPct must be in (0, 100)")
    val scored = docs
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextFunctions.predLang(col(textCol)))
      .filter(col("quality") >= minQuality && col("lang_pred") =!= "und")
    val deduped = CorpusDedup.run(scored, idCol, textCol)
    val bucket =
      CleanFunctions.md5Hash64(concat(lit("split:"), col(idCol))) % 100
    deduped
      .withColumn("split", when(bucket < trainPct, "train").otherwise("val"))
      .select(col(idCol), col("lang_pred"), col("quality"), col("split"))
  }
}
