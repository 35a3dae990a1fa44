package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{CleanFunctions, TextFunctions}

/** Benchmark decontamination — the training-data hygiene op: flag training
  * documents sharing any k-gram shingle with a held-out benchmark set
  * (the guard against evaluation leakage when assembling a training
  * corpus from web-scale text).
  *
  * Scale shape: candidates come from an equi-join on the 60-bit shingle
  * HASH (cheap shuffle compares, never doc x doc); the shingle STRING
  * rides along and is re-confirmed after the join, so a birthday
  * collision in the hash space can never fabricate contamination
  * evidence (prefilter-then-confirm, like bloom_prefilter_join).
  *
  * `k` is the match window: production pipelines run k=8..13 (a 13-gram
  * almost never collides by chance); small-corpus tests use k=4 so the
  * synthetic near-dup structure shows up. `normalizeText=true` applies
  * [[normalize]] before shingling — production decontamination always
  * normalizes, otherwise "The Answer Is 42." fails to match
  * "the answer is 42".
  */
object Decontaminate {

  /** Case/punctuation normalizer: strip every char outside
    * [A-Za-z0-9, whitespace], THEN lowercase. Strip-before-lower keeps
    * the result engine-portable: lowercasing is applied only to pure
    * ASCII, where every engine agrees (Unicode lowering of e.g. dotted-I
    * is where engines can diverge; those chars are gone by then).
    * Multi-space runs collapse in the whitespace tokenizer, not here.
    */
  def normalize(text: Column): Column =
    lower(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))

  /** DuckDB twin of [[normalize]]. */
  def normalizeSql(s: String): String =
    s"lower(regexp_replace($s, '[^A-Za-z0-9\\s]', '', 'g'))"

  /** One row per contaminated training doc with match evidence:
    * (idCol, n_bench_docs, n_shared_shingles). `isBench` partitions
    * `docs` into the held-out set (true) and the training set (false).
    */
  def flag(docs: DataFrame, isBench: Column, idCol: String, textCol: String,
           k: Int, normalizeText: Boolean = true): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val txt = if (normalizeText) normalize(col(textCol)) else col(textCol)
    val sh = docs
      .select(col(idCol), isBench.as("__bench"), TextFunctions.tokens(txt).as("t"))
      .filter(size(col("t")) >= k)
      .select(col(idCol), col("__bench"),
        explode(TextFunctions.shingles(col("t"), k)).as("s"))
      .select(col(idCol), col("__bench"), col("s"),
        CleanFunctions.md5Hash64(col("s")).as("h"))
    // `bh` alias: bench derives from the same plan as train, so an
    // unaliased h === h would resolve to one attribute (Spark WARNs
    // "trivially true equals predicate") and drop the hash key from
    // the join, leaving only the string-shingle equality.
    val bench = sh.filter(col("__bench"))
      .select(col(idCol).as("bench_id"), col("s").as("bs"), col("h").as("bh"))
    val train = sh.filter(!col("__bench"))
    train.join(bench, train("h") === bench("bh") && train("s") === bench("bs"))
      .groupBy(train(idCol))
      .agg(countDistinct(col("bench_id")).as("n_bench_docs"),
        countDistinct(train("s")).as("n_shared_shingles"))
  }
}
