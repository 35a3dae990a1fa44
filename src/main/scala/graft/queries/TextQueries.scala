package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.{CleanFunctions, TextFunctions}
import graft.sources.Tables

/** Text-analysis operators over `documents` (SURVEY.md §2.10) plus exact
  * dedup (§2.8). All per-row map work — no shuffle except dedup_exact's
  * hash-keyed window — so the plan is a single WholeStageCodegen over the
  * parquet scan and scales linearly with input.
  */
object TextQueries {

  /** BPE-ish token pattern: letter runs | digit runs | single non-space
    * symbol (GPT-2-style pre-tokenizer, simplified to what both regex
    * engines — Java and RE2 — agree on).
    */
  private val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  // Single source of truth lives in TextFunctions (shared with
  // CorpusCuration); these aliases keep the entry/oracle code unchanged.
  private val Stopwords  = TextFunctions.QualityStopwords
  private val MarkerSets = TextFunctions.LangMarkers

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Sequence-packing parameters: token budget per training bin, and the
    * number of independent pack shards (each shard = one keyed window).
    */
  private val PackBudget = 512L
  private val PackShards = 8L

  /** Weighted-sampling draw size (A-Res top-k). */
  private val WeightedSampleK = 100

  /** Naive-Bayes classifier geometry: hashed-unigram feature buckets
    * (small enough that add-one smoothing stays meaningful on the test
    * corpus; production sizes [[nbSourceConfusion]]'s `buckets` knob to
    * 2^18+) — this pinned default is the shared literal in both
    * engines, so the driver entry and its oracle can never disagree.
    */
  private val NbBuckets = 256L

  /** UniMax epoch cap C: no language may be sampled for more than C
    * passes over its own tokens, however large the budget share.
    */
  private val UniMaxEpochs = 3L

  /** Gopher word-count band, sized so the synthetic corpus (20-80 word
    * docs) actually splits on the rule (the published 50..100k band
    * would pass every doc and test nothing).
    */
  private val GopherMinWords = 30L
  private val GopherMaxWords = 5000L

  /** BM25 parameters (the standard k1/b), the static-pruning idf floor
    * (drops only df~N stopwords), and the reported depth.
    */
  private val BmK1 = 1.2
  private val BmB  = 0.75
  private val BmIdfFloor = 0.05
  private val BmTopK = 10

  /** BM25 query-batch cap: query docs are `doc_id % 100 == 0 AND doc_id
    * < BmQueryCap` — the cap makes the batch a BOUNDED contract (≤50
    * queries) instead of corpus-proportional. Without it the r12 decade
    * study measured slope 1.77 at 10x sf0.1: with queries ∝ corpus the
    * scoring join is queries×postings ≈ quadratic (amplified by this
    * testdata's 31-word vocab — every posting list is corpus-length).
    * Document-at-a-time scoring is linear in the corpus only when the
    * query batch is fixed, which is also the real retrieval workload
    * (queries don't grow because the corpus did). No-op at the committed
    * sfs (max doc_id 4999 at sf0.1), so oracle hashes are unchanged.
    */
  private val BmQueryCap = 5000L

  /** RBO truncation depth and persistence, plus the per-depth weights
    * (1−p)·p^(d−1)/d PRECOMPUTED as Scala doubles so the identical bit
    * patterns are injected into both the Spark plan and the DuckDB
    * oracle (runtime pow() would differ by libm ulps across engines).
    */
  private val RboK = 10
  private val RboP = 0.9
  private val RboWeights: Seq[(Int, Double)] =
    (1 to RboK).map(d => (d, (1 - RboP) * math.pow(RboP, d - 1) / d))

  /** Temperature exponent for source-mix sampling weights (mBERT's
    * alpha=0.7). The SQL twin interpolates the exact double literal.
    */
  private val MixAlpha = 0.7

  /** 8 greedy BPE merge rounds over the corpus word-frequency table.
    * Returns (merge table rows, final vocab with '·'-delimited symbol
    * strings). Shared by text_bpe_train and text_bpe_encode so the two
    * entries can never disagree on the learned merges. The merge loop is
    * driver-coordinated over the O(vocab) type table (the MMR shape);
    * only the word-frequency aggregation touches the corpus.
    */
  private def bpeLearn(s: SparkSession, d: String)
      : (Seq[(Long, String, Long)], DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val wf = Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .cache()
    var vocab = wf.withColumn("sym",
      concat(lit("·"), concat_ws("·",
        expr("filter(split(w, ''), x -> x != '')")), lit("·")))
    val merges = collection.mutable.Buffer[(Long, String, Long)]()
    for (k <- 1 to 8) {
      // Adjacent symbol pairs built per row (r16): transform pairs each
      // symbol with its successor (out-of-range index -> null nxt) and
      // the slice drops the trailing element, so the pair multiset is
      // exactly what the old posexplode + lead()-over-(w, pos) window
      // produced — without a per-round exchange of the vocab table.
      val best = vocab
        .withColumn("syms", expr("filter(split(sym, '·'), x -> x != '')"))
        .select(col("freq"), explode(expr(
          "slice(transform(syms, (x, i) -> struct(x AS t, get(syms, i + 1) AS nxt)), " +
            "1, size(syms) - 1)")).as("pr"))
        .groupBy(col("pr.t").as("t"), col("pr.nxt").as("nxt"))
        .agg(sum(col("freq")).as("total"))
        .orderBy(desc("total"), col("t"), col("nxt")).limit(1).head
      val (x, y, tot) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((k.toLong, x + " " + y, tot))
      vocab = vocab.withColumn("sym",
        expr(s"replace(sym, '·${x}·${y}·', '·${x}${y}·')"))
    }
    (merges.toSeq, vocab)
  }

  /** Hashed multinomial naive-Bayes SOURCE classifier with holdout
    * confusion matrix (see the `text_nb_source` entry's doc for the
    * full rationale). `buckets` is the hashed feature-space size — the
    * constructor-level knob a production corpus sizes to 2^18+; the
    * default stays the pinned test-sized [[NbBuckets]] so the driver
    * entry and its DuckDB oracle share one literal. Model size is
    * O(sources x buckets) either way (both model broadcasts are
    * aggregates, never corpus rows), so the knob changes memory per
    * executor, not the plan shape.
    */
  def nbSourceConfusion(s: SparkSession, d: String,
                        buckets: Long = NbBuckets): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets must be >= 2")
    val docs = Tables.documents(s, d).withColumn("split",
      when(CleanFunctions.md5Hash64(
        concat(lit("nbsplit:"), col("doc_id"))) % 100 < 80, "train")
        .otherwise("test"))
    val toks = docs.select(col("doc_id"), col("source"), col("split"),
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      .withColumn("b", CleanFunctions.md5Hash64(col("tok")) % buckets)
    val trainToks = toks.where(col("split") === "train")
    val counts = trainToks.groupBy("source", "b").agg(count(lit(1)).as("cnt"))
    val srcTok = trainToks.groupBy("source").agg(count(lit(1)).as("n_tok"))
    val srcDoc = docs.where(col("split") === "train")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val total = docs.where(col("split") === "train").agg(count(lit(1)).as("d_tot"))
    val dims = srcDoc.join(srcTok, "source").crossJoin(broadcast(total))
      .withColumn("prior", CleanFunctions.round6(log(
        col("n_docs").cast(DoubleType) / col("d_tot").cast(DoubleType))))
      .withColumn("dflt", CleanFunctions.round6(log(
        lit(1.0) / (col("n_tok") + lit(buckets)).cast(DoubleType))))
    val ll = counts.join(srcTok, "source")
      .withColumn("llw", CleanFunctions.round6(log(
        (col("cnt") + lit(1L)).cast(DoubleType)
          / (col("n_tok") + lit(buckets)).cast(DoubleType))))
      .select(col("source").as("cand"), col("b"), col("llw"))
    val testCnt = toks.where(col("split") === "test")
      .groupBy(col("doc_id"), col("source").as("actual"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val scored = testCnt
      .crossJoin(broadcast(dims.select(col("source").as("cand"),
        col("prior"), col("dflt"))))
      .join(broadcast(ll), Seq("cand", "b"), "left")
      .withColumn("term", CleanFunctions.round6(
        col("cnt").cast(DoubleType) * coalesce(col("llw"), col("dflt"))))
      .groupBy("doc_id", "actual", "cand")
      .agg(CleanFunctions.round4(
        CleanFunctions.exactSum(col("term")) + max(col("prior"))).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .groupBy(col("actual"), col("cand"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"))
      .select(col("actual"), col("cand").as("predicted"), col("n_docs"))
      .orderBy("actual", "predicted")
  }

  /** Stratified-sample size per (lang, source) cell and the weighted
    * sample's global K — pinned so both engines share the literals.
    */
  private val SampleK  = 3
  private val SampleWK = 20L

  /** Deterministic stratified inspection sample (the
    * `docs_sample_stratified` entry): K docs per (lang, source) cell,
    * ranked by md5 of the doc id. `k` is the constructor-level knob a
    * deployment tunes; the default stays the pinned [[SampleK]] so the
    * driver entry and its oracle share one literal (the burstProfile
    * precedent). Because the md5 rank is a fixed total order per
    * stratum, a smaller k is always a PREFIX of a larger one — the
    * property KnobSpec pins.
    */
  def stratifiedSample(s: SparkSession, d: String,
                       k: Int = SampleK): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val w = Window.partitionBy("lang", "source")
      .orderBy(CleanFunctions.md5Hash64(
        concat(lit("sample:"), col("doc_id"))), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .where(col("rk") <= k)
      .select(col("lang"), col("source"), col("rk"), col("doc_id"))
      .orderBy("lang", "source", "rk")
  }

  /** Deterministic Efraimidis-Spirakis weighted sample (the
    * `docs_weighted_sample` entry): global top-`k` by the ln(u)/w key
    * via TakeOrderedAndProject. `k` defaults to the pinned
    * [[SampleWK]]; a smaller k is a prefix of a larger one (fixed
    * total order on (es_key desc, doc_id)).
    */
  def weightedSample(s: SparkSession, d: String,
                     k: Int = SampleWK.toInt): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    Tables.documents(s, d).where(col("n_chars") > 0L)
      .withColumn("u_num", CleanFunctions.md5Hash64(
        concat(lit("wsample:"), col("doc_id"))) % lit(1000000L) + lit(1L))
      .withColumn("es_key",
        CleanFunctions.round6(log(col("u_num").cast(DoubleType) / lit(1000001.0)))
          / col("n_chars").cast(DoubleType))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_chars"),
        CleanFunctions.round6(col("es_key")).as("es_key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic STRATIFIED inspection sample — the "give me K docs
    // per (lang, source) cell" primitive every corpus audit starts
    // with: rank = md5 of the doc id (reproducible across runs, cluster
    // sizes and engines — no RNG state), one grouped window over the
    // stratum key, output O(strata x K) however large the corpus grows.
    // The 100 TB-safe way to eyeball the data.
    "docs_sample_stratified" -> { (s, d) => stratifiedSample(s, d) },

    // Deterministic WEIGHTED sample (Efraimidis-Spirakis 2006 one-pass
    // weighted reservoir — the length-proportional doc sampler a
    // mixture builder uses): rank by key = u^(1/w) descending, which
    // equals ranking by ln(u)/w (ln is monotone and 1/w > 0) — so the
    // only transcendental is round6(ln u) on an EXACT shared rational
    // u = (md5 mod 1e6 + 1)/1000001; weight = n_chars. Global top-K is
    // Spark's TakeOrderedAndProject — a distributed heap reduction,
    // never a single-partition sort.
    "docs_weighted_sample" -> { (s, d) => weightedSample(s, d) },

    // PII scrubbing (training-data redaction): emails then number runs,
    // per-pattern match counts on the original text. Runs over the
    // events.props JSON strings — the synthetic documents contain no
    // digits, props yields real redactions on every row; the synthetic-
    // PII spec (TextAnalysisSpec) exercises the email path.
    "text_pii_scrub" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          TextFunctions.scrubPii(col("props")).as("scrubbed"),
          TextFunctions.piiCount(col("props"), TextFunctions.PiiPatterns(0)._1).as("n_emails"),
          TextFunctions.piiCount(col("props"), TextFunctions.PiiPatterns(1)._1).as("n_nums"))
        .orderBy("event_id")
    },

    // Token counting: whitespace tokens + BPE-ish regex tokens + chars.
    "text_tokens" -> { (s, d) =>
      val toks = TextFunctions.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast(LongType).as("ws_tokens"),
          regexp_count(col("text"), lit(BpePattern)).cast(LongType).as("bpe_tokens"),
          length(col("text")).cast(LongType).as("chars"))
        .orderBy("doc_id")
    },

    // Quality scoring: length/alpha/punct/stopword signals -> [0,1] score.
    "text_quality" -> { (s, d) =>
      val toks = TextFunctions.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          length(col("text")).cast(DoubleType).as("n_chars"),
          size(toks).cast(DoubleType).as("n_tokens"),
          size(filter(toks, t => t.isin(Stopwords: _*))).cast(DoubleType).as("n_stop"),
          regexp_count(col("text"), lit("[a-zA-Z]")).cast(DoubleType).as("n_alpha"),
          regexp_count(col("text"), lit("[.,!?;:]")).cast(DoubleType).as("n_punct"))
        .select(col("doc_id"),
          col("n_tokens").cast(LongType).as("n_tokens"),
          CleanFunctions.round4(CleanFunctions.safeDiv(col("n_stop"), col("n_tokens"))).as("stopword_ratio"),
          CleanFunctions.round4(CleanFunctions.safeDiv(col("n_alpha"), col("n_chars"))).as("alpha_ratio"),
          CleanFunctions.round4(CleanFunctions.safeDiv(col("n_punct"), col("n_chars"))).as("punct_ratio"),
          TextFunctions.qualityScore(col("text")).as("quality_score"))
        .orderBy("doc_id")
    },

    // Flesch reading-ease readability: 206.835 - 1.015*(words/sentence)
    // - 84.6*(syllables/word), syllables approximated as vowel-group
    // count (the standard regex heuristic — identical pattern on both
    // engines, so the approximation cancels in the parity check).
    // Ratios are single IEEE divisions of BIGINT counts, rounded 4dp
    // BEFORE the score so both engines combine identical doubles; the
    // grade thresholds then compare the identical rounded score.
    "text_readability" -> { (s, d) =>
      val t = col("text")
      val flesch = CleanFunctions.round4(
        lit(206.835) - lit(1.015) * col("words_per_sentence")
          - lit(84.6) * col("syllables_per_word"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(t)).cast(LongType).as("n_words"),
          greatest(regexp_count(t, lit("[.!?]+")).cast(LongType), lit(1L)).as("n_sentences"),
          regexp_count(lower(t), lit("[aeiouy]+")).cast(LongType).as("n_syllables"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
          CleanFunctions.round4(col("n_words").cast(DoubleType) /
            col("n_sentences").cast(DoubleType)).as("words_per_sentence"),
          CleanFunctions.round4(CleanFunctions.safeDiv(
            col("n_syllables").cast(DoubleType), col("n_words").cast(DoubleType)))
            .as("syllables_per_word"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
          col("words_per_sentence"), col("syllables_per_word"),
          flesch.as("flesch"),
          when(flesch >= 60.0, lit("easy"))
            .when(flesch >= 30.0, lit("medium"))
            .otherwise(lit("hard")).as("grade"))
        .orderBy("doc_id")
    },

    // Zipf-law fit per language: OLS slope of ln(freq) on ln(rank) over
    // the token frequency table — a corpus-health diagnostic (natural
    // text ≈ -1; generated/boilerplate text drifts). Rank is a window
    // PARTITIONED by language (deterministic freq-then-token order);
    // ln terms rounded 6dp then DECIMAL-summed (the psi pattern — libm
    // log may differ in the last ulp across engines), slope computed
    // once unrounded and reused for the intercept so both engines run
    // the identical IEEE chain.
    "text_zipf" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val freq = Tables.documents(s, d)
        .select(col("lang"), explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
      val w = Window.partitionBy("lang").orderBy(desc("f"), col("tok"))
      val terms = freq.withColumn("rk", row_number().over(w))
        .withColumn("x", CleanFunctions.round6(log(col("rk").cast(DoubleType))))
        .withColumn("y", CleanFunctions.round6(log(col("f").cast(DoubleType))))
      val mom = terms.groupBy("lang").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        CleanFunctions.exactSum(col("x")).as("sx"),
        CleanFunctions.exactSum(col("y")).as("sy"),
        CleanFunctions.exactSum(CleanFunctions.round6(col("x") * col("y"))).as("sxy"),
        CleanFunctions.exactSum(CleanFunctions.round6(col("x") * col("x"))).as("sxx"))
      mom.withColumn("slope", CleanFunctions.safeDiv(
          col("n") * col("sxy") - col("sx") * col("sy"),
          col("n") * col("sxx") - col("sx") * col("sx")))
        .select(col("lang"), col("n").cast(LongType).as("n_types"),
          CleanFunctions.round4(col("slope")).as("zipf_slope"),
          CleanFunctions.round4((col("sy") - col("slope") * col("sx")) / col("n"))
            .as("intercept"))
        .orderBy("lang")
    },

    // Feature-hashing vectorizer (the hashing trick): tokens hashed into
    // 1024 buckets by the shared md5-derived 64-bit hash, per-doc bucket
    // counts — the fixed-width bag-of-words featurizer that needs NO
    // vocabulary pass (and therefore no vocabulary shuffle at 100 TB).
    // Explode + two-level grouped count, map-side partial; hash
    // non-negative by construction so plain % is engine-identical.
    "text_hashing_trick" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .withColumn("bucket", CleanFunctions.md5Hash64(col("tok")) % 1024L)
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket")
    },

    // BPE merge training (the tokenizer-learning primitive of every LLM
    // data pipeline): 8 greedy merge rounds over the word-frequency
    // table — each round counts freq-weighted adjacent symbol pairs and
    // merges the argmax everywhere. The ONLY corpus-scale stage is the
    // word-frequency aggregation; the merge loop runs on the O(vocab)
    // type table with the pick collected per round (sequential-greedy,
    // like emb_mmr_diversify — a self-referential plan would double per
    // step). Merging is literal '·'-delimited string replace: greedy
    // left-to-right non-overlapping, the reference BPE behavior, and
    // both engines' replace() share that exact contract. All counts
    // INTEGER; ties break on the pair strings.
    "text_bpe_train" -> { (s, d) =>
      import s.implicits._
      bpeLearn(s, d)._1.toDF("merge_rank", "pair", "weighted_count")
        .orderBy("merge_rank")
    },

    // BPE ENCODE: apply the learned merge table to every document and
    // report its token count under the learned vocabulary — the second
    // half of the tokenizer lifecycle (train above, apply here; both
    // share bpeLearn so the merge table cannot drift). Per-doc counting
    // is one corpus-scale join of words against the O(vocab) final
    // symbol table (auto-broadcast), map-side partial sums.
    "text_bpe_encode" -> { (s, d) =>
      val vocab = bpeLearn(s, d)._2
      val perWord = vocab.select(col("w"),
        size(expr("filter(split(sym, '·'), x -> x != '')"))
          .cast(org.apache.spark.sql.types.LongType).as("n_sym"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextFunctions.tokens(lower(col("text")))).as("w"))
        .join(perWord, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
          CleanFunctions.round4(col("n_bpe_tokens").cast(org.apache.spark.sql.types.DoubleType)
            / col("n_words").cast(org.apache.spark.sql.types.DoubleType)).as("bpe_per_word"))
        .orderBy("doc_id")
    },

    // Tokenizer FERTILITY report per language — the tokenizer-eval
    // readout next to text_bpe_encode (tokens/char and chars/token under
    // the learned BPE vocabulary, per language): high fertility for a
    // language means its text costs more tokens per character, the
    // metric that drives vocab-size and mix decisions in LLM data
    // pipelines. Char mass comes straight from the docs table (one tiny
    // grouped agg); token mass reuses the SAME bpeLearn merge table as
    // train/encode (no drift possible); the only corpus-scale stage is
    // the token-vs-O(vocab)-symbol-table join, map-side partial sums.
    "text_token_fertility" -> { (s, d) =>
      val vocab = bpeLearn(s, d)._2
      val perWord = vocab.select(col("w"),
        size(expr("filter(split(sym, '·'), x -> x != '')"))
          .cast(org.apache.spark.sql.types.LongType).as("n_sym"))
      val docs = Tables.documents(s, d)
      val chars = docs.groupBy("lang").agg(
        count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      val toks = docs
        .select(col("lang"), explode(TextFunctions.tokens(lower(col("text")))).as("w"))
        .join(perWord, "w")
        .groupBy("lang").agg(sum(col("n_sym")).as("n_bpe_tokens"))
      chars.join(toks, "lang")
        .select(col("lang"), col("n_docs"), col("n_bpe_tokens"), col("n_chars"),
          CleanFunctions.round4(col("n_bpe_tokens").cast(DoubleType)
            / col("n_chars").cast(DoubleType)).as("tokens_per_char"),
          CleanFunctions.round4(col("n_chars").cast(DoubleType)
            / col("n_bpe_tokens").cast(DoubleType)).as("chars_per_token"))
        .orderBy("lang")
    },

    // DSIR-style importance weighting for domain-targeted data selection
    // (Xie et al. 2023, "Data Selection for Language Models via
    // Importance Resampling" — arXiv:2302.03169): fit a smoothed unigram
    // LM on the TARGET domain (the src0 slice) and on the full corpus
    // (background), score every doc by its mean per-token log importance
    // ratio ln(p_tgt/p_bg). Positive weight = more target-like than the
    // corpus at large; `selected = weight > 0` is a pure PER-DOC
    // decision (no global sort / percentile state — the posture that
    // survives 100 TB; callers wanting a quota instead compose with
    // text_sample_weighted). Same LM-join shape as text_crossentropy:
    // both LMs are O(vocab) grouped aggs, N/V a 1-row broadcast, the
    // corpus-scale stage is one token-vs-vocab join with map-side
    // partial sums. Add-1 smoothing over the BACKGROUND vocab on both
    // sides so out-of-target words get a finite negative ratio; per-token
    // ratios are 6dp-pinned before the exact DECIMAL doc sum.
    "text_dsir_weights" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val docToks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val bg = docToks.groupBy("tok").agg(count(lit(1)).as("cb"))
      val tgt = docs.where(col("source") === "src0")
        .select(explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("ct"))
      val scal = bg.agg(sum(col("cb")).as("tb"), count(lit(1)).as("vv"))
        .crossJoin(tgt.agg(sum(col("ct")).as("tt")))
      val lm = bg.join(tgt, Seq("tok"), "left")
      docToks.join(lm, "tok")
        .crossJoin(broadcast(scal))
        .withColumn("lr", CleanFunctions.round6(log(
          ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast(DoubleType)
            / (col("tt") + col("vv")).cast(DoubleType))
            / ((col("cb") + lit(1L)).cast(DoubleType)
              / (col("tb") + col("vv")).cast(DoubleType)))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          CleanFunctions.round4(
            CleanFunctions.exactSum(col("lr")) / count(lit(1))).as("dsir_w"))
        .withColumn("selected",
          (col("dsir_w") > lit(0.0)).cast(org.apache.spark.sql.types.LongType))
        .orderBy("doc_id")
    },

    // Hashed multinomial naive-Bayes SOURCE classifier with holdout
    // confusion matrix — the fastText-style domain/quality classifier of
    // LLM data pipelines (CCNet / GPT-3-era filtering scores documents
    // with a linear model over hashed features; text_dsir_weights above
    // is its two-class importance-weight sibling). Deterministic 80/20
    // hash split; training = add-one-smoothed per-(source, bucket)
    // token counts over NbBuckets hashed unigram buckets; scoring =
    // per-doc DECIMAL-summed 6dp log-likelihood terms + log prior;
    // prediction = rank-1 candidate (4dp score desc, source asc).
    // Scale: the model is O(sources × NbBuckets) — broadcast both ways;
    // scoring multiplies test doc-bucket rows by n_src (the
    // events_roc_auc one-vs-rest shape); every corpus-scale stage is
    // one grouped count. ln() is libm-identical cross-engine on this
    // platform (the events_value_entropy / ts_records precedent), and
    // every post-ln value is round6-quantized before entering a sum.
    "text_nb_source" -> { (s, d) => nbSourceConfusion(s, d) },

    // UniMax per-language sampling budget (Chung et al. 2023 — the
    // mT5/PaLM-era answer to temperature sampling): allocate a total
    // token budget across languages so no language exceeds UniMaxEpochs
    // passes over its data, waterfilling the remainder UNIFORMLY.
    // Closed form instead of the paper's sequential loop: sort languages
    // ascending by capacity cap = n_tokens·C; a language is
    // budget-CONSTRAINED iff cap·(remaining langs incl. self) +
    // preceding-capacity prefix ≤ B (once the equal share exceeds a
    // cap, it exceeds every later one — the share is invariant across
    // unconstrained steps), constrained languages take their full cap,
    // and the rest split B − Σ(constrained caps) evenly. Corpus-scale
    // work is ONE grouped token count; the waterfill runs on the
    // O(languages) aggregate. Counts integer-exact; the equal share is
    // the only double (round4 at output).
    "text_unimax_budget" -> { (s, d) =>
      val langTok = Tables.documents(s, d)
        .select(col("lang"),
          explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy("lang").agg(count(lit(1)).as("n_tokens"))
        .withColumn("cap", col("n_tokens") * lit(UniMaxEpochs))
      // floor() explicitly: a bare double->long CAST truncates in Spark
      // but ROUNDS in DuckDB, so an odd token total would put the two
      // budgets one token apart.
      val tot = langTok.agg(
        floor(sum(col("n_tokens")) / lit(2L)).cast(LongType).as("budget"),
        count(lit(1)).as("n_langs"))
      // Rank + capacity prefix via a broadcast theta SELF-JOIN on the
      // O(languages) aggregate instead of a global window — a
      // single-partition Exchange is a plan smell even over a tiny
      // frame (PlanAudit), and langs² pairs stay trivial at any corpus
      // size. (cap, lang) is unique per row, so strictly-before count
      // + 1 = the (cap asc, lang asc) row_number exactly.
      val before = langTok
        .select(col("lang").as("b_lang"), col("cap").as("b_cap"))
      val ranked = langTok.crossJoin(broadcast(tot))
        .join(broadcast(before),
          col("b_cap") < col("cap") ||
            (col("b_cap") === col("cap") && col("b_lang") < col("lang")),
          "left")
        .groupBy("lang", "n_tokens", "cap", "budget", "n_langs")
        .agg((count(col("b_lang")) + lit(1L)).as("rn"),
          coalesce(sum(col("b_cap")), lit(0L)).as("pfx"))
        .withColumn("constrained",
          (col("cap") * (col("n_langs") - col("rn") + lit(1L)) + col("pfx")
            <= col("budget")).cast(LongType))
      val consumed = ranked.agg(
        coalesce(sum(when(col("constrained") === 1L, col("cap"))), lit(0L)).as("c_cap"),
        coalesce(sum(col("constrained")), lit(0L)).as("c_n"))
      ranked.crossJoin(broadcast(consumed))
        .withColumn("share",
          (col("budget") - col("c_cap")).cast(DoubleType)
            / (col("n_langs") - col("c_n")).cast(DoubleType))
        .select(col("lang"), col("n_tokens"), col("cap"), col("constrained"),
          CleanFunctions.round4(when(col("constrained") === 1L,
            col("cap").cast(DoubleType)).otherwise(col("share"))).as("alloc_tokens"),
          CleanFunctions.round4(
            when(col("constrained") === 1L, col("cap").cast(DoubleType))
              .otherwise(col("share")) / col("n_tokens").cast(DoubleType))
            .as("epochs"))
        .orderBy("lang")
    },

    // Rendezvous (highest-random-weight) shard assignment + the
    // rebalancing-consistency report for growing the shard count 8 → 9 —
    // the incremental-pipeline property a 100 TB corpus store actually
    // needs: under HRW only docs whose NEW shard wins the weight argmax
    // move (expected share 1/9), and every mover lands ON the new shard
    // (mod-hash resharding would reshuffle ~8/9 of the corpus). Weight =
    // md5 of (doc, shard); argmax by (weight desc, shard asc). One ×9
    // candidate explode, two keyed rank windows, one grouped count —
    // linear, no shuffle beyond the doc-keyed window.
    "text_rendezvous_shards" -> { (s, d) =>
      val cand = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("sh", explode(sequence(lit(0), lit(8))))
        .withColumn("w", CleanFunctions.md5Hash64(
          concat(lit("rdv:"), col("doc_id"), lit(":"), col("sh"))))
      def pick(df: DataFrame, outCol: String) = {
        val w = Window.partitionBy("doc_id")
          .orderBy(col("w").desc, col("sh").asc)
        df.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
          .select(col("doc_id"), col("sh").cast(LongType).as(outCol))
      }
      val old8 = pick(cand.where(col("sh") < 8), "shard_old")
      val new9 = pick(cand, "shard_new")
      old8.join(new9, "doc_id")
        .groupBy("shard_old", "shard_new")
        .agg(count(lit(1)).cast(LongType).as("n_docs"))
        .withColumn("moved",
          (col("shard_old") =!= col("shard_new")).cast(LongType))
        .select("shard_old", "shard_new", "n_docs", "moved")
        .orderBy("shard_old", "shard_new")
    },

    // Rank-biased overlap (Webber et al. 2010, truncated at k=10, p=0.9)
    // between two rankers over the SAME candidate pool — the
    // ranker-ablation eval of retrieval pipelines (how much does adding
    // idf weighting actually change what the user sees?). Ranker A
    // scores a candidate by the idf mass of its shared query terms,
    // ranker B by raw shared term frequency; RBO = (1−p)·Σ_d p^(d−1)
    // X_d/d where X_d = |topA_1..d ∩ topB_1..d|. X_d is computed
    // without any prefix materialization: an item in both top-10s
    // enters the intersection at depth max(ra, rb), so X_d = #{items:
    // max(ra,rb) ≤ d} — one join of the two rank frames + a 10-row
    // depth spine. The depth weights are Scala-computed double literals
    // injected VERBATIM into both engines (no runtime pow() — libm ulp
    // drift would break bitwise parity). Query batch reuses the bounded
    // BmQueryCap contract; scale shape = the BM25 document-at-a-time
    // posting join, then per-query O(k²) arithmetic.
    "text_rank_rbo" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val tf = docs
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("idf", CleanFunctions.round6(log(lit(n.toDouble) / col("df"))))
      val q = tf.where(col("doc_id") % 100 === 0 && col("doc_id") < BmQueryCap)
        .select(col("doc_id").as("q_id"), col("term"))
      val scored = graft.operators.JoinOps
        .boundedBroadcast(q, 1000000L, "rbo-query-batch")
        .join(tf.join(idf, "term"), "term")
        .where(col("doc_id") =!= col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(CleanFunctions.exactSum(col("idf")).as("sa"), sum(col("tf")).as("sb"))
        .localCheckpoint()
      val wa = Window.partitionBy("q_id").orderBy(desc("sa"), col("doc_id"))
      val wb = Window.partitionBy("q_id").orderBy(desc("sb"), col("doc_id"))
      val topA = scored.withColumn("ra", row_number().over(wa)).where(col("ra") <= RboK)
        .select("q_id", "doc_id", "ra")
      val topB = scored.withColumn("rb", row_number().over(wb)).where(col("rb") <= RboK)
        .select("q_id", "doc_id", "rb")
      // topB / rbo are bounded by construction (≤ batch × k rows — the
      // batch is capped, so these are static small-side contracts like
      // the interval tables in JoinOps.rangeJoin, not corpus hints).
      val both = topA.join(broadcast(topB), Seq("q_id", "doc_id"))
        .select(col("q_id"), greatest(col("ra"), col("rb")).as("mr"))
      val terms = both
        .select(col("q_id"), col("mr"), explode(sequence(lit(1), lit(RboK))).as("dd"))
        .where(col("mr") <= col("dd"))
        .groupBy("q_id", "dd").agg(count(lit(1)).as("xd"))
      val wCase = RboWeights.tail.foldLeft(
        when(col("dd") === 1, lit(RboWeights.head._2))) {
        case (c, (dd, w)) => c.when(col("dd") === dd, lit(w))
      }
      val rbo = terms
        .select(col("q_id"), col("dd"), col("xd"),
          CleanFunctions.round6(wCase * col("xd").cast(DoubleType)).as("term"))
        .groupBy("q_id")
        .agg(max(when(col("dd") === RboK, col("xd"))).as("n_common"),
          CleanFunctions.round4(CleanFunctions.exactSum(col("term"))).as("rbo"))
      scored.select("q_id").distinct()
        .join(broadcast(rbo), Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          coalesce(col("rbo"), lit(0.0)).as("rbo"))
        .orderBy("q_id")
    },

    // Collocation mining via pointwise mutual information over adjacent
    // bigrams: PMI = ln(p(xy)/(p(x)p(y))), df-capped at c_xy >= 3 — the
    // phrase detector feeding tokenizer-vocab and stopword decisions.
    // posexplode + per-doc lead window (the measured-fast shape from
    // text_inverted_index — no interpreted array transform); counts all
    // BIGINT, one ln on identical doubles rounded 6dp.
    "text_pmi_bigrams" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "tok")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = tok.withColumn("nxt", lead(col("tok"), 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("tok").as("t1"), col("nxt").as("t2"))
      val cxy = big.groupBy("t1", "t2").agg(count(lit(1)).as("c_xy"))
        .where(col("c_xy") >= 3)
      val cx = tok.groupBy("tok").agg(count(lit(1)).as("c"))
      val nTok = tok.agg(count(lit(1)).cast(DoubleType).as("n_tok"))
      val nBig = big.agg(count(lit(1)).cast(DoubleType).as("n_big"))
      cxy.join(cx.select(col("tok").as("t1"), col("c").as("c1")), "t1")
        .join(cx.select(col("tok").as("t2"), col("c").as("c2")), "t2")
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
        .select(col("t1"), col("t2"), col("c_xy"), col("c1"), col("c2"),
          CleanFunctions.round6(log(
            (col("c_xy").cast(DoubleType) / col("n_big"))
              / ((col("c1").cast(DoubleType) / col("n_tok"))
                * (col("c2").cast(DoubleType) / col("n_tok"))))).as("pmi"))
        .orderBy("t1", "t2")
    },

    // Interpolated Kneser-Ney BIGRAM LM scoring — the stronger-LM
    // sibling of text_crossentropy's add-1 unigram (CCNet-style corpus
    // quality ranking scores documents by LM perplexity; KN is the
    // classic n-gram smoother those LMs used): P(w2|w1) =
    // (max(c(w1,w2)−D, 0) + D·N1+(w1·)·(N1+(·w2)/T)) / c(w1·), D=0.75 —
    // absolute discounting with CONTINUATION-count backoff (a word seen
    // after many distinct contexts backs off high, a burst word low).
    // Scale: the LM state is three vocab-bounded count tables (bigram,
    // context, continuation) built by one grouped pass each; scoring is
    // three equi-joins on token keys. Self-scored on its own corpus, so
    // every probed bigram exists (no zero-prob branch); per-token -ln is
    // 6dp-quantized before the DECIMAL sum, so the per-doc mean is
    // engine-exact like every LM entry here.
    "text_kn_bigram" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "tok")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = tok.withColumn("nxt", lead(col("tok"), 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("doc_id"), col("tok").as("t1"), col("nxt").as("t2"))
      val cxy = big.groupBy("t1", "t2").agg(count(lit(1)).as("cxy"))
      val ctx = cxy.groupBy("t1")
        .agg(sum(col("cxy")).as("cx"), count(lit(1)).as("fanout"))
      val cont = cxy.groupBy("t2").agg(count(lit(1)).as("cont"))
      val types = cxy.agg(count(lit(1)).cast(DoubleType).as("tt"))
      big
        .join(cxy, Seq("t1", "t2"))
        .join(ctx, Seq("t1"))
        .join(cont, Seq("t2"))
        .crossJoin(broadcast(types))
        .withColumn("lp", CleanFunctions.round6(-log(
          (greatest(col("cxy").cast(DoubleType) - lit(0.75), lit(0.0)) +
            lit(0.75) * col("fanout").cast(DoubleType) *
              (col("cont").cast(DoubleType) / col("tt"))) /
            col("cx").cast(DoubleType))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          CleanFunctions.round4(
            CleanFunctions.exactSum(col("lp")) / count(lit(1))).as("kn_cross_entropy"))
        .orderBy("doc_id")
    },

    // Language ID: marker-token counts per language, deterministic argmax.
    "text_langid" -> { (s, d) =>
      val toks = TextFunctions.tokens(lower(col("text")))
      val scored = Tables.documents(s, d).select(
        col("doc_id") +: col("text") +: MarkerSets.map { case (lang, ws) =>
          size(filter(toks, t => t.isin(ws: _*))).cast(LongType).as(s"s_$lang")
        }: _*)
      scored.withColumn("pred_lang", TextFunctions.predLang(col("text")))
        .drop("text")
        .orderBy("doc_id")
    },

    // Fingerprinting: md5-derived content hash of normalized text + the
    // min shingle hash (a 1-perm minhash, stable under reordering edits).
    "text_fingerprint" -> { (s, d) =>
      val norm = trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      val toks = TextFunctions.tokens(col("text"))
      Tables.documents(s, d)
        .filter(size(TextFunctions.tokens(col("text"))) >= graft.GraftConfig.ShingleSize)
        .select(col("doc_id"),
          CleanFunctions.md5Hash64(norm).as("content_fp"),
          array_min(transform(TextFunctions.shingles(toks, graft.GraftConfig.ShingleSize),
            sh => CleanFunctions.md5Hash64(sh))).as("min_shingle_fp"))
        .orderBy("doc_id")
    },

    // Corpus term statistics: top-5 tokens per language by frequency.
    // Explode -> two-level aggregation (map-side partial on (lang, token))
    // -> per-lang window top-k; deterministic tie-break on the token.
    "text_top_terms" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documents(s, d)
        .select(col("lang"), explode(TextFunctions.tokens(lower(col("text")))).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy(desc("cnt"), col("token"))
      counts.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    },

    // Deterministic train/val split: assignment from the md5-derived
    // content-id hash — stable across runs, engines, and partitionings
    // (a rand()-based split would re-deal on every retry). 90/10 by
    // hash bucket; stratification keys (lang here) ride along so split
    // balance is auditable per stratum.
    "text_split" -> { (s, d) =>
      val bucket = CleanFunctions.md5Hash64(concat(lit("split:"), col("doc_id"))) % 100
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(bucket < 90, "train").otherwise("val").as("split"))
        .orderBy("doc_id")
    },

    // Sequence packing (training-batch construction): stream documents
    // into fixed token-budget bins, greedy-contiguous in a deterministic
    // md5 order. Sharded so the cumulative sum is a KEYED window — each
    // shard packs independently on its executor (the distributed shape;
    // a single global pack order would be one sorted partition). Output:
    // which bin each doc starts in and at what token offset.
    "text_pack_sequences" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = CleanFunctions.md5Hash64(concat(lit("pack:"), col("doc_id")))
      val w = Window.partitionBy("shard").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), h.as("h"), (h % PackShards).as("shard"),
          size(TextFunctions.tokens(col("text"))).cast(LongType).as("n_tokens"))
        .withColumn("prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("shard"),
          expr(s"prev div $PackBudget").as("bin"),
          (col("prev") % PackBudget).as("bin_offset"), col("n_tokens"))
        .orderBy("doc_id")
    },

    // Corpus rarity / novelty score: mean IDF of a doc's DISTINCT tokens
    // — high scorers are off-distribution (specialist or noise), low
    // scorers boilerplate-like. Two grouped aggs + a token join (the
    // tf-idf plan minus the per-doc window); IDF rounded to 1e-6 before
    // the order-independent DECIMAL mean so both engines sum identical
    // quantities.
    "text_rarity" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val nDf = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      val toks = docs
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .distinct()
      val dfCounts = toks.groupBy("tok").agg(count(lit(1)).cast(DoubleType).as("df"))
      toks.join(dfCounts, "tok").crossJoin(broadcast(nDf))
        .withColumn("idf", CleanFunctions.round6(log(col("n_docs") / col("df"))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
          CleanFunctions.round4(
            CleanFunctions.exactSum(col("idf")) / count(lit(1))).as("rarity"))
        .orderBy("doc_id")
    },

    // CCNet-style LM cross-entropy scoring (Wenzek et al.): a unigram LM
    // with Laplace smoothing is fit on the ENGLISH slice and scores
    // EVERY doc — off-domain/off-language docs surface as high
    // cross-entropy, the classic LM-perplexity filter of LLM data
    // pipelines. The LM is O(vocab) after one grouped agg (optimizer
    // decides the token join); N/V are a 1-row broadcast; per-token
    // -ln p terms are 6dp-rounded DECIMAL sums (engine-exact, the
    // text_rarity pattern).
    "text_crossentropy" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val docToks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      val lm = docs.where(col("lang") === "en")
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("tf"))
      val scal = lm.agg(sum(col("tf")).as("nn"), count(lit(1)).as("vv"))
      docToks.join(lm, Seq("tok"), "left")
        .crossJoin(broadcast(scal))
        .withColumn("lp", CleanFunctions.round6(
          -log((coalesce(col("tf"), lit(0L)) + lit(1L)).cast(DoubleType) /
            (col("nn") + col("vv")).cast(DoubleType))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          CleanFunctions.round4(
            CleanFunctions.exactSum(col("lp")) / count(lit(1))).as("cross_entropy"))
        .orderBy("doc_id")
    },

    // Stratified deterministic sampling — the data-MIXING primitive:
    // down/up-weight strata (language here) by per-stratum keep rates
    // when composing a training corpus. Same md5-bucket determinism as
    // text_split (stable across runs/engines/partitionings — a rand()
    // sample re-deals every retry, breaking exactly-once semantics of a
    // pipeline re-run); unknown strata keep the default rate. Pure
    // filter, no shuffle.
    "text_sample_stratified" -> { (s, d) =>
      val rates = Map("en" -> 50, "de" -> 80) // keep-% per stratum
      val defaultRate = 100
      val bucket = CleanFunctions.md5Hash64(concat(lit("sample:"), col("doc_id"))) % 100
      val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (lang, r)) =>
        when(col("lang") === lang, lit(r)).otherwise(acc)
      }
      Tables.documents(s, d)
        .filter(bucket < rate)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // Language-ID confusion matrix: predicted vs labeled language with
    // per-truth-row share — the eval loop for the langid heuristic (and
    // the template for any classifier-vs-label audit). One grouped count
    // + a partition-sum window over the tiny lang x lang grid.
    "text_langid_confusion" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cm = Tables.documents(s, d)
        .select(col("lang"), TextFunctions.predLang(col("text")).as("pred_lang"))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("cnt"))
      cm.withColumn("share", CleanFunctions.round4(col("cnt").cast(DoubleType) /
          sum(col("cnt")).over(Window.partitionBy("lang")).cast(DoubleType)))
        .orderBy("lang", "pred_lang")
    },

    // End-to-end corpus curation as ONE user-facing call (quality gate ->
    // language gate -> exact + simhash near-dup dedup -> deterministic
    // split). Delegates to graft.operators.CorpusCuration.run, so the
    // library's own composition — not a query re-implementation — is
    // what the oracle hash-checks.
    "text_curation" -> { (s, d) =>
      graft.operators.CorpusCuration.run(Tables.documents(s, d))
        .orderBy("doc_id")
    },

    // Inverted index build (the IR/search primitive): 3-gram shingle ->
    // sorted posting list of containing docs + document frequency.
    // Shingles, not unigrams: the synthetic corpus has a ~30-word
    // vocabulary where every unigram hits ~80% of docs, while shingle
    // terms are combinatorial — the realistic phrase-index shape. df
    // capped at [2, 50]: singletons are dead index weight and a
    // boilerplate phrase's postings at corpus scale are the corpus (real
    // indexes tier those separately) — the cap IS the scale story.
    // Postings emitted as a joined string so the oracle compares scalars.
    // Terms come from posexplode(tokens) + a per-doc lead window, NOT
    // explode(shingles(...)): exploding the interpreted
    // array_distinct(transform(...)) re-evaluates the whole shingle
    // array pathologically (MEASURED 8.5 s vs 2.8 s at sf0.1 for the
    // same 260k terms) — the SURVEY §5 explode-over-array-transform rule
    // applied to generators. Two-phase df-first pruning: a boilerplate
    // phrase with corpus-scale df never materializes its posting list.
    "text_inverted_index" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // The two lead columns ARE the 3-gram; keep in sync with the
      // oracle's shinglesSql(t, ShingleSize).
      require(graft.GraftConfig.ShingleSize == 3,
        "text_inverted_index hardcodes 3-gram terms")
      val toks = TextFunctions.tokens(col("text"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val pairs = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
        .withColumn("t1", lead("tok", 1).over(w))
        .withColumn("t2", lead("tok", 2).over(w))
        .where(col("t2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("term"))
        .distinct()
        .cache()
      val inRange = pairs.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 50))
      pairs.join(inRange, "term")
        .groupBy("term", "df")
        .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))
        .select("term", "df", "postings")
        .orderBy("term")
    },

    // WEIGHTED deterministic sampling without replacement (Efraimidis-
    // Spirakis A-Res): top-k docs by ln(u)/w where u is an md5-derived
    // uniform and w the doc weight (chars here) — longer docs
    // proportionally likelier, yet the draw replays identically across
    // runs/engines/partitionings. Global top-k = per-partition top-k +
    // k-row driver merge (TakeOrderedAndProject), never a global sort.
    "text_sample_weighted" -> { (s, d) =>
      val u = ((CleanFunctions.md5Hash64(concat(lit("wsample:"), col("doc_id"))) % 1000000L + 1L)
        .cast(DoubleType)) / lit(1000001.0)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          CleanFunctions.round6(
            CleanFunctions.safeDiv(log(u), col("n_chars").cast(DoubleType))).as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(WeightedSampleK)
    },

    // Leakage-safe train/val split — the hash bucket is keyed on the
    // near-dup CLUSTER id (simhash connected component), so a val doc's
    // near-copy can never land in train. Delegates to the user-facing
    // CorpusDedup.leakageSafeSplit; oracle = the dedup_clusters recursive
    // CTE left-joined onto all docs + the text_split bucket rule on the
    // coalesced label.
    "text_split_nodup" -> { (s, d) =>
      graft.operators.CorpusDedup
        .leakageSafeSplit(Tables.documents(s, d))
        .orderBy("doc_id")
    },

    // Within-doc repetition score — the n-gram repetition quality signal
    // (high repeated-3gram ratio = boilerplate/spam/generated text):
    // 1 - distinct/total 3-grams per doc. Pure per-row array expressions,
    // no shuffle; docs shorter than 3 tokens are excluded (no 3-grams).
    "text_repetition" -> { (s, d) =>
      val k = 3
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= k)
        .select(col("doc_id"),
          (size(col("t")) - (k - 1)).cast(LongType).as("n_grams"),
          size(TextFunctions.shingles(col("t"), k)).cast(LongType).as("n_distinct"))
        .withColumn("rep_ratio", CleanFunctions.round4(
          lit(1.0) - col("n_distinct").cast("double") / col("n_grams")))
        .orderBy("doc_id")
    },

    // Context chunking: split each document into fixed-size token chunks
    // with overlap (size 50, stride 40) — the training-prep op that turns
    // documents into model-context windows. Pure per-row explode + slice
    // (no shuffle); chunks are emitted as (id, fingerprint, token count)
    // so the oracle verifies content without megabyte text columns.
    "text_chunk" -> { (s, d) =>
      val chunkSize = 50
      val stride = 40
      val toks = TextFunctions.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), col("t"),
          posexplode(sequence(lit(0), greatest(size(col("t")) - 1, lit(0)), lit(stride)))
            .as(Seq("chunk_id", "start")))
        .select(col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
          array_join(slice(col("t"), col("start") + 1, lit(chunkSize)), " ").as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          CleanFunctions.md5Hash64(col("chunk")).as("chunk_fp"),
          size(TextFunctions.tokens(col("chunk"))).cast(LongType).as("n_tokens"))
        .orderBy("doc_id", "chunk_id")
    },

    // TF-IDF: score = tf * ln(N / df), top-3 terms per doc. Two grouped
    // aggregations (doc-term counts, per-term doc frequency) + one join
    // on the term — the textbook distributed TF-IDF shape; ranking is on
    // the 4dp-rounded score with a term tie-break so both engines order
    // identically.
    "text_tfidf" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // terms cached: the tokenize+explode pass feeds BOTH the tf and df
      // branches (N's count(*) is parquet-metadata-only, no data scan).
      val n = Tables.documents(s, d).count()
      val terms = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .cache()
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = terms.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("term"))
      tf.join(df, "term")
        .withColumn("tfidf",
          CleanFunctions.round4(col("tf") * log(lit(n.toDouble) / col("df"))))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rk"))
        .orderBy("doc_id", "rk")
    },

    // Okapi BM25 ranked retrieval (Robertson-Sparck Jones) — the sparse
    // complement of the dense ANN family: query-by-document (bench set
    // doc_id % 100 = 0) scored document-at-a-time through the posting
    // join, THE lexical-retrieval shape at scale (cost = |queries| x
    // sum of query-term dfs, never corpus x queries). Static index
    // pruning drops terms below the idf floor — true stopwords whose
    // df ~ N contribute ~0 score but dominate posting volume (the
    // WAND-family optimization, applied as a hard fence both engines
    // agree on). Per-(doc,term) weights are 6dp-quantized and the
    // per-pair score is their DECIMAL sum (order-independent), ranked
    // exactly with doc_id ties.
    "text_bm25_topk" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val docs = Tables.documents(s, d)
      val n = docs.count()
      // ONE aggregation of the exploded token stream; dl, df, avgdl and
      // the query-term sets all derive from the (doc,term,tf) frame
      // (sum(tf) per doc == token count; count per term == distinct-doc
      // df; the frame is already distinct per (doc,term) so the bench
      // query set needs no extra distinct). The exploded stream is never
      // cached or re-scanned — it exists only inside this single
      // partial-agg stage, which is the posture that matters when the
      // token stream is 100x the corpus. The doc-id repartition spreads
      // the tokenize+partial-agg across cores even when the corpus
      // arrives as one small file (a multi-TB corpus splits at the scan;
      // a local test file does not), and localCheckpoint pins the frame
      // so its four consumers don't re-run the explode.
      val tf = docs
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      val avgdl = dl.agg(CleanFunctions.round6(
        sum(col("dl").cast(DecimalType(18, 0))).cast(DoubleType) / count(lit(1))).as("avgdl"))
      val idf = tf
        .groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("idf", CleanFunctions.round6(log(lit(1.0) +
          ((lit(n) - col("df")).cast(DoubleType) + lit(0.5)) /
            (col("df").cast(DoubleType) + lit(0.5)))))
        .where(col("idf") >= BmIdfFloor)
      val weights = tf.join(idf, "term").join(dl, "doc_id").crossJoin(broadcast(avgdl))
        .select(col("doc_id"), col("term"), CleanFunctions.round6(
          col("idf") * (col("tf").cast(DoubleType) * lit(BmK1 + 1.0)) /
            (col("tf").cast(DoubleType) + lit(BmK1) * (lit(1.0 - BmB) +
              lit(BmB) * col("dl").cast(DoubleType) / col("avgdl")))).as("w"))
      val qterms = tf.where(col("doc_id") % 100 === 0 && col("doc_id") < BmQueryCap)
        .select(col("doc_id").as("q_id"), col("term"))
      // Broadcast the query-term side: scoring then runs map-side over
      // the weights partitions with partial aggregation before the
      // (q_id, doc_id) shuffle. The alternative — an equi-join shuffled
      // on `term` — is a guaranteed skew trap: natural-language term
      // frequencies are Zipfian, so the hot terms' postings pile into a
      // handful of tasks (at this corpus's tiny vocab, ALL of them do).
      // boundedBroadcast (not bare broadcast): qterms descends from the
      // localCheckpoint'ed tf frame, so the static corpus-broadcast audit
      // cannot see its lineage (r10 verdict item 3) — the 1M-row fence
      // turns the "caller provides a bounded query batch" contract into
      // an enforced plan-time failure; the count is one cheap scan of the
      // checkpoint. PlanAudit.CheckpointBroadcastContract +
      // PlanAuditSpec assert the fence stays on this path.
      val scored = graft.operators.JoinOps
        .boundedBroadcast(qterms, 1000000L, "bm25-query-batch")
        .join(weights, "term")
        .where(col("doc_id") =!= col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(sum(col("w").cast(DecimalType(18, 6))).as("sdec"))
      val rkw = Window.partitionBy("q_id").orderBy(desc("sdec"), col("doc_id"))
      scored.withColumn("rk", row_number().over(rkw).cast(LongType))
        .where(col("rk") <= BmTopK)
        .select(col("q_id"), col("doc_id"),
          CleanFunctions.round4(col("sdec").cast(DoubleType)).as("score"), col("rk"))
        .orderBy("q_id", "rk")
    },

    // Benchmark decontamination — delegates to the user-facing
    // graft.operators.Decontaminate API (k and case/punct normalization
    // are parameters there; k=4 here so the synthetic corpus's near-dup
    // structure shows up, web-scale pipelines run the same plan with
    // k=8..13 — DecontaminateSpec exercises k=8). Bench-set stand-in:
    // doc_id % 97 == 0. The oracle twin replicates the normalize +
    // shingle-hash prefilter + string confirm exactly.
    "text_decontaminate" -> { (s, d) =>
      graft.operators.Decontaminate
        .flag(Tables.documents(s, d), col("doc_id") % 97 === 0,
          "doc_id", "text", k = 4, normalizeText = true)
        .orderBy("doc_id")
    },

    // Exact dedup: canonical id = min doc_id per content hash. Window over
    // the hash key (hash-partition shuffle, no driver collect); at 100 TB
    // this is the standard one-shuffle canonicalization.
    "dedup_exact" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(md5(col("text")))
      Tables.documents(s, d)
        .select(col("doc_id"), min(col("doc_id")).over(w).as("canonical_id"))
        .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
        .orderBy("doc_id")
    },

    // Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1,
    // adapted thresholds for the synthetic corpus): per-doc word count
    // band, mean word length band, symbol-to-word ratio, alphabetic-word
    // fraction, and distinct-stopword floor, composed into one boolean
    // verdict. All counts are integers and every ratio is a single IEEE
    // division rounded 4dp, so parity is exact; pure per-row map work —
    // one WholeStageCodegen over the scan, embarrassingly parallel at
    // any corpus size.
    "text_gopher_rules" -> { (s, d) =>
      val toks = TextFunctions.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          size(toks).cast(LongType).as("n_words"),
          expr("aggregate(transform(" +
            "split(trim(text), '\\\\s+'), x -> length(x)), 0L, (a, x) -> a + x)")
            .as("sum_word_len"),
          size(array_distinct(filter(transform(toks, t => lower(t)),
            t => t.isin(Stopwords: _*)))).cast(LongType).as("n_stop_distinct"),
          size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast(LongType).as("n_alpha_words"),
          regexp_count(col("text"), lit("#|\\.\\.\\.")).cast(LongType).as("n_symbols"))
        .select(col("doc_id"), col("n_words"), col("n_stop_distinct"),
          CleanFunctions.round4(col("sum_word_len").cast(DoubleType) /
            nullif(col("n_words").cast(DoubleType), lit(0.0))).as("mean_word_len"),
          CleanFunctions.round4(col("n_symbols").cast(DoubleType) /
            nullif(col("n_words").cast(DoubleType), lit(0.0))).as("symbol_ratio"),
          CleanFunctions.round4(col("n_alpha_words").cast(DoubleType) /
            nullif(col("n_words").cast(DoubleType), lit(0.0))).as("alpha_word_frac"))
        .withColumn("ok_words", col("n_words").between(GopherMinWords, GopherMaxWords))
        .withColumn("ok_word_len", col("mean_word_len").between(3.0, 10.0))
        .withColumn("ok_symbols", col("symbol_ratio") <= 0.1)
        .withColumn("ok_alpha", col("alpha_word_frac") >= 0.8)
        .withColumn("ok_stopwords", col("n_stop_distinct") >= 2)
        .withColumn("pass", col("ok_words") && col("ok_word_len") &&
          col("ok_symbols") && col("ok_alpha") && col("ok_stopwords"))
        .orderBy("doc_id")
    },

    // Burrows' delta between corpus sources (stylometry — the
    // authorship/provenance screen: two "different" sources with a tiny
    // delta are probably the same crawler or the same generator, a
    // duplication signal ORTHOGONAL to content dedup). Per doc:
    // function-word relative frequencies (the QualityStopwords set) on
    // the docs×words spine (zero counts COUNT — that's the fingerprint);
    // per word: corpus mean/std from exact-DECIMAL moments of the
    // 6dp-quantized frequencies; per source: mean frequency → z-score;
    // delta(a,b) = mean |z_a − z_b| over words. Everything after the
    // explode is O(docs×10) then O(sources×10); the pair join is over
    // the tiny z table.
    "text_style_delta" -> { (s, d) =>
      val words = Stopwords
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.tokens(lower(col("text"))).as("t"))
        .withColumn("dl", size(col("t")).cast(LongType))
        .where(col("dl") > 0L)
      val wordSpine = words.map(w => lit(w)).toArray
      val spine = docs.select(col("doc_id"), col("source"), col("dl"),
        explode(array(wordSpine: _*)).as("w"))
      val cnt = docs
        .select(col("doc_id"), explode(col("t")).as("term"))
        .where(col("term").isin(words: _*))
        .groupBy(col("doc_id"), col("term").as("w"))
        .agg(count(lit(1)).as("c"))
      val rf = spine.join(cnt, Seq("doc_id", "w"), "left")
        .select(col("doc_id"), col("source"), col("w"),
          CleanFunctions.round6(coalesce(col("c"), lit(0L)).cast(DoubleType) /
            col("dl").cast(DoubleType)).as("rf"))
      val corpus = rf.groupBy("w").agg(
        CleanFunctions.round6(CleanFunctions.exactMean(col("rf"))).as("cm"),
        CleanFunctions.round6(CleanFunctions.exactMean(
          CleanFunctions.round6(col("rf") * col("rf")))).as("cm2"))
        .select(col("w"), col("cm"),
          sqrt(greatest(lit(0.0), CleanFunctions.round6(col("cm2") - col("cm") * col("cm")))).as("sd"))
      val srcZ = rf.groupBy("source", "w")
        .agg(CleanFunctions.round6(CleanFunctions.exactMean(col("rf"))).as("sm"))
        .join(broadcast(corpus), "w")
        .where(col("sd") > 0.0)
        .select(col("source"), col("w"),
          CleanFunctions.round6((col("sm") - col("cm")) / col("sd")).as("z"))
      srcZ.as("a").join(srcZ.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_words"),
          sum(CleanFunctions.round6(abs(col("a.z") - col("b.z")))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("dsum"))
        .select(col("source_a"), col("source_b"), col("n_words"),
          CleanFunctions.round4(col("dsum").cast(DoubleType) /
            col("n_words").cast(DoubleType)).as("delta"))
        .orderBy("source_a", "source_b")
    },

    // Training-mix construction: temperature-scaled source sampling
    // weights (the multilingual/multi-source standard, alpha=0.7 as in
    // mBERT/XLM-R): share^alpha renormalized, effective epochs =
    // weight/share — how much each source is over/under-sampled. The
    // per-source table is O(#sources) after one map-side-combinable
    // aggregation; pow runs on a 4dp-rounded share and its result is
    // 6dp-rounded before the DECIMAL renormalization sum, so the libm
    // call sits between two rounding fences on both engines.
    "text_mix_weights" -> { (s, d) =>
      val toks = TextFunctions.tokens(col("text"))
      val src = Tables.documents(s, d)
        .select(col("source"), size(toks).cast(LongType).as("tk"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tokens"))
      val tot = src.agg(sum(col("n_tokens")).as("total_tokens"))
      val shared = src.crossJoin(broadcast(tot))
        .withColumn("share", CleanFunctions.round4(
          col("n_tokens").cast(DoubleType) / col("total_tokens").cast(DoubleType)))
        .withColumn("w_raw", CleanFunctions.round6(pow(col("share"), lit(MixAlpha))))
      val wsum = shared.agg(CleanFunctions.exactSum(col("w_raw")).as("w_sum"))
      shared.crossJoin(broadcast(wsum))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
          CleanFunctions.round4(col("w_raw") / col("w_sum")).as("weight"),
          CleanFunctions.round4(
            CleanFunctions.round4(col("w_raw") / col("w_sum")) / col("share"))
            .as("effective_epochs"))
        .orderBy("source")
    },

    // C4-style duplicate-segment removal stats (Raffel et al. 2020 do it
    // per line; this corpus is single-line, so the unit is a fixed
    // 10-token non-overlapping segment — the fixed-granularity cousin of
    // exact-substring dedup, Lee et al. 2021). The FIRST instance of each
    // distinct segment (min (doc_id, seg_idx)) survives; later instances
    // are dups. First-instance election is a min(struct) AGGREGATE, not a
    // corpus-wide window: partial map-side combine per segment key, no
    // sort — the hot-segment skew a rank window would serialize stays one
    // combinable min. Output is all-integer, so parity is exact.
    "text_segment_dedup" -> { (s, d) =>
      val SegLen = 10
      val docs = Tables.documents(s, d).where(length(trim(col("text"))) > 0)
      val segs = docs
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, (size(t) - 1) div $SegLen), " +
            s"i -> concat_ws(' ', slice(t, i * $SegLen + 1, $SegLen)))"))
          .as(Seq("seg_idx", "seg")))
      val firsts = segs.groupBy("seg")
        .agg(min(struct(col("doc_id"), col("seg_idx"))).as("f"))
      segs.join(firsts, Seq("seg"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_seg"),
          sum(when(col("f.doc_id") =!= col("doc_id") ||
            col("f.seg_idx") =!= col("seg_idx"), 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_seg"), col("n_dup"),
          (col("n_seg") - col("n_dup")).as("n_kept"))
        .orderBy("doc_id")
    },

    // Vocabulary-growth (Heaps-law) profile: cumulative token and
    // distinct-type counts over the corpus in doc order, at 100-doc
    // bucket granularity. New-type attribution is "first bucket a type
    // appears in" — a min AGGREGATE per type (map-side combinable), so
    // the only serial step is the prefix sum over BUCKETS (corpus/100
    // rows — at 100 TB pick bucket = corpus/1e6 and the window stays
    // tiny; the per-token work never sees a global window). All-integer
    // output: exact parity, and the Heaps slope fit stays downstream
    // where float libm differences can't break the gate.
    "text_vocab_growth" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(expr("doc_id div 100").as("bucket"),
          explode(TextFunctions.tokens(lower(col("text")))).as("token"))
      val bt = toks.groupBy("bucket").agg(count(lit(1)).as("n_tok"))
      val nt = toks.groupBy("token").agg(min(col("bucket")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("new_types"))
      val per = bt.join(nt, Seq("bucket"), "left")
        .select(col("bucket"), col("n_tok"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
      // Prefix sums via the banded two-level decomposition — no global
      // window even over the bucket table (integer sums, exact).
      graft.operators.StatsOps
        .bandedPrefixSums(per, col("bucket"), Seq("n_tok", "new_types"))
        .select(col("bucket"), col("cum_n_tok").as("cum_tokens"),
          col("cum_new_types").as("cum_types"))
        .orderBy("bucket")
    },

    // RAKE keyword extraction (Rose et al. 2010): candidate phrases =
    // stopword-delimited token runs (bounded ≤4 words), word score =
    // degree/frequency within the DOC's phrases, phrase score = Σ word
    // scores (4dp-quantized, DECIMAL-summed), top-3 phrases per doc.
    // Every aggregate/window keys on doc_id — embarrassingly parallel;
    // run segmentation is one per-doc prefix sum over token positions
    // (bounded by doc length). Phrase assembly sorts (pos, tok) structs,
    // never an unordered collect_list.
    "text_rake" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val stop = TextFunctions.QualityStopwords
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "tok")))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = toks
        .withColumn("is_stop", col("tok").isin(stop: _*))
        .withColumn("run", sum(when(col("is_stop"), 1L).otherwise(0L)).over(wd))
        .where(!col("is_stop"))
      val phrases = runs.groupBy("doc_id", "run")
        .agg(array_sort(collect_list(struct(col("pos"), col("tok")))).as("ps"))
        .select(col("doc_id"), col("run"),
          expr("transform(ps, x -> x.tok)").as("words"))
        .where(size(col("words")) <= 4)
        .withColumn("phrase", concat_ws(" ", col("words")))
      val wordStats = phrases
        .select(col("doc_id"), size(col("words")).cast(LongType).as("plen"),
          explode(col("words")).as("wd"))
        .groupBy("doc_id", "wd")
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .withColumn("wscore", CleanFunctions.round4(
          col("deg").cast(DoubleType) / col("freq").cast(DoubleType)))
      val runScores = phrases
        .select(col("doc_id"), col("run"), col("phrase"), explode(col("words")).as("wd"))
        .join(wordStats.select("doc_id", "wd", "wscore"), Seq("doc_id", "wd"))
        .groupBy("doc_id", "run", "phrase")
        .agg(CleanFunctions.exactSum(col("wscore")).as("rscore"))
      // Identical phrase strings in different runs carry identical scores
      // (same words, same per-doc stats) — min() just collapses them.
      val phraseScores = runScores.groupBy("doc_id", "phrase")
        .agg(min(col("rscore")).as("score"))
      val wr = Window.partitionBy("doc_id").orderBy(desc("score"), col("phrase"))
      phraseScores.withColumn("rk", row_number().over(wr).cast(LongType))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("phrase"), col("score"))
        .orderBy("doc_id", "rk")
    },

    // Term burstiness (Church & Gale): observed document frequency vs
    // the Poisson expectation N(1−e^(−tf/N)) for each of the top-50
    // terms — a term whose occurrences CLUMP into few documents
    // (df ≪ expected) is topical/bursty, one spread evenly is function-
    // word-like; the dispersion signal tf-idf conflates with rarity.
    // Two grouped integer aggregates (tf, df) + one broadcast corpus
    // size; the only transcendental is one exp per term, rounded after.
    "text_term_burstiness" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .where(length(col("term")) >= 3)
      val stats = toks.groupBy("term").agg(
        count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).cast(DoubleType).as("nd"))
      stats.crossJoin(broadcast(nd))
        .withColumn("expected_df",
          col("nd") * (lit(1.0) - exp(-col("tf").cast(DoubleType) / col("nd"))))
        .select(col("term"), col("tf"), col("df"),
          CleanFunctions.round4(col("tf").cast(DoubleType) / col("df").cast(DoubleType))
            .as("occ_per_doc"),
          CleanFunctions.round4(col("df").cast(DoubleType) / col("expected_df"))
            .as("burst_ratio"))
        .orderBy(desc("tf"), col("term")).limit(50)
    },

    // TextRank keywords over the corpus-wide word co-occurrence graph:
    // content words (len ≥ 3, non-stopword) are nodes, adjacency within
    // original-position distance ≤ 2 inside a document is an edge
    // (symmetrized, corpus-count weighted), and 6 damped power-iteration
    // rounds score global salience — the graph-centrality keyword
    // extractor next to text_rake (per-doc degree/freq) and text_tfidf
    // (corpus rarity): TextRank rewards words that BRIDGE contexts.
    // The graph build is one keyed lag + grouped count (vocab-scale,
    // shuffle equi-joins, never adjacency broadcast); each round is the
    // nation_pagerank discipline — 6dp-quantized contributions into
    // DECIMAL sums; the edge frame is localCheckpoint'ed so six rounds
    // don't re-tokenize the corpus.
    "text_textrank" -> { (s, d) =>
      val stop = TextFunctions.QualityStopwords
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "tok")))
        .where(length(col("tok")) >= 3 && !col("tok").isin(stop: _*))
      val wdoc = Window.partitionBy("doc_id").orderBy("pos")
      val adj = toks
        .withColumn("ppos", lag(col("pos"), 1).over(wdoc))
        .withColumn("ptok", lag(col("tok"), 1).over(wdoc))
        .where(col("ptok").isNotNull && col("pos") - col("ppos") <= lit(2) &&
          col("ptok") =!= col("tok"))
        .select(col("ptok").as("a"), col("tok").as("b"))
      val und = adj.union(adj.select(col("b").as("a"), col("a").as("b")))
      val edges = und.groupBy(col("a").as("src"), col("b").as("dst"))
        .agg(count(lit(1)).as("w"))
      val outw = edges.groupBy("src").agg(sum(col("w")).as("wout"))
      val ew = edges.join(outw, "src")
        .select(col("src"), col("dst"),
          CleanFunctions.round6(col("w").cast(DoubleType) / col("wout").cast(DoubleType)).as("p"))
        .localCheckpoint()
      val nodes = ew.select(col("src").as("node")).distinct().localCheckpoint()
      val nn = nodes.agg(count(lit(1)).cast(DoubleType).as("nd"))
      var ranks = nodes.crossJoin(broadcast(nn))
        .select(col("node"), CleanFunctions.round6(lit(1.0) / col("nd")).as("r"))
      for (_ <- 1 to 6) {
        val sums = ew.join(ranks, ew("src") === ranks("node"))
          .select(col("dst"), CleanFunctions.round6(col("r") * col("p")).cast(DecimalType(18, 6)).as("c"))
          .groupBy("dst").agg(sum(col("c")).as("m"))
        ranks = nodes.join(sums, col("node") === col("dst"), "left")
          .crossJoin(broadcast(nn))
          .select(col("node"), CleanFunctions.round6(lit(0.15) / col("nd") +
            lit(0.85) * coalesce(col("m"), lit(0)).cast(DoubleType)).as("r"))
      }
      ranks.orderBy(desc("r"), col("node")).limit(50)
        .select(col("node").as("token"), col("r").as("textrank"))
    },

    // Corpus-composition report: predicted language × declared source
    // counts and within-source shares — the dashboard every multilingual
    // curation run publishes (and the input to mix-weight decisions).
    // Two map-side aggregates over the langid classifier; O(sources ×
    // languages) output.
    "text_lang_source_mix" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("source"), TextFunctions.predLang(col("text")).as("pred_lang"))
      val counts = docs.groupBy("source", "pred_lang").agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("source").agg(sum(col("n")).as("src_n"))
      counts.join(tot, Seq("source"))
        .select(col("source"), col("pred_lang"), col("n"),
          CleanFunctions.round4(
            col("n").cast(DoubleType) / col("src_n").cast(DoubleType)).as("share"))
        .orderBy("source", "pred_lang")
    },

    // Out-of-vocabulary rate per language against the corpus top-1k
    // vocabulary — the tokenizer-coverage diagnostic (high OOV = the
    // vocab under-serves that language and fertility blows up). Top-k
    // selection is orderBy+limit (TakeOrderedAndProject — no global
    // window at any scale, count/token tiebreak), membership via a
    // broadcast left join, integer ratios exact.
    "text_oov_rate" -> { (s, d) =>
      import org.apache.spark.sql.types.LongType
      val toks = Tables.documents(s, d)
        .select(col("lang"), explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), col("tok")).limit(1000)
        .select(col("tok"), lit(1L).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("lang").agg(
          count(lit(1)).cast(LongType).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("lang"), col("n_tokens"), col("n_oov"),
          CleanFunctions.round6(
            col("n_oov").cast(DoubleType) / col("n_tokens").cast(DoubleType))
            .as("oov_rate"))
        .orderBy("lang")
    }
  )

  /** The shared BPE oracle scaffolding: word frequencies, char-split v0,
    * and the 8 materialized merge rounds (pK counts, bK argmax, vK
    * rewrite) — used by BOTH the train and encode oracles so they replay
    * the identical learned merges. MATERIALIZED throughout: DuckDB 1.0
    * inlines plain CTEs and the chained rounds would re-evaluate
    * exponentially.
    */
  private lazy val bpeSqlCtes: String = {
    def syms(src: String) =
      s"list_filter(string_split($src, '·'), x -> x <> '')"
    def round(k: Int): String = {
      val prev = s"v${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT t, nxt, sum(freq) AS total FROM (
         |    SELECT w, freq, tok AS t,
         |      lead(tok) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |    FROM (SELECT w, freq, unnest(${syms("sym")}) AS tok,
         |            generate_subscripts(${syms("sym")}, 1) AS pos
         |          FROM $prev))
         |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |b$k AS MATERIALIZED (
         |  SELECT t, nxt, total FROM p$k ORDER BY total DESC, t, nxt LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT w, freq,
         |    replace(sym, '·' || b.t || '·' || b.nxt || '·',
         |            '·' || b.t || b.nxt || '·') AS sym
         |  FROM $prev, b$k b)""".stripMargin
    }
    val t = TextFunctions.tokensSql("lower(text)")
    s"""wf AS MATERIALIZED (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest($t) AS w FROM documents) GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT w, freq,
       |    '·' || array_to_string(list_filter(string_split(w, ''), x -> x <> ''), '·') || '·' AS sym
       |  FROM wf),
       |${(1 to 8).map(round).mkString(",\n")}""".stripMargin
  }

  val oracleSql: Map[String, String] = {
    val t = "regexp_split_to_array(trim(text), '\\s+')"
    val tl = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    Map(
      "docs_sample_stratified" ->
        s"""SELECT lang, source, rk, doc_id FROM (
           |  SELECT lang, source, doc_id,
           |    row_number() OVER (PARTITION BY lang, source
           |      ORDER BY ${CleanFunctions.md5Hash64Sql("'sample:' || doc_id")}, doc_id) AS rk
           |  FROM documents) t
           |WHERE rk <= $SampleK ORDER BY lang, source, rk""".stripMargin,

      "docs_weighted_sample" ->
        s"""WITH k AS (
           |  SELECT doc_id, n_chars,
           |    ${CleanFunctions.round6Sql(
                  s"ln(CAST(${CleanFunctions.md5Hash64Sql("'wsample:' || doc_id")} % 1000000 + 1 AS DOUBLE) / 1000001.0)")}
           |      / CAST(n_chars AS DOUBLE) AS es_raw
           |  FROM documents WHERE n_chars > 0)
           |SELECT doc_id, n_chars, ${CleanFunctions.round6Sql("es_raw")} AS es_key
           |FROM k ORDER BY es_raw DESC, doc_id LIMIT $SampleWK""".stripMargin,
      "text_top_terms" ->
        s"""WITH c AS (SELECT lang, unnest($tl) AS token FROM documents),
           |g AS (SELECT lang, token, count(*) AS cnt FROM c GROUP BY 1, 2),
           |r AS (SELECT lang, token, cnt,
           |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rk FROM g)
           |SELECT lang, token, cnt, rk FROM r WHERE rk <= 5
           |ORDER BY lang, rk""".stripMargin,

      "text_pii_scrub" ->
        s"""SELECT event_id, ${TextFunctions.scrubPiiSql("props")} AS scrubbed,
           |${TextFunctions.piiCountSql("props", TextFunctions.PiiPatterns(0)._1)} AS n_emails,
           |${TextFunctions.piiCountSql("props", TextFunctions.PiiPatterns(1)._1)} AS n_nums
           |FROM events ORDER BY event_id""".stripMargin,

      "text_tokens" ->
        s"""SELECT doc_id, len($t) AS ws_tokens,
           |len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_tokens,
           |length(text) AS chars FROM documents ORDER BY doc_id""".stripMargin,

      "text_quality" ->
        s"""WITH m AS (SELECT doc_id,
           |CAST(length(text) AS DOUBLE) AS n_chars,
           |CAST(len($t) AS DOUBLE) AS n_tokens,
           |CAST(len(list_filter($t, x -> list_contains(${sqlList(Stopwords)}, x))) AS DOUBLE) AS n_stop,
           |CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) AS n_alpha,
           |CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS n_punct
           |FROM documents)
           |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           |round(n_stop / nullif(n_tokens, 0) * 10000.0) / 10000.0 + 0.0 AS stopword_ratio,
           |round(n_alpha / nullif(n_chars, 0) * 10000.0) / 10000.0 + 0.0 AS alpha_ratio,
           |round(n_punct / nullif(n_chars, 0) * 10000.0) / 10000.0 + 0.0 AS punct_ratio,
           |round((0.3 * least(1.0, n_tokens / 100.0) + 0.3 * (n_alpha / nullif(n_chars, 0))
           | + 0.2 * (1.0 - n_punct / nullif(n_chars, 0)) + 0.2 * (n_stop / nullif(n_tokens, 0))) * 10000.0) / 10000.0 + 0.0 AS quality_score
           |FROM m ORDER BY doc_id""".stripMargin,

      "text_readability" ->
        s"""WITH m AS (SELECT doc_id,
           |  len($t) AS n_words,
           |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
           |  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
           |FROM documents),
           |r AS (SELECT doc_id, n_words, n_sentences, n_syllables,
           |  ${CleanFunctions.round4Sql("CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)")} AS words_per_sentence,
           |  ${CleanFunctions.round4Sql("CAST(n_syllables AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0)")} AS syllables_per_word
           |FROM m),
           |f AS (SELECT *,
           |  ${CleanFunctions.round4Sql("206.835 - 1.015 * words_per_sentence - 84.6 * syllables_per_word")} AS flesch
           |FROM r)
           |SELECT doc_id, n_words, n_sentences, n_syllables,
           |  words_per_sentence, syllables_per_word, flesch,
           |  CASE WHEN flesch >= 60.0 THEN 'easy'
           |       WHEN flesch >= 30.0 THEN 'medium'
           |       ELSE 'hard' END AS grade
           |FROM f ORDER BY doc_id""".stripMargin,

      "text_zipf" -> {
        val round6 = (x: String) => s"(round(($x) * 1000000.0) / 1000000.0 + 0.0)"
        s"""WITH tok AS (
           |  SELECT lang, unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok
           |  FROM documents),
           |f AS (SELECT lang, tok, count(*) AS f FROM tok GROUP BY 1, 2),
           |r AS (SELECT lang, f,
           |  row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS rk FROM f),
           |t AS (SELECT lang,
           |  ${round6("ln(CAST(rk AS DOUBLE))")} AS x,
           |  ${round6("ln(CAST(f AS DOUBLE))")} AS y FROM r),
           |m AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
           |  ${CleanFunctions.exactSumSql("x")} AS sx,
           |  ${CleanFunctions.exactSumSql("y")} AS sy,
           |  ${CleanFunctions.exactSumSql(round6("x * y"))} AS sxy,
           |  ${CleanFunctions.exactSumSql(round6("x * x"))} AS sxx
           |  FROM t GROUP BY lang),
           |s AS (SELECT *,
           |  (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS slope FROM m)
           |SELECT lang, CAST(n AS BIGINT) AS n_types,
           |  ${CleanFunctions.round4Sql("slope")} AS zipf_slope,
           |  ${CleanFunctions.round4Sql("(sy - slope * sx) / n")} AS intercept
           |FROM s ORDER BY lang""".stripMargin
      },

      "text_hashing_trick" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok
           |  FROM documents)
           |SELECT doc_id, ${CleanFunctions.md5Hash64Sql("tok")} % 1024 AS bucket,
           |  count(*) AS cnt
           |FROM tok GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin,

      "text_bpe_train" -> {
        val out = (1 to 8).map(k =>
          s"SELECT CAST($k AS BIGINT) AS merge_rank, t || ' ' || nxt AS pair, CAST(total AS BIGINT) AS weighted_count FROM b$k")
          .mkString("\nUNION ALL\n")
        s"""WITH $bpeSqlCtes
           |$out
           |ORDER BY merge_rank""".stripMargin
      },

      "text_bpe_encode" ->
        s"""WITH $bpeSqlCtes,
           |pw AS MATERIALIZED (
           |  SELECT w, CAST(len(list_filter(string_split(sym, '·'), x -> x <> '')) AS BIGINT) AS n_sym
           |  FROM v8),
           |dw AS (
           |  SELECT doc_id, unnest(${TextFunctions.tokensSql("lower(text)")}) AS w
           |  FROM documents)
           |SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
           |  (round((CAST(sum(n_sym) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0) AS bpe_per_word
           |FROM dw JOIN pw USING (w)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "text_kn_bigram" -> {
        val r6 = (x: String) => s"(round(($x) * 1000000.0) / 1000000.0 + 0.0)"
        val p = "(greatest(CAST(cxy AS DOUBLE) - 0.75, 0.0) + 0.75 * CAST(fanout AS DOUBLE) * " +
          "(CAST(cont AS DOUBLE) / tt)) / CAST(cx AS DOUBLE)"
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok,
           |    generate_subscripts(${TextFunctions.tokensSql("lower(text)")}, 1) AS pos
           |  FROM documents),
           |big AS (
           |  SELECT doc_id, tok AS t1,
           |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
           |  FROM tok),
           |bf AS (SELECT doc_id, t1, t2 FROM big WHERE t2 IS NOT NULL),
           |cxyt AS (SELECT t1, t2, count(*) AS cxy FROM bf GROUP BY 1, 2),
           |ctx AS (SELECT t1, CAST(sum(cxy) AS BIGINT) AS cx, count(*) AS fanout
           |  FROM cxyt GROUP BY 1),
           |cont AS (SELECT t2, count(*) AS cont FROM cxyt GROUP BY 1),
           |tt AS (SELECT CAST(count(*) AS DOUBLE) AS tt FROM cxyt),
           |lp AS (
           |  SELECT bf.doc_id, ${r6(s"-ln($p)")} AS lp
           |  FROM bf
           |  JOIN cxyt USING (t1, t2)
           |  JOIN ctx USING (t1)
           |  JOIN cont USING (t2), tt)
           |SELECT doc_id, count(*) AS n_bigrams,
           |  ${CleanFunctions.round4Sql(CleanFunctions.exactSumSql("lp") + " / count(*)")} AS kn_cross_entropy
           |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },

      "text_pmi_bigrams" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok,
           |    generate_subscripts(${TextFunctions.tokensSql("lower(text)")}, 1) AS pos
           |  FROM documents),
           |big AS (
           |  SELECT tok AS t1, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
           |  FROM tok),
           |bf AS (SELECT t1, t2 FROM big WHERE t2 IS NOT NULL),
           |cxy AS (SELECT t1, t2, count(*) AS c_xy FROM bf GROUP BY 1, 2
           |        HAVING count(*) >= 3),
           |cx AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
           |nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_tok FROM tok),
           |nb AS (SELECT CAST(count(*) AS DOUBLE) AS n_big FROM bf)
           |SELECT t1, t2, c_xy, a.c AS c1, b.c AS c2,
           |  (round((ln((CAST(c_xy AS DOUBLE) / n_big)
           |    / ((CAST(a.c AS DOUBLE) / n_tok) * (CAST(b.c AS DOUBLE) / n_tok)))) * 1000000.0) / 1000000.0 + 0.0) AS pmi
           |FROM cxy JOIN cx a ON cxy.t1 = a.tok JOIN cx b ON cxy.t2 = b.tok, nt, nb
           |ORDER BY t1, t2""".stripMargin,

      "text_langid" -> {
        val scores = MarkerSets.map { case (l, ws) =>
          s"len(list_filter($tl, x -> list_contains(${sqlList(ws)}, x))) AS s_$l"
        }.mkString(",\n")
        val best = MarkerSets.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
        val pred = MarkerSets.foldRight("'und'") { case ((l, _), acc) =>
          s"CASE WHEN $best > 0 AND s_$l = $best THEN '$l' ELSE $acc END"
        }
        s"""WITH m AS (SELECT doc_id,\n$scores\nFROM documents)
           |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh, $pred AS pred_lang
           |FROM m ORDER BY doc_id""".stripMargin
      },

      "text_fingerprint" -> {
        val norm = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
        val sh = TextFunctions.shinglesSql("t", graft.GraftConfig.ShingleSize)
        s"""WITH tok AS (SELECT doc_id, text, $t AS t FROM documents WHERE len($t) >= ${graft.GraftConfig.ShingleSize})
           |SELECT doc_id, ${CleanFunctions.md5Hash64Sql(norm)} AS content_fp,
           |list_min(list_transform($sh, sh -> ${CleanFunctions.md5Hash64Sql("sh")})) AS min_shingle_fp
           |FROM tok ORDER BY doc_id""".stripMargin
      },

      "text_split" ->
        s"""SELECT doc_id, lang,
           |CASE WHEN ${CleanFunctions.md5Hash64Sql("'split:' || doc_id")} % 100 < 90
           |     THEN 'train' ELSE 'val' END AS split
           |FROM documents ORDER BY doc_id""".stripMargin,

      "text_pack_sequences" ->
        s"""WITH t AS (SELECT doc_id,
           |  ${CleanFunctions.md5Hash64Sql("'pack:' || doc_id")} AS h,
           |  ${CleanFunctions.md5Hash64Sql("'pack:' || doc_id")} % $PackShards AS shard,
           |  CAST(len(${TextFunctions.tokensSql("text")}) AS BIGINT) AS n_tokens
           |  FROM documents),
           |c AS (SELECT doc_id, shard, n_tokens,
           |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
           |  FROM t)
           |SELECT doc_id, shard, prev // $PackBudget AS bin, prev % $PackBudget AS bin_offset, n_tokens
           |FROM c ORDER BY doc_id""".stripMargin,

      "text_rarity" ->
        s"""WITH tk AS (SELECT DISTINCT doc_id,
           |    unnest(${TextFunctions.tokensSql("text")}) AS tok FROM documents),
           |f AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tk GROUP BY tok),
           |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
           |SELECT doc_id, count(*) AS n_terms,
           |  ${CleanFunctions.round4Sql(
                CleanFunctions.exactSumSql("round(ln(n_docs / df) * 1000000.0) / 1000000.0") + " / count(*)")} AS rarity
           |FROM tk JOIN f USING (tok) CROSS JOIN n
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "text_crossentropy" ->
        s"""WITH dt AS (SELECT doc_id, unnest(${TextFunctions.tokensSql("text")}) AS tok
           |  FROM documents),
           |lm AS (SELECT tok, count(*) AS tf FROM (
           |    SELECT unnest(${TextFunctions.tokensSql("text")}) AS tok
           |    FROM documents WHERE lang = 'en') GROUP BY tok),
           |sc AS (SELECT sum(tf) AS nn, count(*) AS vv FROM lm)
           |SELECT doc_id, count(*) AS n_tokens,
           |  ${CleanFunctions.round4Sql(
              CleanFunctions.exactSumSql(
                "round((-ln(CAST(coalesce(tf, 0) + 1 AS DOUBLE) / CAST(nn + vv AS DOUBLE))) * 1000000.0) / 1000000.0") +
              " / count(*)")} AS cross_entropy
           |FROM dt LEFT JOIN lm USING (tok) CROSS JOIN sc
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "text_token_fertility" ->
        s"""WITH $bpeSqlCtes,
           |pw AS MATERIALIZED (
           |  SELECT w, CAST(len(list_filter(string_split(sym, '·'), x -> x <> '')) AS BIGINT) AS n_sym
           |  FROM v8),
           |dw AS (
           |  SELECT lang, unnest(${TextFunctions.tokensSql("lower(text)")}) AS w
           |  FROM documents),
           |tk AS (SELECT lang, CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
           |  FROM dw JOIN pw USING (w) GROUP BY lang),
           |ch AS (SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS n_chars FROM documents GROUP BY lang)
           |SELECT lang, n_docs, n_bpe_tokens, n_chars,
           |  ${CleanFunctions.round4Sql(
              "CAST(n_bpe_tokens AS DOUBLE) / CAST(n_chars AS DOUBLE)")} AS tokens_per_char,
           |  ${CleanFunctions.round4Sql(
              "CAST(n_chars AS DOUBLE) / CAST(n_bpe_tokens AS DOUBLE)")} AS chars_per_token
           |FROM ch JOIN tk USING (lang) ORDER BY lang""".stripMargin,

      "text_dsir_weights" ->
        s"""WITH dt AS (SELECT doc_id, unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok
           |  FROM documents),
           |bg AS (SELECT tok, count(*) AS cb FROM dt GROUP BY tok),
           |tg AS (SELECT tok, count(*) AS ct FROM (
           |    SELECT unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok
           |    FROM documents WHERE source = 'src0') GROUP BY tok),
           |sc AS (SELECT b.tb, b.vv, t.tt FROM
           |  (SELECT sum(cb) AS tb, count(*) AS vv FROM bg) b
           |  CROSS JOIN (SELECT sum(ct) AS tt FROM tg) t),
           |lm AS (SELECT bg.tok, bg.cb, tg.ct FROM bg LEFT JOIN tg USING (tok)),
           |dl AS (SELECT doc_id,
           |  round((ln((CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(tt + vv AS DOUBLE)) / (CAST(cb + 1 AS DOUBLE) / CAST(tb + vv AS DOUBLE)))) * 1000000.0) / 1000000.0 AS lr
           |  FROM dt JOIN lm USING (tok) CROSS JOIN sc),
           |w AS (SELECT doc_id, count(*) AS n_tok,
           |  ${CleanFunctions.round4Sql(CleanFunctions.exactSumSql("lr") + " / count(*)")} AS dsir_w
           |  FROM dl GROUP BY doc_id)
           |SELECT doc_id, n_tok, dsir_w, CAST(dsir_w > 0.0 AS BIGINT) AS selected
           |FROM w ORDER BY doc_id""".stripMargin,

      "text_rendezvous_shards" ->
        s"""WITH cand AS (SELECT doc_id, sh,
           |  ${CleanFunctions.md5Hash64Sql("'rdv:' || doc_id || ':' || sh")} AS w
           |  FROM documents, (SELECT unnest(generate_series(0, 8)) AS sh)),
           |o AS (SELECT doc_id, CAST(sh AS BIGINT) AS shard_old FROM (
           |  SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
           |    ORDER BY w DESC, sh ASC) AS rk FROM cand WHERE sh < 8)
           |  WHERE rk = 1),
           |n AS (SELECT doc_id, CAST(sh AS BIGINT) AS shard_new FROM (
           |  SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
           |    ORDER BY w DESC, sh ASC) AS rk FROM cand)
           |  WHERE rk = 1)
           |SELECT shard_old, shard_new, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(shard_old <> shard_new AS BIGINT) AS moved
           |FROM o JOIN n USING (doc_id)
           |GROUP BY 1, 2 ORDER BY shard_old, shard_new""".stripMargin,

      "text_nb_source" -> {
        val nb = NbBuckets
        s"""WITH docs AS (SELECT doc_id, source, text,
           |  CASE WHEN ${CleanFunctions.md5Hash64Sql("'nbsplit:' || doc_id")} % 100 < 80
           |       THEN 'train' ELSE 'test' END AS split
           |  FROM documents),
           |tok AS (SELECT doc_id, source, split,
           |  ${CleanFunctions.md5Hash64Sql("tok")} % $nb AS b
           |  FROM (SELECT doc_id, source, split,
           |    unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok FROM docs)),
           |cnts AS (SELECT source, b, count(*) AS cnt
           |  FROM tok WHERE split = 'train' GROUP BY 1, 2),
           |stok AS (SELECT source, count(*) AS n_tok
           |  FROM tok WHERE split = 'train' GROUP BY 1),
           |sdoc AS (SELECT source, count(*) AS n_docs
           |  FROM docs WHERE split = 'train' GROUP BY 1),
           |tot AS (SELECT count(*) AS d_tot FROM docs WHERE split = 'train'),
           |dims AS (SELECT sdoc.source AS cand,
           |  ${CleanFunctions.round6Sql("ln(CAST(n_docs AS DOUBLE) / CAST(d_tot AS DOUBLE))")} AS prior,
           |  ${CleanFunctions.round6Sql(s"ln(CAST(1.0 AS DOUBLE) / CAST(n_tok + $nb AS DOUBLE))")} AS dflt
           |  FROM sdoc JOIN stok USING (source), tot),
           |ll AS (SELECT cnts.source AS cand, b,
           |  ${CleanFunctions.round6Sql(s"ln(CAST(cnt + 1 AS DOUBLE) / CAST(n_tok + $nb AS DOUBLE))")} AS llw
           |  FROM cnts JOIN stok USING (source)),
           |tc AS (SELECT doc_id, source AS actual, b, count(*) AS cnt
           |  FROM tok WHERE split = 'test' GROUP BY 1, 2, 3),
           |tm AS (SELECT tc.doc_id, tc.actual, d.cand, d.prior,
           |  ${CleanFunctions.round6Sql("CAST(tc.cnt AS DOUBLE) * coalesce(ll.llw, d.dflt)")} AS term
           |  FROM tc CROSS JOIN dims d
           |  LEFT JOIN ll ON ll.cand = d.cand AND ll.b = tc.b),
           |sc AS (SELECT doc_id, actual, cand,
           |  ${CleanFunctions.round4Sql(CleanFunctions.exactSumSql("term") + " + max(prior)")} AS score
           |  FROM tm GROUP BY 1, 2, 3),
           |pr AS (SELECT actual, cand AS predicted,
           |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rk
           |  FROM sc)
           |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
           |FROM pr WHERE rk = 1 GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin
      },

      "text_unimax_budget" -> {
        s"""WITH lt AS (SELECT lang, count(*) AS n_tokens
           |  FROM (SELECT lang, unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok
           |        FROM documents) GROUP BY lang),
           |c AS (SELECT lang, n_tokens, n_tokens * $UniMaxEpochs AS cap FROM lt),
           |tot AS (SELECT CAST(floor(CAST(sum(n_tokens) AS DOUBLE) / CAST(2 AS DOUBLE)) AS BIGINT) AS budget,
           |  count(*) AS n_langs FROM c),
           |r AS (SELECT c.lang, c.n_tokens, c.cap, budget, n_langs,
           |  CAST(count(b.b_lang) + 1 AS BIGINT) AS rn,
           |  coalesce(sum(b.b_cap), 0) AS pfx
           |  FROM c CROSS JOIN tot
           |  LEFT JOIN (SELECT lang AS b_lang, cap AS b_cap FROM c) b
           |    ON b.b_cap < c.cap OR (b.b_cap = c.cap AND b.b_lang < c.lang)
           |  GROUP BY 1, 2, 3, 4, 5),
           |k AS (SELECT *, CAST(CASE WHEN cap * (n_langs - rn + 1) + pfx <= budget
           |  THEN 1 ELSE 0 END AS BIGINT) AS constrained FROM r),
           |agg AS (SELECT coalesce(sum(CASE WHEN constrained = 1 THEN cap END), 0) AS c_cap,
           |  coalesce(sum(constrained), 0) AS c_n FROM k)
           |SELECT lang, n_tokens, cap, constrained,
           |  ${CleanFunctions.round4Sql("CASE WHEN constrained = 1 THEN CAST(cap AS DOUBLE) ELSE CAST(budget - c_cap AS DOUBLE) / CAST(n_langs - c_n AS DOUBLE) END")} AS alloc_tokens,
           |  ${CleanFunctions.round4Sql("(CASE WHEN constrained = 1 THEN CAST(cap AS DOUBLE) ELSE CAST(budget - c_cap AS DOUBLE) / CAST(n_langs - c_n AS DOUBLE) END) / CAST(n_tokens AS DOUBLE)")} AS epochs
           |FROM k, agg ORDER BY lang""".stripMargin
      },

      "text_sample_stratified" ->
        s"""SELECT doc_id, lang FROM documents
           |WHERE ${CleanFunctions.md5Hash64Sql("'sample:' || doc_id")} % 100 <
           |  CASE WHEN lang = 'de' THEN 80 WHEN lang = 'en' THEN 50 ELSE 100 END
           |ORDER BY doc_id""".stripMargin,

      "text_langid_confusion" ->
        s"""WITH cm AS (SELECT lang, ${TextFunctions.predLangSql("text")} AS pred_lang,
           |    count(*) AS cnt
           |  FROM documents GROUP BY 1, 2)
           |SELECT lang, pred_lang, cnt,
           |  ${CleanFunctions.round4Sql("CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY lang) AS DOUBLE)")} AS share
           |FROM cm ORDER BY lang, pred_lang""".stripMargin,

      // The curation oracle replays the full composition: quality/lang
      // gates (shared-formula SQL twins), exact dedup (min id per md5),
      // simhash near-dup drop (all-pairs — recall-complete at hamming<=5,
      // same rationale as the dedup_simhash oracle), md5-bucket split.
      "text_curation" ->
        s"""WITH m AS (SELECT doc_id, text,
           |  ${TextFunctions.qualityScoreSql("text")} AS quality,
           |  ${TextFunctions.predLangSql("text")} AS lang_pred
           |  FROM documents),
           |base AS (SELECT doc_id, text, quality, lang_pred FROM m
           |  WHERE quality >= 0.4 AND lang_pred <> 'und'),
           |kept AS (SELECT doc_id, text, quality, lang_pred FROM (
           |  SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical
           |  FROM base) WHERE doc_id = canonical),
           |tok AS (SELECT doc_id, unnest(${TextFunctions.tokensSql("text")}) AS t FROM kept),
           |h AS (SELECT doc_id, ${CleanFunctions.md5Hash64Sql("t")} AS h FROM tok),
           |v AS (SELECT doc_id, i, sum(((h >> i) & 1) * 2 - 1) AS vote
           |  FROM h, (SELECT unnest(generate_series(0, 59)) AS i) GROUP BY doc_id, i),
           |sim AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS sig
           |  FROM v GROUP BY doc_id),
           |dropped AS (SELECT DISTINCT b.doc_id FROM sim a JOIN sim b ON a.doc_id < b.doc_id
           |  WHERE bit_count(xor(a.sig, b.sig)) <= ${graft.operators.CorpusDedup.SimhashMaxHamming})
           |SELECT doc_id, lang_pred, quality,
           |  CASE WHEN ${CleanFunctions.md5Hash64Sql("'split:' || doc_id")} % 100 < 90
           |       THEN 'train' ELSE 'val' END AS split
           |FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
           |ORDER BY doc_id""".stripMargin,

      "text_inverted_index" -> {
        val k = graft.GraftConfig.ShingleSize
        s"""WITH tk AS (SELECT doc_id, ${TextFunctions.tokensSql("text")} AS t FROM documents),
           |sh AS (SELECT doc_id, unnest(${TextFunctions.shinglesSql("t", k)}) AS term
           |       FROM tk WHERE len(t) >= $k)
           |SELECT term, count(*) AS df,
           |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
           |FROM sh GROUP BY term HAVING count(*) BETWEEN 2 AND 50
           |ORDER BY term""".stripMargin
      },

      "text_sample_weighted" ->
        s"""SELECT doc_id, lang,
           |round((ln(CAST(${CleanFunctions.md5Hash64Sql("'wsample:' || doc_id")} % 1000000 + 1 AS DOUBLE) / 1000001.0)
           |  / nullif(CAST(n_chars AS DOUBLE), 0.0)) * 1000000.0) / 1000000.0 + 0.0 AS score
           |FROM documents ORDER BY score DESC, doc_id LIMIT $WeightedSampleK""".stripMargin,

      // Same recursive transitive-closure CTE as the dedup_clusters
      // oracle (min reachable id == the label-propagation fixpoint),
      // left-joined onto all docs, then the text_split bucket rule keyed
      // on the coalesced cluster label.
      "text_split_nodup" -> {
        val lbl = "coalesce(l.cluster_id, d.doc_id)"
        s"""WITH RECURSIVE tok AS (SELECT doc_id, unnest($t) AS tk FROM documents),
           |h AS (SELECT doc_id, ${CleanFunctions.md5Hash64Sql("tk")} AS h FROM tok),
           |v AS (SELECT doc_id, i, sum(((h >> i) & 1) * 2 - 1) AS vote
           |  FROM h, (SELECT unnest(generate_series(0, 59)) AS i) GROUP BY doc_id, i),
           |sim AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS sig
           |  FROM v GROUP BY doc_id),
           |p AS (SELECT a.doc_id AS x, b.doc_id AS y FROM sim a JOIN sim b ON a.doc_id < b.doc_id
           |  WHERE bit_count(xor(a.sig, b.sig)) <= ${graft.operators.CorpusDedup.SimhashMaxHamming}),
           |e AS (SELECT x, y FROM p UNION ALL SELECT y AS x, x AS y FROM p),
           |reach(doc_id, lbl) AS (
           |  SELECT DISTINCT x AS doc_id, x AS lbl FROM e
           |  UNION
           |  SELECT e.y AS doc_id, r.lbl FROM reach r JOIN e ON e.x = r.doc_id),
           |lab AS (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id)
           |SELECT d.doc_id, $lbl AS cluster_id,
           |CASE WHEN ${CleanFunctions.md5Hash64Sql(s"'split:' || $lbl")} % 100 < 90
           |     THEN 'train' ELSE 'val' END AS split
           |FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
           |ORDER BY d.doc_id""".stripMargin
      },

      "text_repetition" ->
        s"""WITH tok AS (SELECT doc_id, $t AS t FROM documents WHERE len($t) >= 3),
           |g AS (SELECT doc_id, CAST(len(t) - 2 AS BIGINT) AS n_grams,
           |  CAST(len(${TextFunctions.shinglesSql("t", 3)}) AS BIGINT) AS n_distinct FROM tok)
           |SELECT doc_id, n_grams, n_distinct,
           |${CleanFunctions.round4Sql("1.0 - CAST(n_distinct AS DOUBLE) / n_grams")} AS rep_ratio
           |FROM g ORDER BY doc_id""".stripMargin,

      "text_chunk" ->
        s"""WITH tok AS (SELECT doc_id, $t AS t FROM documents),
           |st AS (SELECT doc_id, t, unnest(generate_series(0, greatest(len(t) - 1, 0), 40)) AS start,
           |  generate_subscripts(generate_series(0, greatest(len(t) - 1, 0), 40), 1) - 1 AS chunk_id
           |  FROM tok),
           |c AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           |  array_to_string(t[start + 1 : start + 50], ' ') AS chunk FROM st)
           |SELECT doc_id, chunk_id, ${CleanFunctions.md5Hash64Sql("chunk")} AS chunk_fp,
           |len(regexp_split_to_array(trim(chunk), '\\s+')) AS n_tokens
           |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

      "text_tfidf" ->
        s"""WITH terms AS (SELECT doc_id, unnest($tl) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
           |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
           |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
           |  round((tf.tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df.df)) * 10000.0) / 10000.0 + 0.0 AS tfidf
           |  FROM tf JOIN df USING (term)),
           |r AS (SELECT doc_id, term, tf, df, tfidf,
           |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk FROM sc)
           |SELECT doc_id, term, tf, df, tfidf, rk FROM r WHERE rk <= 3
           |ORDER BY doc_id, rk""".stripMargin,

      "text_bm25_topk" ->
        s"""WITH tok AS (SELECT doc_id, unnest($tl) AS term FROM documents),
           |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
           |ad AS (SELECT ${CleanFunctions.round6Sql(
                "CAST(sum(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / count(*)")} AS avgdl FROM dl),
           |nn AS (SELECT count(*) AS n FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
           |idf AS (SELECT term, idf FROM (
           |  SELECT term, ${CleanFunctions.round6Sql(
                "ln(1.0 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))")} AS idf
           |  FROM (SELECT term, count(*) AS df
           |        FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1), nn)
           |  WHERE idf >= $BmIdfFloor),
           |wts AS (SELECT tf.doc_id, tf.term, ${CleanFunctions.round6Sql(
                s"idf * (CAST(tf AS DOUBLE) * ${BmK1 + 1.0}) / (CAST(tf AS DOUBLE) + $BmK1 * (${1.0 - BmB} + $BmB * CAST(dl AS DOUBLE) / avgdl))")} AS w
           |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), ad),
           |qt AS (SELECT DISTINCT doc_id AS q_id, term FROM tok
           |  WHERE doc_id % 100 = 0 AND doc_id < $BmQueryCap),
           |sc AS (SELECT q.q_id, w.doc_id, sum(CAST(w.w AS DECIMAL(18,6))) AS sdec
           |  FROM qt q JOIN wts w USING (term) WHERE w.doc_id <> q.q_id GROUP BY 1, 2)
           |SELECT q_id, doc_id, ${CleanFunctions.round4Sql("CAST(sdec AS DOUBLE)")} AS score, rk
           |FROM (SELECT q_id, doc_id, sdec,
           |  row_number() OVER (PARTITION BY q_id ORDER BY sdec DESC, doc_id) AS rk FROM sc)
           |WHERE rk <= $BmTopK ORDER BY q_id, rk""".stripMargin,

      "text_rank_rbo" -> {
        val wCase = "CASE dd " + RboWeights.map { case (dd, w) =>
          s"WHEN $dd THEN $w" }.mkString(" ") + " END"
        s"""WITH tok AS (SELECT doc_id, unnest($tl) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
           |idf AS (SELECT term, ${CleanFunctions.round6Sql(
              "ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / CAST(df AS DOUBLE))")} AS idf
           |  FROM (SELECT term, count(*) AS df FROM tf GROUP BY 1)),
           |qt AS (SELECT doc_id AS q_id, term FROM tf
           |  WHERE doc_id % 100 = 0 AND doc_id < $BmQueryCap),
           |sc AS (SELECT q.q_id, t.doc_id,
           |  ${CleanFunctions.exactSumSql("i.idf")} AS sa, sum(t.tf) AS sb
           |  FROM qt q JOIN tf t USING (term) JOIN idf i ON t.term = i.term
           |  WHERE t.doc_id <> q.q_id GROUP BY 1, 2),
           |ta AS (SELECT q_id, doc_id,
           |  row_number() OVER (PARTITION BY q_id ORDER BY sa DESC, doc_id) AS ra FROM sc),
           |tb AS (SELECT q_id, doc_id,
           |  row_number() OVER (PARTITION BY q_id ORDER BY sb DESC, doc_id) AS rb FROM sc),
           |bo AS (SELECT ta.q_id, greatest(ta.ra, tb.rb) AS mr
           |  FROM ta JOIN tb ON ta.q_id = tb.q_id AND ta.doc_id = tb.doc_id
           |  WHERE ta.ra <= $RboK AND tb.rb <= $RboK),
           |xs AS (SELECT q_id, dd, count(*) AS xd
           |  FROM bo CROSS JOIN (SELECT unnest(generate_series(1, $RboK)) AS dd)
           |  WHERE mr <= dd GROUP BY 1, 2),
           |rb AS (SELECT q_id,
           |  max(CASE WHEN dd = $RboK THEN xd END) AS n_common,
           |  ${CleanFunctions.round4Sql(CleanFunctions.exactSumSql(
              CleanFunctions.round6Sql(s"($wCase) * CAST(xd AS DOUBLE)")))} AS rbo
           |  FROM xs GROUP BY 1)
           |SELECT b.q_id, CAST(coalesce(rb.n_common, 0) AS BIGINT) AS n_common,
           |  coalesce(rb.rbo, 0.0) AS rbo
           |FROM (SELECT DISTINCT q_id FROM sc) b LEFT JOIN rb USING (q_id)
           |ORDER BY b.q_id""".stripMargin
      },

      "text_decontaminate" -> {
        val tn = s"regexp_split_to_array(trim(${graft.operators.Decontaminate.normalizeSql("text")}), '\\s+')"
        s"""WITH tok AS (SELECT doc_id, $tn AS t FROM documents WHERE len($tn) >= 4),
           |sh0 AS (SELECT doc_id, unnest(${TextFunctions.shinglesSql("t", 4)}) AS s FROM tok),
           |sh AS (SELECT doc_id, s, ${CleanFunctions.md5Hash64Sql("s")} AS h FROM sh0),
           |bench AS (SELECT doc_id AS bench_id, s AS bs, h FROM sh WHERE doc_id % 97 = 0),
           |train AS (SELECT doc_id, s, h FROM sh WHERE doc_id % 97 <> 0)
           |SELECT train.doc_id, count(DISTINCT bench.bench_id) AS n_bench_docs,
           |  count(DISTINCT train.s) AS n_shared_shingles
           |FROM train JOIN bench ON train.h = bench.h AND train.s = bench.bs
           |GROUP BY train.doc_id ORDER BY train.doc_id""".stripMargin
      },

      "dedup_exact" ->
        """SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
          |doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
          |FROM documents ORDER BY doc_id""".stripMargin,

      "text_gopher_rules" ->
        s"""WITH m AS (SELECT doc_id,
           |  CAST(len($t) AS BIGINT) AS n_words,
           |  CAST(list_sum(list_transform($t, x -> length(x))) AS BIGINT) AS sum_word_len,
           |  CAST(len(list_distinct(list_filter(list_transform($t, x -> lower(x)),
           |    x -> list_contains(${sqlList(Stopwords)}, x)))) AS BIGINT) AS n_stop_distinct,
           |  CAST(len(list_filter($t, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
           |  CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT) AS n_symbols
           |FROM documents),
           |r AS (SELECT doc_id, n_words, n_stop_distinct,
           |  ${CleanFunctions.round4Sql("CAST(sum_word_len AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0)")} AS mean_word_len,
           |  ${CleanFunctions.round4Sql("CAST(n_symbols AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0)")} AS symbol_ratio,
           |  ${CleanFunctions.round4Sql("CAST(n_alpha_words AS DOUBLE) / nullif(CAST(n_words AS DOUBLE), 0.0)")} AS alpha_word_frac
           |FROM m)
           |SELECT doc_id, n_words, n_stop_distinct, mean_word_len, symbol_ratio,
           |  alpha_word_frac,
           |  n_words BETWEEN $GopherMinWords AND $GopherMaxWords AS ok_words,
           |  mean_word_len BETWEEN 3.0 AND 10.0 AS ok_word_len,
           |  symbol_ratio <= 0.1 AS ok_symbols,
           |  alpha_word_frac >= 0.8 AS ok_alpha,
           |  n_stop_distinct >= 2 AS ok_stopwords,
           |  (n_words BETWEEN $GopherMinWords AND $GopherMaxWords)
           |    AND (mean_word_len BETWEEN 3.0 AND 10.0)
           |    AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
           |    AND n_stop_distinct >= 2 AS pass
           |FROM r ORDER BY doc_id""".stripMargin,

      "text_style_delta" -> {
        val tlow = TextFunctions.tokensSql("lower(text)")
        val r6 = CleanFunctions.round6Sql _
        s"""WITH d AS (SELECT doc_id, source, $tlow AS t FROM documents
           |  WHERE len($tlow) > 0),
           |dl AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS dl FROM d),
           |words AS (SELECT unnest(${sqlList(Stopwords)}) AS w),
           |cnt AS (SELECT doc_id, term AS w, count(*) AS c
           |  FROM (SELECT doc_id, unnest(t) AS term FROM d)
           |  WHERE term IN (SELECT w FROM words) GROUP BY 1, 2),
           |rf AS (SELECT dl.doc_id, dl.source, words.w,
           |  ${r6("CAST(coalesce(cnt.c, 0) AS DOUBLE) / CAST(dl.dl AS DOUBLE)")} AS rf
           |  FROM dl CROSS JOIN words
           |  LEFT JOIN cnt ON cnt.doc_id = dl.doc_id AND cnt.w = words.w),
           |corpus AS (SELECT w,
           |  ${r6(CleanFunctions.exactMeanSql("rf"))} AS cm,
           |  ${r6(CleanFunctions.exactMeanSql(r6("rf * rf")))} AS cm2
           |  FROM rf GROUP BY 1),
           |cs AS (SELECT w, cm, sqrt(greatest(0.0, ${r6("cm2 - cm * cm")})) AS sd FROM corpus),
           |sz AS (SELECT source, rf.w,
           |  ${r6(s"(${r6(CleanFunctions.exactMeanSql("rf"))} - any_value(cm)) / any_value(sd)")} AS z
           |  FROM rf JOIN cs ON rf.w = cs.w
           |  WHERE sd > 0.0 GROUP BY source, rf.w)
           |SELECT a.source AS source_a, b.source AS source_b,
           |  count(*) AS n_words,
           |  ${CleanFunctions.round4Sql(
              s"CAST(sum(CAST(${r6("abs(a.z - b.z)")} AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS delta
           |FROM sz a JOIN sz b ON a.w = b.w AND a.source < b.source
           |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin
      },

      "text_mix_weights" ->
        s"""WITH src AS (SELECT source, count(*) AS n_docs,
           |  CAST(sum(len($t)) AS BIGINT) AS n_tokens
           |FROM documents GROUP BY source),
           |sh AS (SELECT source, n_docs, n_tokens,
           |  ${CleanFunctions.round4Sql("CAST(n_tokens AS DOUBLE) / CAST((SELECT sum(n_tokens) FROM src) AS DOUBLE)")} AS share
           |FROM src),
           |w AS (SELECT *, round(pow(share, ${CleanFunctions.dlitSql(MixAlpha)}) * 1000000.0) / 1000000.0 + 0.0 AS w_raw FROM sh),
           |ws AS (SELECT ${CleanFunctions.exactSumSql("w_raw")} AS w_sum FROM w)
           |SELECT source, n_docs, n_tokens, share,
           |  ${CleanFunctions.round4Sql("w_raw / w_sum")} AS weight,
           |  ${CleanFunctions.round4Sql(s"${CleanFunctions.round4Sql("w_raw / w_sum")} / share")} AS effective_epochs
           |FROM w, ws ORDER BY source""".stripMargin,

      "text_segment_dedup" ->
        s"""WITH tk AS (SELECT doc_id, $t AS t FROM documents
           |  WHERE length(trim(text)) > 0),
           |ix AS (SELECT doc_id, t,
           |  unnest(generate_series(0, (len(t) - 1) // 10)) AS seg_idx FROM tk),
           |sg AS (SELECT doc_id, seg_idx,
           |  array_to_string(list_slice(t, seg_idx * 10 + 1, seg_idx * 10 + 10), ' ') AS seg
           |  FROM ix),
           |rk AS (SELECT doc_id,
           |  row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rk FROM sg)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
           |  CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           |  CAST(count(*) - sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "text_vocab_growth" ->
        s"""WITH tok AS (SELECT doc_id // 100 AS bucket, unnest($tl) AS token
           |  FROM documents),
           |bt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tok FROM tok GROUP BY bucket),
           |nt AS (SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS new_types FROM
           |  (SELECT token, min(bucket) AS fb FROM tok GROUP BY token) GROUP BY fb)
           |SELECT bt.bucket,
           |  CAST(sum(bt.n_tok) OVER (ORDER BY bt.bucket
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
           |  CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY bt.bucket
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
           |FROM bt LEFT JOIN nt ON bt.bucket = nt.bucket
           |ORDER BY bt.bucket""".stripMargin,

      "text_term_burstiness" ->
        s"""WITH tk AS (SELECT doc_id, unnest($tl) AS term FROM documents),
           |ft AS (SELECT doc_id, term FROM tk WHERE length(term) >= 3),
           |st AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
           |  FROM ft GROUP BY 1),
           |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
           |x AS (SELECT term, tf, df, nd,
           |  nd * (1.0 - exp(-CAST(tf AS DOUBLE) / nd)) AS expected_df
           |  FROM st, nd)
           |SELECT term, tf, df,
           |  ${CleanFunctions.round4Sql("CAST(tf AS DOUBLE) / CAST(df AS DOUBLE)")} AS occ_per_doc,
           |  ${CleanFunctions.round4Sql("CAST(df AS DOUBLE) / expected_df")} AS burst_ratio
           |FROM x ORDER BY tf DESC, term LIMIT 50""".stripMargin,

      "text_textrank" -> {
        val stopList = sqlList(TextFunctions.QualityStopwords)
        def iter(prev: String): String =
          s"""SELECT n.node,
             |  ${CleanFunctions.round6Sql("0.15 / ns.nd + 0.85 * CAST(coalesce(m.m, 0) AS DOUBLE)")} AS r
             |FROM nodes n CROSS JOIN ns LEFT JOIN (
             |  SELECT ew.dst,
             |    sum(CAST(${CleanFunctions.round6Sql("pr.r * ew.p")} AS DECIMAL(18,6))) AS m
             |  FROM ew JOIN $prev pr ON ew.src = pr.node GROUP BY 1) m
             |  ON n.node = m.dst""".stripMargin
        val chain = (1 to 6).map(i => s"r$i AS (${iter(s"r${i - 1}")})").mkString(",\n")
        s"""WITH tk AS (SELECT doc_id, unnest($tl) AS tok,
           |  generate_subscripts($tl, 1) AS pos FROM documents),
           |ct AS (SELECT doc_id, pos, tok FROM tk
           |  WHERE length(tok) >= 3 AND NOT list_contains($stopList, tok)),
           |aj AS (SELECT lag(tok) OVER w AS a, tok AS b,
           |  pos - lag(pos) OVER w AS gap
           |  FROM ct WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
           |ad AS (SELECT a, b FROM aj WHERE a IS NOT NULL AND gap <= 2 AND a <> b),
           |und AS (SELECT a, b FROM ad UNION ALL SELECT b AS a, a AS b FROM ad),
           |edges AS (SELECT a AS src, b AS dst, count(*) AS w FROM und GROUP BY 1, 2),
           |ew AS (SELECT src, dst,
           |  ${CleanFunctions.round6Sql("CAST(w AS DOUBLE) / CAST(sum(w) OVER (PARTITION BY src) AS DOUBLE)")} AS p
           |  FROM edges),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |ns AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM nodes),
           |r0 AS (SELECT node, ${CleanFunctions.round6Sql("1.0 / nd")} AS r FROM nodes, ns),
           |$chain
           |SELECT node AS token, r AS textrank FROM r6
           |ORDER BY r DESC, node LIMIT 50""".stripMargin
      },

      "text_rake" -> {
        val stopList = sqlList(TextFunctions.QualityStopwords)
        s"""WITH tk AS (SELECT doc_id, unnest($tl) AS tok,
           |  generate_subscripts($tl, 1) AS pos FROM documents),
           |mk AS (SELECT doc_id, pos, tok,
           |  list_contains($stopList, tok) AS is_stop,
           |  sum(CASE WHEN list_contains($stopList, tok) THEN 1 ELSE 0 END)
           |    OVER (PARTITION BY doc_id ORDER BY pos
           |          ROWS UNBOUNDED PRECEDING) AS run
           |  FROM tk),
           |ph AS (SELECT doc_id, run, list(tok ORDER BY pos) AS words
           |  FROM mk WHERE NOT is_stop GROUP BY doc_id, run
           |  HAVING count(*) <= 4),
           |ph2 AS (SELECT doc_id, run, words,
           |  array_to_string(words, ' ') AS phrase FROM ph),
           |ws AS (SELECT doc_id, wd,
           |  ${CleanFunctions.round4Sql("CAST(sum(plen) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS wscore
           |  FROM (SELECT doc_id, CAST(len(words) AS BIGINT) AS plen,
           |        unnest(words) AS wd FROM ph2)
           |  GROUP BY doc_id, wd),
           |rs AS (SELECT p.doc_id, p.run, p.phrase,
           |  ${CleanFunctions.exactSumSql("w.wscore")} AS rscore
           |  FROM (SELECT doc_id, run, phrase, unnest(words) AS wd FROM ph2) p
           |  JOIN ws w ON p.doc_id = w.doc_id AND p.wd = w.wd
           |  GROUP BY p.doc_id, p.run, p.phrase),
           |pc AS (SELECT doc_id, phrase, min(rscore) AS score
           |  FROM rs GROUP BY doc_id, phrase),
           |rk AS (SELECT doc_id, phrase, score,
           |  CAST(row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, phrase) AS BIGINT) AS rk FROM pc)
           |SELECT doc_id, rk, phrase, score FROM rk WHERE rk <= 3
           |ORDER BY doc_id, rk""".stripMargin
      },

      "text_lang_source_mix" ->
        s"""WITH p AS (SELECT source, ${TextFunctions.predLangSql("text")} AS pred_lang
           |  FROM documents),
           |c AS (SELECT source, pred_lang, CAST(count(*) AS BIGINT) AS n
           |  FROM p GROUP BY 1, 2),
           |t AS (SELECT source, CAST(sum(n) AS BIGINT) AS src_n FROM c GROUP BY 1)
           |SELECT c.source, c.pred_lang, c.n,
           |  ${CleanFunctions.round4Sql("CAST(c.n AS DOUBLE) / CAST(t.src_n AS DOUBLE)")} AS share
           |FROM c JOIN t ON c.source = t.source
           |ORDER BY c.source, c.pred_lang""".stripMargin,

      "text_oov_rate" ->
        s"""WITH tk AS (SELECT lang, unnest($tl) AS tok FROM documents),
           |vc AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1)
           |  ORDER BY c DESC, tok LIMIT 1000)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
           |  CAST(sum(CASE WHEN vc.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           |  ${CleanFunctions.round6Sql("CAST(sum(CASE WHEN vc.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS oov_rate
           |FROM tk LEFT JOIN vc ON tk.tok = vc.tok
           |GROUP BY lang ORDER BY lang""".stripMargin
    )
  }
}
