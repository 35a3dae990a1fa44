package graft

import org.scalatest.funsuite.AnyFunSuite

class QueriesSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("approx stats land near the exact values") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("events_approx_stats")(spark, sfDir)
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        expr("percentile(value, 0.5)").as("p50"))
    approx.join(exact, "event_type").collect().foreach { r =>
      val (au, eu) = (r.getAs[Long]("approx_users"), r.getAs[Long]("n_users"))
      assert(math.abs(au - eu) <= math.max(2, eu / 10), s"HLL off: $au vs $eu")
      val (ap, ep) = (r.getAs[Double]("approx_p50"), r.getAs[Double]("p50"))
      assert(math.abs(ap - ep) <= math.max(0.5, ep * 0.1), s"p50 off: $ap vs $ep")
    }
  }

  test("IVF ANN recall vs brute force is useful") {
    import org.apache.spark.sql.functions._
    val bf = SparkEntry.queries("ann_topk_cosine")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("ann_ivf_topk")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall@10 too low: $recall")
  }

  test("multi-probe LSH ANN recall vs brute force") {
    import org.apache.spark.sql.functions._
    val bf = SparkEntry.queries("ann_topk_cosine")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("ann_lsh_topk")(spark, sfDir)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.9, s"adaptive multi-probe LSH recall@10 too low: $recall")
  }

  test("sequence packing: offsets stay inside the budget, bins fill contiguously per shard") {
    import org.apache.spark.sql.functions._
    val packed = SparkEntry.queries("text_pack_sequences")(spark, sfDir).cache()
    val budget = 512L
    // Every start offset is a valid position inside a bin.
    assert(packed.filter(col("bin_offset") < 0 || col("bin_offset") >= budget).count() === 0)
    // Within a shard, cumulative token stream is consistent: the doc's
    // global start position equals bin*budget + offset and is
    // non-decreasing in (bin, offset) — i.e. bins are contiguous.
    val bad = packed
      .withColumn("start", col("bin") * budget + col("bin_offset"))
      .groupBy("shard")
      .agg((sum(col("n_tokens")) =!= max(col("start") + col("n_tokens"))).as("mismatch"))
      .filter(col("mismatch")) // last doc's end == total tokens per shard
    assert(bad.count() === 0)
    packed.unpersist()
    ()
  }

  test("truncated+renormalized embeddings have unit L2 norm") {
    import org.apache.spark.sql.functions._
    val offUnit = SparkEntry.queries("emb_truncate_renorm")(spark, sfDir)
      .groupBy("vec_id").agg(sum(col("v") * col("v")).as("norm2"))
      .filter(abs(col("norm2") - 1.0) > 1e-3)
    assert(offUnit.count() === 0)
  }

  test("embedding outliers: z standardization is centered and flags are rare") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("emb_outliers")(spark, sfDir).cache()
    val n = out.count()
    val flagged = out.filter(col("is_outlier") === 1).count()
    assert(flagged.toDouble / n < 0.1, s"too many outliers: $flagged/$n")
    val meanZ = out.agg(avg(col("z"))).head().getDouble(0)
    assert(math.abs(meanZ) < 0.05, s"per-label z not centered: $meanZ")
    out.unpersist()
    ()
  }

  test("rarity score is bounded by the corpus-size IDF ceiling") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir).count().toDouble
    val outOfRange = SparkEntry.queries("text_rarity")(spark, sfDir)
      .filter(col("rarity") < 0.0 || col("rarity") > math.log(docs) + 1e-9)
    assert(outOfRange.count() === 0)
  }

  test("weighted sampling over-represents heavy documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    val picked = SparkEntry.queries("text_sample_weighted")(spark, sfDir)
      .join(docs, "doc_id")
    val sampleMean = picked.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"A-Res draw not weight-biased: sample $sampleMean vs corpus $corpusMean")
  }

  test("markov transition probabilities sum to 1 per from-state") {
    import org.apache.spark.sql.functions._
    val bad = SparkEntry.queries("events_markov")(spark, sfDir)
      .groupBy("from_type").agg(sum("p").as("total"))
      .filter(abs(col("total") - 1.0) > 1e-3)
    assert(bad.count() === 0)
  }

  test("seasonal/trend strength lands in [0, 1]") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ts_seasonal_strength")(spark, sfDir)
    val bad = out.filter(
      col("f_seasonal") < 0 || col("f_seasonal") > 1 ||
        col("f_trend") < 0 || col("f_trend") > 1)
    assert(bad.count() === 0)
  }

  test("SAX symbols agree with the PAA breakpoints") {
    import org.apache.spark.sql.functions._
    val sax = SparkEntry.queries("ts_sax")(spark, sfDir).cache()
    val bad = sax.filter(
      (col("sym") === "a" && col("paa") >= -0.6745) ||
        (col("sym") === "b" && (col("paa") < -0.6745 || col("paa") >= 0.0)) ||
        (col("sym") === "c" && (col("paa") < 0.0 || col("paa") >= 0.6745)) ||
        (col("sym") === "d" && col("paa") < 0.6745))
    assert(bad.count() === 0)
    // A z-normalized series exercises the whole alphabet.
    assert(sax.select("sym").distinct().count() >= 3)
    sax.unpersist()
    ()
  }

  test("SAX MINDIST is nonnegative, bounded by the max-cell word, and 0 for matching words") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ts_sax_mindist")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("mindist") < 0 || col("mindist").isNull).count() == 0)
    // Upper bound: every matched frame at the worst cell (a vs d,
    // (2*0.6745)^2 per frame) -> mindist <= sqrt(n_obs * 1.819801).
    val bad = out.filter(col("mindist") >
      sqrt(col("n_obs").cast("double") * lit(1.82)) + lit(1e-6))
    assert(bad.count() == 0)
    // The zero case of the lower-bound property is pinned by the
    // crafted-series spec below (real data can't guarantee a matched
    // word exists at every sf).
    out.unpersist()
    ()
  }

  test("SAX MINDIST crafted series: matched and gap<=1 words score exactly 0; an all-gap-2 word hits the closed form") {
    import spark.implicits._
    import graft.functions.CleanFunctions
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-03-01 00:00:00")
    def t(frame: Int) = new Timestamp(base.getTime + frame * 6L * 3600 * 1000)
    def runOn(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-sax-crafted")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      SparkEntry.queries("ts_sax_mindist")(spark, dir.toString)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
    }
    // Case 1 — MATCHED WORDS: two identical 8-frame series (one event
    // per frame, values hitting all four letters: z of {0,0,4,4,6,6,
    // 10,10} = -1.39,-0.28,+0.28,+1.39 -> word "aabbccdd"). The global
    // series is the same distribution duplicated, so its word equals
    // each user's word frame-for-frame -> MINDIST exactly 0.0 (the
    // documented zero case, previously untested — r14 verdict item 4).
    val vA = Seq(0.0, 0.0, 4.0, 4.0, 6.0, 6.0, 10.0, 10.0)
    val caseA = for (u <- 1L to 2L; f <- 0 until 8)
      yield ((u - 1) * 8 + f + 1, t(f), u, "x", vA(f), "")
    val outA = runOn(caseA)
    assert(outA(1L) == ((8L, 8L, 0.0)) && outA(2L) == ((8L, 8L, 0.0)),
      s"matched-word series must score exactly 0: $outA")
    // Case 2 — GAP 1 and GAP 2: user 1 (9 events/frame, 6..6 then 4..4)
    // self-normalizes to word "ddddaaaa" and DOMINATES the global frame
    // averages, which land at ~+/-0.217 -> global word "ccccbbbb".
    // User 2 (1 event/frame, 0..0 then 10..10) self-normalizes to
    // "aaaadddd". So user 1 sits at gap 1 on every frame (adjacent
    // letters cost 0 -> exactly 0.0, the lower-bound property), and
    // user 2 at gap 2 on every frame -> mindist = round4(sqrt(n_obs/
    // n_frames * 8*cell1sq)) with cell1sq = round6(0.6745^2).
    val caseB =
      (for (f <- 0 until 8; i <- 0 until 9) yield
        ((f * 9 + i + 1).toLong, t(f), 1L, "x", if (f < 4) 6.0 else 4.0, "")) ++
      (for (f <- 0 until 8) yield
        ((100 + f).toLong, t(f), 2L, "x", if (f < 4) 0.0 else 10.0, ""))
    val outB = runOn(caseB)
    assert(outB(1L) == ((8L, 72L, 0.0)),
      s"gap<=1 word must score exactly 0: ${outB(1L)}")
    val cell1sq = CleanFunctions.round6Jvm(0.6745 * 0.6745)
    val expect2 = CleanFunctions.round4Jvm(math.sqrt(8.0 / 8.0 * 8.0 * cell1sq))
    assert(outB(2L) == ((8L, 8L, expect2)) && expect2 == 1.9078,
      s"all-gap-2 word must hit the closed form $expect2: ${outB(2L)}")
  }

  test("Pettitt test: crafted level shift localizes the changepoint with the closed-form statistic; constant series score 0") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-03-01 00:00:00")
    def t(day: Int) = new Timestamp(base.getTime + day * 24L * 3600 * 1000)
    // User 1: 10 days at level 10, then 10 days at level 50 — every
    // cross-boundary pair contributes one unit, so |U_k| peaks at the
    // boundary k=10 with K = 10*10 = 100 and q = 6*100^2/(20^3+20^2)
    // = 60000/8400 = 7.142857 -> significant (> ln 40 = 3.6889).
    // User 2: constant -> all signs 0 -> K = 0, q = 0, not significant.
    val rows =
      (for (dy <- 0 until 20) yield
        ((dy + 1).toLong, t(dy), 1L, "x", if (dy < 10) 10.0 else 50.0, "")) ++
      (for (dy <- 0 until 20) yield
        ((100 + dy).toLong, t(dy), 2L, "x", 7.0, ""))
    val dir = java.nio.file.Files.createTempDirectory("graft-pettitt")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ts_pettitt")(spark, dir.toString)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
      .toMap
    val day9 = base.getTime / 86400000L + 9 // epoch-day of the last low day
    val (n1, k1, cp1, q1, sig1) = out(1L)
    assert(n1 == 20L && k1 == 100L && cp1 == day9 && sig1 == 1L,
      s"shift user: ${out(1L)}")
    assert(math.abs(q1 - 60000.0 / 8400.0) < 1e-6)
    val (_, k2, _, q2, sig2) = out(2L)
    assert(k2 == 0L && q2 == 0.0 && sig2 == 0L, s"constant user: ${out(2L)}")
  }

  test("ts_pettitt real-data invariants: K within the pairwise bound, q nonnegative") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ts_pettitt")(spark, sfDir).cache()
    assert(out.count() > 0)
    // |U_k| = |sum over k(T-k) cross pairs| <= floor(T^2/4).
    val bad = out.filter(col("k_stat") > (col("n_days") * col("n_days")) / 4 ||
      col("pettitt_q") < 0 || col("pettitt_q").isNull)
    assert(bad.count() == 0)
    out.unpersist()
    ()
  }

  test("LZ76 phrase count: hand-checked words and the periodic-vs-varied ordering") {
    import graft.queries.OpsQueries.lz76Phrases
    assert(lz76Phrases("") == 0L)
    assert(lz76Phrases("a") == 1L)          // a
    assert(lz76Phrases("aa") == 2L)         // a|a
    assert(lz76Phrases("aaaa") == 2L)       // a|aaa
    assert(lz76Phrases("abab") == 3L)       // a|b|ab
    assert(lz76Phrases("abcd") == 4L)       // a|b|c|d
    assert(lz76Phrases("abcabcabc") == 4L)  // a|b|c|abcabc
    // A period-2 word compresses to O(1) phrases however long it grows.
    assert(lz76Phrases("ad" * 64) == 3L)    // a|d|adad...ad
    // Monotone sanity: a de Bruijn-ish varied word out-phrases it.
    assert(lz76Phrases("abcdacbdabdcbacd") > lz76Phrases("ad" * 8))
  }

  test("ts_lz_complexity real-data invariants: 1 <= phrases <= word length, norm >= 0") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ts_lz_complexity")(spark, sfDir).cache()
    assert(out.count() > 0)
    val bad = out.filter(col("lz_c") < 1 || col("lz_c") > col("n_sym") ||
      col("lz_norm") < 0 || col("lz_norm").isNull)
    assert(bad.count() == 0)
    out.unpersist()
    ()
  }

  test("stratified sample: at most K per (lang, source) cell, reproducible, drawn from the corpus") {
    import org.apache.spark.sql.functions._
    val a = SparkEntry.queries("docs_sample_stratified")(spark, sfDir).collect()
    val b = SparkEntry.queries("docs_sample_stratified")(spark, sfDir).collect()
    assert(a.nonEmpty && a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "hash-ranked sample must be run-reproducible")
    val perCell = a.groupBy(r => (r.getString(0), r.getString(1))).values
    assert(perCell.forall(_.length <= 3) &&
      perCell.forall(c =>
        c.map(_.getLong(2)).sorted.sameElements(1L to c.length.toLong)))
    // Every sampled doc exists (ranks are over real rows, not synthesized).
    val ids = a.map(_.getLong(3)).toSet
    val real = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(real))
  }

  test("weighted sample: exactly K rows, ES keys descending, long docs overrepresented vs uniform") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("docs_weighted_sample")(spark, sfDir).collect()
    assert(out.length == 20)
    // ES keys are ln(u)/w with u in (0,1): strictly negative, and the
    // emitted rows are the global top-K so every key must beat the
    // corpus-wide K+1-th — checked via the reproducibility of a rerun.
    val keys = out.map(_.getDouble(2))
    assert(keys.forall(k => k < 0.0 && !k.isNaN))
    val rerun = SparkEntry.queries("docs_weighted_sample")(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(rerun.sameElements(out.map(_.toString).sorted),
      "hash-seeded weighted sample must be run-reproducible")
    // Top-K by u^(1/w): the sampled docs' mean length must exceed the
    // corpus mean (length-proportional inclusion) — deterministic here,
    // not a statistical flake: fixed hash, fixed corpus.
    val sampleMean = out.map(_.getLong(1)).sum.toDouble / out.length
    val corpusMean = graft.sources.Tables.documents(spark, sfDir)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
  }

  test("time-to-convert latencies are strictly positive") {
    import org.apache.spark.sql.functions._
    val bad = SparkEntry.queries("events_time_to_convert")(spark, sfDir)
      .filter(col("latency_s") < 0 ||
        col("first_purchase_us") <= col("first_view_us"))
    assert(bad.count() === 0)
  }

  test("langid confusion shares sum to 1 per labeled language") {
    import org.apache.spark.sql.functions._
    val bad = SparkEntry.queries("text_langid_confusion")(spark, sfDir)
      .groupBy("lang").agg(sum("share").as("total"))
      .filter(abs(col("total") - 1.0) > 1e-3)
    assert(bad.count() === 0)
  }

  test("containment catches a doc-in-doc pair that Jaccard misses") {
    import org.apache.spark.sql.functions._
    val cont = SparkEntry.queries("dedup_containment")(spark, sfDir).cache()
    assert(cont.count() > 0, "no containment pairs in testdata")
    val bounds = cont.filter(col("cont_a_in_b") > 1.0001 || col("cont_b_in_a") > 1.0001 ||
      (col("cont_a_in_b") < 0.9 && col("cont_b_in_a") < 0.9)).count()
    assert(bounds == 0, "containment outside [threshold, 1]")
    // Invariant vs Jaccard on shared pairs: J = |∩|/|∪| <= |∩|/max(|A|,|B|)
    // <= max-direction containment (this testdata's near-dups are full
    // near-copies, so the doc-in-doc asymmetric case itself doesn't
    // occur here — that semantics is pinned by the exact DuckDB oracle).
    val jac = SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)
    val violated = cont.join(jac, Seq("doc_id_a", "doc_id_b"))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) < col("jaccard") - 1e-4)
      .count()
    assert(violated == 0, "max containment must dominate Jaccard on shared pairs")
  }

  test("cross-entropy separates in-domain (en) from off-domain docs") {
    import org.apache.spark.sql.functions._
    val ce = SparkEntry.queries("text_crossentropy")(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir).select("doc_id", "lang")
    val m = ce.join(docs, "doc_id")
      .groupBy(col("lang") === "en").agg(avg("cross_entropy").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) < m(false),
      s"en docs should score lower CE under the en LM: ${m(true)} vs ${m(false)}")
  }

  test("silhouette lies in [-1,1] and is 1 for the seed centroids themselves") {
    import org.apache.spark.sql.functions._
    val sil = SparkEntry.queries("emb_silhouette")(spark, sfDir).cache()
    assert(sil.filter(col("silhouette") < -1.0001 || col("silhouette") > 1.0001).count() == 0)
    val seeds = sil.filter(col("vec_id") < 16)
    assert(seeds.filter(col("silhouette") =!= 1.0).count() == 0,
      "a seed vector's own-centroid distance is 0, so its silhouette must be 1")
  }

  test("rolling lag-1 correlation stays in [-1,1]") {
    import org.apache.spark.sql.functions._
    val rc = SparkEntry.queries("ts_rolling_corr")(spark, sfDir)
    assert(rc.filter(col("roll_corr") < -1.0001 || col("roll_corr") > 1.0001).count() == 0)
  }

  test("trimmed mean drops exactly 2*floor(n/10) samples per series") {
    import org.apache.spark.sql.functions._
    val tm = SparkEntry.queries("ts_trimmed_mean")(spark, sfDir)
    val n = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val bad = tm.join(n, "user_id")
      .filter(col("n_used") =!= col("n") - lit(2) * (col("n") / 10).cast("long"))
      .count()
    assert(bad == 0, "trim count drifted from n - 2*floor(n/10)")
  }

  test("Benford chi2 is non-negative; Mann-Whitney U lies in [0, n1*n2]") {
    import org.apache.spark.sql.functions._
    val bf = SparkEntry.queries("events_benford")(spark, sfDir)
    assert(bf.filter(col("chi2") < 0.0).count() == 0 && bf.count() > 0)
    val mw = SparkEntry.queries("events_mannwhitney")(spark, sfDir).head
    val (n1, n2, u1) = (mw.getLong(0), mw.getLong(1), mw.getDouble(2))
    assert(u1 >= 0.0 && u1 <= n1.toDouble * n2,
      s"U=$u1 outside [0, ${n1.toDouble * n2}]")
  }

  test("product quantization: codes in range, 4 subspaces beat plain VQ") {
    import org.apache.spark.sql.functions._
    val pq = SparkEntry.queries("emb_pq")(spark, sfDir).cache()
    val codeCols = Seq("c0", "c1", "c2", "c3")
    codeCols.foreach { c =>
      assert(pq.filter(col(c) < 0 || col(c) >= 16).count() == 0, s"$c out of [0,16)")
    }
    // Same code budget concentrated in ONE codebook (m=1, k=16) cannot
    // match m=4 independent codebooks (16^4 effective cells). On these
    // near-random synthetic embeddings the margin is modest (~15% — no
    // cluster structure to exploit), so the invariant is strict
    // improvement, not a factor.
    val e = graft.sources.Tables.embeddings(spark, sfDir).cache()
    val vqBook = graft.operators.ProductQuantizer.fit(e, "vec_id", "embedding", 64, 1, 16, 1)
    val (_, vqErr) = graft.operators.ProductQuantizer.codeAndError(
      col("embedding"), 0, 64, vqBook.head)
    val vqMean = e.agg(avg(vqErr)).head.getDouble(0)
    val pqMean = pq.agg(avg(col("recon_err"))).head.getDouble(0)
    assert(pqMean < vqMean,
      s"PQ (m=4) must beat plain VQ at equal code budget: pq=$pqMean vq=$vqMean")
  }

  test("shard manifest offsets stay in-shard; gini and VR are in range") {
    import org.apache.spark.sql.functions._
    val man = SparkEntry.queries("mm_shard_manifest")(spark, sfDir)
    assert(man.filter(col("byte_offset") < 0 || col("byte_offset") >= 65536).count() == 0)
    // First-fit contract: no blob straddles a shard-file boundary.
    assert(man.filter(col("byte_offset") + col("n_bytes") > 65536).count() == 0,
      "a blob read would run past its shard file's end")
    val gini = SparkEntry.queries("orders_gini")(spark, sfDir).head.getDouble(1)
    assert(gini >= 0.0 && gini < 1.0, s"gini=$gini out of [0,1)")
    val vr = SparkEntry.queries("ts_variance_ratio")(spark, sfDir)
    assert(vr.filter(col("vr") <= 0.0).count() == 0, "variance ratio must be positive")
  }

  test("hampel passes inliers through; permutation entropy lies in [0,1]") {
    import org.apache.spark.sql.functions._
    val h = SparkEntry.queries("ts_hampel")(spark, sfDir).cache()
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), graft.functions.CleanFunctions.round4(col("value")).as("v4"))
    val drifted = h.filter(col("is_outlier") === 0).join(ev, "event_id")
      .filter(col("cleaned") =!= col("v4")).count()
    assert(drifted == 0, "non-outlier rows must pass through unchanged")
    val pe = SparkEntry.queries("ts_perm_entropy")(spark, sfDir)
    assert(pe.filter(col("perm_entropy") < 0.0 || col("perm_entropy") > 1.0001).count() == 0)
  }

  test("ESD rounds never re-flag an event and emit 3 per live series") {
    import org.apache.spark.sql.functions._
    val esd = SparkEntry.queries("ts_esd_anomalies")(spark, sfDir).cache()
    val reflagged = esd.groupBy("user_id", "event_id")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    assert(reflagged == 0, "an event survived removal and was flagged twice")
    val perSeries = esd.groupBy("user_id").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 3).count()
    assert(perSeries == 0, "every non-constant series should yield exactly 3 rounds")
  }

  test("conformal width actually covers ~90% of naive-forecast errors") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val resid = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .withColumn("pred", lag(col("value"), 24).over(w))
      .filter(col("pred").isNotNull)
      .withColumn("ar", abs(col("value") - col("pred")))
    val width = SparkEntry.queries("ts_conformal_width")(spark, sfDir)
    val cov = resid.join(width, "user_id")
      .groupBy("user_id")
      .agg((count(when(col("ar") <= col("q90_width"), 1)).cast("double") /
        count(lit(1))).as("coverage"))
    val under = cov.filter(col("coverage") < 0.85).count()
    assert(under == 0, "a series' conformal width covers < 85% of its own errors")
  }

  test("bollinger bands bracket the mid; RSI in [0,100]; spearman in [-1,1]") {
    import org.apache.spark.sql.functions._
    val bb = SparkEntry.queries("ts_bollinger")(spark, sfDir).cache()
    assert(bb.filter(col("bb_upper") < col("bb_mid") || col("bb_mid") < col("bb_lower")).count() == 0,
      "band ordering upper >= mid >= lower violated")
    assert(bb.filter(!col("breach").isin(-1L, 0L, 1L)).count() == 0)
    val rsi = SparkEntry.queries("ts_rsi")(spark, sfDir)
    assert(rsi.filter(col("rsi") < -0.0001 || col("rsi") > 100.0001).count() == 0)
    val sp = SparkEntry.queries("ts_spearman")(spark, sfDir)
    assert(sp.filter(col("spearman_lag1") < -1.0001 || col("spearman_lag1") > 1.0001).count() == 0)
  }

  test("pagerank mass ~1; basket lift positive; flesch grade consistent") {
    import org.apache.spark.sql.functions._
    val pr = SparkEntry.queries("nation_pagerank")(spark, sfDir).cache()
    assert(pr.filter(col("pagerank") <= 0.0).count() == 0, "nonpositive rank")
    // Mass is conserved up to rounding + dangling leakage: sum in (0.5, 1.01].
    val mass = pr.agg(sum(col("pagerank"))).head.getDouble(0)
    assert(mass > 0.5 && mass < 1.01, s"total rank mass $mass out of range")
    val bp = SparkEntry.queries("lineitem_basket_pairs")(spark, sfDir).cache()
    assert(bp.filter(col("lift") <= 0.0 || col("support") <= 0.0).count() == 0)
    assert(bp.filter(col("pair_cnt") > col("cnt_a") || col("pair_cnt") > col("cnt_b")).count() == 0,
      "a pair cannot co-occur more often than either part occurs")
    val rd = SparkEntry.queries("text_readability")(spark, sfDir).cache()
    assert(rd.filter(col("grade") === "easy" && col("flesch") < 60.0).count() == 0)
    assert(rd.filter(col("n_syllables") > 0 && col("n_words") > 0).count() == rd.count(),
      "every document should have at least one word and one vowel group")
  }

  test("mann-kendall S bounded by pair count; HHI in (0,1]; CUPED shrinks variance") {
    import org.apache.spark.sql.functions._
    val mk = SparkEntry.queries("ts_mann_kendall")(spark, sfDir).cache()
    val maxPairs = col("n_days") * (col("n_days") - 1) / 2
    assert(mk.filter(abs(col("s_stat")) > maxPairs).count() == 0,
      "|S| cannot exceed n_days*(n_days-1)/2")
    assert(mk.filter(col("var_s") < 0.0).count() == 0)
    val hhi = SparkEntry.queries("supplier_hhi")(spark, sfDir).cache()
    assert(hhi.filter(col("hhi") <= 0.0 || col("hhi") > 1.0001).count() == 0)
    assert(hhi.filter(col("top_share") * col("top_share") > col("hhi") + 1e-4).count() == 0,
      "HHI must be at least the top supplier's squared share")
    val cu = SparkEntry.queries("events_cuped")(spark, sfDir).cache()
    val v = cu.agg(
      variance(col("y_post")).as("vy"), variance(col("y_cuped")).as("vc")).head
    assert(v.getDouble(1) <= v.getDouble(0) + 1e-9,
      s"CUPED variance ${v.getDouble(1)} must not exceed raw ${v.getDouble(0)}")
  }

  test("market shares sum to ~1 per market; zipf slope negative for natural text") {
    import org.apache.spark.sql.functions._
    val ms = SparkEntry.queries("q8_market_share")(spark, sfDir).cache()
    val bad = ms.groupBy("r_name", "yr").agg(sum(col("mkt_share")).as("tot"))
      .filter(abs(col("tot") - 1.0) > 0.01).count()
    assert(bad == 0, "shares within a (region, year) market must sum to ~1")
    val r10 = SparkEntry.queries("q10_returned_items")(spark, sfDir).cache()
    assert(r10.count() <= 20 && r10.filter(col("revenue") <= 0.0).count() == 0)
    val z = SparkEntry.queries("text_zipf")(spark, sfDir).cache()
    assert(z.filter(col("zipf_slope") >= 0.0).count() == 0,
      "token frequency must decay with rank (negative Zipf slope)")
    assert(z.filter(col("n_types") < 2).count() == 0)
  }

  test("granger F nonnegative; interarrival cv positive; hashing buckets in range") {
    import org.apache.spark.sql.functions._
    val gr = SparkEntry.queries("ts_granger")(spark, sfDir).cache()
    assert(gr.count() > 0 && gr.filter(col("granger_f") < 0.0).count() == 0)
    val ia = SparkEntry.queries("orders_interarrival")(spark, sfDir).cache()
    assert(ia.filter(col("mean_gap_days") <= 0.0 || col("cv") < 0.0).count() == 0)
    val ht = SparkEntry.queries("text_hashing_trick")(spark, sfDir).cache()
    assert(ht.filter(col("bucket") < 0 || col("bucket") >= 1024).count() == 0)
    // Column-sum preservation: total hashed counts == total tokens.
    val totHashed = ht.agg(sum(col("cnt"))).head.getLong(0)
    val totToks = graft.sources.Tables.documents(spark, sfDir)
      .select(size(graft.functions.TextFunctions.tokens(lower(col("text")))).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(totHashed == totToks, s"hashed $totHashed != tokens $totToks")
  }

  test("MMR picks are distinct, monotone in score, and diversify vs plain top-k") {
    import org.apache.spark.sql.functions._
    val mmr = SparkEntry.queries("emb_mmr_diversify")(spark, sfDir).cache()
    assert(mmr.count() == 8 && mmr.select("vec_id").distinct().count() == 8)
    val scores = mmr.orderBy("sel_rank").select("mmr_score")
      .collect().map(_.getDouble(0)).toSeq
    assert(scores.head >= scores(1),
      "rank-1 pick (pure relevance) must not score below rank 2")
    // Diversity: the MMR set's mean pairwise cosine must not exceed the
    // plain top-8-by-relevance set's (on identical candidates it is the
    // objective being minimized away from).
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    def meanPairSim(ids: Seq[Long]): Double = {
      val sub = e.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("i"), col("embedding").as("ei"))
      val sub2 = sub.select(col("i").as("j"), col("ei").as("ej"))
      sub.join(sub2, col("i") < col("j"))
        .agg(avg(graft.functions.TextFunctions.cosine(col("ei"), col("ej"))))
        .head.getDouble(0)
    }
    val mmrIds = mmr.select("vec_id").collect().map(_.getLong(0)).toSeq
    val topIds = SparkEntry.queries("ann_topk_cosine")(spark, sfDir)
      .filter(col("q_id") === 0 && col("rk") <= 8)
      .select("n_id").collect().map(_.getLong(0)).toSeq
    assert(meanPairSim(mmrIds) <= meanPairSim(topIds) + 1e-9,
      "MMR set should be no more self-similar than the plain top-k set")
    val q16 = SparkEntry.queries("q16_part_supplier_counts")(spark, sfDir)
    assert(q16.filter(col("supplier_cnt") <= 0).count() == 0 && q16.count() > 0)
  }

  test("ann recall harness: recall in [0,1], LSH recovers most true neighbors") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("ann_recall_eval")(spark, sfDir).cache()
    assert(r.filter(col("recall_at_10") < 0.0 || col("recall_at_10") > 1.0).count() == 0)
    assert(r.filter(col("n_hits") > 10).count() == 0)
    val mean = r.agg(avg(col("recall_at_10"))).head.getDouble(0)
    assert(mean >= 0.5, s"mean LSH recall@10 $mean collapsed below 0.5")
  }

  test("q6 positive; promo share in [0,100]; DAU never exceeds MAU") {
    import org.apache.spark.sql.functions._
    val q6 = SparkEntry.queries("q6_revenue_delta")(spark, sfDir).head.getDouble(0)
    assert(q6 > 0.0, s"q6 revenue delta $q6 should be positive on this data")
    val q14 = SparkEntry.queries("q14_promo_share")(spark, sfDir)
    assert(q14.filter(col("promo_share") < 0.0 || col("promo_share") > 100.0).count() == 0)
    val dm = SparkEntry.queries("events_dau_mau")(spark, sfDir).cache()
    assert(dm.filter(col("dau") > col("mau")).count() == 0,
      "daily actives cannot exceed the trailing-28d actives")
    assert(dm.filter(col("stickiness") <= 0.0 || col("stickiness") > 1.0).count() == 0)
  }

  test("discord word is each series' rarest; DiD equals its four-mean identity") {
    import org.apache.spark.sql.functions._
    val dc = SparkEntry.queries("ts_discord")(spark, sfDir).cache()
    assert(dc.count() > 0 && dc.filter(col("n_occ") <= 0).count() == 0)
    assert(dc.filter(length(col("discord_word")) =!= 4).count() == 0)
    val did = SparkEntry.queries("events_did")(spark, sfDir).head
    val (tp, tq, cp, cq, d) = (did.getDouble(0), did.getDouble(1),
      did.getDouble(2), did.getDouble(3), did.getDouble(4))
    assert(math.abs(((tq - tp) - (cq - cp)) - d) < 1e-3,
      "did column must equal its own four-mean identity")
  }

  test("hurst exponent sane: R/S positive and H in a plausible band") {
    import org.apache.spark.sql.functions._
    val h = SparkEntry.queries("ts_hurst")(spark, sfDir).cache()
    assert(h.count() > 0)
    Seq("rs_8", "rs_16", "rs_32").foreach { c =>
      assert(h.filter(col(c) <= 0.0).count() == 0, s"$c must be positive")
    }
    // R/S grows with chunk size for any non-degenerate series.
    assert(h.filter(col("rs_32") <= col("rs_8")).count() == 0,
      "rescaled range must grow with window size")
    assert(h.filter(col("hurst") < -0.1 || col("hurst") > 1.1).count() == 0,
      "H outside [0,1] (beyond rounding slack) indicates a broken estimate")
  }

  test("LTV curve monotone per cohort; power n positive; PMI counts consistent") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ltv = SparkEntry.queries("orders_cohort_ltv")(spark, sfDir).cache()
    val w = Window.partitionBy("cohort_mo").orderBy("age")
    val dips = ltv.withColumn("prev", lag(col("ltv_per_user"), 1).over(w))
      .filter(col("prev").isNotNull && col("ltv_per_user") < col("prev") - 1e-9)
      .count()
    assert(dips == 0, "cumulative LTV per user cannot decrease with age")
    val pw = SparkEntry.queries("events_ab_power")(spark, sfDir)
    assert(pw.filter(col("n_required") <= 0).count() == 0 && pw.count() > 0)
    val pmi = SparkEntry.queries("text_pmi_bigrams")(spark, sfDir).cache()
    assert(pmi.count() > 0)
    assert(pmi.filter(col("c_xy") > col("c1") || col("c_xy") > col("c2")).count() == 0,
      "a bigram cannot outnumber either of its unigrams")
  }

  test("triangle clustering in [0,1]; rule confidence bounded by 1") {
    import org.apache.spark.sql.functions._
    val tr = SparkEntry.queries("nation_triangles")(spark, sfDir).cache()
    assert(tr.filter(col("clustering") < 0.0 || col("clustering") > 1.0001).count() == 0)
    assert(tr.filter(col("n_triangles") > 0 && col("degree") < 2).count() == 0,
      "a node in a triangle needs degree >= 2")
    val rules = SparkEntry.queries("lineitem_basket_rules")(spark, sfDir).cache()
    assert(rules.filter(col("confidence") <= 0.0 || col("confidence") > 1.0001).count() == 0)
    // Both orientations of every pair exist with equal support.
    val asym = rules.select(col("ante").as("x"), col("cons").as("y"), col("support"))
      .join(rules.select(col("cons").as("x"), col("ante").as("y"),
        col("support").as("s2")), Seq("x", "y"), "left")
      .filter(col("s2").isNull || col("support") =!= col("s2")).count()
    assert(asym == 0, "pair support must be orientation-symmetric")
  }

  test("BPE merges are 8 distinct pairs with non-increasing available mass") {
    import org.apache.spark.sql.functions._
    val m = SparkEntry.queries("text_bpe_train")(spark, sfDir).cache()
    assert(m.count() == 8)
    assert(m.select("pair").distinct().count() == 8, "a pair merged twice")
    assert(m.filter(col("weighted_count") <= 0).count() == 0)
    // Each merge's count is bounded by the total token mass.
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
      .count()
    assert(m.filter(col("weighted_count") > toks).count() == 0,
      "a pair cannot outweigh the corpus token count")
  }

  test("BPE encode: merged tokens never exceed chars and shrink vs char count") {
    import org.apache.spark.sql.functions._
    val enc = SparkEntry.queries("text_bpe_encode")(spark, sfDir).cache()
    assert(enc.count() > 0)
    assert(enc.filter(col("n_bpe_tokens") < col("n_words")).count() == 0,
      "a word is at least one BPE token")
    // Merges strictly compress: total BPE tokens < total characters in words.
    val chars = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
      .agg(sum(length(col("w")))).head.getLong(0)
    val bpe = enc.agg(sum(col("n_bpe_tokens"))).head.getLong(0)
    assert(bpe < chars, s"8 merges must compress below char count ($bpe vs $chars)")
  }

  test("JL projection roughly preserves pairwise distances; fuzzy dupes are tight") {
    import org.apache.spark.sql.functions._
    val proj = SparkEntry.queries("emb_random_projection")(spark, sfDir).cache()
    assert(proj.select("dim").distinct().count() == 16)
    // Distance preservation on a small sample: projected distance within
    // a loose JL band (factor 3) of the original for most pairs.
    val ids = Seq(0L, 50L, 100L, 150L, 200L)
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val pr = proj.filter(col("vec_id").isin(ids: _*)).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.sortBy(_.getLong(1)).map(_.getDouble(2))
      }
    val ratios = for {
      i <- ids; j <- ids if i < j
      dOrig = math.sqrt(e(i).zip(e(j)).map { case (a, b) => (a - b).toDouble * (a - b) }.sum)
      dProj = math.sqrt(pr(i).zip(pr(j)).map { case (a, b) => (a - b) * (a - b) }.sum)
    } yield dProj / dOrig
    assert(ratios.count(r => r > 0.33 && r < 3.0) >= ratios.size * 0.8,
      s"JL distance ratios collapsed: ${ratios.mkString(",")}")
    val fd = SparkEntry.queries("orders_fuzzy_dupes")(spark, sfDir)
    assert(fd.filter(col("day_gap") > 14 || col("day_gap") < 0).count() == 0)
  }

  test("HW anomaly flags exactly the >2-sigma residual days, and few of them") {
    import org.apache.spark.sql.functions._
    val a = SparkEntry.queries("ts_hw_anomaly")(spark, sfDir).cache()
    assert(a.count() > 0)
    assert(a.filter(col("is_anomaly") === 1L && abs(col("hw_z")) <= 2.0).count() == 0)
    assert(a.filter(col("is_anomaly") === 0L && abs(col("hw_z")) > 2.0).count() == 0)
    val rate = a.filter(col("is_anomaly") === 1L).count().toDouble / a.count()
    assert(rate < 0.2, s"anomaly rate $rate implausibly high for a 2-sigma gate")
  }

  test("KPSS nonnegative with consistent flag; changepoint shift equals means") {
    import org.apache.spark.sql.functions._
    val k = SparkEntry.queries("ts_kpss")(spark, sfDir).cache()
    assert(k.count() > 0 && k.filter(col("kpss") < 0.0).count() == 0)
    assert(k.filter(col("nonstationary") === 1L && col("kpss") <= 0.463).count() == 0)
    assert(k.filter(col("nonstationary") === 0L && col("kpss") > 0.463).count() == 0)
    val cs = SparkEntry.queries("ts_changepoint_segment")(spark, sfDir).cache()
    assert(cs.count() > 0 && cs.filter(col("cp_score") < 0.0).count() == 0)
    val bad = cs.filter(abs(col("shift") -
      (col("post_mean") - col("pre_mean"))) > 1e-3).count()
    assert(bad == 0, "shift must equal post_mean - pre_mean")
  }

  test("pacf lag-1 equals acf lag-1 and all pacf values stay in [-1,1]") {
    import org.apache.spark.sql.functions._
    val p = SparkEntry.queries("ts_pacf")(spark, sfDir).cache()
    val a = SparkEntry.queries("ts_acf")(spark, sfDir)
      .select(col("user_id"), col("acf_1"))
    // Durbin-Levinson level 1 IS the lag-1 autocorrelation.
    assert(p.join(a, "user_id").filter(col("pacf_1") =!= col("acf_1")).count() == 0)
    Seq("pacf_1", "pacf_2", "pacf_3").foreach { c =>
      assert(p.filter(col(c) < -1.0001 || col(c) > 1.0001).count() == 0, s"$c out of range")
    }
  }

  test("query column names match oracle aliases (driver hashes by name)") {
    // Spot-check: no generated names like sum(x) leak into output schemas.
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, sfDir).columns
      cols.foreach { c =>
        assert(!c.contains("("), s"$name leaks generated column name: $c")
      }
    }
  }

  test("CMS estimates never undercount (the one-sided sketch guarantee)") {
    import org.apache.spark.sql.functions._
    val cms = SparkEntry.queries("events_cms_topk")(spark, sfDir).cache()
    assert(cms.count() > 0)
    assert(cms.filter(col("cms_est") < col("true_cnt")).count() == 0,
      "count-min must only overestimate")
    assert(cms.filter(col("overestimate") =!=
      col("cms_est") - col("true_cnt")).count() == 0)
  }

  test("LSH recall harness: metrics in [0,1], hits bounded by both sides") {
    val r = SparkEntry.queries("dedup_recall_eval")(spark, sfDir).head()
    val (nT, nC, nH) = (r.getAs[Long]("n_truth"),
      r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hits"))
    assert(nH <= nT && nH <= nC, s"hits $nH exceed truth $nT or candidates $nC")
    val (rec, prec) = (r.getAs[Double]("recall"), r.getAs[Double]("precision"))
    assert(rec >= 0.0 && rec <= 1.0 && prec >= 0.0 && prec <= 1.0)
    // The banding constants are tuned for ~0.7 Jaccard; on the synthetic
    // near-dup corpus the harness should report useful recall.
    assert(rec >= 0.5, s"minhash-LSH recall collapsed: $rec")
  }

  test("gopher rules: pass is the conjunction of its flags") {
    import org.apache.spark.sql.functions._
    val g = SparkEntry.queries("text_gopher_rules")(spark, sfDir).cache()
    assert(g.count() > 0)
    val bad = g.filter(col("pass") =!= (col("ok_words") && col("ok_word_len") &&
      col("ok_symbols") && col("ok_alpha") && col("ok_stopwords"))).count()
    assert(bad == 0, "pass must equal the AND of the five rules")
    // Both verdicts must occur on the synthetic corpus or the rule band
    // tests nothing.
    assert(g.filter(col("pass")).count() > 0 && g.filter(!col("pass")).count() > 0)
  }

  test("mix weights: normalized, and temperature compresses toward uniform") {
    import org.apache.spark.sql.functions._
    val m = SparkEntry.queries("text_mix_weights")(spark, sfDir).cache()
    val wsum = m.agg(sum(col("weight"))).head().getDouble(0)
    assert(math.abs(wsum - 1.0) < 0.01, s"weights must renormalize, got $wsum")
    // alpha < 1 over-samples small sources relative to their share and
    // under-samples large ones: epochs anti-correlate with share.
    val rows = m.select(col("share"), col("effective_epochs"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val minShare = rows.minBy(_._1)
    val maxShare = rows.maxBy(_._1)
    assert(minShare._2 >= maxShare._2,
      s"temperature must favor small sources: $minShare vs $maxShare")
  }

  test("BFS: source at hop 0, every hop within the cap and reachable-only") {
    import org.apache.spark.sql.functions._
    val b = SparkEntry.queries("nation_bfs")(spark, sfDir).cache()
    assert(b.filter(col("nationkey") === 0).head().getAs[Long]("hops") == 0L)
    assert(b.filter(col("hops") < 0 || col("hops") > 4).count() == 0)
  }

  test("media phash: exact-duplicate payloads pair at hamming 0") {
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("mm_phash_dedup")(spark, sfDir).cache()
    assert(pairs.filter(col("hamming") < 0 || col("hamming") > 5).count() == 0)
    assert(pairs.filter(col("doc_id_a") >= col("doc_id_b")).count() == 0)
    // Every pair of byte-identical payloads (>= one frame) must surface
    // with an identical signature.
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 32)
    val dupes = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"))
    val missed = dupes.join(pairs.filter(col("hamming") === 0),
      Seq("doc_id_a", "doc_id_b"), "left_anti").count()
    assert(missed == 0, s"$missed exact-dup pairs missing from phash output")
  }

  test("spectral entropy is a normalized [0,1] index over the period bins") {
    import org.apache.spark.sql.functions._
    val e = SparkEntry.queries("ts_spectral_entropy")(spark, sfDir).cache()
    assert(e.count() > 0)
    assert(e.filter(col("spec_entropy") < -0.0001 ||
      col("spec_entropy") > 1.0001).count() == 0)
    // Shares form a distribution wherever defined.
    val bad = e.filter(col("q24").isNotNull &&
      abs(col("q24") + col("q12") + col("q8") + col("q6") - 1.0) > 0.01).count()
    assert(bad == 0, "power shares must sum to 1")
  }

  test("q44 best/worst: consecutive ranks, extremes match the global extremes") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q44_best_worst")(spark, sfDir).cache()
    Seq("best", "worst").foreach { side =>
      val rnks = r.filter(col("side") === side).select("rnk")
        .collect().map(_.getLong(0)).sorted
      assert(rnks.nonEmpty && rnks.head == 1L, s"$side must start at rank 1")
      assert(rnks.zipWithIndex.forall { case (v, i) => v == i + 1 },
        s"$side ranks must be consecutive: ${rnks.mkString(",")}")
      assert(rnks.length <= 10)
    }
    val best1 = r.filter(col("side") === "best" && col("rnk") === 1L)
      .select("avg_rev").head().getDouble(0)
    val worst1 = r.filter(col("side") === "worst" && col("rnk") === 1L)
      .select("avg_rev").head().getDouble(0)
    assert(best1 >= worst1)
    assert(r.agg(max(col("avg_rev"))).head().getDouble(0) == best1)
    assert(r.agg(min(col("avg_rev"))).head().getDouble(0) == worst1)
  }

  test("q67 rollup top-k: levels {0,1,3}, ranks <= 3, grand total dominates") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q67_rollup_topk")(spark, sfDir).cache()
    val lvls = r.select("lvl").distinct().collect().map(_.getLong(0)).toSet
    assert(lvls.subsetOf(Set(0L, 1L, 3L)) && lvls.contains(3L), s"levels: $lvls")
    assert(r.filter(col("rnk") < 1L || col("rnk") > 3L).count() == 0)
    val grand = r.filter(col("lvl") === 3L).cache()
    assert(grand.count() == 1)
    val g = grand.head()
    assert(g.getAs[String]("brand") == "ALL" && g.getAs[Long]("ym") == -1L)
    val gRev = g.getAs[Double]("rev_sum")
    assert(r.filter(col("rev_sum") > gRev + 1e-6).count() == 0,
      "no subtotal may exceed the grand total")
  }

  test("quantile sketch: audit columns are consistent and p90 >= p50") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("events_quantile_sketch")(spark, sfDir).cache()
    assert(r.count() > 0)
    // abs_err IS |est - exact| (4dp): the audit can't drift from its inputs.
    val drift = r.filter(
      abs(col("abs_err") - abs(col("pct_est") - col("pct_exact"))) > 1e-4).count()
    assert(drift == 0)
    // Monotone in p on both the sample estimate and the exact truth.
    val wide = r.groupBy("event_type").agg(
      max(when(col("p") === 0.5, col("pct_exact"))).as("x50"),
      max(when(col("p") === 0.9, col("pct_exact"))).as("x90"),
      max(when(col("p") === 0.5, col("pct_est"))).as("e50"),
      max(when(col("p") === 0.9, col("pct_est"))).as("e90"))
    assert(wide.filter(col("x90") < col("x50") || col("e90") < col("e50")).count() == 0)
  }

  test("ddsketch quantile: log-bucket estimate lands within the gamma guarantee") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("events_ddsketch_quantile")(spark, sfDir).cache()
    assert(r.count() > 0)
    // γ=1.02 bounds the bucket-midpoint error at ~1%; the exact truth can
    // interpolate one bucket over, so 5% is the loose structural bound.
    val bad = r.filter(abs(col("rel_err")) > 0.05).count()
    assert(bad == 0, "log-bucket estimate outside the relative-error guarantee")
    assert(r.filter(col("pct_est") <= 0.0).count() == 0)
  }

  test("q51 crossover: cumulatives are monotone and end at the totals") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q51_cumulative_crossover")(spark, sfDir).cache()
    val rows = r.orderBy("day").collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("cum_view") >= a.getAs[Long]("cum_view"))
        assert(b.getAs[Long]("cum_purchase") >= a.getAs[Long]("cum_purchase"))
      case _ => ()
    }
    val tot = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(rows.last.getAs[Long]("cum_view") == tot.getOrElse("view", 0L))
    assert(rows.last.getAs[Long]("cum_purchase") == tot.getOrElse("purchase", 0L))
  }

  test("record linkage: the threshold admits only all-field agreements") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("customer_record_linkage")(spark, sfDir).cache()
    // With the pinned m/u weights, no two-field agreement can reach the
    // 4.0 threshold — every emitted pair must agree on all three fields
    // and carry the single all-agree score.
    assert(r.filter(col("same_nation") =!= 1L || col("same_segment") =!= 1L ||
      col("close_balance") =!= 1L).count() == 0)
    assert(r.select("fs_score").distinct().count() <= 1)
    assert(r.filter(col("ck_a") >= col("ck_b")).count() == 0)
  }

  test("theil decomposition: nonnegative within terms, shares sum to 1") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("orders_theil")(spark, sfDir).cache()
    assert(r.count() > 0)
    assert(r.filter(col("theil_within") < -1e-3).count() == 0,
      "within-group Theil is nonnegative (Jensen)")
    val shareSum = r.agg(sum(col("share"))).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 0.01, s"revenue shares sum to $shareSum")
    // Decomposed total is itself a valid Theil index: nonnegative.
    val total = r.agg(sum(col("share") * col("theil_within") + col("between_term")))
      .head().getDouble(0)
    assert(total > -1e-3)
  }

  test("dbscan stability agrees with emb_dbscan's loose-level membership") {
    import org.apache.spark.sql.functions._
    val st = SparkEntry.queries("emb_dbscan_stability")(spark, sfDir).cache()
    assert(st.count() > 0)
    assert(st.filter(col("stability") < 0.0 || col("stability") > 1.0001).count() == 0)
    assert(st.filter(col("max_child") > col("n_points")).count() == 0)
    assert(st.filter((col("n_children") === 0L) =!= (col("max_child") === 0L)).count() == 0)
    // The loose level IS emb_dbscan: per-cluster member counts must match.
    val fromDbscan = SparkEntry.queries("emb_dbscan")(spark, sfDir)
      .filter(col("cluster_id") >= 0L)
      .groupBy("cluster_id").agg(count(lit(1)).as("n_expected"))
    val mismatch = st.join(fromDbscan, Seq("cluster_id"), "full")
      .filter(col("n_points").isNull || col("n_expected").isNull ||
        col("n_points") =!= col("n_expected")).count()
    assert(mismatch == 0, "stability loose clusters != emb_dbscan clusters")
  }

  test("calibrated DBSCAN selects the tightest eps inside the degree band, across sfs") {
    import org.apache.spark.sql.functions._
    // The ladder/target pinned in SimilarityQueries; the selection
    // contract re-derived here from the raw pair graph so the spec
    // catches a drifted selection rule, not just a crashed one.
    val ladder = Seq(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
    val target = 8.0
    for (dir <- Seq(sfDir, "/root/testdata/sf0.1")) {
      val out = SparkEntry.queries("emb_dbscan_calibrated")(spark, dir).cache()
      val eps = out.select("eps").head().getDouble(0)
      assert(ladder.contains(eps), s"selected eps $eps not on the ladder ($dir)")
      val n = out.count()
      assert(n == graft.sources.Tables.embeddings(spark, dir).count())
      // Recompute the per-level mean degree from the SAME blocked pair
      // graph and check the selection: every level at or below eps
      // satisfies the band, the next tighter one does not (or eps is the
      // ladder max).
      val pc = graft.queries.SimilarityQueries.candCosForSpec(spark, dir).cache()
      def meanDeg(e: Double): Double =
        2.0 * pc.filter(col("cos") >= e).count() / n.toDouble
      assert(meanDeg(eps) >= target,
        s"selected eps $eps has mean degree ${meanDeg(eps)} < $target ($dir)")
      val tighter = ladder.filter(_ > eps)
      tighter.headOption.foreach { nxt =>
        assert(meanDeg(nxt) < target,
          s"eps $nxt also satisfies the band but $eps was selected ($dir)")
      }
      out.unpersist(); pc.unpersist()
    }
  }
}
