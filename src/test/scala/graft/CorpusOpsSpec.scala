package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the corpus-curation additions: sign-bit hamming
  * ANN, SemDeDup-style semantic dedup, segment-level exact dedup,
  * vocabulary growth, and aspect-ratio batch bucketing.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("ann_hamming_topk: ranks are 1..10 per query, distances nondecreasing in rank") {
    val rows = SparkEntry.queries("ann_hamming_topk")(spark, sfDir)
      .select("q_id", "rk", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 10L), s"query $q ranks broken")
      val ordered = rs.sortBy(_._2).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
        s"query $q distances not monotone in rank")
      assert(ordered.forall(d => d >= 0 && d <= 60), s"query $q distance out of [0,60]")
    }
  }

  test("ann_hamming_topk: overlaps brute-force cosine top-10 (sign bits carry signal)") {
    val bf = SparkEntry.queries("ann_topk_cosine")(spark, sfDir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hm = SparkEntry.queries("ann_hamming_topk")(spark, sfDir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & hm).size.toDouble / bf.size
    assert(recall >= 0.2, s"hamming recall@10 vs cosine too low: $recall")
  }

  test("dedup_semantic: dup rows point at an earlier same-cluster neighbor above tau") {
    val out = SparkEntry.queries("dedup_semantic")(spark, sfDir)
    val dup = out.filter(col("is_dup") === 1)
    assert(dup.filter(col("keep_id") >= col("vec_id")).count() == 0,
      "a dup's keeper must have a smaller id")
    assert(out.filter(col("is_dup") === 0 && col("keep_id") =!= col("vec_id")).count() == 0,
      "non-dups keep themselves")
    // keeper sits in the same cluster
    val clusters = out.select(col("vec_id").as("k_id"), col("cluster").as("k_cluster"))
    assert(dup.join(clusters, col("keep_id") === col("k_id"))
      .filter(col("cluster") =!= col("k_cluster")).count() == 0,
      "keeper must share the dup's cluster")
  }

  test("text_segment_dedup: kept + dup = total, and one instance per distinct segment survives") {
    val out = SparkEntry.queries("text_segment_dedup")(spark, sfDir)
    assert(out.filter(col("n_kept") + col("n_dup") =!= col("n_seg")).count() == 0)
    val totals = out.agg(sum("n_seg").as("all"), sum("n_kept").as("kept")).head
    // kept instances == number of distinct segments in the corpus
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .where(length(trim(col("text"))) > 0)
    val distinctSegs = docs
      .select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .select(explode(expr(
        "transform(sequence(0, (size(t) - 1) div 10), " +
          "i -> concat_ws(' ', slice(t, i * 10 + 1, 10)))")).as("seg"))
      .distinct().count()
    assert(totals.getLong(1) == distinctSegs,
      s"kept=${totals.getLong(1)} != distinct segments=$distinctSegs")
  }

  test("text_vocab_growth: cumulative counts are nondecreasing and end at corpus totals") {
    val rows = SparkEntry.queries("text_vocab_growth")(spark, sfDir)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    rows.sliding(2).foreach {
      case Array((t1, y1), (t2, y2)) => assert(t1 <= t2 && y1 <= y2)
      case _ =>
    }
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("tk"))
    assert(rows.last._1 == toks.count(), "final cum_tokens != corpus tokens")
    assert(rows.last._2 == toks.distinct().count(), "final cum_types != corpus types")
  }

  test("mm_aspect_buckets: partitions the corpus and batch counts are ceil(n/32)") {
    val out = SparkEntry.queries("mm_aspect_buckets")(spark, sfDir).collect()
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n")).sum == nDocs, "bucket sizes must sum to corpus")
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_batches") == (n + 31) / 32, "batch math")
    }
  }

  test("text_rake: phrases contain no stopwords, ranks 1..3, scores descending") {
    val stop = graft.functions.TextFunctions.QualityStopwords.toSet
    val rows = SparkEntry.queries("text_rake")(spark, sfDir)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    rows.foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rk"))
      assert(byRank.map(_.getAs[Long]("rk")).toSeq == (1L to byRank.length),
        s"doc $doc ranks not contiguous")
      val scores = byRank.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc scores not descending")
      byRank.foreach { r =>
        val words = r.getAs[String]("phrase").split(" ")
        assert(words.length <= 4 && words.forall(w => !stop(w)),
          s"doc $doc phrase '${r.getAs[String]("phrase")}' violates the run contract")
      }
    }
  }

  test("events_entropy_rate: 0 <= rate <= marginal <= ln(#states)") {
    val r = SparkEntry.queries("events_entropy_rate")(spark, sfDir).head
    val rate = r.getAs[Double]("entropy_rate")
    val marg = r.getAs[Double]("marginal_entropy")
    assert(rate >= 0 && marg >= 0)
    assert(rate <= marg + 1e-9, "conditioning cannot increase entropy")
    val states = graft.sources.Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(marg <= math.log(states.toDouble) + 1e-9, "marginal bounded by ln k")
    assert(math.abs(r.getAs[Double]("info_gain") - (marg - rate)) < 2e-6)
  }

  test("dedup_cluster_sizes: doc counts partition the corpus, sizes >= 1") {
    val out = SparkEntry.queries("dedup_cluster_sizes")(spark, sfDir)
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.agg(sum("n_docs")).head.getLong(0) == nDocs)
    assert(out.filter(col("cluster_size") < 1).count() == 0)
  }

  test("text_lang_source_mix: shares sum to ~1 per source") {
    SparkEntry.queries("text_lang_source_mix")(spark, sfDir)
      .groupBy("source").agg(sum("share").as("s")).collect()
      .foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 0.01,
        s"source ${r.get(0)} shares sum to ${r.get(1)}"))
  }

  test("emb_drift_psi: nonnegative and populations cover the corpus") {
    val r = SparkEntry.queries("emb_drift_psi")(spark, sfDir).head
    assert(r.getAs[Double]("psi") >= 0.0)
    val n = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur") == n)
  }

  test("text_oov_rate: rates in [0,1] and tokens partition by language") {
    val out = SparkEntry.queries("text_oov_rate")(spark, sfDir)
    assert(out.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() == 0)
    val total = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("t"))
      .count()
    assert(out.agg(sum("n_tokens")).head.getLong(0) == total)
  }

  test("events_zonemap_report: day partitions cover all events, min <= max") {
    val out = SparkEntry.queries("events_zonemap_report")(spark, sfDir)
    val n = graft.sources.Tables.events(spark, sfDir).count()
    assert(out.agg(sum("n")).head.getLong(0) == n)
    assert(out.filter(col("min_v") > col("max_v")).count() == 0)
  }

  test("text_nb_source: confusion matrix partitions the test split, predictions from train sources") {
    val out = SparkEntry.queries("text_nb_source")(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir).withColumn("split",
      when(graft.functions.CleanFunctions.md5Hash64(
        concat(lit("nbsplit:"), col("doc_id"))) % 100 < 80, "train")
        .otherwise("test"))
    val nTest = docs.filter(col("split") === "test").count()
    assert(out.agg(sum("n_docs")).head.getLong(0) == nTest,
      "every test doc gets exactly one prediction")
    val trainSources = docs.filter(col("split") === "train")
      .select("source").distinct().as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet
    val predicted = out.select("predicted").distinct()
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(predicted.subsetOf(trainSources),
      "a prediction can only name a source seen in training")
  }

  test("text_rendezvous_shards: movers land only on the new shard, movement ~1/9") {
    val out = SparkEntry.queries("text_rendezvous_shards")(spark, sfDir)
    val total = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.agg(sum("n_docs")).head.getLong(0) == total)
    // THE rendezvous property: growing 8 -> 9 shards only ever moves a
    // doc onto the NEW shard — any (old != new, new != 8) row means the
    // argmax is broken.
    assert(out.filter(col("moved") === 1 && col("shard_new") =!= 8).count() == 0)
    val movedN = out.filter(col("moved") === 1)
      .agg(coalesce(sum("n_docs"), lit(0L))).head.getLong(0)
    val share = movedN.toDouble / total.toDouble
    assert(share > 0.0 && share < 0.35, s"moved share $share far from 1/9")
  }

  test("text_unimax_budget: caps honored, budget exhausted, waterfill share uniform") {
    val out = SparkEntry.queries("text_unimax_budget")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val eps = 1e-6
    // No language exceeds the epoch cap; constrained rows take exactly
    // their capacity.
    out.foreach { r =>
      val cap = r.getAs[Long]("cap").toDouble
      val alloc = r.getAs[Double]("alloc_tokens")
      assert(r.getAs[Double]("epochs") <= 3.0 + eps)
      assert(alloc <= cap + eps)
      if (r.getAs[Long]("constrained") == 1L)
        assert(math.abs(alloc - cap) < eps, s"constrained lang must take its cap: $r")
    }
    // Unconstrained languages all get the SAME share (uniform waterfill)...
    val shares = out.filter(_.getAs[Long]("constrained") == 0L)
      .map(_.getAs[Double]("alloc_tokens")).distinct
    assert(shares.length <= 1, s"waterfill share must be uniform, got $shares")
    // ...and the allocations exhaust the budget (sum n_tokens / 2,
    // double-then-truncate like both engines).
    val totalTok = out.map(_.getAs[Long]("n_tokens")).sum
    val budget = (totalTok.toDouble / 2.0).toLong
    val allocSum = out.map(_.getAs[Double]("alloc_tokens")).sum
    if (shares.nonEmpty)
      assert(math.abs(allocSum - budget.toDouble) < 1e-2,
        s"alloc sum $allocSum != budget $budget")
  }
}
