package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.VectorExpressions
import graft.functions.TextFunctions

class VectorExpressionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("floatDot matches the aggregate/zip_with fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f))
    ).toDF("a", "b")
    val folded = aggregate(
      zip_with(col("a"), col("b"), (u, v) => u.cast("double") * v.cast("double")),
      lit(0.0), (acc, p) => acc + p)
    val rows = df.select(
      VectorExpressions.floatDot(col("a"), col("b")).as("fast"),
      folded.as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("floatDot nulls propagate; cosine of identical vectors is 1") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f, 2.0f)))
    ).toDF("a", "b")
    val rows = df.select(
      VectorExpressions.floatDot(col("a"), col("b")).as("d"),
      TextFunctions.cosine(col("a"), col("b")).as("c")).collect()
    assert(rows(0).getDouble(0) == 5.0)
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("SimHash60 expression matches the aggregate/zip_with formulation") {
    import spark.implicits._
    import graft.functions.CleanFunctions
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three four five six seven",
      "hello").toDF("text").select(TextFunctions.tokens(col("text")).as("t"))
    val slow = {
      val hashes = transform(col("t"), t => CleanFunctions.md5Hash64(t))
      val votes = aggregate(
        hashes,
        array_repeat(lit(0L), 60),
        (acc, h) => zip_with(acc, sequence(lit(0), lit(59)),
          (a, i) => a + (call_function("shiftright", h, i) % 2L) * 2L - 1L))
      aggregate(
        zip_with(votes, sequence(lit(0), lit(59)),
          (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
        lit(0.0).cast("long"), (acc, b) => acc + b)
    }
    val rows = df.select(TextFunctions.simhash60(col("t")).as("fast"), slow.as("slow")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("bloomMightContain has no false negatives on member keys") {
    import spark.implicits._
    val members = (1L to 500L).filter(_ % 3 == 0)
    val df = members.toDF("k")
    val bf = df.stat.bloomFilter("k", 200L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = (1L to 500L).toDF("k")
      .filter(VectorExpressions.bloomMightContain(bos.toByteArray, col("k")))
      .collect().map(_.getLong(0)).toSet
    assert(members.forall(probe.contains), "bloom dropped a member key")
    // FP rate sane: kept set not wildly larger than the true set.
    assert(probe.size <= members.size + 25, s"too many false positives: ${probe.size}")
  }

  test("GraftExtensions expose the expressions to SQL") {
    import org.apache.spark.sql.SparkSession
    // Build a sibling session (same context) with the extensions applied.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions).getOrCreate()
      val d = s2.sql(
        "SELECT float_vector_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
          "array(cast(3.0 as float), cast(4.0 as float))) AS d").head().getDouble(0)
      assert(d == 11.0)
      val sh = s2.sql("SELECT simhash60(array('a', 'b')) AS s").head().getLong(0)
      val expected = SparkTestSession.spark.range(1)
        .select(graft.functions.TextFunctions.simhash60(
          org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.lit("a"),
            org.apache.spark.sql.functions.lit("b")))).head().getLong(0)
      assert(sh == expected)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("lshSign with literal-weight dot matches the interpreted formula") {
    import spark.implicits._
    val df = Seq(Tuple1(Array.tabulate(64)(i => (i % 7 - 3).toFloat))).toDF("e")
    for (p <- 0 until 16) {
      val expected = {
        val v = Array.tabulate(64) { i =>
          val w = if (((p * 8191L + i * 524287L) % 97) % 2 == 0) 1.0 else -1.0
          (i % 7 - 3).toDouble * w
        }.sum
        if (v >= 0) 1L else 0L
      }
      val got = df.select(TextFunctions.lshSign(col("e"), p)).head().getLong(0)
      assert(got == expected, s"plane $p")
    }
  }

  test("SignBits60 equals the higher-order sign fold") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val hof = expr("aggregate(sequence(0, 59), 0L, (acc, i) -> " +
      "acc + IF(element_at(embedding, i + 1) > CAST(0.0 AS FLOAT), shiftleft(1L, i), 0L))")
    val both = e.select(
      org.apache.spark.sql.graft.VectorExpressions.signBits60(col("embedding")).as("fast"),
      hof.as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("DtwDistance matches a reference DP and honors its contracts") {
    import spark.implicits._
    // Reference DP (independent implementation: full matrix, not the
    // expression's rolling buffer) — same recurrence, any order agrees.
    def refDtw(a: Array[Double], b: Array[Double]): Double = {
      val dp = Array.ofDim[Double](a.length, b.length)
      for (i <- a.indices; j <- b.indices) {
        val base = math.abs(a(i) - b(j))
        dp(i)(j) = base + ((i, j) match {
          case (0, 0) => 0.0
          case (0, _) => dp(0)(j - 1)
          case (_, 0) => dp(i - 1)(0)
          case _      => math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
        })
      }
      dp(a.length - 1)(b.length - 1)
    }
    val cases = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),              // identical -> 0
      (Array(1.0, 2.0, 3.0, 4.0), Array(2.0, 3.0, 4.0, 5.0)),    // shifted
      (Array(0.0, 10.0, 0.0), Array(0.0, 0.0, 10.0, 0.0)),       // elastic match
      (Array(5.0), Array(1.0, 2.0, 3.0)))                        // m != n
    val df = cases.toDF("a", "b")
    val rows = df.select(
      VectorExpressions.dtwDistance(col("a"), col("b")).as("d")).collect()
    cases.zip(rows).foreach { case ((a, b), r) =>
      assert(r.getDouble(0) == refDtw(a, b), s"${a.toSeq} vs ${b.toSeq}")
    }
    assert(rows.head.getDouble(0) == 0.0)
    // Contracts: empty or oversized input -> null (never a fake 0).
    val edge = Seq(
      (Array.empty[Double], Array(1.0)),
      (Array.fill(65)(1.0), Array(1.0))).toDF("a", "b")
    assert(edge.select(VectorExpressions.dtwDistance(col("a"), col("b")))
      .collect().forall(_.isNullAt(0)))
    // SQL registration surface.
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT dtw_distance(array(1.0d, 2.0d), array(2.0d, 3.0d)) AS d")
      .head().getDouble(0) == refDtw(Array(1.0, 2.0), Array(2.0, 3.0)))
  }

  test("the ts_dtw_lbkeogh lower bound never exceeds the exact DTW (randomized)") {
    // The bound the pruned-DTW entry relies on: max of the full-width
    // envelope bound per side and the endpoint bound. If this were ever
    // ABOVE the true DTW, the fence would silently drop genuinely close
    // pairs — exactly the plausible-but-wrong failure a randomized
    // property check exists to catch.
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val pairs = Seq.fill(200)((
      Array.fill(7)(rng.nextDouble() * 20 - 10),
      Array.fill(7)(rng.nextDouble() * 20 - 10)))
    val df = pairs.toDF("a", "b")
    def lbEnv(xa: org.apache.spark.sql.Column, yb: org.apache.spark.sql.Column) =
      (1 to 7).map(i => greatest(lit(0.0),
        element_at(xa, i) - array_max(yb),
        array_min(yb) - element_at(xa, i))).reduce(_ + _)
    val rows = df.select(
      greatest(lbEnv(col("a"), col("b")), lbEnv(col("b"), col("a")),
        abs(element_at(col("a"), 1) - element_at(col("b"), 1)) +
          abs(element_at(col("a"), 7) - element_at(col("b"), 7))).as("lb"),
      VectorExpressions.dtwDistance(col("a"), col("b")).as("dtw")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) <= r.getDouble(1) + 1e-9,
        s"lb ${r.getDouble(0)} > dtw ${r.getDouble(1)}")
    }
    // The bound has teeth: on random data it is positive for most pairs.
    assert(rows.count(_.getDouble(0) > 0.0) > 150)
  }

  test("approx_pct_det aggregate matches the DataFrame bottom-k path bit-for-bit") {
    import spark.implicits._
    import graft.functions.CleanFunctions
    import graft.sources.Tables
    val k = 128
    val ev = Tables.events(spark, SparkTestSession.sfDir)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"),
        CleanFunctions.md5Hash64(concat(lit("qsk:"), col("event_id"))).as("h"))
    // DataFrame reference: explicit bottom-k sample (test scale — a rank
    // window is fine here) + the shared rank-interpolation percentile.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h", "event_id")
    val sample = ev.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("event_type", "value")
    val want = graft.operators.StatsOps
      .rankPercentiles(sample, Seq("event_type"), "value", Seq(0.5, 0.9))
      .groupBy("event_type").agg(
        max(when(col("p") === 0.5, col("pct"))).as("p50"),
        max(when(col("p") === 0.9, col("pct"))).as("p90"))
      .as[(String, Double, Double)].collect().sortBy(_._1).toList
    // Aggregate under test, through BOTH surfaces: the Column wrapper and
    // the registered SQL function. The multi-partition group-by exercises
    // the partial-update + heap-merge path, not just a single buffer.
    val viaCol = ev.repartition(7)
      .groupBy("event_type").agg(
        org.apache.spark.sql.graft.AggregateExpressions
          .approxPctDet(col("h"), col("event_id"), col("value"), 0.5, k).as("p50"),
        org.apache.spark.sql.graft.AggregateExpressions
          .approxPctDet(col("h"), col("event_id"), col("value"), 0.9, k).as("p90"))
      .as[(String, Double, Double)].collect().sortBy(_._1).toList
    graft.GraftExtensions.register(spark)
    ev.createOrReplaceTempView("qagg_spec_events")
    val viaSql = spark.sql(s"""
        SELECT event_type,
          approx_pct_det(h, event_id, value, CAST(0.5 AS DOUBLE), $k) AS p50,
          approx_pct_det(h, event_id, value, CAST(0.9 AS DOUBLE), $k) AS p90
        FROM qagg_spec_events GROUP BY event_type""")
      .as[(String, Double, Double)].collect().sortBy(_._1).toList
    def bits(l: List[(String, Double, Double)]) = l.map(t => (t._1,
      java.lang.Double.doubleToRawLongBits(t._2),
      java.lang.Double.doubleToRawLongBits(t._3)))
    assert(want.nonEmpty && bits(viaCol) == bits(want), s"col path: $viaCol vs $want")
    assert(bits(viaSql) == bits(want), s"sql path: $viaSql vs $want")
    // Contracts: an all-null group returns null; k bounds the sample.
    val nulls = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v")
      .select(lit(0L).as("h"), col("id"), col("v"))
    assert(nulls.agg(org.apache.spark.sql.graft.AggregateExpressions
      .approxPctDet(col("h"), col("id"), col("v"), 0.5, 4)).head().isNullAt(0))
    // k=1 keeps only the smallest (hash, id) row's value at every p.
    val tiny = Seq((10L, 1L, 5.0), (1L, 2L, 9.0), (7L, 3L, 2.0)).toDF("h", "id", "v")
    val one = tiny.agg(org.apache.spark.sql.graft.AggregateExpressions
      .approxPctDet(col("h"), col("id"), col("v"), 0.9, 1)).head().getDouble(0)
    assert(one == 9.0, s"k=1 must keep the min-hash row (got $one)")
  }

  test("topk_det aggregate matches the rank-window idiom exactly") {
    import spark.implicits._
    import graft.sources.Tables
    val agg = org.apache.spark.sql.graft.AggregateExpressions
    val o = Tables.orders(spark, SparkTestSession.sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("score"))
    // Window reference: ids in (score DESC, id) order, first 3.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("score"), col("o_orderkey"))
    val want = o.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.collect_list(
        struct(col("rk"), col("o_orderkey"))).as("xs"))
      .select(col("o_custkey"),
        expr("transform(array_sort(xs), x -> x.o_orderkey)").as("ids"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toList
    // Multi-partition group-by: exercises partial update + heap merge.
    val got = o.repartition(7).groupBy("o_custkey")
      .agg(agg.topkDet(col("score"), col("o_orderkey"), 3).as("ids"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toList
    assert(want.nonEmpty && got == want)
    // Order-reversing key contracts: negative scores, both zeros, and
    // NaN-greatest all rank like a (score DESC, id ASC) sort.
    val tricky = Seq(
      (1L, -1.0), (2L, -2.0), (3L, 0.0), (4L, -0.0), (5L, Double.NaN),
      (6L, Double.PositiveInfinity), (7L, Double.NegativeInfinity))
      .toDF("id", "score")
    val ids = tricky.agg(agg.topkDet(col("score"), col("id"), 7))
      .head().getSeq[Long](0).toList
    assert(ids == List(5L, 6L, 3L, 4L, 1L, 2L, 7L), s"got $ids")
    // Regression pin for the NaN-canonicalization fix (r11, commit
    // 12a1039): a SIGN-BIT NaN payload — the bit pattern parquet can
    // deliver — has raw bits BELOW -Inf, so the pre-fix raw-bits key
    // ranked it least instead of NaN-greatest. doubleToLongBits must
    // canonicalize it to rank alongside canonical NaN (ties by id).
    val signBitNaN = java.lang.Double.longBitsToDouble(0xFFF8000000000001L)
    assert(signBitNaN.isNaN, "crafted bits must still be a NaN")
    val payload = Seq(
      (1L, signBitNaN), (2L, Double.NaN), (3L, Double.PositiveInfinity),
      (4L, Double.NegativeInfinity), (5L, -0.0), (6L, 0.0))
      .toDF("id", "score")
    val pids = payload.agg(agg.topkDet(col("score"), col("id"), 6))
      .head().getSeq[Long](0).toList
    assert(pids == List(1L, 2L, 3L, 5L, 6L, 4L), s"got $pids")
    // All-null group -> empty array, never null.
    val nulls = Seq((1L, Option.empty[Double])).toDF("id", "score")
    assert(nulls.agg(agg.topkDet(col("score"), col("id"), 3))
      .head().getSeq[Long](0).isEmpty)
  }
}
