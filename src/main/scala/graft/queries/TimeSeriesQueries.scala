package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConfig
import graft.operators.{Anomaly, TimeSeriesOps => TS}
import graft.functions.CleanFunctions
import graft.functions.CleanFunctions.{epochUs, safeDiv}
import graft.sources.Tables

/** Driver-verified time-series queries over the `events` table
  * (user_id = series key, ts = time index, value = metric) plus their
  * DuckDB oracle SQL. Oracle-parity rules are in SURVEY.md §4: identical
  * aliases, floats rounded to 4dp on both sides, integers as BIGINT,
  * deterministic ORDER BY everywhere.
  */
object TimeSeriesQueries {

  private val K   = Seq("user_id")
  private val Ord = Seq("ts", "event_id")
  /** SQL window body shared by most oracles. */
  private val W = "PARTITION BY user_id ORDER BY ts, event_id"

  /** The non-null events table itself — the oracle for replays whose
    * output contract is "reproduce the input exactly once"
    * (streaming_dedup, streaming_sink).
    */
  private lazy val EventsReproductionOracleSql: String =
    s"""SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id,
       |event_type, value FROM events WHERE value IS NOT NULL
       |ORDER BY event_id""".stripMargin

  /** Run-length episode islands over the |z|>2 flag — shared by the batch
    * `ts_alert_episodes` and the streaming replay `streaming_episodes`
    * oracles so the two checks can never drift apart.
    */
  private lazy val AlertEpisodesOracleSql: String =
    s"""WITH f AS (SELECT event_id, user_id, ts, epoch_us(ts) AS tsu,
       |  CASE WHEN abs((value - ${graft.functions.CleanFunctions.exactMeanSql("value", "OVER u")}) / nullif(stddev_samp(value) OVER u, 0)) > 2.0
       |       THEN 1 ELSE 0 END AS flag
       |  FROM events WINDOW u AS (PARTITION BY user_id)),
       |g AS (SELECT *, CASE WHEN lag(flag) OVER w IS NULL OR flag <> lag(flag) OVER w THEN 1 ELSE 0 END AS chg
       |  FROM f WINDOW w AS ($W)),
       |h AS (SELECT *, sum(chg) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM g)
       |SELECT user_id, count(*) AS n_events, min(tsu) AS start_us, max(tsu) AS end_us
       |FROM h WHERE flag = 1 GROUP BY user_id, grp ORDER BY user_id, start_us""".stripMargin

  /** Nulls for the fill operators: treat 'click' rows as missing. */
  private def withNulled(df: DataFrame): DataFrame =
    df.withColumn("value_n", when(col("event_type") === "click", lit(null)).otherwise(col("value")))
  private val nulledSql = "CASE WHEN event_type = 'click' THEN NULL ELSE value END"

  /** LB fence for ts_dtw_lbkeogh: pairs whose DTW lower bound exceeds
    * this skip the exact DP (emit NULL dtw). Compared on the 4dp-rounded
    * bound so both engines agree at the boundary.
    */
  private val DtwLbTheta = 45.0

  /** Block-size fence for ts_dtw_lbkeogh's SAX-word candidate blocks:
    * a word shared by more than this many series is dropped whole (the
    * dedup df-fence posture), bounding the pair stage at
    * O(DtwMaxBlock × series), never corpus².
    */
  private val DtwMaxBlock = 64L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_time_features" -> { (s, d) =>
      TS.addTimeFeatures(Tables.events(s, d), "ts")
        .select("event_id", "hour", "dayofweek", "dayofmonth", "dayofyear",
          "month", "year", "quarter", "weekofyear", "is_weekend")
        .orderBy("event_id")
    },

    "ts_lag_features" -> { (s, d) =>
      TS.addLags(Tables.events(s, d), K, Ord, "value", Seq(1, 2, 3, 24))
        .select("event_id", "value", "value_lag_1", "value_lag_2", "value_lag_3", "value_lag_24")
        .orderBy("event_id")
    },

    "ts_rolling_features" -> { (s, d) =>
      TS.addRolling(Tables.events(s, d), K, Ord, "value", Seq(3, 24))
        .select(col("event_id"),
          col("value_roll_mean_3h").as("roll_mean_3h"),
          graft.functions.CleanFunctions.round4(col("value_roll_std_3h")).as("roll_std_3h"),
          col("value_roll_min_3h").as("roll_min_3h"),
          col("value_roll_max_3h").as("roll_max_3h"),
          col("value_roll_mean_24h").as("roll_mean_24h"),
          graft.functions.CleanFunctions.round4(col("value_roll_std_24h")).as("roll_std_24h"),
          col("value_roll_min_24h").as("roll_min_24h"),
          col("value_roll_max_24h").as("roll_max_24h"))
        .orderBy("event_id")
    },

    "ts_fill_ffill" -> { (s, d) =>
      TS.fill(withNulled(Tables.events(s, d)), K, Ord, "value_n", "ffill")
        .select(col("event_id"), col("value_n").as("filled"))
        .orderBy("event_id")
    },

    "ts_fill_bfill" -> { (s, d) =>
      TS.fill(withNulled(Tables.events(s, d)), K, Ord, "value_n", "bfill")
        .select(col("event_id"), col("value_n").as("filled"))
        .orderBy("event_id")
    },

    "ts_fill_stats" -> { (s, d) =>
      val base = withNulled(Tables.events(s, d))
      val m  = TS.fill(base, K, Ord, "value_n", "mean").withColumnRenamed("value_n", "f_mean")
      val md = TS.fill(base, K, Ord, "value_n", "median")
      val z  = TS.fill(base, K, Ord, "value_n", "zero")
      m.select(col("event_id"), col("f_mean").as("filled_mean"))
        .join(md.select(col("event_id"), col("value_n").as("filled_median")), "event_id")
        .join(z.select(col("event_id"), col("value_n").as("filled_zero")), "event_id")
        .orderBy("event_id")
    },

    "ts_dedup_first" -> { (s, d) =>
      val ev = Tables.events(s, d)
      TS.dedupIndex(ev, K, date_trunc("hour", col("ts")), Ord, "first")
        .select(col("event_id"), col("user_id"),
          epochUs(date_trunc("hour", col("ts"))).as("bucket_us"))
        .orderBy("event_id")
    },

    "ts_dedup_last" -> { (s, d) =>
      val ev = Tables.events(s, d)
      TS.dedupIndex(ev, K, date_trunc("hour", col("ts")), Ord, "last")
        .select(col("event_id"), col("user_id"),
          epochUs(date_trunc("hour", col("ts"))).as("bucket_us"))
        .orderBy("event_id")
    },

    "ts_dedup_mean" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("bucket_us", epochUs(date_trunc("hour", col("ts"))))
      TS.dedupIndexMean(ev, K, col("bucket_us"), "bucket_us", Seq("value"), Seq("event_id"))
        .select(col("user_id"), col("bucket_us"),
          col("value").as("mean_value"), col("event_id").as("first_event"))
        .orderBy("user_id", "bucket_us")
    },

    "ts_resample_1h" -> { (s, d) =>
      TS.resample(Tables.events(s, d), K, "ts", "hour", "value")
        .select(col("user_id"), epochUs(col("bucket")).as("bucket_us"), col("n"),
          col("avg_value"), col("min_value"), col("max_value"), col("sum_value"))
        .orderBy("user_id", "bucket_us")
    },

    // Time-WEIGHTED hourly resample (step-function hold durations) — the
    // irregular-series downsample ts_resample_1h's plain mean gets wrong
    // when samples arrive unevenly. See TimeSeriesOps.twaResample.
    "ts_twa_resample" -> { (s, d) =>
      TS.twaResample(Tables.events(s, d), K, "ts", Ord, "value")
        .select(col("user_id"), epochUs(col("bucket")).as("bucket_us"), col("n"),
          CleanFunctions.round4(col("twa")).as("twa"))
        .orderBy("user_id", "bucket_us")
    },

    "ts_scale_minmax" -> { (s, d) =>
      TS.minMaxScale(Tables.events(s, d), K, "value", "scaled")
        .select(col("event_id"), graft.functions.CleanFunctions.round4(col("scaled")).as("scaled"))
        .orderBy("event_id")
    },

    "ts_scale_standard" -> { (s, d) =>
      TS.standardScale(Tables.events(s, d), K, "value", "scaled")
        .select(col("event_id"), graft.functions.CleanFunctions.round4(col("scaled")).as("scaled"))
        .orderBy("event_id")
    },

    "ts_zscore_anomaly" -> { (s, d) =>
      Anomaly.zscore(Tables.events(s, d), K, "value")
        .select(col("event_id"), graft.functions.CleanFunctions.round4(col("z")).as("z"), col("is_anomaly"))
        .orderBy("event_id")
    },

    "ts_rolling_zscore" -> { (s, d) =>
      Anomaly.rollingZscore(Tables.events(s, d), K, Ord, "value")
        .select(col("event_id"), graft.functions.CleanFunctions.round4(col("z")).as("z"), col("is_anomaly"))
        .orderBy("event_id")
    },

    "ts_iqr_anomaly" -> { (s, d) =>
      Anomaly.iqr(Tables.events(s, d), K, "value")
        .select(col("event_id"), graft.functions.CleanFunctions.round6(col("lo")).as("lo"), graft.functions.CleanFunctions.round6(col("hi")).as("hi"),
          col("is_anomaly"))
        .orderBy("event_id")
    },

    // Winsorize: clamp value into its per-series [p05, p95] band — the
    // robust-preprocessing step before scaling (clamp, where IQR flags).
    "ts_winsorize" -> { (s, d) =>
      Anomaly.winsorize(Tables.events(s, d), K, "value")
        .select(col("event_id"),
          graft.functions.CleanFunctions.round4(col("value_wins")).as("value_wins"),
          col("is_clamped"))
        .orderBy("event_id")
    },

    "ts_mad_anomaly" -> { (s, d) =>
      Anomaly.mad(Tables.events(s, d), K, "value")
        .select(col("event_id"),
          graft.functions.CleanFunctions.round4(col("rz")).as("rz"), col("is_anomaly"))
        .orderBy("event_id")
    },

    // Majority vote of the three global detectors (z / IQR / MAD) —
    // 2-of-3 agreement trades any single detector's failure mode for
    // consensus. Votes surfaced for auditability.
    "ts_anomaly_ensemble" -> { (s, d) =>
      Anomaly.ensemble(Tables.events(s, d), K, "value")
        .select(col("event_id"),
          coalesce(col("vote_z"), lit(0L)).as("vote_z"),
          coalesce(col("vote_iqr"), lit(0L)).as("vote_iqr"),
          coalesce(col("vote_mad"), lit(0L)).as("vote_mad"),
          col("votes"), col("is_anomaly"))
        .orderBy("event_id")
    },

    // Linear TIME-weighted interpolation of the nulled gaps (pandas
    // interpolate(method='time')): interior nulls get the time-weighted
    // line between nearest observations; leading/trailing stay null.
    "ts_interpolate" -> { (s, d) =>
      TS.interpolateTime(withNulled(Tables.events(s, d)), K, "ts", Ord, "value_n", "interp")
        .select(col("event_id"), CleanFunctions.round4(col("interp")).as("interp"))
        .orderBy("event_id")
    },

    // Classical additive decomposition (statsmodels seasonal_decompose):
    // centered 25-row MA trend, per-(series, hour-of-day) seasonal
    // component centered to ~0, residual. The EDA primitive behind the
    // reference's seasonality notebooks.
    "ts_decompose" -> { (s, d) =>
      TS.decompose(Tables.events(s, d), K, Ord, "value", hour(col("ts")), trendWin = 25)
        .select(col("event_id"),
          CleanFunctions.round4(col("trend")).as("trend"),
          CleanFunctions.round4(col("seasonal")).as("seasonal"),
          CleanFunctions.round4(col("resid")).as("resid"))
        .orderBy("event_id")
    },

    "ts_sequences" -> { (s, d) =>
      val ev = Tables.events(s, d).withColumn("vstr", format_string("%.2f", col("value")))
      TS.sequences(ev, K, Ord, "vstr", GraftConfig.SequenceLength)
        .select(col("event_id"), array_join(col("seq"), ",").as("seq"))
        .orderBy("event_id")
    },

    "ts_recon_error" -> { (s, d) =>
      Anomaly.reconstructionError(Tables.events(s, d), K, Ord, "value")
        .select(col("event_id"),
          graft.functions.CleanFunctions.round4(col("seq_err")).as("seq_err"), col("is_anomaly"))
        .orderBy("event_id")
    },

    // Quantile-threshold detector on the same reconstruction scores:
    // flag sequences above the per-series p95 error (exact interpolated
    // percentile here, approx_percentile at scale — see Anomaly).
    "ts_recon_quantile" -> { (s, d) =>
      Anomaly.reconstructionErrorQuantile(Tables.events(s, d), K, Ord, "value", q = 0.95)
        .select(col("event_id"),
          graft.functions.CleanFunctions.round4(col("seq_err")).as("seq_err"),
          graft.functions.CleanFunctions.round6(col("thr")).as("thr"), col("is_anomaly"))
        .orderBy("event_id")
    },

    "ts_event_counts" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(epochUs(date_trunc("hour", col("ts"))).as("bucket_us"), col("event_type"))
        .agg(count(lit(1)).as("n"), graft.functions.CleanFunctions.exactSum(col("value")).as("sum_value"))
        .orderBy("bucket_us", "event_type")
    },

    // HOPPING (sliding) window aggregation — the smoothing variant
    // tumbling buckets can't give (each event lands in len/slide
    // overlapping windows; Spark's window() TVF expands them inline, so
    // this is still ONE grouped agg with map-side partials, fanout
    // bounded by the constant len/slide=2). The oracle enumerates the
    // same epoch-aligned window starts arithmetically.
    "ts_hopping_counts" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
        .select(epochUs(col("w.start")).as("window_start_us"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("window_start_us", "event_type")
    },

    // STREAMING REPLAY as a driver-checkable entry: the events table is
    // fed through a MemoryStream into the REAL Structured Streaming
    // operator (StreamingAnomaly.windowedCounts — watermark + append-mode
    // tumbling agg), a far-future punctuation event closes every real
    // window, and the memory sink's emitted rows ARE the result the
    // DuckDB oracle hash-checks against the batch aggregation. This
    // proves end-to-end stream/batch equivalence (watermark semantics,
    // append-mode emission, decimal state merge) under the driver's
    // exact-hash gate, not just in specs. The MemoryStream feed is the
    // replay harness, driver-collected BY DESIGN for determinism;
    // production ingest is a file/Kafka readStream over the identical
    // operator. Null-valued events are excluded so the case-class feed
    // and the SQL twin agree row-for-row.
    "streaming_replay" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      val maxUs = rows.iterator.map(e => StreamingAnomaly.tsUs(e.ts)).max
      StreamingAnomaly.replayToSink(s, rows, "graft_streaming_replay",
          Some(StreamingAnomaly.punctuationEvent(maxUs + 10L * 86400L * 1000000L)))(
          ds => StreamingAnomaly.windowedCounts(ds.toDF()))
        .select(epochUs(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"),
          CleanFunctions.round4(col("sum_value")).as("sum_value"))
        .orderBy("window_start_us", "event_type")
    },

    // STREAMING HOPPING-window aggregation, driver-verified: the
    // overlapping-window state shape tumbling windows never exercise
    // (each event updates len/slide open windows; every window still
    // emits exactly once at watermark close). Same replay harness and
    // DECIMAL emission contract as streaming_replay; the oracle is the
    // batch hopping reconstruction restricted to the non-null feed.
    "streaming_hopping" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      val maxUs = rows.iterator.map(e => StreamingAnomaly.tsUs(e.ts)).max
      StreamingAnomaly.replayToSink(s, rows, "graft_streaming_hopping",
          Some(StreamingAnomaly.punctuationEvent(maxUs + 10L * 86400L * 1000000L)))(
          ds => StreamingAnomaly.hoppingCounts(ds.toDF()))
        .select(epochUs(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"),
          CleanFunctions.round4(col("sum_value")).as("sum_value"))
        .orderBy("window_start_us", "event_type")
    },

    // EXACTLY-ONCE PARQUET SINK, driver-verified: the events table fed
    // through the foreachBatch + batch-id-keyed dynamic-partition-
    // overwrite sink in TWO micro-batches (two batch_id partitions, the
    // idempotent-write path), then read back — the files must reproduce
    // the table exactly once. The kill/restart replay (the at-least-once
    // → exactly-once half) is asserted by the checkpoint-restart spec.
    "streaming_sink" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      val (h1, h2) = rows.splitAt(rows.length / 2)
      val ms = MemoryStream[Event](s)
      val out = StreamingAnomaly.replayTempDir("graft-sink-out")
      val ckpt = StreamingAnomaly.replayTempDir("graft-sink-ckpt")
      val q = StreamingAnomaly.exactlyOnceParquetSink(ms.toDF(), out, ckpt)
      try {
        ms.addData(h1); q.processAllAvailable()
        ms.addData(h2); q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(out)
        .select(col("event_id"), epochUs(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },

    // Streaming ALERT EPISODES, driver-verified: flags computed batch
    // side with the ts_alert_episodes rule (|z|>2 per series — integer
    // decisions both engines agree on), then run-length-grouped by the
    // ONE-open-episode-per-key flatMapGroupsWithState fold. A trailing
    // flag=0 closer per user breaks every open run so all episodes emit;
    // closers are flag=0, so they can never create an episode. The
    // oracle is the SAME islands SQL as the batch entry — shared val.
    "streaming_episodes" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{FlaggedEvent, StreamingAnomaly}
      import org.apache.spark.sql.expressions.Window
      val keyW = Window.partitionBy("user_id")
      val z = safeDiv(col("value") - CleanFunctions.exactMeanOver(col("value"), keyW),
        stddev_samp(col("value")).over(keyW))
      val e = Tables.events(s, d)
      val flagged = e
        .withColumn("flag", coalesce((abs(z) > lit(2.0)).cast("long"), lit(0L)))
        .select(col("event_id"), col("ts"), col("user_id"), col("flag"))
        .as[FlaggedEvent].collect().toSeq
      val maxUs = flagged.iterator.map(f => StreamingAnomaly.tsUs(f.ts)).max
      val closers = flagged.map(_.user_id).distinct.map(u =>
        FlaggedEvent(-1L, new java.sql.Timestamp(maxUs / 1000L + 3600L * 1000L), u, 0L))
      StreamingAnomaly.replayToSink(s, flagged ++ closers,
          "graft_streaming_episodes", None)(
          ds => StreamingAnomaly.alertEpisodes(ds).toDF())
        .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
        .orderBy("user_id", "start_us")
    },

    // Watermarked stream-stream INTERVAL JOIN, driver-verified: the
    // events table replayed on BOTH sides (two independent MemoryStreams
    // — the general two-source shape, no self-join special case), each
    // left event enriched with same-key rows whose time falls in
    // [ts − 1h, ts]. Inner join: every matched pair emits in the batch
    // both sides arrive, so one replay batch emits the full pair set,
    // hash-checked against the plain SQL interval join.
    "streaming_interval_join" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      val msL = MemoryStream[Event](s)
      val msR = MemoryStream[Event](s)
      StreamingAnomaly.sinkAndDrain(s, "graft_streaming_interval_join",
          StreamingAnomaly.intervalJoin(msL.toDF(), msR.toDF())) { q =>
        msL.addData(rows); msR.addData(rows)
        q.processAllAvailable()
      }
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"),
          col("matched_id"), epochUs(col("r_ts")).as("r_ts_us"), col("r_value"))
        .orderBy("event_id", "matched_id")
    },

    // Streaming stateful per-key rolling z-score, driver-verified: the
    // flatMapGroupsWithState fold (trailing-24 buffer per key) replayed
    // over the events table; its in-fold moments go through the same
    // DECIMAL(18,6) quantization as the batch exactSum, so the emitted z
    // hash-matches a momentStd window oracle exactly — warm-up (<2
    // priors) and zero-variance frames null out identically.
    "streaming_zscore" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      StreamingAnomaly.replayToSink(s, rows, "graft_streaming_zscore", None)(
          ds => StreamingAnomaly.rollingZscore(ds).toDF())
        .select(col("event_id"), CleanFunctions.round4(col("z")).as("z"),
          col("is_anomaly"))
        .orderBy("event_id")
    },

    // Streaming EXACT DEDUP, driver-verified: the events table is fed
    // TWICE in one micro-batch through dropDuplicatesWithinWatermark —
    // the state store must swallow every second copy, so the emitted
    // rows hash-match the plain table. One batch BY DESIGN: the
    // operator's contract only catches duplicates arriving within the
    // watermark delay, and a replayed second batch would advance the
    // watermark past the older half of the month-long table (the spec
    // covers the cross-batch case on a controlled sequence).
    "streaming_dedup" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      StreamingAnomaly.replayToSink(s, rows ++ rows, "graft_streaming_dedup",
          None)(ds => StreamingAnomaly.dedupEvents(ds.toDF()))
        .select(col("event_id"), epochUs(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },

    // Streaming SESSIONIZATION, driver-verified the same way: the native
    // session_window + watermark operator replayed over the events table,
    // all real sessions closed by the punctuation, emitted rows
    // hash-checked against a batch gap-islands reconstruction in the
    // oracle (session end = last event + 30 min gap, session_window
    // semantics). Exercises streaming state MERGE (sessions extend and
    // coalesce as events arrive), which tumbling windows never do.
    "streaming_sessionize" -> { (s, d) =>
      import s.implicits._
      import graft.streaming.{Event, StreamingAnomaly}
      val rows = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event].collect().toSeq
      val maxUs = rows.iterator.map(e => StreamingAnomaly.tsUs(e.ts)).max
      StreamingAnomaly.replayToSink(s, rows, "graft_streaming_sessionize",
          Some(StreamingAnomaly.punctuationEvent(maxUs + 10L * 86400L * 1000000L)))(
          ds => StreamingAnomaly.sessionAggregates(ds.toDF()))
        .select(col("user_id"),
          epochUs(col("session_start")).as("session_start_us"),
          epochUs(col("session_end")).as("session_end_us"),
          col("n_events"),
          CleanFunctions.round4(col("sum_value")).as("sum_value"))
        .orderBy("user_id", "session_start_us")
    },

    // Seasonal-naive forecast backtest: predict value[t] = value[t-24]
    // (the daily-cycle baseline every forecasting eval starts from) and
    // score per-series MAE / RMSE / MAPE — the model-eval loop the
    // reference runs driver-side, as one window + one grouped aggregate.
    "ts_backtest_naive" -> { (s, d) =>
      TS.backtestSeasonalNaive(Tables.events(s, d), K, Ord, "value", season = 24)
        .select(col("user_id"), col("n"),
          CleanFunctions.round4(col("mae")).as("mae"),
          CleanFunctions.round4(col("rmse")).as("rmse"),
          CleanFunctions.round4(col("mape")).as("mape"))
        .orderBy("user_id")
    },

    // Rank normalization: percent_rank + cume_dist of value within its
    // series (the outlier-robust alternative to min-max scaling; ties
    // broken by event_id so both engines rank identically).
    "ts_percent_rank" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("value", "event_id")
      Tables.events(s, d)
        .select(col("event_id"),
          CleanFunctions.round6(percent_rank().over(w)).as("pct_rank"),
          CleanFunctions.round6(cume_dist().over(w)).as("cume"))
        .orderBy("event_id")
    },

    // Deadband (report-by-exception) compression: keep a sample only when
    // it moved >= eps from the PREVIOUS sample (or starts the series) —
    // the standard IoT/historian ingest shrink. Consecutive-delta
    // variant (vs last-kept, which is recursive): one lag per series.
    "ts_delta_compress" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val delta = col("value") - lag(col("value"), 1).over(w)
      Tables.events(s, d)
        .withColumn("delta", delta)
        .filter(col("delta").isNull || abs(col("delta")) >= 2.0)
        .select(col("event_id"), col("value"),
          CleanFunctions.round4(col("delta")).as("delta"))
        .orderBy("event_id")
    },

    "events_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").try_cast(org.apache.spark.sql.types.LongType).as("k"))
        .orderBy("event_id")
    },

    // Autocorrelation at lags 1 and 24 per series — the seasonality
    // probe for hourly data (a daily cycle shows as an acf_24 peak).
    // Pearson over (x_t, x_{t-k}) pairs from exact DECIMAL moments in
    // ONE pass: lag columns ride the series sort, moments are
    // map-side-combinable conditional sums.
    // Full autocorrelation function, lags 1..12, LONG format (one row per
    // (series, lag)) — the correlogram a seasonality/AR-order analysis
    // actually plots; same clamped exact-moment machinery as ts_acf, 72
    // aggregate columns in ONE grouped pass, stacked to rows at the end.
    // r16 shape: the historical wide form (72 aggregate columns over 12
    // lag columns + 12 momentCorr trees) fell out of whole-stage codegen
    // (HashAggregate carried no codegen id) and its interpreted first
    // evaluation paid ~20 s of JIT warm-up inside ts_ess; stacking the
    // (x, y_k) pairs long FIRST leaves one 6-aggregate group-by and ONE
    // momentCorr expression — codegen-friendly and 12x fewer expression
    // trees. Group set and sums are unchanged: stack emits all 12 lag
    // rows per input row (null y rows included, so short series still
    // produce their null-acf rows), and each per-(user, lag) decimal sum
    // adds exactly the terms the wide form's when(valid, ...) casts
    // added — DECIMAL addition is exact and order-blind, so every corr
    // double is bit-identical. Oracle SQL unchanged.
    "ts_acf_full" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dec = DecimalType(28, 6)
      val lags = 1 to 12
      // spreadKeyed: the 12-lag window + decimal sums are compute-dense
      // per row, so byte-based AQE coalescing starves the stage (2 of 32
      // cores at sf0.1, measured 3.06 s -> 1.43 s); see Tables.spreadKeyed.
      val base = lags.foldLeft(Tables.spreadKeyed(Tables.events(s, d), col("user_id"))) { (df, k) =>
        df.withColumn(s"y$k", lag(col("value"), k).over(w))
      }
      val long = base.select(col("user_id"), col("value").as("x"),
        expr("stack(12, " +
          lags.map(k => s"CAST($k AS BIGINT), y$k").mkString(", ") + ") AS (lag_k, y)"))
      val valid = col("y").isNotNull
      long.groupBy("user_id", "lag_k")
        .agg(count(when(valid, 1)).cast("double").as("n"),
          sum(when(valid, col("x")).cast(dec)).cast("double").as("sx"),
          sum(when(valid, col("y")).cast(dec)).cast("double").as("sy"),
          sum(when(valid, col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
          sum(when(valid, col("x") * col("x")).cast(dec)).cast("double").as("sxx"),
          sum(when(valid, col("y") * col("y")).cast(dec)).cast("double").as("syy"))
        .select(col("user_id"), col("lag_k"),
          CleanFunctions.round4(CleanFunctions.momentCorr(
            col("n"), col("sx"), col("sy"),
            col("sxy"), col("sxx"), col("syy"))).as("acf"))
        .orderBy("user_id", "lag_k")
    },

    "ts_acf" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dec = DecimalType(28, 6)
      def moments(k: Int): Seq[org.apache.spark.sql.Column] = {
        val x = col("value")
        val y = col(s"y$k")
        val valid = y.isNotNull
        Seq(
          count(when(valid, 1)).cast("double").as(s"n$k"),
          sum(when(valid, x).cast(dec)).cast("double").as(s"sx$k"),
          sum(when(valid, y).cast(dec)).cast("double").as(s"sy$k"),
          sum(when(valid, x * y).cast(dec)).cast("double").as(s"sxy$k"),
          sum(when(valid, x * x).cast(dec)).cast("double").as(s"sxx$k"),
          sum(when(valid, y * y).cast(dec)).cast("double").as(s"syy$k"))
      }
      // Shared clamped+guarded moment formula: a stuck-constant series
      // yields null, not NaN/DIVIDE_BY_ZERO/sqrt(<0) (see momentCorr).
      def corrOf(k: Int) = CleanFunctions.round4(CleanFunctions.momentCorr(
        col(s"n$k"), col(s"sx$k"), col(s"sy$k"),
        col(s"sxy$k"), col(s"sxx$k"), col(s"syy$k")))
      val aggs = moments(1) ++ moments(24)
      Tables.events(s, d)
        .withColumn("y1", lag(col("value"), 1).over(w))
        .withColumn("y24", lag(col("value"), 24).over(w))
        .groupBy("user_id")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("user_id"), corrOf(1).as("acf_1"), corrOf(24).as("acf_24"))
        .orderBy("user_id")
    },

    // Change-point score: sliding two-sample mean shift — |mean of the
    // next w rows - mean of the past w rows| / series stddev. Recursive
    // CUSUM isn't window-expressible; the two-window test is, and both
    // windows ride the same per-key sort.
    "ts_changepoint" -> { (s, d) =>
      Anomaly.changePointScore(Tables.events(s, d), K, Ord, "value", win = 24)
        .select(col("event_id"), CleanFunctions.round4(col("cp_score")).as("cp_score"))
        .orderBy("event_id")
    },

    // Partial autocorrelations at lags 1-3 via the Durbin-Levinson
    // closed form (AR model-order identification — pacf cuts off at the
    // true order where acf only decays): φ₁₁=ρ₁, φ₂₂=(ρ₂−ρ₁²)/(1−ρ₁²),
    // φ₃₃ from the level-2 coefficients. ρ's come from the ts_acf moment
    // machinery (DECIMAL sums, clamped corr, rounded 4dp) so every
    // downstream arithmetic step runs on identical doubles; degenerate
    // denominators null out via nullif.
    "ts_pacf" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dec = DecimalType(28, 6)
      def moments(k: Int): Seq[org.apache.spark.sql.Column] = {
        val x = col("value"); val y = col(s"y$k"); val valid = y.isNotNull
        Seq(
          count(when(valid, 1)).cast("double").as(s"n$k"),
          sum(when(valid, x).cast(dec)).cast("double").as(s"sx$k"),
          sum(when(valid, y).cast(dec)).cast("double").as(s"sy$k"),
          sum(when(valid, x * y).cast(dec)).cast("double").as(s"sxy$k"),
          sum(when(valid, x * x).cast(dec)).cast("double").as(s"sxx$k"),
          sum(when(valid, y * y).cast(dec)).cast("double").as(s"syy$k"))
      }
      def corrOf(k: Int) = CleanFunctions.round4(CleanFunctions.momentCorr(
        col(s"n$k"), col(s"sx$k"), col(s"sy$k"),
        col(s"sxy$k"), col(s"sxx$k"), col(s"syy$k")))
      val aggs = moments(1) ++ moments(2) ++ moments(3)
      Tables.events(s, d)
        .withColumn("y1", lag(col("value"), 1).over(w))
        .withColumn("y2", lag(col("value"), 2).over(w))
        .withColumn("y3", lag(col("value"), 3).over(w))
        .groupBy("user_id")
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("r1", corrOf(1)).withColumn("r2", corrOf(2))
        .withColumn("r3", corrOf(3))
        .withColumn("p2", (col("r2") - col("r1") * col("r1")) /
          nullif(lit(1.0) - col("r1") * col("r1"), lit(0.0)))
        .withColumn("p21", col("r1") * (lit(1.0) - col("p2")))
        .withColumn("p3",
          (col("r3") - col("p21") * col("r2") - col("p2") * col("r1")) /
            nullif(lit(1.0) - col("p21") * col("r1") - col("p2") * col("r2"), lit(0.0)))
        .select(col("user_id"), col("r1").as("pacf_1"),
          CleanFunctions.round4(col("p2")).as("pacf_2"),
          CleanFunctions.round4(col("p3")).as("pacf_3"))
        .orderBy("user_id")
    },

    // Change-point SEGMENTATION — the decision step on top of
    // ts_changepoint's per-row scores: per series pick the argmax-score
    // event (4dp-rounded score, event-id tie-break → identical pick on
    // both engines), then report the exact-DECIMAL means of the two
    // segments it induces and the level shift. One rank window over the
    // scored rows + one conditional-mean grouped pass.
    "ts_changepoint_segment" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val scored = Anomaly.changePointScore(Tables.events(s, d), K, Ord, "value", win = 24)
        .withColumn("cps", CleanFunctions.round4(col("cp_score")))
        .where(col("cps").isNotNull)
        .withColumn("tsu", epochUs(col("ts")))
      val w = Window.partitionBy("user_id").orderBy(desc("cps"), col("event_id"))
      val split = scored.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("user_id"), col("event_id").as("split_event"),
          col("tsu").as("split_tsu"), col("cps").as("cp_score"))
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("tsu", epochUs(col("ts")))
      def condMean(c: org.apache.spark.sql.Column) =
        CleanFunctions.exactSum(when(c, col("value"))) /
          count(when(c, col("value"))).cast("double")
      e.join(split, "user_id")
        .groupBy("user_id")
        .agg(max(col("split_event")).as("split_event"),
          max(col("cp_score")).as("cp_score"),
          CleanFunctions.round4(condMean(col("tsu") < col("split_tsu"))).as("pre_mean"),
          CleanFunctions.round4(condMean(col("tsu") >= col("split_tsu"))).as("post_mean"))
        .withColumn("shift", CleanFunctions.round4(col("post_mean") - col("pre_mean")))
        .orderBy("user_id")
    },

    // VARIANCE changepoint per series (ICSS / CUSUM-of-squares): the
    // mean-shift family (ts_changepoint, ts_cusum) is blind to a series
    // whose LEVEL holds but whose volatility regime breaks — the
    // centered-squares cumulative share D_k = C_k/C_T − k/T peaks where
    // the variance splits, and sqrt(n/2)·max|D| is the ICSS statistic
    // (1.358 asymptotic 5% critical value, the KS-family constant).
    // Parity: squares are 6dp-quantized and cumulated in exact DECIMAL
    // (order-blind, so the running sum needs no engine-matched fold),
    // ONE decimal→double cast per term, D_k 4dp-rounded BEFORE the
    // argmax so the peak choice is boundary-stable; sqrt is IEEE
    // exact-rounded on both engines. One ordered window pass + one
    // grouped argmax — the ts_changepoint plan shape at any scale.
    "ts_variance_changepoint" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val dec = DecimalType(28, 6)
      val keyW = Window.partitionBy("user_id")
      val ordW = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("diff", col("value") - CleanFunctions.exactMeanOver(col("value"), keyW))
        .withColumn("a", CleanFunctions.round6(col("diff") * col("diff")).cast(dec))
        .withColumn("ck", sum(col("a")).over(ordW))
        .withColumn("ct", sum(col("a")).over(keyW))
        .withColumn("k", row_number().over(ordW))
        .withColumn("n", count(lit(1)).over(keyW))
        .where(col("ct") > 0)
        .withColumn("dk", CleanFunctions.round4(
          col("ck").cast(DoubleType) / col("ct").cast(DoubleType) -
            col("k").cast(DoubleType) / col("n").cast(DoubleType)))
      val rkW = Window.partitionBy("user_id").orderBy(abs(col("dk")).desc, col("event_id"))
      e.withColumn("rk", row_number().over(rkW)).where(col("rk") === 1)
        .withColumn("icss_stat",
          CleanFunctions.round4(sqrt(col("n").cast(DoubleType) / lit(2.0)) * abs(col("dk"))))
        .select(col("user_id"), col("n"), col("event_id").as("split_event"),
          abs(col("dk")).as("d_max"), col("icss_stat"),
          (col("icss_stat") > lit(1.358)).cast("long").as("is_break"))
        .orderBy("user_id")
    },

    // Alert episodes: consecutive anomalous rows collapse into one
    // episode per series (run-length encoding via the change-flag +
    // cumulative-sum trick — same one-sort shape as sessionize). Turns
    // point flags into the alerts an operator actually pages on.
    "ts_alert_episodes" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val keyW = Window.partitionBy("user_id")
      val z = safeDiv(col("value") - CleanFunctions.exactMeanOver(col("value"), keyW),
        stddev_samp(col("value")).over(keyW))
      val flagged = Tables.events(s, d)
        .withColumn("tsu", epochUs(col("ts")))
        .withColumn("flag", coalesce((abs(z) > lit(2.0)).cast("long"), lit(0L)))
      Anomaly.alertEpisodes(flagged, K, Ord, "flag", "tsu")
        .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
        .orderBy("user_id", "start_us")
    },

    // Seasonal adjustment: the reference's domain is hourly energy load,
    // where the daily cycle dominates. Remove the per-(series, hour-of-
    // day) seasonal mean, z-score the residual per series — anomalies
    // are departures from the series' own seasonal shape, not from the
    // raw mean. Two window passes, both partitioned by key.
    "ts_seasonal_adjust" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val seasW = Window.partitionBy(col("user_id"), hour(col("ts")))
      val keyW = Window.partitionBy("user_id")
      val seasonal = graft.functions.CleanFunctions.exactMeanOver(col("value"), seasW)
      val withRes = Tables.events(s, d)
        .withColumn("seasonal_mean", seasonal)
        .withColumn("resid", col("value") - col("seasonal_mean"))
      val z = safeDiv(col("resid") - graft.functions.CleanFunctions.exactMeanOver(col("resid"), keyW),
        stddev_samp(col("resid")).over(keyW))
      withRes
        .select(col("event_id"),
          graft.functions.CleanFunctions.round4(col("seasonal_mean")).as("seasonal_mean"),
          graft.functions.CleanFunctions.round4(col("resid")).as("resid"),
          coalesce((abs(z) > GraftConfig.AnomalyThreshold).cast("long"), lit(0L)).as("is_anomaly"))
        .orderBy("event_id")
    },

    // Generalized-ESD iterative anomaly extraction (the Rosner test /
    // Twitter-AnomalyDetection core, 3 unrolled rounds): per round,
    // recompute mean/std over the REMAINING seasonal residuals, flag the
    // max-|z| point per series, remove it — iterative re-fitting is the
    // whole point (a single z pass lets one huge outlier MASK the
    // others by inflating std). Emits (series, round, event, z); the
    // ESD critical-value cut is the caller's (we emit the statistic).
    // Exact moments per round; ties broken on (round4 z, event_id).
    "ts_esd_anomalies" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DoubleType
      val seasW = Window.partitionBy(col("user_id"), hour(col("ts")))
      // spreadKeyed on user_id alone: HashPartitioning(user_id) satisfies
      // the (user_id, hour) clustering of seasW AND every per-user round
      // aggregate/window below, so the whole round chain inherits full
      // width from one exchange (see Tables.spreadKeyed).
      // localCheckpoint (r17): round 1 references res0 in two branches
      // (the moment aggregate and the ranked join), so the corpus-wide
      // seasonal window re-ran per branch — materialize the narrow
      // (event, series, residual) table once instead.
      val res0 = Tables.spreadKeyed(
          Tables.events(s, d).where(col("value").isNotNull), col("user_id"))
        .withColumn("r", graft.functions.CleanFunctions.round4(
          col("value") - graft.functions.CleanFunctions.exactMeanOver(col("value"), seasW)))
        .select("event_id", "user_id", "r")
        .localCheckpoint()
      def esdRound(i: Int, prev: DataFrame): (DataFrame, DataFrame) = {
        val m = prev.groupBy("user_id").agg(
          count(col("r")).cast(DoubleType).as("n"),
          CleanFunctions.exactSum(col("r")).as("sx"),
          CleanFunctions.exactSum(
            graft.functions.CleanFunctions.round4(col("r") * col("r"))).as("sxx"))
        // Cached: each round's ranked frame feeds BOTH its extraction
        // (rk=1) and the next round's survivors (rk>1) — uncached, round
        // 3's lineage replays rounds 1-2's join+window per consumer and
        // the final union re-executes every earlier round once more
        // (6 window passes instead of 3, measured 4.2s -> 2.3s at sf0.1).
        val ranked = prev.join(m, "user_id")
          .withColumn("z", graft.functions.CleanFunctions.round4(
            safeDiv(abs(col("r") - col("sx") / col("n")),
              CleanFunctions.momentStd(col("n"), col("sx"), col("sxx")))))
          .where(col("z").isNotNull)
          .withColumn("rk", row_number().over(
            Window.partitionBy("user_id").orderBy(desc("z"), col("event_id"))))
          .cache()
        (ranked.where(col("rk") === 1)
           .select(col("user_id"), lit(i.toLong).as("esd_round"),
             col("event_id"), col("z")),
         ranked.where(col("rk") > 1).select("event_id", "user_id", "r"))
      }
      val (c1, s2) = esdRound(1, res0)
      val (c2, s3) = esdRound(2, s2)
      val (c3, _)  = esdRound(3, s3)
      c1.union(c2).union(c3).orderBy("user_id", "esd_round")
    },

    // Seasonal-HYBRID ESD (Twitter's S-H-ESD, Hochenbaum et al. 2017) —
    // ts_esd_anomalies' robust sibling and the variant production
    // anomaly systems actually deploy: the seasonal component is the
    // per-(series, hour-of-day) MEDIAN (a 3σ spike inflates a seasonal
    // MEAN and masks itself; it cannot drag the median), and each ESD
    // round's test statistic is |r − median(r)| / (1.4826·MAD(r))
    // instead of the mean/σ z — so round 1's own outlier can't widen
    // the denominator it is tested against. Same 3-round
    // extract-and-retest scaffolding, same per-round cache rationale;
    // medians are Spark's exact `median` aggregate, which DuckDB's
    // median matches (the ts_mad_anomaly precedent). MAD = 0 series
    // yield null z and drop from the round, the documented MAD
    // degeneracy the ensemble entry trades away.
    "ts_shesd_anomalies" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val seasW = Window.partitionBy(col("user_id"), hour(col("ts")))
      // Same spreadKeyed rationale as ts_esd_anomalies above.
      // localCheckpoint (r17): round 1 references res0 in three branches
      // (per-series median, the MAD aggregate via withMed, the ranked
      // join), so the corpus-wide seasonal-median window re-ran per
      // branch (28 events scans in the before-plan) — materialize the
      // narrow residual table once instead.
      val res0 = Tables.spreadKeyed(
          Tables.events(s, d).where(col("value").isNotNull), col("user_id"))
        .withColumn("r", graft.functions.CleanFunctions.round4(
          col("value") - median(col("value")).over(seasW)))
        .select("event_id", "user_id", "r")
        .localCheckpoint()
      def shesdRound(i: Int, prev: DataFrame): (DataFrame, DataFrame) = {
        val med = prev.groupBy("user_id").agg(median(col("r")).as("med"))
        val withMed = prev.join(broadcast(med), "user_id")
        val mad = withMed.groupBy("user_id")
          .agg(median(abs(col("r") - col("med"))).as("mad"))
        val ranked = withMed.join(broadcast(mad), "user_id")
          .withColumn("z", graft.functions.CleanFunctions.round4(
            safeDiv(lit(graft.GraftConfig.MadScale) * abs(col("r") - col("med")),
              col("mad"))))
          .where(col("z").isNotNull)
          .withColumn("rk", row_number().over(
            Window.partitionBy("user_id").orderBy(desc("z"), col("event_id"))))
          .cache()
        (ranked.where(col("rk") === 1)
           .select(col("user_id"), lit(i.toLong).as("esd_round"),
             col("event_id"), col("z")),
         ranked.where(col("rk") > 1).select("event_id", "user_id", "r"))
      }
      val (c1, s2) = shesdRound(1, res0)
      val (c2, s3) = shesdRound(2, s2)
      val (c3, _)  = shesdRound(3, s3)
      c1.union(c2).union(c3).orderBy("user_id", "esd_round")
    },

    // Differencing + expanding aggregates: first difference (pandas
    // .diff, the detrending primitive), running total and running max
    // over the expanding window — one window sort serves all three.
    "ts_diff_cumsum" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val exp = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .select(col("event_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("diff_1"),
          graft.functions.CleanFunctions.exactSumOver(col("value"), exp).as("running_sum"),
          max(col("value")).over(exp).as("running_max"))
        .orderBy("event_id")
    },

    // Time spine + gap fill (pandas reindex/asfreq): materialize EVERY
    // hourly bucket between each series' first and last event — the rows
    // that don't exist in the data — left-join the observed hourly means
    // onto the spine, and forward-fill the gaps. Spine generation is a
    // per-key sequence explode (rows proportional to key-span, fully
    // parallel); the fill is the standard last-ignoreNulls window.
    "ts_time_spine" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // Bucketing delegates to the resample operator so spine buckets can
      // never drift from ts_resample_1h's semantics.
      val hourly = TS.resample(Tables.events(s, d), K, "ts", "hour", "value")
        .select(col("user_id"), col("bucket"), col("n"), col("avg_value").as("v"))
      val spine = hourly.groupBy(col("user_id"))
        .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("bucket"))
      val w = Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(hourly, Seq("user_id", "bucket"), "left")
        .select(col("user_id"), epochUs(col("bucket")).as("bucket_us"),
          coalesce(col("n"), lit(0L)).as("n"),
          CleanFunctions.round4(last(col("v"), ignoreNulls = true).over(w)).as("v_ffill"))
        .orderBy("user_id", "bucket_us")
    },

    // TIME-RANGE rolling stats: the trailing window is defined by event
    // TIME (last 24 hours strictly before this row), not row count — the
    // two differ whenever a series has gaps or bursts, which the
    // reference's strictly-hourly data never shows. RANGE frame over
    // epoch-us with an exclusive right edge (current row excluded, like
    // the shift-1 ROWS features).
    "ts_rolling_time_range" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dayUs = 24L * 3600 * 1000000
      val w = Window.partitionBy("user_id").orderBy("tsu")
        .rangeBetween(-dayUs, -1)
      Tables.events(s, d)
        .withColumn("tsu", epochUs(col("ts")))
        .select(col("event_id"),
          count(col("value")).over(w).as("n_24h"),
          CleanFunctions.exactMeanOver(col("value"), w).as("mean_24h"),
          max(col("value")).over(w).as("max_24h"))
        .orderBy("event_id")
    },

    // Cross-series correlation: pairwise Pearson between series of a
    // SELECTED PANEL on the hourly resampled grid (bucket equi-join).
    // Pairwise correlation is inherently k^2 in the series count, and in
    // this schema series count grows with data size (measured: 150 users
    // at sf0.01 -> 1500 at sf0.1, 100x the pairs for 10x the data) — so
    // the operator takes a panel selection, here the user_id % 10 == 0
    // decile; a production caller picks its panel (top-k by variance,
    // a fixed watchlist) to bound k. The reference's EDA notebooks do
    // exactly this heatmap over their handful of columns.
    "ts_cross_corr" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(28, 6)
      val hourly = Tables.events(s, d)
        .filter(col("user_id") % 10 === 0)
        .groupBy(col("user_id"), epochUs(date_trunc("hour", col("ts"))).as("b"))
        .agg(CleanFunctions.exactMean(col("value")).as("v"))
      val joined = hourly.as("x").join(hourly.as("y"),
          col("x.b") === col("y.b") && col("x.user_id") < col("y.user_id"))
        .select(col("x.user_id").as("u1"), col("y.user_id").as("u2"),
          col("x.v").as("xv"), col("y.v").as("yv"))
      joined.groupBy("u1", "u2")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("xv").cast(dec)).cast("double").as("sx"),
          sum(col("yv").cast(dec)).cast("double").as("sy"),
          sum((col("xv") * col("yv")).cast(dec)).cast("double").as("sxy"),
          sum((col("xv") * col("xv")).cast(dec)).cast("double").as("sxx"),
          sum((col("yv") * col("yv")).cast(dec)).cast("double").as("syy"))
        .select(col("u1"), col("u2"),
          CleanFunctions.round4(CleanFunctions.momentCorr(
            col("n"), col("sx"), col("sy"),
            col("sxy"), col("sxx"), col("syy"))).as("corr"))
        .orderBy("u1", "u2")
    },

    // DTW (dynamic-time-warping) distance between series' weekly shape
    // profiles — the ELASTIC similarity the pointwise family (cross-corr
    // on the aligned grid) can't express: two series with the same shape
    // shifted by a day still match. Same panel-selection contract as
    // ts_cross_corr (pairs are k² in series count — the caller bounds
    // k); the DP runs in the codegen'd DtwDistance expression over the
    // 7-point dow profiles (bounded arrays by construction, O(49) per
    // pair inside whole-stage codegen, no m×n materialization). Every
    // DP cell is a pure function of its predecessors, so the oracle's
    // anti-diagonal CTE unroll is bit-identical.
    "ts_dtw_pairs" -> { (s, d) =>
      import org.apache.spark.sql.graft.VectorExpressions
      val prof = Tables.events(s, d)
        .where(col("value").isNotNull && col("user_id") % 10 === 0)
        .groupBy(col("user_id"), weekday(col("ts")).cast("long").as("dow"))
        .agg(CleanFunctions.round4(CleanFunctions.exactMean(col("value"))).as("m"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("dow"), col("m")))).as("p"))
        .where(size(col("p")) === 7)
        .select(col("user_id"), expr("transform(p, x -> x.m)").as("a"))
      prof.as("x").join(prof.as("y"), col("x.user_id") < col("y.user_id"))
        .select(col("x.user_id").as("ua"), col("y.user_id").as("ub"),
          CleanFunctions.round4(
            VectorExpressions.dtwDistance(col("x.a"), col("y.a"))).as("dtw"))
        .orderBy("ua", "ub")
    },

    // LOWER-BOUND-pruned DTW with SAX-WORD-BLOCKED candidates — the
    // full corpus-scale elastic-similarity shape: (1) candidate pairs
    // come from a BUCKETED EQUI-JOIN (series sharing a 4-symbol SAX
    // word over their min-max-normalized weekly profile — the same
    // blocked posture as dedup_minhash_lsh; no panel sampling, no
    // theta-join), with a block-size fence (≤ DtwMaxBlock series per
    // word) so pairs are O(Σ block²), never corpus²; (2) a cheap O(n)
    // lower bound (LB_Keogh family) fences the O(n²) DP so exact DTW
    // runs only on pairs that could possibly be close. The bound is
    // valid for UNCONSTRAINED DTW: max of (a) the global-envelope bound
    // per side — every x_i must align with SOME y_j, so its cost is at
    // least its distance to [min(y), max(y)] — and (b) the endpoint
    // bound |x_1−y_1| + |x_n−y_n| (the path MUST contain both corner
    // cells). The word uses min-max binning (not Gaussian breakpoints):
    // the round4-pinned profile min/max make each symbol an identical
    // IEEE comparison in both engines, with no z-score tree or std=0
    // null path to drift. Envelope sums are 7 explicit left-associated
    // adds; pruned pairs emit a NULL dtw (pruning is the observable,
    // not a dropped row). LB ≤ DTW is spec-asserted on random inputs.
    "ts_dtw_lbkeogh" -> { (s, d) =>
      import org.apache.spark.sql.graft.VectorExpressions
      val prof = Tables.events(s, d)
        .where(col("value").isNotNull)
        .groupBy(col("user_id"), weekday(col("ts")).cast("long").as("dow"))
        .agg(CleanFunctions.round4(CleanFunctions.exactMean(col("value"))).as("m"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("dow"), col("m")))).as("p"))
        .where(size(col("p")) === 7)
        .select(col("user_id"), expr("transform(p, x -> x.m)").as("a"))
        .withColumn("mn", array_min(col("a")))
        .withColumn("mx", array_max(col("a")))
        .withColumn("wd", col("mx") - col("mn"))
      // 3-letter symbol per PAA segment: position within [mn, mx] thirds.
      def sym(e: org.apache.spark.sql.Column) =
        when(e - col("mn") < col("wd") / 3.0, "a")
          .when(e - col("mn") < col("wd") * 2.0 / 3.0, "b")
          .otherwise("c")
      def a(i: Int) = element_at(col("a"), i)
      val words = prof.withColumn("word", concat(
        sym((a(1) + a(2)) * 0.5), sym((a(3) + a(4)) * 0.5),
        sym((a(5) + a(6)) * 0.5), sym(a(7)))).drop("wd")
      // Block fence: words shared by more than DtwMaxBlock series are
      // dropped whole (the dedup df-fence contract) — a degenerate word
      // cannot emit O(block²) pairs at any corpus size.
      val fence = words.groupBy("word").agg(count(lit(1)).as("bn"))
        .where(col("bn") >= 2L && col("bn") <= DtwMaxBlock)
        .select("word")
      val blocked = words.join(fence, "word")
      def lbEnv(xa: org.apache.spark.sql.Column, mn: org.apache.spark.sql.Column,
                mx: org.apache.spark.sql.Column) =
        (1 to 7).map(i =>
          greatest(lit(0.0), element_at(xa, i) - mx, mn - element_at(xa, i)))
          .reduce(_ + _)
      val paired = blocked.as("x").join(blocked.as("y"),
          col("x.word") === col("y.word") && col("x.user_id") < col("y.user_id"))
        .select(col("x.user_id").as("ua"), col("y.user_id").as("ub"),
          col("x.word").as("word"),
          col("x.a").as("a"), col("y.a").as("b"),
          CleanFunctions.round4(greatest(
            lbEnv(col("x.a"), col("y.mn"), col("y.mx")),
            lbEnv(col("y.a"), col("x.mn"), col("x.mx")),
            abs(element_at(col("x.a"), 1) - element_at(col("y.a"), 1)) +
              abs(element_at(col("x.a"), 7) - element_at(col("y.a"), 7)))).as("lb"))
      paired
        .select(col("ua"), col("ub"), col("word"), col("lb"),
          when(col("lb") <= lit(DtwLbTheta), CleanFunctions.round4(
            VectorExpressions.dtwDistance(col("a"), col("b")))).as("dtw"))
        .orderBy("ua", "ub")
    },

    // Truncated EWMA smoothing (span-12 lag kernel, adjust-normalized).
    "ts_ewma" -> { (s, d) =>
      TS.ewma(Tables.events(s, d), K, Ord, "value", alpha = 0.3, span = 12)
        .select(col("event_id"), graft.functions.CleanFunctions.round4(col("ewma")).as("ewma"))
        .orderBy("event_id")
    },

    // RECURSIVE full-history EWMA (pandas ewm(adjust=True) with
    // position-aged weights; nulls age the weights but contribute
    // nothing) — previously spec-only, now exact-oracle (r12): the
    // engine's O(1)-state mapPartitions pass vs a DuckDB recursive CTE
    // stepping the IDENTICAL float recurrence (num·0.7 + x, den·0.7 + 1;
    // 1.0 − 0.3 IS the double 0.7, and a·b commutes bitwise, so both
    // engines walk the same IEEE trajectory row by row).
    "ts_ewma_recursive" -> { (s, d) =>
      TS.ewmaRecursive(Tables.events(s, d), K, Ord, "value", alpha = 0.3)
        .select(col("event_id"),
          graft.functions.CleanFunctions.round4(col("ewma")).as("ewma"))
        .orderBy("event_id")
    },

    // Per-series ORDINAL INDEX under the engine's canonical (ts,
    // event_id) total order — previously implicit (every per-series op
    // sorts this way inside sequences/ewmaRecursive/windows), now an
    // exact-oracle contract: if either engine's tie-break order drifts,
    // this entry's hash breaks before any downstream op does.
    "ts_series_index" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          row_number().over(w).cast(org.apache.spark.sql.types.LongType).as("seq_idx"))
        .orderBy("event_id")
    },

    // Drop-null rows (ref main.py:150 dropna after warm-up) — previously
    // implicit inside the feature pipeline, now exact-oracle: the
    // surviving row set IS the contract (a filter that silently widened
    // to other columns would change the hash).
    "ts_drop_null" -> { (s, d) =>
      TS.dropNulls(Tables.events(s, d), Seq("value"))
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id")
    },

    // Engine-portable standard-normal CDF (the Abramowitz-Stegun 7.1.26
    // erf used by every p-value entry) — previously spec-only, now
    // exact-oracle on round4-quantized global z-scores: both engines
    // build the identical Horner polynomial from identical double
    // literals, so Φ(z) matches bitwise.
    "ts_normal_cdf" -> { (s, d) =>
      import org.apache.spark.sql.types.DoubleType
      val e = Tables.events(s, d).where(col("value").isNotNull)
      val stats = e.agg(count(col("value")).cast(DoubleType).as("n"),
        CleanFunctions.exactSum(col("value")).as("sx"),
        CleanFunctions.exactSum(col("value") * col("value")).as("sxx"))
      e.crossJoin(broadcast(stats))
        // safeDiv: a degenerate all-constant value column zeroes the
        // moment std — Spark's Divide yields NULL there but DuckDB's
        // double division yields inf/NaN, so both sides nullif the
        // denominator explicitly (the kendall_w/kappa rule).
        .select(col("event_id"), CleanFunctions.round4(
          CleanFunctions.safeDiv(col("value") - col("sx") / col("n"),
            CleanFunctions.momentStd(col("n"), col("sx"), col("sxx")))).as("z"))
        .select(col("event_id"), col("z"),
          CleanFunctions.round4(CleanFunctions.normalCdf(col("z"))).as("phi"))
        .orderBy("event_id")
    },

    // Fast/slow EWMA crossover — the trend-shift signal (trading's
    // moving-average cross, ops' sustained-drift detector): sign of
    // (fast - slow) plus a flag on the rows where the sign flips. Two
    // lag-kernel EWMAs over ONE shared window spec + one lag.
    "ts_ewma_crossover" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val fast = TS.ewma(Tables.events(s, d), K, Ord, "value",
        alpha = 0.3, span = 12, outCol = "fast")
      val both = TS.ewma(fast, K, Ord, "value",
        alpha = 0.1, span = 24, outCol = "slow")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sig = when(col("fast").isNull || col("slow").isNull, lit(null).cast("long"))
        .when(col("fast") > col("slow"), 1L)
        .when(col("fast") < col("slow"), -1L)
        .otherwise(0L)
      both.withColumn("signal", sig)
        .withColumn("prev_sig", lag(col("signal"), 1).over(w))
        .select(col("event_id"),
          graft.functions.CleanFunctions.round4(col("fast")).as("fast"),
          graft.functions.CleanFunctions.round4(col("slow")).as("slow"),
          col("signal"),
          when(col("signal").isNotNull && col("prev_sig").isNotNull &&
            col("signal") =!= col("prev_sig"), 1L).otherwise(0L).as("is_cross"))
        .orderBy("event_id")
    },

    // Haar discrete-wavelet-transform energy profile per series — the
    // multi-RESOLUTION spectral signature (which time scale carries the
    // variance: level 1 = adjacent-sample noise, level 6 = the 32-64
    // sample trend band) next to the single-scale ACF/period family.
    // Each level is one keyed groupBy on (series, idx/2) computing the
    // pairwise average (cascades down) and detail (energy); 6 levels
    // over the first 64 samples of each qualifying series. Averages and
    // details divide by 2 (EXACT in binary) and every add is the same
    // two-operand IEEE op on both engines, so no rounding is needed
    // BETWEEN levels; detail energies are 6dp-quantized + DECIMAL-summed
    // per level.
    "ts_haar_energy" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wa = Window.partitionBy("user_id")
      var lvl = Tables.events(s, d).where(col("value").isNotNull)
        .withColumn("idx", row_number().over(wq).cast("long"))
        .withColumn("n", count(lit(1)).over(wa))
        .where(col("n") >= 64L && col("idx") <= 64L)
        .select(col("user_id"), col("idx"), col("value").as("v"))
      val energies = (1 to 6).map { l =>
        val paired = lvl.groupBy(col("user_id"),
            ((col("idx") + 1L) / lit(2L)).cast("long").as("idx"))
          .agg(max(when(col("idx") % 2L === 1L, col("v"))).as("vo"),
            max(when(col("idx") % 2L === 0L, col("v"))).as("ve"))
          .select(col("user_id"), col("idx"),
            ((col("vo") + col("ve")) / 2.0).as("v"),
            ((col("vo") - col("ve")) / 2.0).as("dd"))
        val e = paired.groupBy("user_id")
          .agg(count(lit(1)).as("n_coeffs"),
            CleanFunctions.round4(sum(CleanFunctions.round6(col("dd") * col("dd"))
              .cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast("double")).as("energy"))
          .select(col("user_id"), lit(l.toLong).as("level"), col("n_coeffs"), col("energy"))
        lvl = paired.select(col("user_id"), col("idx"), col("v"))
        e
      }
      energies.reduce((a, b) => a.unionByName(b)).orderBy("user_id", "level")
    },

    // Detector-agreement matrix: pairwise overlap (Jaccard) of the
    // z / IQR / MAD anomaly flags — which detectors are redundant and
    // which disagree (the eval loop for the ensemble's vote weights).
    // Three single-row conditional aggregates over one ensemble pass.
    "ts_detector_agreement" -> { (s, d) =>
      val votes = Anomaly.ensemble(Tables.events(s, d), K, "value").cache()
      val pairs = Seq(("iqr", "vote_iqr", "mad", "vote_mad"),
        ("z", "vote_z", "iqr", "vote_iqr"), ("z", "vote_z", "mad", "vote_mad"))
      pairs.map { case (an, ac, bn, bc) =>
        votes.agg(
          count(when(col(ac) === 1 && col(bc) === 1, 1)).as("n_both"),
          count(when(col(ac) === 1 || col(bc) === 1, 1)).as("n_either"))
          .select(lit(an).as("det_a"), lit(bn).as("det_b"),
            col("n_both"), col("n_either"),
            graft.functions.CleanFunctions.round4(CleanFunctions.safeDiv(
              col("n_both").cast("double"), col("n_either").cast("double"))).as("jaccard"))
      }.reduce(_ unionByName _).orderBy("det_a", "det_b")
    },

    // Cohen's kappa between detector pairs — the CHANCE-CORRECTED
    // agreement next to ts_detector_agreement's raw Jaccard: two
    // detectors that both flag 1% of rows agree 98% of the time by
    // accident alone, so raw overlap overstates redundancy exactly
    // where anomaly flags live (rare positives). kappa = (po − pe) /
    // (1 − pe) from four integer counts per pair; all products stay in
    // exact BIGINT (< 2^53) before ONE cast to double per term, so the
    // IEEE trees match across engines.
    "ts_detector_kappa" -> { (s, d) =>
      import org.apache.spark.sql.types.DoubleType
      val votes = Anomaly.ensemble(Tables.events(s, d), K, "value").cache()
      val pairs = Seq(("iqr", "vote_iqr", "mad", "vote_mad"),
        ("z", "vote_z", "iqr", "vote_iqr"), ("z", "vote_z", "mad", "vote_mad"))
      pairs.map { case (an, ac, bn, bc) =>
        val agg = votes.agg(
          count(lit(1)).as("n"),
          count(when(col(ac) === 1, 1)).as("a1"),
          count(when(col(bc) === 1, 1)).as("b1"),
          count(when(col(ac) === 1 && col(bc) === 1, 1)).as("n11"))
        val po = (col("n11") + (col("n") - col("a1") - col("b1") + col("n11")))
          .cast(DoubleType) / col("n").cast(DoubleType)
        val pe = (col("a1") * col("b1") + (col("n") - col("a1")) * (col("n") - col("b1")))
          .cast(DoubleType) / (col("n") * col("n")).cast(DoubleType)
        agg.select(lit(an).as("det_a"), lit(bn).as("det_b"),
          col("n"), col("n11").as("n_both"),
          graft.functions.CleanFunctions.round4(po).as("po"),
          graft.functions.CleanFunctions.round4(pe).as("pe"),
          graft.functions.CleanFunctions.round4(CleanFunctions.safeDiv(
            po - pe, lit(1.0) - pe)).as("kappa"))
      }.reduce(_ unionByName _).orderBy("det_a", "det_b")
    },

    // Multivariate MinMax (ref main.py:168-181 scales every feature
    // column): value + its lag-1 scaled in one window pass per key.
    "ts_scale_multi" -> { (s, d) =>
      val lagged = TS.addLags(Tables.events(s, d), K, Ord, "value", Seq(1))
      TS.minMaxScaleAll(lagged, K, Seq("value", "value_lag_1"))
        .select(col("event_id"),
          graft.functions.CleanFunctions.round4(col("value_scaled")).as("value_scaled"),
          graft.functions.CleanFunctions.round4(col("value_lag_1_scaled")).as("lag1_scaled"))
        .orderBy("event_id")
    },

    // Multivariate sequences (ref main.py:183-195: windows over the full
    // feature matrix, shape (L, F)): each step encodes its feature vector
    // as a string so parity is exact; the window mechanics are identical
    // for array-of-array payloads.
    "ts_sequences_multi" -> { (s, d) =>
      val ev = TS.addLags(Tables.events(s, d), K, Ord, "value", Seq(1))
        .filter(col("value_lag_1").isNotNull)
        .withColumn("fvec",
          format_string("%.2f:%.2f", col("value"), col("value_lag_1")))
      TS.sequences(ev, K, Ord, "fvec", 8)
        .select(col("event_id"), array_join(col("seq"), ",").as("seq"))
        .orderBy("event_id")
    },

    // As-of join: every event picks up the most recent (<= its time)
    // purchase value of its user. Right side pre-deduped per (user, ts)
    // so the most-recent row is unique; oracle is DuckDB's native
    // ASOF LEFT JOIN on the same epoch-us integers.
    "ts_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val l = ev.select(col("event_id"), col("user_id"),
        epochUs(col("ts")).as("tsu"), col("value"))
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), epochUs(col("ts")).as("tsu"))
        .agg(max(col("value")).as("pval"))
      TS.asofJoin(l, r, K, "tsu", Seq("pval"))
        .select(col("event_id"), col("value"),
          col("asof_pval").as("last_purchase_value"))
        .orderBy("event_id")
    },

    // Sequential funnel: per user, the first view, the first click
    // STRICTLY AFTER that view, and the first purchase strictly after
    // that click — order-dependent conversion, not mere co-occurrence.
    // Three grouped mins chained by per-user join-backs; the stage
    // tables are <= |users| rows but |users| grows with data here, so
    // join strategy is left to the optimizer (broadcast at test scale,
    // shuffle at billions of users — a forced broadcast() would OOM).
    "events_funnel" -> { (s, d) =>
      val ev = Tables.events(s, d).withColumn("tsu", epochUs(col("ts")))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("tsu")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("tsu") > col("t_view"))
        .groupBy("user_id").agg(min(col("tsu")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("tsu") > col("t_click"))
        .groupBy("user_id").agg(min(col("tsu")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          (lit(1L) + col("t_click").isNotNull.cast("long")
            + col("t_purchase").isNotNull.cast("long")).as("stage"))
        .orderBy("user_id")
    },

    // Funnel step conversions with Wilson 95% intervals: the funnel's
    // per-step rates plus the score interval (correct coverage at
    // small n and extreme p, where the naive ±z√(p(1−p)/n) Wald band
    // collapses or escapes [0,1]) — what turns a funnel dashboard into
    // a decision ("is click→purchase REALLY below 20% or is n too
    // small to say"). Reuses the production funnel entry verbatim;
    // the CI arithmetic runs on two aggregate rows with center/half
    // 6dp-pinned before lo/hi so both engines agree exactly.
    "events_funnel_ci" -> { (s, d) =>
      val z = 1.96; val z2 = 3.8416
      val cnt = queries("events_funnel")(s, d).agg(
        count(lit(1)).as("n_view"),
        count(when(col("stage") >= 2L, 1)).as("n_click"),
        count(when(col("stage") >= 3L, 1)).as("n_purchase"))
      val steps = cnt.select(expr(
        "stack(2, 'click_to_purchase', n_purchase, n_click, " +
          "'view_to_click', n_click, n_view) AS (step, x, n)"))
        .where(col("n") > 0L)
      val nd = col("n").cast("double")
      val p = col("x").cast("double") / nd
      val denom = lit(1.0) + lit(z2) / nd
      val r6 = graft.functions.CleanFunctions.round6 _
      steps
        .withColumn("rate", r6(p))
        .withColumn("center", r6((p + lit(z2) / (lit(2.0) * nd)) / denom))
        .withColumn("half", r6(lit(z) * sqrt(p * (lit(1.0) - p) / nd +
          lit(z2) / (lit(4.0) * nd * nd)) / denom))
        .select(col("step"), col("x"), col("n"), col("rate"),
          r6(col("center") - col("half")).as("ci_lo"),
          r6(col("center") + col("half")).as("ci_hi"))
        .orderBy("step")
    },

    // WINDOWED funnel: the events_funnel stages under real conversion
    // deadlines — first click within 6h of the first view, first
    // purchase within 24h of that click. Deadlines change semantics, not
    // shape: the same two conditional-min joins with an upper time bound
    // (an unbounded funnel counts a purchase a week later as converted;
    // attribution windows don't).
    "events_funnel_windowed" -> { (s, d) =>
      val SixH  = 6L * 3600 * 1000000
      val DayUs = 24L * 3600 * 1000000
      val ev = Tables.events(s, d).withColumn("tsu", epochUs(col("ts")))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("tsu")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("tsu") > col("t_view") && col("tsu") <= col("t_view") + SixH)
        .groupBy("user_id").agg(min(col("tsu")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("tsu") > col("t_click") && col("tsu") <= col("t_click") + DayUs)
        .groupBy("user_id").agg(min(col("tsu")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          (lit(1L) + col("t_click").isNotNull.cast("long")
            + col("t_purchase").isNotNull.cast("long")).as("stage"))
        .orderBy("user_id")
    },

    // Cohort retention: users grouped by first-seen day, distinct-user
    // counts per (cohort, day offset) — the activity-decay matrix. One
    // grouped min (cohort per user) joined back on the key (optimizer
    // picks broadcast vs shuffle; the per-user table grows with data) +
    // one distinct-count aggregation.
    "events_retention" -> { (s, d) =>
      val dayUs = 24L * 3600 * 1000000
      val ev = Tables.events(s, d)
        .withColumn("day_us", epochUs(date_trunc("day", col("ts"))))
      val cohort = ev.groupBy("user_id").agg(min(col("day_us")).as("cohort_us"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_us"),
          expr(s"(day_us - cohort_us) div $dayUs").as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_us", "offset_days")
    },

    // Retention half-life per cohort: log-linear OLS of ln(retained
    // share) on offset days → decay rate λ, half-life ln2/λ — the one
    // scalar that makes cohorts COMPARABLE (a retention matrix shows
    // curves; growth accounting needs "this cohort loses half its
    // users every N days"). Reuses the production retention entry
    // verbatim; the fit is one grouped DECIMAL moment pass over the
    // O(cohorts × offsets) aggregate, logs 6dp-pinned; cohorts whose
    // fitted slope is nonnegative (flat/growing) report a null
    // half-life rather than a fake negative one.
    "events_retention_halflife" -> { (s, d) =>
      import org.apache.spark.sql.types.{DoubleType, LongType}
      val exactSum = CleanFunctions.exactSum _
      val round6 = CleanFunctions.round6 _
      val r = queries("events_retention")(s, d)
      val base = r.where(col("offset_days") === 0L)
        .select(col("cohort_us"), col("n_users").as("n0"))
      val pts = r.join(base, "cohort_us")
        .where(col("offset_days") >= 1L && col("n_users") > 0L)
        .withColumn("x", col("offset_days").cast(DoubleType))
        .withColumn("y", round6(log(col("n_users").cast(DoubleType) /
          col("n0").cast(DoubleType))))
      pts.groupBy("cohort_us").agg(
          count(lit(1)).cast(DoubleType).as("n"),
          exactSum(col("x")).as("sx"), exactSum(col("y")).as("sy"),
          exactSum(round6(col("x") * col("x"))).as("sxx"),
          exactSum(round6(col("x") * col("y"))).as("sxy"))
        .where(col("n") > 2.0)
        .withColumn("slope", round6((col("n") * col("sxy") - col("sx") * col("sy")) /
          nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0))))
        .select(col("cohort_us"), col("n").cast(LongType).as("n_points"),
          col("slope").as("decay_slope"),
          CleanFunctions.round4(when(col("slope") < 0.0,
            lit(-0.6931471805599453) / col("slope"))).as("half_life_days"))
        .orderBy("cohort_us")
    },

    // Gap-based sessionization: 30-minute inactivity cuts a session.
    "ts_sessionize" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("tsu", epochUs(col("ts")))
      TS.sessionize(ev, K, Ord, "tsu", 30L * 60 * 1000000)
        .select(col("event_id"), col("user_id"), col("session_id"))
        .orderBy("event_id")
    },

    // Event-type CO-OCCURRENCE within sessions — market-basket analysis
    // where the basket is the SESSION (which behaviors happen in the
    // same visit), with lift vs the independence baseline: the
    // session-scoped sibling of lineitem_basket_pairs. Pair generation
    // is bounded by construction (pairs of DISTINCT types per session —
    // ≤ |type alphabet|² per session, never corpus²); supports and lift
    // are integer-count ratios with single rounded divisions.
    "events_session_type_pairs" -> { (s, d) =>
      val ev = Tables.events(s, d).withColumn("tsu", epochUs(col("ts")))
      val st = TS.sessionize(ev, K, Ord, "tsu", 30L * 60 * 1000000)
        .select(col("user_id"), col("session_id"), col("event_type"))
        .distinct()
        .localCheckpoint() // 3 consumers: both pair sides + type supports
      val nSess = st.select("user_id", "session_id").distinct().count()
      val sup = st.groupBy("event_type").agg(count(lit(1)).as("n_t"))
      val pairs = st.as("a").join(st.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.session_id") === col("b.session_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("n_both"))
      import org.apache.spark.sql.types.DoubleType
      pairs
        .join(sup.select(col("event_type").as("t1"), col("n_t").as("n1")), "t1")
        .join(sup.select(col("event_type").as("t2"), col("n_t").as("n2")), "t2")
        .select(col("t1"), col("t2"), col("n_both"),
          CleanFunctions.round6(col("n_both").cast(DoubleType) / lit(nSess.toDouble))
            .as("support"),
          CleanFunctions.round6(
            (col("n_both").cast(DoubleType) * lit(nSess.toDouble)) /
              (col("n1").cast(DoubleType) * col("n2").cast(DoubleType))).as("lift"))
        .orderBy("t1", "t2")
    },

    // Per-session aggregates on top of sessionization: length + duration.
    "ts_session_stats" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("tsu", epochUs(col("ts")))
      TS.sessionize(ev, K, Ord, "tsu", 30L * 60 * 1000000)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          expr("(max(tsu) - min(tsu)) div 1000000").as("duration_s"))
        .orderBy("user_id", "session_id")
    }
  )

  private val baseOracleSql: Map[String, String] = Map(
    "ts_time_features" ->
      s"""SELECT event_id, CAST(hour(ts) AS BIGINT) AS hour, CAST(isodow(ts)-1 AS BIGINT) AS dayofweek,
         |CAST(day(ts) AS BIGINT) AS dayofmonth, CAST(dayofyear(ts) AS BIGINT) AS dayofyear,
         |CAST(month(ts) AS BIGINT) AS month, CAST(year(ts) AS BIGINT) AS year,
         |CAST(quarter(ts) AS BIGINT) AS quarter, CAST(weekofyear(ts) AS BIGINT) AS weekofyear,
         |CAST(CASE WHEN isodow(ts)-1 >= 5 THEN 1 ELSE 0 END AS BIGINT) AS is_weekend
         |FROM events ORDER BY event_id""".stripMargin,

    "ts_lag_features" ->
      s"""SELECT event_id, value, lag(value,1) OVER w AS value_lag_1, lag(value,2) OVER w AS value_lag_2,
         |lag(value,3) OVER w AS value_lag_3, lag(value,24) OVER w AS value_lag_24
         |FROM events WINDOW w AS ($W) ORDER BY event_id""".stripMargin,

    "ts_rolling_features" ->
      s"""SELECT event_id,
         |(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w3 AS DOUBLE) / count(value) OVER w3) AS roll_mean_3h, round((stddev_samp(value) OVER w3) * 10000.0) / 10000.0 + 0.0 AS roll_std_3h,
         |min(value) OVER w3 AS roll_min_3h, max(value) OVER w3 AS roll_max_3h,
         |(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w24 AS DOUBLE) / count(value) OVER w24) AS roll_mean_24h, round((stddev_samp(value) OVER w24) * 10000.0) / 10000.0 + 0.0 AS roll_std_24h,
         |min(value) OVER w24 AS roll_min_24h, max(value) OVER w24 AS roll_max_24h
         |FROM events
         |WINDOW w3 AS ($W ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
         |w24 AS ($W ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
         |ORDER BY event_id""".stripMargin,

    "ts_fill_ffill" ->
      s"""SELECT event_id, coalesce(last_value($nulledSql IGNORE NULLS)
         |OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled
         |FROM events ORDER BY event_id""".stripMargin,

    "ts_fill_bfill" ->
      s"""SELECT event_id, coalesce(first_value($nulledSql IGNORE NULLS)
         |OVER ($W ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 0.0) AS filled
         |FROM events ORDER BY event_id""".stripMargin,

    "ts_fill_stats" ->
      s"""SELECT event_id,
         |coalesce(v, CAST(sum(CAST(v AS DECIMAL(18,6))) OVER u AS DOUBLE) / count(v) OVER u) AS filled_mean,
         |coalesce(v, median(v) OVER u) AS filled_median,
         |coalesce(v, 0.0) AS filled_zero
         |FROM (SELECT event_id, user_id, $nulledSql AS v FROM events)
         |WINDOW u AS (PARTITION BY user_id) ORDER BY event_id""".stripMargin,

    "ts_dedup_first" ->
      s"""SELECT event_id, user_id, CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts) ORDER BY ts, event_id) AS rn FROM events)
         |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "ts_dedup_last" ->
      s"""SELECT event_id, user_id, CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "ts_dedup_mean" ->
      s"""SELECT user_id, CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
         |CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS mean_value, min(event_id) AS first_event
         |FROM events GROUP BY 1, 2 ORDER BY user_id, bucket_us""".stripMargin,

    "ts_resample_1h" ->
      s"""SELECT user_id, CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
         |count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value, min(value) AS min_value,
         |max(value) AS max_value, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY user_id, bucket_us""".stripMargin,

    "ts_twa_resample" ->
      s"""WITH b AS (SELECT user_id, value, epoch_us(ts) AS ts_us,
         |  CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
         |  epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS end_us,
         |  lead(epoch_us(ts)) OVER ($W) AS nxt_us
         |  FROM events WHERE value IS NOT NULL),
         |w AS (SELECT user_id, bucket_us, value,
         |  (least(coalesce(nxt_us, end_us), end_us) - ts_us) / 1000000.0 AS w FROM b)
         |SELECT user_id, bucket_us, count(*) AS n,
         |${CleanFunctions.round4Sql(
             CleanFunctions.exactSumSql("w * value") + " / nullif(" + CleanFunctions.exactSumSql("w") + ", 0.0)")} AS twa
         |FROM w GROUP BY 1, 2 ORDER BY user_id, bucket_us""".stripMargin,

    "ts_scale_minmax" ->
      s"""SELECT event_id, round(((value - min(value) OVER u) / nullif(max(value) OVER u - min(value) OVER u, 0)) * 10000.0) / 10000.0 + 0.0 AS scaled
         |FROM events WINDOW u AS (PARTITION BY user_id) ORDER BY event_id""".stripMargin,

    "ts_scale_standard" ->
      s"""SELECT event_id, round(((value - avg(value) OVER u) / nullif(stddev_samp(value) OVER u, 0)) * 10000.0) / 10000.0 + 0.0 AS scaled
         |FROM events WINDOW u AS (PARTITION BY user_id) ORDER BY event_id""".stripMargin,

    "ts_zscore_anomaly" ->
      s"""SELECT event_id, round((z) * 10000.0) / 10000.0 + 0.0 AS z,
         |CAST(CASE WHEN abs(z) > ${GraftConfig.AnomalyThreshold} THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM (SELECT event_id, (value - avg(value) OVER u) / nullif(stddev_samp(value) OVER u, 0) AS z
         |FROM events WINDOW u AS (PARTITION BY user_id)) ORDER BY event_id""".stripMargin,

    "ts_rolling_zscore" ->
      s"""SELECT event_id, round((z) * 10000.0) / 10000.0 + 0.0 AS z,
         |CAST(coalesce(CASE WHEN abs(z) > ${GraftConfig.AnomalyThreshold} THEN 1 ELSE 0 END, 0) AS BIGINT) AS is_anomaly
         |FROM (SELECT event_id, (value - avg(value) OVER w) / nullif(stddev_samp(value) OVER w, 0) AS z
         |FROM events WINDOW w AS ($W ROWS BETWEEN ${GraftConfig.SequenceLength} PRECEDING AND 1 PRECEDING))
         |ORDER BY event_id""".stripMargin,

    "ts_iqr_anomaly" ->
      s"""WITH s AS (SELECT user_id, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
         |FROM events GROUP BY user_id)
         |SELECT e.event_id, round((s.q1 - 1.5*(s.q3 - s.q1)) * 1000000.0) / 1000000.0 + 0.0 AS lo, round((s.q3 + 1.5*(s.q3 - s.q1)) * 1000000.0) / 1000000.0 + 0.0 AS hi,
         |CAST(CASE WHEN e.value < s.q1 - 1.5*(s.q3 - s.q1) OR e.value > s.q3 + 1.5*(s.q3 - s.q1) THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM events e JOIN s USING (user_id) ORDER BY e.event_id""".stripMargin,

    "ts_winsorize" ->
      s"""WITH s AS (SELECT user_id, quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
         |FROM events GROUP BY user_id)
         |SELECT e.event_id,
         |round((CASE WHEN e.value IS NULL THEN NULL ELSE least(greatest(e.value, s.lo), s.hi) END) * 10000.0) / 10000.0 + 0.0 AS value_wins,
         |CAST(CASE WHEN e.value < s.lo OR e.value > s.hi THEN 1 ELSE 0 END AS BIGINT) AS is_clamped
         |FROM events e JOIN s USING (user_id) ORDER BY e.event_id""".stripMargin,

    "ts_backtest_naive" ->
      s"""WITH f AS (SELECT user_id, value, value - lag(value, 24) OVER ($W) AS err FROM events),
         |e AS (SELECT user_id, value, err FROM f WHERE err IS NOT NULL)
         |SELECT user_id, count(*) AS n,
         |${CleanFunctions.round4Sql(CleanFunctions.exactMeanSql("abs(err)"))} AS mae,
         |${CleanFunctions.round4Sql("sqrt(" + CleanFunctions.exactMeanSql("err * err") + ")")} AS rmse,
         |${CleanFunctions.round4Sql(CleanFunctions.exactMeanSql("abs(err / nullif(value, 0.0))"))} AS mape
         |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_percent_rank" ->
      s"""SELECT event_id,
         |round((percent_rank() OVER v) * 1000000.0) / 1000000.0 + 0.0 AS pct_rank,
         |round((cume_dist() OVER v) * 1000000.0) / 1000000.0 + 0.0 AS cume
         |FROM events WINDOW v AS (PARTITION BY user_id ORDER BY value, event_id)
         |ORDER BY event_id""".stripMargin,

    "ts_delta_compress" ->
      s"""SELECT event_id, value, ${CleanFunctions.round4Sql("delta")} AS delta
         |FROM (SELECT event_id, value, value - lag(value, 1) OVER ($W) AS delta FROM events)
         |WHERE delta IS NULL OR abs(delta) >= 2.0
         |ORDER BY event_id""".stripMargin,

    "ts_anomaly_ensemble" ->
      s"""WITH z AS (SELECT event_id, user_id, value,
         |  CAST(CASE WHEN abs((value - avg(value) OVER u) / nullif(stddev_samp(value) OVER u, 0)) > ${GraftConfig.AnomalyThreshold} THEN 1 ELSE 0 END AS BIGINT) AS vote_z
         |  FROM events WINDOW u AS (PARTITION BY user_id)),
         |q AS (SELECT user_id, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events GROUP BY user_id),
         |m AS (SELECT user_id, median(value) AS med FROM events GROUP BY user_id),
         |md AS (SELECT e.user_id, median(abs(e.value - m.med)) AS mad FROM events e JOIN m USING (user_id) GROUP BY e.user_id)
         |SELECT z.event_id, z.vote_z,
         |CAST(CASE WHEN z.value < q.q1 - 1.5*(q.q3 - q.q1) OR z.value > q.q3 + 1.5*(q.q3 - q.q1) THEN 1 ELSE 0 END AS BIGINT) AS vote_iqr,
         |CAST(coalesce(CASE WHEN abs(${GraftConfig.MadScale} * (z.value - m.med) / nullif(md.mad, 0)) > ${GraftConfig.MadThreshold} THEN 1 ELSE 0 END, 0) AS BIGINT) AS vote_mad,
         |z.vote_z
         | + CAST(CASE WHEN z.value < q.q1 - 1.5*(q.q3 - q.q1) OR z.value > q.q3 + 1.5*(q.q3 - q.q1) THEN 1 ELSE 0 END AS BIGINT)
         | + CAST(coalesce(CASE WHEN abs(${GraftConfig.MadScale} * (z.value - m.med) / nullif(md.mad, 0)) > ${GraftConfig.MadThreshold} THEN 1 ELSE 0 END, 0) AS BIGINT) AS votes,
         |CAST(CASE WHEN z.vote_z
         | + CAST(CASE WHEN z.value < q.q1 - 1.5*(q.q3 - q.q1) OR z.value > q.q3 + 1.5*(q.q3 - q.q1) THEN 1 ELSE 0 END AS BIGINT)
         | + CAST(coalesce(CASE WHEN abs(${GraftConfig.MadScale} * (z.value - m.med) / nullif(md.mad, 0)) > ${GraftConfig.MadThreshold} THEN 1 ELSE 0 END, 0) AS BIGINT) >= 2 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM z JOIN q USING (user_id) JOIN m USING (user_id) JOIN md USING (user_id)
         |ORDER BY z.event_id""".stripMargin,

    "ts_interpolate" ->
      s"""WITH b AS (SELECT event_id, user_id, ts, epoch_us(ts) AS t, $nulledSql AS v FROM events),
         |w AS (SELECT event_id, t, v,
         |  last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER wp AS pv,
         |  last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS pt,
         |  first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER wf AS nv,
         |  first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wf AS nt
         |  FROM b WINDOW wp AS ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wf AS ($W ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT event_id, ${CleanFunctions.round4Sql(
             """CASE WHEN v IS NOT NULL THEN v
               | WHEN pv IS NULL OR nv IS NULL THEN NULL
               | WHEN nt = pt THEN (pv + nv) / 2.0
               | ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END""".stripMargin)} AS interp
         |FROM w ORDER BY event_id""".stripMargin,

    "ts_decompose" ->
      s"""WITH t AS (SELECT event_id, user_id, value, hour(ts) AS pos,
         |  CASE WHEN count(value) OVER w = 25 THEN ${CleanFunctions.exactMeanSql("value", "OVER w")} END AS trend
         |  FROM events WINDOW w AS ($W ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
         |d AS (SELECT *, value - trend AS detr FROM t),
         |pm AS (SELECT user_id, pos, ${CleanFunctions.exactMeanSql("detr")} AS pos_mean
         |  FROM d WHERE detr IS NOT NULL GROUP BY user_id, pos),
         |km AS (SELECT user_id, ${CleanFunctions.exactMeanSql("pos_mean")} AS key_mean FROM pm GROUP BY user_id)
         |SELECT d.event_id, ${CleanFunctions.round4Sql("d.trend")} AS trend,
         |${CleanFunctions.round4Sql("pm.pos_mean - km.key_mean")} AS seasonal,
         |${CleanFunctions.round4Sql("d.value - d.trend - (pm.pos_mean - km.key_mean)")} AS resid
         |FROM d LEFT JOIN pm USING (user_id, pos) LEFT JOIN km USING (user_id)
         |ORDER BY d.event_id""".stripMargin,

    "ts_mad_anomaly" ->
      s"""WITH m AS (SELECT user_id, median(value) AS med FROM events GROUP BY user_id),
         |md AS (SELECT e.user_id, median(abs(e.value - m.med)) AS mad FROM events e JOIN m USING (user_id) GROUP BY e.user_id)
         |SELECT e.event_id, round(${GraftConfig.MadScale} * (e.value - m.med) / nullif(md.mad, 0) * 10000.0) / 10000.0 + 0.0 AS rz,
         |CAST(coalesce(CASE WHEN abs(${GraftConfig.MadScale} * (e.value - m.med) / nullif(md.mad, 0)) > ${GraftConfig.MadThreshold} THEN 1 ELSE 0 END, 0) AS BIGINT) AS is_anomaly
         |FROM events e JOIN m USING (user_id) JOIN md USING (user_id) ORDER BY e.event_id""".stripMargin,

    "ts_sequences" ->
      s"""WITH x AS (SELECT event_id,
         |string_agg(printf('%.2f', value), ',') OVER ($W ROWS BETWEEN ${GraftConfig.SequenceLength - 1} PRECEDING AND CURRENT ROW) AS seq,
         |row_number() OVER ($W) AS rn FROM events)
         |SELECT event_id, seq FROM x WHERE rn >= ${GraftConfig.SequenceLength} ORDER BY event_id""".stripMargin,

    "ts_recon_error" ->
      s"""WITH e1 AS (SELECT user_id, event_id, ts,
         |pow(value - (CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wp AS DOUBLE) / count(value) OVER wp), 2) AS err,
         |row_number() OVER ($W) AS rn FROM events
         |WINDOW wp AS ($W ROWS BETWEEN ${GraftConfig.SequenceLength} PRECEDING AND 1 PRECEDING)),
         |e2 AS (SELECT user_id, event_id, ts, rn,
         |(CAST(sum(CAST(err AS DECIMAL(18,6))) OVER ws AS DOUBLE) / count(err) OVER ws) AS seq_err
         |FROM e1 WINDOW ws AS ($W ROWS BETWEEN ${GraftConfig.SequenceLength - 1} PRECEDING AND CURRENT ROW)),
         |e3 AS (SELECT * FROM e2 WHERE rn >= ${2 * GraftConfig.SequenceLength})
         |SELECT event_id, round(seq_err * 10000.0) / 10000.0 + 0.0 AS seq_err,
         |CAST(CASE WHEN seq_err > 4.0 * (CAST(sum(CAST(seq_err AS DECIMAL(18,6))) OVER u AS DOUBLE) / count(seq_err) OVER u) THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM e3 WINDOW u AS (PARTITION BY user_id) ORDER BY event_id""".stripMargin,

    "ts_recon_quantile" ->
      s"""WITH e1 AS (SELECT user_id, event_id, ts,
         |pow(value - (CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wp AS DOUBLE) / count(value) OVER wp), 2) AS err,
         |row_number() OVER ($W) AS rn FROM events
         |WINDOW wp AS ($W ROWS BETWEEN ${GraftConfig.SequenceLength} PRECEDING AND 1 PRECEDING)),
         |e2 AS (SELECT user_id, event_id, ts, rn,
         |(CAST(sum(CAST(err AS DECIMAL(18,6))) OVER ws AS DOUBLE) / count(err) OVER ws) AS seq_err
         |FROM e1 WINDOW ws AS ($W ROWS BETWEEN ${GraftConfig.SequenceLength - 1} PRECEDING AND CURRENT ROW)),
         |e3 AS (SELECT * FROM e2 WHERE rn >= ${2 * GraftConfig.SequenceLength})
         |SELECT event_id, round(seq_err * 10000.0) / 10000.0 + 0.0 AS seq_err,
         |round((quantile_cont(seq_err, 0.95) OVER u) * 1000000.0) / 1000000.0 + 0.0 AS thr,
         |CAST(CASE WHEN seq_err > quantile_cont(seq_err, 0.95) OVER u THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM e3 WINDOW u AS (PARTITION BY user_id) ORDER BY event_id""".stripMargin,

    "ts_event_counts" ->
      s"""SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us, event_type,
         |count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin,

    // Epoch-aligned hop enumeration: an event at t belongs to the
    // len/slide windows starting at slide*(t div slide) - k*slide for
    // k in [0, len/slide) — integer µs arithmetic, no window TVF needed.
    "ts_hopping_counts" -> {
      val slideUs = 1800L * 1000000
      val lenUs   = 3600L * 1000000
      s"""WITH e AS (SELECT epoch_us(ts) AS tsu, event_type, value FROM events),
         |x AS (SELECT ((tsu // $slideUs) - k.k) * $slideUs AS window_start_us,
         |  event_type, value
         |  FROM e, (SELECT unnest(generate_series(0, ${lenUs / slideUs - 1})) AS k) k
         |  WHERE tsu - (((tsu // $slideUs) - k.k) * $slideUs) < $lenUs
         |    AND tsu >= (((tsu // $slideUs) - k.k) * $slideUs))
         |SELECT window_start_us, event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM x GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin
    },

    // The batch hopping reconstruction over the non-null feed (the
    // streamed Event rows carry primitive doubles), sums 4dp-rounded
    // like the entry's emission.
    "streaming_hopping" -> {
      val slideUs = 1800L * 1000000
      val lenUs   = 3600L * 1000000
      s"""WITH e AS (SELECT epoch_us(ts) AS tsu, event_type, value
         |  FROM events WHERE value IS NOT NULL),
         |x AS (SELECT ((tsu // $slideUs) - k.k) * $slideUs AS window_start_us,
         |  event_type, value
         |  FROM e, (SELECT unnest(generate_series(0, ${lenUs / slideUs - 1})) AS k) k
         |  WHERE tsu - (((tsu // $slideUs) - k.k) * $slideUs) < $lenUs
         |    AND tsu >= (((tsu // $slideUs) - k.k) * $slideUs))
         |SELECT window_start_us, event_type, count(*) AS n_events,
         |  ${graft.functions.CleanFunctions.round4Sql("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")} AS sum_value
         |FROM x GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin
    },

    // The batch twin of the streamed windowed aggregation: if streaming
    // watermark/append semantics are correct, the emitted windows equal
    // this plain GROUP BY exactly.
    "streaming_replay" ->
      s"""SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
         |event_type, count(*) AS n_events,
         |${graft.functions.CleanFunctions.round4Sql(graft.functions.CleanFunctions.exactSumSql("value"))} AS sum_value
         |FROM events WHERE value IS NOT NULL
         |GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,

    // Trailing-24-priors momentStd window — the SQL twin of the
    // streaming fold's decimal buffer moments. The anomaly flag compares
    // the UNROUNDED z like the fold does.
    "streaming_zscore" -> {
      val n = "CAST(n AS DOUBLE)"
      val zRaw = s"((x - sx / $n) / nullif(${graft.functions.CleanFunctions.momentStdSql(n, "sx", "sxx")}, 0.0))"
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, CAST(value AS DOUBLE) AS x
         |  FROM events WHERE value IS NOT NULL),
         |m AS (SELECT event_id, x,
         |  count(x) OVER w AS n,
         |  CAST(sum(CAST(x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         |  CAST(sum(CAST(x * x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
         |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |SELECT event_id, ${graft.functions.CleanFunctions.round4Sql(zRaw)} AS z,
         |  CAST(CASE WHEN abs($zRaw) > 3.0 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM m ORDER BY event_id""".stripMargin
    },

    // The dedup replay must reproduce the table itself.
    "streaming_dedup" -> EventsReproductionOracleSql,

    // So must the exactly-once sink's files, read back.
    "streaming_sink" -> EventsReproductionOracleSql,

    // Gap-islands reconstruction of session_window semantics: a session
    // breaks after 30 min of silence; end = last event + gap.
    "streaming_sessionize" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, value FROM events
         |  WHERE value IS NOT NULL),
         |f AS (SELECT user_id, tsu, value,
         |  CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > ${30L * 60 * 1000000}
         |       THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
         |g AS (SELECT user_id, tsu, value,
         |  sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |FROM f)
         |SELECT user_id, min(tsu) AS session_start_us,
         |  max(tsu) + ${30L * 60 * 1000000} AS session_end_us,
         |  count(*) AS n_events,
         |  ${graft.functions.CleanFunctions.round4Sql(graft.functions.CleanFunctions.exactSumSql("value"))} AS sum_value
         |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,

    "events_json_extract" ->
      s"""SELECT event_id, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |FROM events ORDER BY event_id""".stripMargin,

    "ts_acf_full" -> {
      val lags = 1 to 12
      def m(k: Int) =
        s"""  CAST(count(CASE WHEN y$k IS NOT NULL THEN 1 END) AS DOUBLE) AS n$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS sx$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN y$k END AS DECIMAL(28,6))) AS DOUBLE) AS sy$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value * y$k END AS DECIMAL(28,6))) AS DOUBLE) AS sxy$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value * value END AS DECIMAL(28,6))) AS DOUBLE) AS sxx$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN y$k * y$k END AS DECIMAL(28,6))) AS DOUBLE) AS syy$k""".stripMargin
      def corrOf(k: Int) =
        s"(round((${CleanFunctions.momentCorrSql(s"n$k", s"sx$k", s"sy$k", s"sxy$k", s"sxx$k", s"syy$k")}) * 10000.0) / 10000.0 + 0.0)"
      val lagCols = lags.map(k => s"lag(value, $k) OVER ($W) AS y$k").mkString(",\n  ")
      val rows = lags.map(k =>
        s"SELECT user_id, CAST($k AS BIGINT) AS lag_k, ${corrOf(k)} AS acf FROM m")
        .mkString("\n  UNION ALL ")
      s"""WITH l AS (SELECT user_id, value,
         |  $lagCols FROM events),
         |m AS (SELECT user_id,
         |${lags.map(m).mkString(",\n")}
         |  FROM l GROUP BY user_id)
         |SELECT user_id, lag_k, acf FROM ($rows)
         |ORDER BY user_id, lag_k""".stripMargin
    },

    "ts_acf" -> {
      def m(k: Int) =
        s"""  CAST(count(CASE WHEN y$k IS NOT NULL THEN 1 END) AS DOUBLE) AS n$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS sx$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN y$k END AS DECIMAL(28,6))) AS DOUBLE) AS sy$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value * y$k END AS DECIMAL(28,6))) AS DOUBLE) AS sxy$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value * value END AS DECIMAL(28,6))) AS DOUBLE) AS sxx$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN y$k * y$k END AS DECIMAL(28,6))) AS DOUBLE) AS syy$k""".stripMargin
      def corrOf(k: Int) =
        s"(round((${CleanFunctions.momentCorrSql(s"n$k", s"sx$k", s"sy$k", s"sxy$k", s"sxx$k", s"syy$k")}) * 10000.0) / 10000.0 + 0.0)"
      s"""WITH l AS (SELECT user_id, value,
         |  lag(value, 1) OVER ($W) AS y1, lag(value, 24) OVER ($W) AS y24 FROM events),
         |m AS (SELECT user_id,
         |${m(1)},
         |${m(24)}
         |  FROM l GROUP BY user_id)
         |SELECT user_id, ${corrOf(1)} AS acf_1, ${corrOf(24)} AS acf_24
         |FROM m ORDER BY user_id""".stripMargin
    },

    "ts_changepoint" ->
      s"""WITH c AS (SELECT event_id, user_id, value,
         |  count(value) OVER wb AS nb, count(value) OVER wa AS na,
         |  ${CleanFunctions.exactMeanSql("value", "OVER wa")} AS ma,
         |  ${CleanFunctions.exactMeanSql("value", "OVER wb")} AS mb,
         |  stddev_samp(value) OVER u AS sd
         |  FROM events WINDOW wb AS ($W ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
         |  wa AS ($W ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING),
         |  u AS (PARTITION BY user_id))
         |SELECT event_id, round((abs(ma - mb) / nullif(sd, 0)) * 10000.0) / 10000.0 + 0.0 AS cp_score
         |FROM c WHERE nb = 24 AND na = 24 ORDER BY event_id""".stripMargin,

    "ts_pacf" -> {
      def m(k: Int) =
        s"""  CAST(count(CASE WHEN y$k IS NOT NULL THEN 1 END) AS DOUBLE) AS n$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS sx$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN y$k END AS DECIMAL(28,6))) AS DOUBLE) AS sy$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value * y$k END AS DECIMAL(28,6))) AS DOUBLE) AS sxy$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN value * value END AS DECIMAL(28,6))) AS DOUBLE) AS sxx$k,
           |  CAST(sum(CAST(CASE WHEN y$k IS NOT NULL THEN y$k * y$k END AS DECIMAL(28,6))) AS DOUBLE) AS syy$k""".stripMargin
      def corrOf(k: Int) =
        s"(round((${CleanFunctions.momentCorrSql(s"n$k", s"sx$k", s"sy$k", s"sxy$k", s"sxx$k", s"syy$k")}) * 10000.0) / 10000.0 + 0.0)"
      s"""WITH l AS (SELECT user_id, value,
         |  lag(value, 1) OVER ($W) AS y1, lag(value, 2) OVER ($W) AS y2,
         |  lag(value, 3) OVER ($W) AS y3 FROM events),
         |mm AS (SELECT user_id,
         |${m(1)},
         |${m(2)},
         |${m(3)}
         |  FROM l GROUP BY user_id),
         |r AS (SELECT user_id, ${corrOf(1)} AS r1, ${corrOf(2)} AS r2,
         |  ${corrOf(3)} AS r3 FROM mm),
         |s2 AS (SELECT *, (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0) AS p2 FROM r),
         |s3 AS (SELECT *, r1 * (1.0 - p2) AS p21 FROM s2),
         |s4 AS (SELECT *,
         |  (r3 - p21 * r2 - p2 * r1) / nullif(1.0 - p21 * r1 - p2 * r2, 0.0) AS p3
         |  FROM s3)
         |SELECT user_id, r1 AS pacf_1,
         |  ${CleanFunctions.round4Sql("p2")} AS pacf_2,
         |  ${CleanFunctions.round4Sql("p3")} AS pacf_3
         |FROM s4 ORDER BY user_id""".stripMargin
    },

    "ts_changepoint_segment" ->
      s"""WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, value,
         |  count(value) OVER wb AS nb, count(value) OVER wa AS na,
         |  ${CleanFunctions.exactMeanSql("value", "OVER wa")} AS ma,
         |  ${CleanFunctions.exactMeanSql("value", "OVER wb")} AS mb,
         |  stddev_samp(value) OVER u AS sd
         |  FROM events WINDOW wb AS ($W ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
         |  wa AS ($W ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING),
         |  u AS (PARTITION BY user_id)),
         |sc AS (SELECT event_id, user_id, tsu,
         |  ${CleanFunctions.round4Sql("abs(ma - mb) / nullif(sd, 0)")} AS cps
         |  FROM c WHERE nb = 24 AND na = 24
         |    AND ${CleanFunctions.round4Sql("abs(ma - mb) / nullif(sd, 0)")} IS NOT NULL),
         |sp AS (SELECT user_id, event_id AS split_event, tsu AS split_tsu, cps AS cp_score
         |  FROM (SELECT *, row_number() OVER (
         |      PARTITION BY user_id ORDER BY cps DESC, event_id) AS rk FROM sc)
         |  WHERE rk = 1),
         |e AS (SELECT user_id, epoch_us(ts) AS tsu, value
         |  FROM events WHERE value IS NOT NULL)
         |SELECT e.user_id, max(split_event) AS split_event, max(cp_score) AS cp_score,
         |  ${CleanFunctions.round4Sql(
            s"${CleanFunctions.exactSumSql("CASE WHEN e.tsu < split_tsu THEN e.value END")} / CAST(count(CASE WHEN e.tsu < split_tsu THEN e.value END) AS DOUBLE)")} AS pre_mean,
         |  ${CleanFunctions.round4Sql(
            s"${CleanFunctions.exactSumSql("CASE WHEN e.tsu >= split_tsu THEN e.value END")} / CAST(count(CASE WHEN e.tsu >= split_tsu THEN e.value END) AS DOUBLE)")} AS post_mean,
         |  ${CleanFunctions.round4Sql(
            s"(${CleanFunctions.round4Sql(s"${CleanFunctions.exactSumSql("CASE WHEN e.tsu >= split_tsu THEN e.value END")} / CAST(count(CASE WHEN e.tsu >= split_tsu THEN e.value END) AS DOUBLE)")}) - (${CleanFunctions.round4Sql(s"${CleanFunctions.exactSumSql("CASE WHEN e.tsu < split_tsu THEN e.value END")} / CAST(count(CASE WHEN e.tsu < split_tsu THEN e.value END) AS DOUBLE)")})")} AS shift
         |FROM e JOIN sp ON e.user_id = sp.user_id
         |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,

    "ts_alert_episodes" -> AlertEpisodesOracleSql,

    // The streaming fold (with per-user flag=0 closers) must reproduce
    // the batch islands exactly.
    "streaming_episodes" -> AlertEpisodesOracleSql,

    "streaming_interval_join" ->
      s"""SELECT l.event_id, l.user_id, CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
         |  r.event_id AS matched_id, CAST(epoch_us(r.ts) AS BIGINT) AS r_ts_us,
         |  r.value AS r_value
         |FROM events l JOIN events r ON l.user_id = r.user_id
         |  AND epoch_us(r.ts) >= epoch_us(l.ts) - ${3600L * 1000000}
         |  AND epoch_us(r.ts) <= epoch_us(l.ts)
         |WHERE l.value IS NOT NULL AND r.value IS NOT NULL
         |ORDER BY l.event_id, matched_id""".stripMargin,

    "ts_esd_anomalies" -> {
      val std = CleanFunctions.momentStdSql("m.n", "m.sx", "m.sxx")
      def roundCte(i: Int) =
        s"""m$i AS (SELECT user_id, CAST(count(r) AS DOUBLE) AS n,
           |  ${CleanFunctions.exactSumSql("r")} AS sx,
           |  ${CleanFunctions.exactSumSql(CleanFunctions.round4Sql("r * r"))} AS sxx
           |  FROM s$i GROUP BY user_id),
           |k$i AS (SELECT s.event_id, s.user_id, s.r,
           |  ${CleanFunctions.round4Sql(s"abs(s.r - m.sx / m.n) / nullif($std, 0.0)")} AS z
           |  FROM s$i s JOIN m$i m USING (user_id)),
           |rk$i AS (SELECT event_id, user_id, r, z,
           |  row_number() OVER (PARTITION BY user_id ORDER BY z DESC, event_id) AS rk
           |  FROM k$i WHERE z IS NOT NULL),
           |c$i AS (SELECT user_id, CAST($i AS BIGINT) AS esd_round, event_id, z
           |  FROM rk$i WHERE rk = 1),
           |s${i + 1} AS (SELECT event_id, user_id, r FROM rk$i WHERE rk > 1)""".stripMargin
      s"""WITH s1 AS (
         |  SELECT event_id, user_id,
         |    ${CleanFunctions.round4Sql(
              s"value - ${CleanFunctions.exactMeanSql("value", "OVER ws")}")} AS r
         |  FROM events WHERE value IS NOT NULL
         |  WINDOW ws AS (PARTITION BY user_id, hour(ts))),
         |${roundCte(1)},
         |${roundCte(2)},
         |${roundCte(3)}
         |SELECT user_id, esd_round, event_id, z FROM (
         |  SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3)
         |ORDER BY user_id, esd_round""".stripMargin
    },

    "ts_shesd_anomalies" -> {
      def roundCte(i: Int) =
        s"""m$i AS (SELECT user_id, median(r) AS med FROM s$i GROUP BY user_id),
           |d$i AS (SELECT s.user_id, median(abs(s.r - m.med)) AS mad
           |  FROM s$i s JOIN m$i m USING (user_id) GROUP BY s.user_id),
           |k$i AS (SELECT s.event_id, s.user_id, s.r,
           |  ${CleanFunctions.round4Sql(
              s"${graft.GraftConfig.MadScale} * abs(s.r - m.med) / nullif(d.mad, 0.0)")} AS z
           |  FROM s$i s JOIN m$i m USING (user_id) JOIN d$i d USING (user_id)),
           |rk$i AS (SELECT event_id, user_id, r, z,
           |  row_number() OVER (PARTITION BY user_id ORDER BY z DESC, event_id) AS rk
           |  FROM k$i WHERE z IS NOT NULL),
           |c$i AS (SELECT user_id, CAST($i AS BIGINT) AS esd_round, event_id, z
           |  FROM rk$i WHERE rk = 1),
           |s${i + 1} AS (SELECT event_id, user_id, r FROM rk$i WHERE rk > 1)""".stripMargin
      s"""WITH s1 AS (
         |  SELECT event_id, user_id,
         |    ${CleanFunctions.round4Sql("value - median(value) OVER ws")} AS r
         |  FROM events WHERE value IS NOT NULL
         |  WINDOW ws AS (PARTITION BY user_id, hour(ts))),
         |${roundCte(1)},
         |${roundCte(2)},
         |${roundCte(3)}
         |SELECT user_id, esd_round, event_id, z FROM (
         |  SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3)
         |ORDER BY user_id, esd_round""".stripMargin
    },

    "ts_seasonal_adjust" ->
      s"""WITH a AS (SELECT event_id, user_id, value,
         |  ${CleanFunctions.exactMeanSql("value", "OVER ws")} AS seasonal_mean
         |  FROM events WINDOW ws AS (PARTITION BY user_id, hour(ts))),
         |b AS (SELECT event_id, user_id, seasonal_mean, value - seasonal_mean AS resid FROM a)
         |SELECT event_id,
         |round((seasonal_mean) * 10000.0) / 10000.0 + 0.0 AS seasonal_mean,
         |round((resid) * 10000.0) / 10000.0 + 0.0 AS resid,
         |CAST(coalesce(CASE WHEN abs((resid - ${CleanFunctions.exactMeanSql("resid", "OVER u")}) / nullif(stddev_samp(resid) OVER u, 0)) > ${GraftConfig.AnomalyThreshold} THEN 1 ELSE 0 END, 0) AS BIGINT) AS is_anomaly
         |FROM b WINDOW u AS (PARTITION BY user_id) ORDER BY event_id""".stripMargin,

    "ts_diff_cumsum" ->
      s"""SELECT event_id,
         |value - lag(value, 1) OVER ($W) AS diff_1,
         |CAST(sum(CAST(value AS DECIMAL(18,6))) OVER we AS DOUBLE) AS running_sum,
         |max(value) OVER we AS running_max
         |FROM events WINDOW we AS ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "ts_time_spine" ->
      s"""WITH h AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
         |  count(*) AS n, ${CleanFunctions.exactMeanSql("value")} AS v
         |  FROM events GROUP BY 1, 2),
         |b AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
         |sp AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM b),
         |j AS (SELECT sp.user_id, sp.bucket, coalesce(h.n, 0) AS n, h.v
         |  FROM sp LEFT JOIN h ON sp.user_id = h.user_id AND sp.bucket = h.bucket)
         |SELECT user_id, CAST(epoch_us(bucket) AS BIGINT) AS bucket_us, n,
         |round((last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0) / 10000.0 + 0.0 AS v_ffill
         |FROM j ORDER BY user_id, bucket_us""".stripMargin,

    "ts_rolling_time_range" -> {
      val dayUs = 24L * 3600 * 1000000
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, value FROM events)
         |SELECT event_id,
         |count(value) OVER w AS n_24h,
         |${CleanFunctions.exactMeanSql("value", "OVER w")} AS mean_24h,
         |max(value) OVER w AS max_24h
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu
         |  RANGE BETWEEN $dayUs PRECEDING AND 1 PRECEDING)
         |ORDER BY event_id""".stripMargin
    },

    "ts_cross_corr" ->
      s"""WITH h AS (SELECT user_id, CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS b,
         |  ${CleanFunctions.exactMeanSql("value")} AS v
         |  FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
         |j AS (SELECT x.user_id AS u1, y.user_id AS u2, x.v AS xv, y.v AS yv
         |  FROM h x JOIN h y ON x.b = y.b AND x.user_id < y.user_id),
         |m AS (SELECT u1, u2, CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(CAST(xv AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         |  CAST(sum(CAST(yv AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         |  CAST(sum(CAST(xv * yv AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         |  CAST(sum(CAST(xv * xv AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         |  CAST(sum(CAST(yv * yv AS DECIMAL(28,6))) AS DOUBLE) AS syy
         |  FROM j GROUP BY 1, 2)
         |SELECT u1, u2,
         |round((${CleanFunctions.momentCorrSql("n", "sx", "sy", "sxy", "sxx", "syy")}) * 10000.0) / 10000.0 + 0.0 AS corr
         |FROM m ORDER BY u1, u2""".stripMargin,

    "ts_dtw_pairs" -> {
      def diag(k: Int) = math.max(0, k - 6) to math.min(6, k)
      val ctes = (1 to 12).map { k =>
        val vals = diag(k).map(i => s"($i, ${k - i})").mkString(", ")
        val pm1 = s"d${k - 1}"
        val pm2 = s"d${math.max(0, k - 2)}"
        s"""d$k AS MATERIALIZED (SELECT p.ua, p.ub, g.i, g.j,
           |  abs(p.a[g.i + 1] - p.b[g.j + 1]) + least(
           |    coalesce(p1.c, 1e30), coalesce(p2.c, 1e30), coalesce(p3.c, 1e30)) AS c
           |  FROM pairs p
           |  CROSS JOIN (VALUES $vals) AS g(i, j)
           |  LEFT JOIN $pm1 p1 ON p1.ua = p.ua AND p1.ub = p.ub AND p1.i = g.i - 1 AND p1.j = g.j
           |  LEFT JOIN $pm1 p2 ON p2.ua = p.ua AND p2.ub = p.ub AND p2.i = g.i AND p2.j = g.j - 1
           |  LEFT JOIN $pm2 p3 ON p3.ua = p.ua AND p3.ub = p.ub AND p3.i = g.i - 1 AND p3.j = g.j - 1)""".stripMargin
      }
      s"""WITH pr0 AS (SELECT user_id, CAST(isodow(ts) - 1 AS BIGINT) AS dow,
         |  ${CleanFunctions.round4Sql(CleanFunctions.exactMeanSql("value"))} AS m
         |  FROM events WHERE value IS NOT NULL AND user_id % 10 = 0 GROUP BY 1, 2),
         |pr AS (SELECT user_id, list(m ORDER BY dow) AS a FROM pr0
         |  GROUP BY 1 HAVING count(*) = 7),
         |pairs AS MATERIALIZED (SELECT x.user_id AS ua, y.user_id AS ub, x.a AS a, y.a AS b
         |  FROM pr x JOIN pr y ON x.user_id < y.user_id),
         |d0 AS MATERIALIZED (SELECT ua, ub, 0 AS i, 0 AS j, abs(a[1] - b[1]) AS c FROM pairs),
         |${ctes.mkString(",\n")}
         |SELECT ua, ub, ${CleanFunctions.round4Sql("c")} AS dtw FROM d12
         |ORDER BY ua, ub""".stripMargin
    },

    "ts_dtw_lbkeogh" -> {
      def diag(k: Int) = math.max(0, k - 6) to math.min(6, k)
      val ctes = (1 to 12).map { k =>
        val vals = diag(k).map(i => s"($i, ${k - i})").mkString(", ")
        val pm1 = s"d${k - 1}"
        val pm2 = s"d${math.max(0, k - 2)}"
        s"""d$k AS MATERIALIZED (SELECT p.ua, p.ub, g.i, g.j,
           |  abs(p.a[g.i + 1] - p.b[g.j + 1]) + least(
           |    coalesce(p1.c, 1e30), coalesce(p2.c, 1e30), coalesce(p3.c, 1e30)) AS c
           |  FROM pairs p
           |  CROSS JOIN (VALUES $vals) AS g(i, j)
           |  LEFT JOIN $pm1 p1 ON p1.ua = p.ua AND p1.ub = p.ub AND p1.i = g.i - 1 AND p1.j = g.j
           |  LEFT JOIN $pm1 p2 ON p2.ua = p.ua AND p2.ub = p.ub AND p2.i = g.i AND p2.j = g.j - 1
           |  LEFT JOIN $pm2 p3 ON p3.ua = p.ua AND p3.ub = p.ub AND p3.i = g.i - 1 AND p3.j = g.j - 1)""".stripMargin
      }
      // The envelope sums and the SAX word mirror the Spark side
      // exactly: 7 explicit left-associated adds / per-segment CASE
      // comparisons on the same round4-pinned profile.
      def lbEnv(xa: String, mn: String, mx: String) =
        (1 to 7).map(i => s"greatest(0.0, $xa[$i] - $mx, $mn - $xa[$i])")
          .mkString(" + ")
      def symSql(e: String) =
        s"CASE WHEN $e - mn < wd / 3.0 THEN 'a' " +
          s"WHEN $e - mn < wd * 2.0 / 3.0 THEN 'b' ELSE 'c' END"
      val wordSql = s"concat(${symSql("(a[1] + a[2]) * 0.5")}, " +
        s"${symSql("(a[3] + a[4]) * 0.5")}, " +
        s"${symSql("(a[5] + a[6]) * 0.5")}, ${symSql("a[7]")})"
      s"""WITH pr0 AS (SELECT user_id, CAST(isodow(ts) - 1 AS BIGINT) AS dow,
         |  ${CleanFunctions.round4Sql(CleanFunctions.exactMeanSql("value"))} AS m
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |pr1 AS (SELECT user_id, list(m ORDER BY dow) AS a FROM pr0
         |  GROUP BY 1 HAVING count(*) = 7),
         |pe0 AS (SELECT user_id, a, list_aggregate(a, 'min') AS mn,
         |  list_aggregate(a, 'max') AS mx,
         |  list_aggregate(a, 'max') - list_aggregate(a, 'min') AS wd FROM pr1),
         |pw AS (SELECT user_id, a, mn, mx, $wordSql AS word FROM pe0),
         |fence AS (SELECT word FROM (
         |  SELECT word, count(*) AS bn FROM pw GROUP BY word)
         |  WHERE bn >= 2 AND bn <= $DtwMaxBlock),
         |pe AS (SELECT pw.* FROM pw JOIN fence USING (word)),
         |pairs AS MATERIALIZED (SELECT x.user_id AS ua, y.user_id AS ub,
         |  x.word AS word, x.a AS a, y.a AS b,
         |  ${CleanFunctions.round4Sql(
              s"greatest(${lbEnv("x.a", "y.mn", "y.mx")}, " +
              s"${lbEnv("y.a", "x.mn", "x.mx")}, " +
              "abs(x.a[1] - y.a[1]) + abs(x.a[7] - y.a[7]))")} AS lb
         |  FROM pe x JOIN pe y ON x.word = y.word AND x.user_id < y.user_id),
         |d0 AS MATERIALIZED (SELECT ua, ub, 0 AS i, 0 AS j, abs(a[1] - b[1]) AS c FROM pairs),
         |${ctes.mkString(",\n")}
         |SELECT p.ua, p.ub, p.word, p.lb,
         |  CASE WHEN p.lb <= $DtwLbTheta THEN ${CleanFunctions.round4Sql("d.c")} END AS dtw
         |FROM pairs p JOIN d12 d ON p.ua = d.ua AND p.ub = d.ub
         |ORDER BY p.ua, p.ub""".stripMargin
    },

    "ts_haar_energy" -> {
      val levels = (1 to 6).map { l =>
        s"""l$l AS (SELECT user_id, (idx + 1) // 2 AS idx,
           |  (max(CASE WHEN idx % 2 = 1 THEN v END) + max(CASE WHEN idx % 2 = 0 THEN v END)) / 2.0 AS v,
           |  (max(CASE WHEN idx % 2 = 1 THEN v END) - max(CASE WHEN idx % 2 = 0 THEN v END)) / 2.0 AS dd
           |FROM l${l - 1} GROUP BY 1, 2)""".stripMargin
      }
      val es = (1 to 6).map { l =>
        s"""SELECT user_id, CAST($l AS BIGINT) AS level, count(*) AS n_coeffs,
           |  ${CleanFunctions.round4Sql(
              s"CAST(sum(CAST(${CleanFunctions.round6Sql("dd * dd")} AS DECIMAL(18,6))) AS DOUBLE)")} AS energy
           |FROM l$l GROUP BY 1""".stripMargin
      }
      s"""WITH b0 AS (SELECT user_id, value AS v,
         |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx,
         |  count(*) OVER (PARTITION BY user_id) AS n
         |FROM events WHERE value IS NOT NULL),
         |l0 AS (SELECT user_id, idx, v FROM b0 WHERE n >= 64 AND idx <= 64),
         |${levels.mkString(",\n")}
         |${es.mkString("\nUNION ALL\n")}
         |ORDER BY user_id, level""".stripMargin
    },

    "ts_ewma" -> {
      val terms = (0 until 12).map { j =>
        val wt = math.pow(0.7, j)
        val v = if (j == 0) "value" else s"lag(value, $j) OVER ($W)"
        (s"coalesce(CASE WHEN $v IS NOT NULL THEN $wt * $v END, 0.0)",
          s"coalesce(CASE WHEN $v IS NOT NULL THEN $wt END, 0.0)")
      }
      s"""SELECT event_id,
         |round(((${terms.map(_._1).mkString(" + ")}) /
         |      nullif(${terms.map(_._2).mkString(" + ")}, 0.0)) * 10000.0) / 10000.0 + 0.0 AS ewma
         |FROM events ORDER BY event_id""".stripMargin
    },

    // Recursive CTE stepping the engine's exact (num·0.7 + x, den·0.7 + 1)
    // recurrence per series; see the entry's IEEE-commutation note.
    "ts_ewma_recursive" ->
      s"""WITH RECURSIVE s AS (
         |  SELECT event_id, user_id, value,
         |    row_number() OVER ($W) AS idx
         |  FROM events),
         |r(user_id, idx, event_id, num, den) AS (
         |  -- base-case CASTs pin num/den to DOUBLE: bare 0.0/1.0 literals
         |  -- type as DECIMAL(2,1) in DuckDB, and the recursive CTE's
         |  -- column types are FIXED by the base query — every later step
         |  -- would round to one decimal place.
         |  SELECT user_id, idx, event_id,
         |    CAST(CASE WHEN value IS NULL THEN 0.0 ELSE value END AS DOUBLE),
         |    CAST(CASE WHEN value IS NULL THEN 0.0 ELSE 1.0 END AS DOUBLE)
         |  FROM s WHERE idx = 1
         |  UNION ALL
         |  SELECT s.user_id, s.idx, s.event_id,
         |    CASE WHEN s.value IS NULL THEN 0.7 * r.num
         |         ELSE 0.7 * r.num + s.value END,
         |    CASE WHEN s.value IS NULL THEN 0.7 * r.den
         |         ELSE 0.7 * r.den + 1.0 END
         |  FROM r JOIN s ON s.user_id = r.user_id AND s.idx = r.idx + 1)
         |SELECT event_id,
         |  CASE WHEN den = 0.0 THEN NULL
         |       ELSE ${CleanFunctions.round4Sql("num / den")} END AS ewma
         |FROM r ORDER BY event_id""".stripMargin,

    "ts_series_index" ->
      s"""SELECT event_id, user_id,
         |  CAST(row_number() OVER ($W) AS BIGINT) AS seq_idx
         |FROM events ORDER BY event_id""".stripMargin,

    "ts_drop_null" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE value IS NOT NULL ORDER BY event_id""".stripMargin,

    "ts_normal_cdf" -> {
      val z = "z"
      s"""WITH e AS (SELECT event_id, value FROM events WHERE value IS NOT NULL),
         |st AS (SELECT CAST(count(value) AS DOUBLE) AS n,
         |  ${CleanFunctions.exactSumSql("value")} AS sx,
         |  ${CleanFunctions.exactSumSql("value * value")} AS sxx FROM e),
         |zs AS (SELECT event_id,
         |  ${CleanFunctions.round4Sql(
            s"(value - sx / n) / nullif(${CleanFunctions.momentStdSql("n", "sx", "sxx")}, 0.0)")} AS z
         |  FROM e, st)
         |SELECT event_id, z,
         |  ${CleanFunctions.round4Sql(CleanFunctions.normalCdfSql(z))} AS phi
         |FROM zs ORDER BY event_id""".stripMargin
    },

    "ts_ewma_crossover" -> {
      def kernel(decay: Double, span: Int): String = {
        val terms = (0 until span).map { j =>
          val wt = math.pow(decay, j)
          val v = if (j == 0) "value" else s"lag(value, $j) OVER ($W)"
          (s"coalesce(CASE WHEN $v IS NOT NULL THEN $wt * $v END, 0.0)",
            s"coalesce(CASE WHEN $v IS NOT NULL THEN $wt END, 0.0)")
        }
        s"((${terms.map(_._1).mkString(" + ")}) / nullif(${terms.map(_._2).mkString(" + ")}, 0.0))"
      }
      s"""WITH k AS (SELECT event_id, user_id, ts,
         |  ${kernel(0.7, 12)} AS fast,
         |  ${kernel(0.9, 24)} AS slow
         |  FROM events),
         |sg AS (SELECT event_id, user_id, ts, fast, slow,
         |  CASE WHEN fast IS NULL OR slow IS NULL THEN NULL
         |       WHEN fast > slow THEN 1 WHEN fast < slow THEN -1 ELSE 0 END AS signal
         |  FROM k),
         |c AS (SELECT event_id, fast, slow, signal,
         |  lag(signal) OVER ($W) AS prev FROM sg)
         |SELECT event_id,
         |  round(fast * 10000.0) / 10000.0 + 0.0 AS fast,
         |  round(slow * 10000.0) / 10000.0 + 0.0 AS slow,
         |  CAST(signal AS BIGINT) AS signal,
         |  CAST(CASE WHEN signal IS NOT NULL AND prev IS NOT NULL AND signal <> prev
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_cross
         |FROM c ORDER BY event_id""".stripMargin
    },

    "ts_detector_agreement" -> {
      val iqrFlag = "CAST(CASE WHEN v.value < q.q1 - 1.5*(q.q3 - q.q1) OR v.value > q.q3 + 1.5*(q.q3 - q.q1) THEN 1 ELSE 0 END AS BIGINT)"
      val madFlag = s"CAST(coalesce(CASE WHEN abs(${GraftConfig.MadScale} * (v.value - m.med) / nullif(md.mad, 0)) > ${GraftConfig.MadThreshold} THEN 1 ELSE 0 END, 0) AS BIGINT)"
      def pair(a: String, ac: String, b: String, bc: String) =
        s"""SELECT '$a' AS det_a, '$b' AS det_b,
           |  count(CASE WHEN $ac = 1 AND $bc = 1 THEN 1 END) AS n_both,
           |  count(CASE WHEN $ac = 1 OR $bc = 1 THEN 1 END) AS n_either,
           |  round((CAST(count(CASE WHEN $ac = 1 AND $bc = 1 THEN 1 END) AS DOUBLE)
           |    / nullif(CAST(count(CASE WHEN $ac = 1 OR $bc = 1 THEN 1 END) AS DOUBLE), 0.0)) * 10000.0) / 10000.0 + 0.0 AS jaccard
           |FROM votes""".stripMargin
      s"""WITH v AS (SELECT event_id, user_id, value,
         |  CAST(CASE WHEN abs((value - avg(value) OVER u) / nullif(stddev_samp(value) OVER u, 0)) > ${GraftConfig.AnomalyThreshold} THEN 1 ELSE 0 END AS BIGINT) AS vote_z
         |  FROM events WINDOW u AS (PARTITION BY user_id)),
         |q AS (SELECT user_id, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events GROUP BY user_id),
         |m AS (SELECT user_id, median(value) AS med FROM events GROUP BY user_id),
         |md AS (SELECT e.user_id, median(abs(e.value - m.med)) AS mad FROM events e JOIN m USING (user_id) GROUP BY e.user_id),
         |votes AS (SELECT v.event_id, v.vote_z,
         |  $iqrFlag AS vote_iqr, $madFlag AS vote_mad
         |  FROM v JOIN q USING (user_id) JOIN m USING (user_id) JOIN md USING (user_id))
         |SELECT * FROM (
         |  ${pair("iqr", "vote_iqr", "mad", "vote_mad")}
         |  UNION ALL ${pair("z", "vote_z", "iqr", "vote_iqr")}
         |  UNION ALL ${pair("z", "vote_z", "mad", "vote_mad")}
         |) ORDER BY det_a, det_b""".stripMargin
    },

    "ts_variance_changepoint" ->
      s"""WITH b AS (SELECT user_id, event_id, ts, value,
         |  value - ${CleanFunctions.exactMeanSql("value", "OVER (PARTITION BY user_id)")} AS diff
         |  FROM events WHERE value IS NOT NULL),
         |c AS (SELECT user_id, event_id,
         |  sum(CAST(${CleanFunctions.round6Sql("diff * diff")} AS DECIMAL(28,6))) OVER ($W) AS ck,
         |  sum(CAST(${CleanFunctions.round6Sql("diff * diff")} AS DECIMAL(28,6))) OVER (PARTITION BY user_id) AS ct,
         |  row_number() OVER ($W) AS k,
         |  count(*) OVER (PARTITION BY user_id) AS n
         |  FROM b),
         |dk AS (SELECT user_id, event_id, k, n,
         |  ${CleanFunctions.round4Sql(
            "CAST(ck AS DOUBLE) / CAST(ct AS DOUBLE) - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)")} AS dk
         |  FROM c WHERE ct > 0),
         |pk AS (SELECT user_id, event_id, n, dk,
         |  row_number() OVER (PARTITION BY user_id ORDER BY abs(dk) DESC, event_id) AS rk
         |  FROM dk)
         |SELECT user_id, n, event_id AS split_event, abs(dk) AS d_max,
         |  ${CleanFunctions.round4Sql("sqrt(CAST(n AS DOUBLE) / 2.0) * abs(dk)")} AS icss_stat,
         |  CAST(CASE WHEN ${CleanFunctions.round4Sql(
            "sqrt(CAST(n AS DOUBLE) / 2.0) * abs(dk)")} > 1.358 THEN 1 ELSE 0 END AS BIGINT) AS is_break
         |FROM pk WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "ts_detector_kappa" -> {
      val iqrFlag = "CAST(CASE WHEN v.value < q.q1 - 1.5*(q.q3 - q.q1) OR v.value > q.q3 + 1.5*(q.q3 - q.q1) THEN 1 ELSE 0 END AS BIGINT)"
      val madFlag = s"CAST(coalesce(CASE WHEN abs(${GraftConfig.MadScale} * (v.value - m.med) / nullif(md.mad, 0)) > ${GraftConfig.MadThreshold} THEN 1 ELSE 0 END, 0) AS BIGINT)"
      def pair(a: String, ac: String, b: String, bc: String) = {
        val po = s"CAST(n11 + (n - a1 - b1 + n11) AS DOUBLE) / CAST(n AS DOUBLE)"
        val pe = s"CAST(a1*b1 + (n - a1)*(n - b1) AS DOUBLE) / CAST(n*n AS DOUBLE)"
        s"""SELECT det_a, det_b, n, n11 AS n_both,
           |  ${CleanFunctions.round4Sql(po)} AS po,
           |  ${CleanFunctions.round4Sql(pe)} AS pe,
           |  ${CleanFunctions.round4Sql(s"(($po) - ($pe)) / nullif(1.0 - ($pe), 0.0)")} AS kappa
           |FROM (SELECT '$a' AS det_a, '$b' AS det_b, count(*) AS n,
           |  count(CASE WHEN $ac = 1 THEN 1 END) AS a1,
           |  count(CASE WHEN $bc = 1 THEN 1 END) AS b1,
           |  count(CASE WHEN $ac = 1 AND $bc = 1 THEN 1 END) AS n11
           |  FROM votes)""".stripMargin
      }
      s"""WITH v AS (SELECT event_id, user_id, value,
         |  CAST(CASE WHEN abs((value - avg(value) OVER u) / nullif(stddev_samp(value) OVER u, 0)) > ${GraftConfig.AnomalyThreshold} THEN 1 ELSE 0 END AS BIGINT) AS vote_z
         |  FROM events WINDOW u AS (PARTITION BY user_id)),
         |q AS (SELECT user_id, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events GROUP BY user_id),
         |m AS (SELECT user_id, median(value) AS med FROM events GROUP BY user_id),
         |md AS (SELECT e.user_id, median(abs(e.value - m.med)) AS mad FROM events e JOIN m USING (user_id) GROUP BY e.user_id),
         |votes AS (SELECT v.event_id, v.vote_z,
         |  $iqrFlag AS vote_iqr, $madFlag AS vote_mad
         |  FROM v JOIN q USING (user_id) JOIN m USING (user_id) JOIN md USING (user_id))
         |SELECT * FROM (
         |  ${pair("iqr", "vote_iqr", "mad", "vote_mad")}
         |  UNION ALL ${pair("z", "vote_z", "iqr", "vote_iqr")}
         |  UNION ALL ${pair("z", "vote_z", "mad", "vote_mad")}
         |) ORDER BY det_a, det_b""".stripMargin
    },

    "ts_scale_multi" ->
      s"""WITH l AS (SELECT event_id, user_id, value,
         |  lag(value, 1) OVER ($W) AS value_lag_1 FROM events)
         |SELECT event_id,
         |round(((value - min(value) OVER u) / nullif(max(value) OVER u - min(value) OVER u, 0)) * 10000.0) / 10000.0 + 0.0 AS value_scaled,
         |round(((value_lag_1 - min(value_lag_1) OVER u) / nullif(max(value_lag_1) OVER u - min(value_lag_1) OVER u, 0)) * 10000.0) / 10000.0 + 0.0 AS lag1_scaled
         |FROM l WINDOW u AS (PARTITION BY user_id) ORDER BY event_id""".stripMargin,

    "ts_sequences_multi" ->
      s"""WITH l AS (SELECT event_id, user_id, ts, value,
         |  lag(value, 1) OVER ($W) AS value_lag_1 FROM events),
         |f AS (SELECT event_id, user_id, ts,
         |  printf('%.2f:%.2f', value, value_lag_1) AS fvec
         |  FROM l WHERE value_lag_1 IS NOT NULL),
         |g AS (SELECT event_id,
         |  string_agg(fvec, ',') OVER ($W ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS seq,
         |  row_number() OVER ($W) AS rn FROM f)
         |SELECT event_id, seq FROM g WHERE rn >= 8 ORDER BY event_id""".stripMargin,

    "ts_asof_join" ->
      s"""WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, value FROM events),
         |r AS (SELECT user_id, epoch_us(ts) AS tsu, max(value) AS pval
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         |SELECT l.event_id, l.value, r.pval AS last_purchase_value
         |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tsu >= r.tsu
         |ORDER BY l.event_id""".stripMargin,

    "events_retention" ->
      s"""WITH e AS (SELECT user_id, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us FROM events),
         |c AS (SELECT user_id, min(day_us) AS cohort_us FROM e GROUP BY 1)
         |SELECT c.cohort_us, (e.day_us - c.cohort_us) // ${24L * 3600 * 1000000} AS offset_days,
         |  count(DISTINCT e.user_id) AS n_users
         |FROM e JOIN c USING (user_id)
         |GROUP BY 1, 2 ORDER BY cohort_us, offset_days""".stripMargin,

    "events_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
         |v AS (SELECT user_id, min(tsu) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(e.tsu) AS t_click FROM e JOIN v USING (user_id)
         |  WHERE e.event_type = 'click' AND e.tsu > v.t_view GROUP BY 1),
         |p AS (SELECT e.user_id, min(e.tsu) AS t_purchase FROM e JOIN c USING (user_id)
         |  WHERE e.event_type = 'purchase' AND e.tsu > c.t_click GROUP BY 1)
         |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
         |  1 + CAST(c.t_click IS NOT NULL AS BIGINT) + CAST(p.t_purchase IS NOT NULL AS BIGINT) AS stage
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |ORDER BY user_id""".stripMargin,

    "events_funnel_windowed" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
         |v AS (SELECT user_id, min(tsu) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(e.tsu) AS t_click FROM e JOIN v USING (user_id)
         |  WHERE e.event_type = 'click' AND e.tsu > v.t_view
         |    AND e.tsu <= v.t_view + ${6L * 3600 * 1000000} GROUP BY 1),
         |p AS (SELECT e.user_id, min(e.tsu) AS t_purchase FROM e JOIN c USING (user_id)
         |  WHERE e.event_type = 'purchase' AND e.tsu > c.t_click
         |    AND e.tsu <= c.t_click + ${24L * 3600 * 1000000} GROUP BY 1)
         |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
         |  1 + CAST(c.t_click IS NOT NULL AS BIGINT) + CAST(p.t_purchase IS NOT NULL AS BIGINT) AS stage
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |ORDER BY user_id""".stripMargin,

    "ts_sessionize" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events),
         |f AS (SELECT event_id, user_id, tsu,
         |  CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > ${30L * 60 * 1000000}
         |       THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id))
         |SELECT event_id, user_id,
         |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |FROM f ORDER BY event_id""".stripMargin,

    "events_session_type_pairs" -> {
      val r6 = graft.functions.CleanFunctions.round6Sql _
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu FROM events),
         |f AS (SELECT event_id, user_id, event_type, tsu,
         |  CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > ${30L * 60 * 1000000}
         |       THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |sid AS (SELECT event_type, user_id,
         |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM f),
         |st AS (SELECT DISTINCT user_id, session_id, event_type FROM sid),
         |ns AS (SELECT CAST(count(*) AS DOUBLE) AS n_sess
         |  FROM (SELECT DISTINCT user_id, session_id FROM st)),
         |sup AS (SELECT event_type, count(*) AS n_t FROM st GROUP BY 1),
         |p AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
         |  FROM st a JOIN st b
         |    ON a.user_id = b.user_id AND a.session_id = b.session_id
         |   AND a.event_type < b.event_type
         |  GROUP BY 1, 2)
         |SELECT t1, t2, n_both,
         |  ${r6("CAST(n_both AS DOUBLE) / n_sess")} AS support,
         |  ${r6("(CAST(n_both AS DOUBLE) * n_sess) / (CAST(s1.n_t AS DOUBLE) * CAST(s2.n_t AS DOUBLE))")} AS lift
         |FROM p JOIN sup s1 ON p.t1 = s1.event_type
         |JOIN sup s2 ON p.t2 = s2.event_type, ns
         |ORDER BY t1, t2""".stripMargin
    },

    "ts_session_stats" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events),
         |f AS (SELECT event_id, user_id, tsu,
         |  CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > ${30L * 60 * 1000000}
         |       THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         |g AS (SELECT user_id, tsu,
         |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |FROM f)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  (max(tsu) - min(tsu)) // 1000000 AS duration_s
         |FROM g GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin
  )

  /** Wilson-interval funnel oracle composes the production funnel
    * oracle verbatim (referenced once — plain subquery).
    */
  private val retentionHalflifeOracle: String = {
    val r6 = graft.functions.CleanFunctions.round6Sql _
    val r4 = graft.functions.CleanFunctions.round4Sql _
    val es = (x: String) => graft.functions.CleanFunctions.exactSumSql(x)
    val ln2 = graft.functions.CleanFunctions.dlitSql(-0.6931471805599453)
    s"""WITH r AS (SELECT cohort_us, offset_days, n_users
       |  FROM (${baseOracleSql("events_retention")}) qr),
       |b AS (SELECT cohort_us, n_users AS n0 FROM r WHERE offset_days = 0),
       |pts AS (
       |  SELECT r.cohort_us, CAST(offset_days AS DOUBLE) AS x,
       |    ${r6("ln(CAST(n_users AS DOUBLE) / CAST(n0 AS DOUBLE))")} AS y
       |  FROM r JOIN b ON r.cohort_us = b.cohort_us
       |  WHERE offset_days >= 1 AND n_users > 0),
       |m AS (
       |  SELECT cohort_us, CAST(count(*) AS DOUBLE) AS n,
       |    ${es("x")} AS sx, ${es("y")} AS sy,
       |    ${es(r6("x * x"))} AS sxx, ${es(r6("x * y"))} AS sxy
       |  FROM pts GROUP BY 1 HAVING count(*) > 2),
       |f AS (
       |  SELECT cohort_us, CAST(n AS BIGINT) AS n_points,
       |    ${r6("(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)")} AS decay_slope
       |  FROM m)
       |SELECT cohort_us, n_points, decay_slope,
       |  ${r4(s"CASE WHEN decay_slope < 0.0 THEN $ln2 / decay_slope END")} AS half_life_days
       |FROM f ORDER BY cohort_us""".stripMargin
  }

  val oracleSql: Map[String, String] = baseOracleSql +
    ("events_retention_halflife" -> retentionHalflifeOracle) +
    ("events_funnel_ci" -> {
      val z = "1.96"; val z2 = "3.8416"
      val r6 = graft.functions.CleanFunctions.round6Sql _
      s"""WITH f AS (SELECT stage FROM (${baseOracleSql("events_funnel")}) qf),
         |cnt AS (SELECT
         |  CAST(count(*) AS BIGINT) AS n_view,
         |  CAST(count(CASE WHEN stage >= 2 THEN 1 END) AS BIGINT) AS n_click,
         |  CAST(count(CASE WHEN stage >= 3 THEN 1 END) AS BIGINT) AS n_purchase
         |  FROM f),
         |st AS (
         |  SELECT 'click_to_purchase' AS step, n_purchase AS x, n_click AS n FROM cnt
         |  UNION ALL
         |  SELECT 'view_to_click' AS step, n_click AS x, n_view AS n FROM cnt),
         |w AS (
         |  SELECT step, x, n,
         |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         |    1.0 + $z2 / CAST(n AS DOUBLE) AS denom
         |  FROM st WHERE n > 0),
         |ci AS (
         |  SELECT step, x, n, ${r6("p")} AS rate,
         |    ${r6(s"(p + $z2 / (2.0 * CAST(n AS DOUBLE))) / denom")} AS center,
         |    ${r6(s"$z * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE) + $z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / denom")} AS half
         |  FROM w)
         |SELECT step, x, n, rate,
         |  ${r6("center - half")} AS ci_lo, ${r6("center + half")} AS ci_hi
         |FROM ci ORDER BY step""".stripMargin
    })
}
