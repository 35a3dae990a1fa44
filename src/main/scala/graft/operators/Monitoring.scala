package graft.operators

import org.apache.spark.sql.DataFrame

/** One-call monitoring pipeline — the user-facing composition a
  * production alerting stack runs per metric: the null-safe 2-of-3
  * ensemble detector ([[Anomaly.ensemble]]: z / IQR / MAD majority vote)
  * grouped into alert EPISODES ([[Anomaly.alertEpisodes]]: run-length
  * spans of consecutive flagged samples) — one incident row per
  * contiguous anomalous stretch instead of one page per sample.
  *
  * Like [[CorpusCuration]] and [[CorpusDedup]], the composition itself
  * is what the driver hash-checks end to end (`ops_incidents`).
  *
  * Reference semantics: the reference's anomaly step flags individual
  * sequences (main.py:221-230 placeholder); operationally those flags
  * are only actionable grouped into incidents.
  */
object Monitoring {

  /** Incidents for one metric: (keys..., n_events, start_us, end_us) —
    * one row per run of >= 1 consecutive ensemble-flagged samples.
    */
  def run(events: DataFrame, keys: Seq[String], order: Seq[String],
          tsNumCol: String, target: String, minVotes: Int = 2): DataFrame = {
    val flagged = Anomaly.ensemble(events, keys, target, minVotes)
      .withColumnRenamed("is_anomaly", "__inc_flag")
    Anomaly.alertEpisodes(flagged, keys, order, "__inc_flag", tsNumCol)
  }
}
