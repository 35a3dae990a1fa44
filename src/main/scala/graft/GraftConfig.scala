package graft

/** Pipeline constants mirroring the reference configuration
  * (reference: config.py:23 ANOMALY_THRESHOLD, config.py:27
  * LSTM_SEQUENCE_LENGTH, main.py:131-132 lag/window lists).
  */
object GraftConfig {
  /** |z| threshold for flagging anomalies (config.py:23). */
  val AnomalyThreshold = 3.0

  /** Sliding-window sequence length (config.py:27). */
  val SequenceLength = 24

  /** Lag periods for lag features (main.py:131). */
  val DefaultLags: Seq[Int] = Seq(1, 2, 3, 24, 48, 168)

  /** Rolling window sizes (main.py:132). */
  val DefaultWindows: Seq[Int] = Seq(3, 6, 12, 24)

  /** Rolling aggregates (main.py:137). */
  val RollingAggs: Seq[String] = Seq("mean", "std", "min", "max")

  /** Robust z-score scale factor (standard MAD consistency constant). */
  val MadScale = 0.6745
  val MadThreshold = 3.5

  // ---- MinHash / LSH (dedup + ANN) -------------------------------------
  /** Number of MinHash permutations; banded 4 x 4 for LSH. */
  val MinHashK = 16
  val MinHashRowsPerBand = 4
  val MinHashPrime = 2147483647L // 2^31 - 1: a*h stays within Int64

  /** Deterministic permutation coefficients h_i(x) = (a_i*x + b_i) mod p.
    * Fixed LCG-derived constants so the DuckDB oracle can embed the same
    * literals.
    */
  val MinHashA: Seq[Long] = (1 to MinHashK).map { i =>
    val v = (1103515245L * i + 12345L) % MinHashPrime
    if (v <= 0) v + MinHashPrime - 1 else v
  }
  val MinHashB: Seq[Long] = (1 to MinHashK).map { i =>
    val v = (1013904223L * i + 8121L) % MinHashPrime
    if (v < 0) v + MinHashPrime else v
  }

  /** Shingle size (tokens) for n-gram dedup. */
  val ShingleSize = 3

  // ---- Random-hyperplane LSH for ANN -----------------------------------
  val LshPlanes = 16
  /** Deterministic +-1 weight for (plane p, dim i): shared with SQL. */
  def lshWeightExprSql(p: String, i: String): String =
    s"CASE WHEN (($p * 8191 + $i * 524287) % 97) % 2 = 0 THEN 1.0 ELSE -1.0 END"
}
