package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.GraftConfig

/** Text tokenization / shingling / sketching building blocks for the
  * LLM-training-data operators (SURVEY.md §2.8-2.10).
  *
  * Everything is expressed with codegen'd `org.apache.spark.sql.functions`
  * higher-order array functions — no UDFs — so the hot path stays inside
  * whole-stage codegen and is replicable as DuckDB SQL for the oracle
  * (each Spark helper has a `...Sql` twin producing the equivalent SQL).
  *
  * Shared hashing: [[CleanFunctions.md5Hash64]] (md5-derived 60-bit int,
  * identical in both engines) seeds MinHash permutations and SimHash bits.
  */
object TextFunctions {

  /** Whitespace tokens of a text column. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")
  def tokensSql(s: String): String = s"regexp_split_to_array(trim($s), '\\s+')"

  /** Distinct k-token shingles (word n-grams). Callers must pre-filter
    * rows with fewer than k tokens: Spark `sequence(0, n-k)` would run
    * DESCENDING for n<k and emit junk shingles.
    */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))

  /** DuckDB twin of [[shingles]] (1-based list indexing); `t` is the SQL
    * name of the token-list column.
    */
  def shinglesSql(t: String, k: Int): String = {
    val parts = (0 until k).map(j => s"$t[i+$j]").mkString(" || ' ' || ")
    s"list_distinct([$parts for i in generate_series(1, len($t) - ${k - 1})])"
  }

  /** MinHash value for permutation i over a base-hash column:
    * h_i(x) = (a_i * (x mod p) + b_i) mod p  — x reduced mod p first so
    * a*x stays within Int64 (x is 60-bit, a is 31-bit).
    */
  def minhashPerm(baseHash: Column, i: Int): Column = {
    val p = GraftConfig.MinHashPrime
    (lit(GraftConfig.MinHashA(i)) * (baseHash % p) + GraftConfig.MinHashB(i)) % p
  }
  def minhashPermSql(xSql: String, i: Int): String = {
    val p = GraftConfig.MinHashPrime
    s"(${GraftConfig.MinHashA(i)} * (($xSql) % $p) + ${GraftConfig.MinHashB(i)}) % $p"
  }

  /** 60-bit SimHash of a token array, no explosion: hash each token once,
    * accumulate a +-1 vote per bit position sequentially (deterministic,
    * same order as the SQL twin), then pack sign bits into a long.
    */
  def simhash60(toks: Column): Column = {
    val hashes = transform(toks, t => CleanFunctions.md5Hash64(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(59)),
        (a, i) => a + (call_function("shiftright", h, i) % 2L) * 2L - 1L))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(59)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)
  }

  /** Cosine similarity of two float-array columns, computed in double with
    * strictly sequential accumulation (aggregate is a left fold) so the
    * DuckDB twin — list_sum over the same element order — bit-matches.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column = aggregate(
      zip_with(x, y, (u, v) => u.cast(DoubleType) * v.cast(DoubleType)),
      lit(0.0), (acc, p) => acc + p)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
  def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(list_zip($x, $y), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Signed projection of an embedding onto deterministic +-1 hyperplane
    * `p` (GraftConfig.lshWeightExpr semantics), sequential accumulation.
    */
  def lshSign(emb: Column, plane: Int): Column = {
    val dotv = aggregate(
      zip_with(emb, sequence(lit(0), lit(63)), (v, i) =>
        v.cast(DoubleType) * when((lit(plane) * 8191 + i * 524287) % 97 % 2 === 0, 1.0).otherwise(-1.0)),
      lit(0.0), (acc, x) => acc + x)
    when(dotv >= 0, 1L).otherwise(0L)
  }
  def lshSignSql(embSql: String, plane: Int): String = {
    val terms = (0 until 64).map { i =>
      val w = if (((plane * 8191L + i * 524287L) % 97) % 2 == 0) "1.0" else "-1.0"
      s"CAST($embSql[${i + 1}] AS DOUBLE) * $w"
    }.mkString(" + ")
    s"(CASE WHEN ($terms) >= 0 THEN 1 ELSE 0 END)"
  }

  /** Pack `n` sign bits (columns of 0/1 long) into a bucket id. */
  def packBits(bits: Seq[Column]): Column =
    bits.zipWithIndex.map { case (b, i) => shiftleft(b, i) }
      .reduce(_ + _).cast(LongType)
}
