package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark-side DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL.
  * `oracle == None` → the driver records a weaker rows-only check.
  *
  * Determinism discipline (so the DuckDB hash-compare passes):
  *  - aggregate money/quantity doubles through DECIMAL (see
  *    [[graft.ops.Exact]]) — order-independent, engine-independent;
  *  - order every result by all (or a unique subset of) output columns;
  *  - alias every computed column identically on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait Suite {
  def qs: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap
  final def oracles: Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Shared oracle-SQL fragments (DuckDB dialect) for kernels that
  * several suites replay — ONE definition per replayed construction,
  * so an engine-side change has a single oracle-side site to track
  * (previously the simhash fold was hand-synced across
  * DedupQueries d06/d07/d39 and Extras x29).
  */
private[queries] object OracleFragments {

  /** Portable 60-bit hash of an expression — the replay of
    * Text.portableHash / Kernels.portableHash60. */
  def hash60(e: String): String =
    s"CAST('0x' || substr(md5($e),1,15) AS BIGINT)"

  /** md5 bits 60-119 (hex chars 16-30) — the HI word's hash in the
    * two-long fingerprint rung (Kernels.hash120Memoized). */
  def hash60Hi(e: String): String =
    s"CAST('0x' || substr(md5($e),16,15) AS BIGINT)"

  /** SimHash ±1 bit-sum select list over `wordExpr` (one SUM per
    * bit) — the replay of Kernels.simhashFp's accumulation. Width
    * comes from the caller; the repo default is
    * [[graft.expressions.GraftFunctions.SimhashDefaultBits]].
    * `pfx`/`hashExpr` parameterize the column family and word hash so
    * the two-long rung (d40) replays its HI word with the same
    * fragment. */
  def simhashBitSums(bits: Int, wordExpr: String, pfx: String = "b",
      hi: Boolean = false): String = {
    val h = if (hi) hash60Hi(wordExpr) else hash60(wordExpr)
    (0 until bits).map(j =>
      s"SUM(CASE WHEN ($h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS ${pfx}_$j")
      .mkString(",\n    ")
  }

  /** Fold of the `pfx`_j bit-sum columns into the fingerprint long —
    * the replay of Kernels.simhashFp's `sums(j) > 0` bit set. */
  def simhashFold(bits: Int, pfx: String = "b"): String =
    (0 until bits).map(j =>
      s"CASE WHEN ${pfx}_$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
}
