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
