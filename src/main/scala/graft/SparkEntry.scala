package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every suite's queries and oracles.
  */
object SparkEntry {
  private val suites: Seq[Suite] = Seq(Relational, Sessions, TextQueries, DedupQueries, MlQueries, BdbShapes, BdbShapes2, Extras, Relational2, TextQueries2, CurationQueries, GraphQueries, graft.bdb.BdbDirect)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("o15_multi_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    suites.flatMap(_.oracles).toMap
}
