package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality counters collected DURING the main pass via Spark's
  * `Observation` API — at 100 TB a second validation scan doubles the
  * dominant cost, so completeness/violation metrics must ride along
  * with the action that already reads the data (observe() attaches
  * aggregates to the plan; the driver receives them with the action's
  * completion, no extra job).
  */
object Quality {

  /** Standard per-column completeness + row count. Returns the
    * observed DataFrame and the Observation handle; call
    * `obs.get` AFTER an action on the returned frame.
    */
  def observeCompleteness(df: DataFrame, cols: Seq[String])
      : (DataFrame, Observation) = {
    val obs = Observation()
    val metrics: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        cols.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Count violations of arbitrary boolean invariants in-pass.
    * `checks` maps metric name -> predicate that GOOD rows satisfy.
    * A predicate that evaluates to NULL (the usual face of a data
    * defect — `col("qty") > 0` on a null qty) counts as a VIOLATION:
    * only rows where the predicate is definitely true are good.
    */
  def observeInvariants(df: DataFrame, checks: Map[String, Column])
      : (DataFrame, Observation) = {
    require(checks.nonEmpty, "observeInvariants needs at least one check")
    val obs = Observation()
    val metrics = checks.toSeq.sortBy(_._1).map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"bad_$name")
    }
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
