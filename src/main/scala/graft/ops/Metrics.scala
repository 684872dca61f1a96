package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Observed-metric plumbing for the repo's no-silent-caps rule.
  *
  * Operators that bound coverage (df caps, bucket-size guards) must
  * surface what they dropped — but an eager `count()` of the dropped
  * set costs a second pass over the data (measured ~2x on
  * d05_ngram_jaccard at sf0.1). `Dataset.observe` instead accumulates
  * the metric inside the SAME job, for free, and a
  * QueryExecutionListener logs any non-zero drop count when the
  * action completes. Works identically on a 1000-executor cluster:
  * observe metrics are merged across tasks like any aggregate.
  */
object Metrics {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Sessions that already carry the logging listener. */
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Attach `name` as an observed count of rows matching `dropped`
    * (logged as a warning when non-zero), then pass the frame through
    * unchanged. The metric rides the existing job — no extra action.
    */
  def observeDropped(df: DataFrame, name: String,
      dropped: org.apache.spark.sql.Column): DataFrame = {
    ensureListener(df.sparkSession)
    df.observe(name, sum(when(dropped, 1L).otherwise(0L)).as("dropped"))
  }

  private def ensureListener(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            val i = row.schema.fieldNames.indexOf("dropped")
            if (i >= 0 && !row.isNullAt(i) && row.getLong(i) > 0L)
              log.warn(s"$name: dropped ${row.getLong(i)} rows " +
                "(coverage cap engaged — see operator scaladoc)")
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
