package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` on the same key — the temporal operator Spark
  * lacks natively (DuckDB: `ASOF JOIN`; the guide's example custom
  * operator).
  *
  * Implemented by COMPOSITION (preference (a) over a custom
  * SparkPlan): union both sides tagged, one window pass per key
  * ordered by (ts, side) carrying the last-seen right payload via
  * `last(_, ignoreNulls)`. ONE shuffle on the key, no range join, no
  * per-row binary search — this is the scalable formulation at any
  * data size (a broadcast-range-join alternative only works when one
  * side is small).
  *
  * Right rows must be unique per (key, ts) — pre-aggregate otherwise
  * (ties would make "the" as-of row ambiguous in any engine).
  */
object AsOf {

  /** @param payload right-side columns to carry (renamed as given)
    * @param tolerance optional max allowed left.ts - right.ts
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tolerance: Option[Long] = None): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumns(payload.map(c => c -> lit(null)).toMap)
    val leftCols = left.columns.toSeq
    val r = right.select(
      (Seq(col(key), col(ts), lit(0).as("_side")) ++
        payload.map(col) ++
        leftCols.filterNot(c => c == key || c == ts || payload.contains(c))
          .map(c => lit(null).as(c))): _*)
    val unioned = l.select((Seq(col(key), col(ts), col("_side")) ++
      payload.map(col) ++
      leftCols.filterNot(c => c == key || c == ts || payload.contains(c))
        .map(col)): _*)
      .unionByName(r)
    val w = Window.partitionBy(key).orderBy(ts, "_side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(
      unioned.withColumn("_asof_ts",
        last(when(col("_side") === 0, col(ts)), ignoreNulls = true).over(w))) {
      (df, c) =>
        df.withColumn(c, last(when(col("_side") === 0, col(c)),
          ignoreNulls = true).over(w))
    }
    val joined = carried.filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(t) =>
        // out-of-tolerance matches become nulls (still left-outer)
        val inTol = col("_asof_ts").isNotNull && col(ts) - col("_asof_ts") <= t
        payload.foldLeft(
          joined.withColumn("_asof_ts", when(inTol, col("_asof_ts")))) {
          (df, c) => df.withColumn(c, when(inTol, col(c)))
        }
      case None => joined
    }
    bounded.drop("_side")
  }
}
