package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` on the same key — the temporal operator Spark
  * lacks natively (DuckDB: `ASOF JOIN`).
  *
  * Implemented by COMPOSITION (preference (a) over a custom
  * SparkPlan): union both sides tagged, one window pass per key
  * ordered by (ts, side) carrying the last-seen right row as a single
  * STRUCT via `last(_, ignoreNulls)`. Carrying one struct (not one
  * column per field) guarantees the matched timestamp and every
  * payload field come from the SAME right row, and a right row whose
  * payload value is genuinely NULL is still carried (only left rows
  * have a NULL struct). ONE shuffle on the key, no range join — the
  * scalable formulation at any size.
  *
  * NULL keys never match (SQL join semantics): null-key right rows
  * are dropped, so null-key left rows come back with NULL payload.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate otherwise.
  */
object AsOf {

  /** @param payload right-side columns to carry
    * @param tolerance optional max allowed left.ts - right.ts
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tolerance: Option[Long] = None): DataFrame = {
    val reserved = payload ++ Seq("_side", "_asof_ts", "_r", "_m")
    val collisions = reserved.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"left columns collide with reserved/payload names: $collisions")

    val rStructType = StructType(
      StructField("_ts", right.schema(ts).dataType) +:
        payload.map(c => StructField(c, right.schema(c).dataType)))

    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rStructType))
    val extraLeftCols = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val r = right
      .filter(col(key).isNotNull) // NULL keys never match
      .select(
        (Seq(col(key), col(ts), lit(0).as("_side"),
          struct(col(ts).as("_ts") +: payload.map(col): _*).as("_r")) ++
          extraLeftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val unioned = l.select(
      (Seq(col(key), col(ts), col("_side"), col("_r")) ++
        extraLeftCols.map(col)): _*)
      .unionByName(r)

    val w = Window.partitionBy(key).orderBy(ts, "_side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val inTol = tolerance match {
      case Some(t) => col("_m").isNotNull &&
        col(ts) - col("_m").getField("_ts") <= t
      case None => col("_m").isNotNull
    }
    payload.foldLeft(
      carried.withColumn("_asof_ts",
        when(inTol, col("_m").getField("_ts")))) { (df, c) =>
        df.withColumn(c, when(inTol, col("_m").getField(c)))
      }
      .drop("_side", "_r", "_m")
  }
}
