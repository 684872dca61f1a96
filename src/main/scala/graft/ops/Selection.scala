package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics by bucketed selection — the
  * classic two-phase selection that replaces "sort the whole group"
  * with "count, locate, sort one bucket":
  *
  *  1. per-group min/max (one narrow agg) fixes B equi-width buckets;
  *  2. per-(group, bucket) counts — map-side combinable to G*B rows,
  *     so the exchange is tiny however large the input;
  *  3. a cumulative count over the (tiny) bucket table locates, for
  *     each requested 0-based rank, its bucket and in-bucket index;
  *  4. only rows in TARGET buckets (|group|*|ranks| buckets of ~n/B
  *     rows) are ranked — a window over a few thousand rows instead
  *     of a per-group sort of everything.
  *
  * The selected value at a rank is unique regardless of tie order, so
  * the result is deterministic even though row_number among equal
  * values is not. Null values are ignored (rank space is over
  * non-null values, like `percentile`). Rows whose rank is out of
  * range [0, n) yield no output.
  *
  * At 100 TB: steps 1-2 are single narrow scans with constant-size
  * partials; step 4 touches ~(ranks * n/B) rows. A pathological pile
  * of equal values concentrates one bucket (selection degenerates to
  * sorting that pile); raise `buckets` or recurse — not needed for
  * any engine query. Replaces the per-group full sort in o42's p99
  * (window over 6M rows in 3 tasks, ~9 s at sf1 -> sub-second).
  */
object Selection {

  /** @param df     input rows
    * @param ranks  DataFrame with `groupCol` and a `rank` LONG column
    *               (0-based, one row per requested statistic,
    *               duplicates allowed)
    * @param statsNarrow optional precomputed per-group range —
    *               (groupCol, _lo DOUBLE, _hi DOUBLE) over the
    *               group's non-null values (min/max ignore nulls, so
    *               any aggregate already passing over the data can
    *               carry them) — saving this operator its own
    *               full-input min/max pass (step 1). Groups absent
    *               from it yield no output, like groups with no rows.
    * @return (groupCol, rank, value) — `value` keeps the input type
    */
  def orderStatistics(df: DataFrame, groupCol: String, valueCol: String,
      ranks: DataFrame, buckets: Int = 1024,
      statsNarrow: Option[DataFrame] = None): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val rows = df.filter(v.isNotNull).select(g, v)

    // 1. per-group value range -> equi-width bucket id
    val stats = statsNarrow.getOrElse(rows.groupBy(groupCol)
      .agg(min(v).cast("double").as("_lo"), max(v).cast("double").as("_hi")))
    val bucketed = rows.join(broadcast(stats), groupCol)
      .withColumn("_b",
        when(col("_hi") === col("_lo"), lit(0)).otherwise(
          least(floor((v.cast("double") - col("_lo")) /
            ((col("_hi") - col("_lo")) / buckets)).cast("int"),
            lit(buckets - 1))))

    // 2. tiny per-(group, bucket) count table
    val bc = bucketed.groupBy(groupCol, "_b").agg(count(lit(1)).as("_cnt"))

    // 3. locate each rank's bucket + in-bucket index
    val cumW = Window.partitionBy(groupCol).orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val located = bc
      .withColumn("_before", coalesce(sum(col("_cnt")).over(cumW), lit(0L)))
    val targets = ranks.join(located, groupCol)
      .filter(col("rank") >= col("_before") &&
        col("rank") < col("_before") + col("_cnt"))
      .select(g, col("_b"), col("rank"),
        (col("rank") - col("_before")).as("_idx"))

    // 4. rank only inside target buckets
    val hot = targets.select(groupCol, "_b").distinct()
    val rnW = Window.partitionBy(groupCol, "_b").orderBy(v)
    bucketed.join(broadcast(hot), Seq(groupCol, "_b"))
      .withColumn("_rn", row_number().over(rnW).cast("long") - 1)
      .join(broadcast(targets), Seq(groupCol, "_b"))
      .filter(col("_rn") === col("_idx"))
      .select(g, col("rank"), v.as("value"))
  }
}
