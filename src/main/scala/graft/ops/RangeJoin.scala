package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: join points to intervals on containment
  * (`lo <= p <= hi`) as an EQUI-join.
  *
  * The naive formulation is a broadcast-nested-loop (or a cartesian
  * shuffle) — O(|points| x |intervals|) comparisons, which is the
  * classic 100 TB cliff for interval predicates. Binning restores a
  * hash-join shape:
  *
  *  1. each point maps to bin `p div binWidth` (one row);
  *  2. each interval explodes to every bin it overlaps
  *     (`sequence(lo div w, hi div w)` — (len/w + 1) rows);
  *  3. equi-join on the bin key (ordinary shuffle/broadcast hash
  *     join, partial pruning, AQE skew handling all apply);
  *  4. residual filter re-checks the exact containment.
  *
  * Work scales with |points| + |intervals| x avgSpan/w + |matches|;
  * `binWidth` trades interval duplication against bin selectivity —
  * pick it near the median interval length so most intervals land in
  * O(1) bins. Same contract as the standard spatial/temporal
  * bin-join (e.g. interval joins in stream processors).
  *
  * Inputs may have arbitrary extra columns; both sides' are kept.
  * `point`, `lo`, `hi` must be integral (use exact integer units —
  * epoch micros, cents — per the engine's determinism discipline).
  */
object RangeJoin {

  /** Exact floor-division bin key over the FULL long domain: `div` is
    * 64-bit integral division (no double rounding anywhere), and the
    * pmod correction turns its truncate-toward-zero into floor for
    * negative keys — an out-of-range key can mis-bin silently and the
    * residual filter only removes false positives, so the key math
    * must be exact rather than "exact below 2^53".
    */
  private def bin(c: Column, w: Long): Column = {
    val k = c.cast("long")
    val q = call_function("div", k, lit(w))
    when(pmod(k, lit(w)) === 0 || k >= 0, q).otherwise(q - 1L)
  }

  def binned(points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // the join key is added to (and dropped from) BOTH inputs — a
    // caller's same-named column would be silently overwritten
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "binned: input collides with the reserved column __bin")
    val p = points.withColumn("__bin", bin(point, binWidth))
    // sequence is ascending because lo <= hi (filtered, so a corrupt
    // interval can't produce a descending sequence)
    val iv = intervals
      .filter(lo.cast("long") <= hi.cast("long"))
      .withColumn("__bin",
        explode(sequence(bin(lo, binWidth), bin(hi, binWidth))))
    p.join(iv, "__bin")
      .filter(point.cast("long").between(lo.cast("long"), hi.cast("long")))
      .drop("__bin")
  }
}
