package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity over `array<float>` embedding columns — built on
  * higher-order array functions (zip_with / aggregate), fully
  * codegen-compatible, no UDFs.
  *
  * Floats are cast to double per-element before multiply so both the
  * engine and a SQL oracle accumulate identically; final cosines are
  * rounded to 6 decimals (see [[Exact]] scaladoc for why).
  *
  * 100 TB design: brute-force top-k broadcasts the (small) query set
  * against the corpus — one scan, no shuffle of the corpus; the IVF
  * path assigns every vector to its nearest centroid (broadcast
  * centroids) and restricts search to the query's bucket, trading
  * recall for a c-fold cost cut (c = #centroids).
  */
object Similarity {

  private def dotd(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = dotd(a, b)

  def norm(a: Column): Column = sqrt(dotd(a, a))

  /** Cosine similarity, rounded to 6 decimals for cross-engine
    * determinism. Dispatches to the native codegen'd Catalyst kernel
    * ([[graft.expressions.CosineF]]) — the higher-order-function form
    * ([[cosineHof]]) evaluates its lambda interpreted per element,
    * ~10x slower on the 2M-pair ANN scans.
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.GraftFunctions.cosine_f(a, b)

  /** Reference implementation via zip_with/aggregate (kept for
    * equivalence testing against the native kernel). NOT equivalent on
    * zero-norm vectors: under ANSI mode this division ERRORS on a zero
    * divisor, while the kernel returns NaN (matching the oracle's
    * float division) — see ExpressionsSpec's zero-norm test. */
  def cosineHof(a: Column, b: Column): Column =
    round(dotd(a, b) / (norm(a) * norm(b)), 6)

  /** Deterministic random-hyperplane weights for RP-LSH bucketing:
    * integer w(plane, dim) in [-1000, 1000] derived from the portable
    * hash, so any engine regenerates the identical planes. Combined
    * with 1e6-quantized vector components, plane-side dot products are
    * exact integers — bucket assignment is order- and
    * engine-independent (float dots could flip sign bits at the last
    * ulp under different summation orders).
    */
  def rpPlanes(nPlanes: Int, dims: Int): Seq[(Int, Int, Long)] =
    for { j <- 0 until nPlanes; d <- 1 to dims } yield {
      val h = graft.expressions.Kernels.portableHash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"rp|$j|$d"))
      (j, d, (h % 2001L) - 1000L)
    }
}
