package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (SQ8-style) vector quantization for approximate nearest
  * neighbor at scale: each dimension is linearly quantized to an 8-bit
  * code against the corpus-wide per-dimension [min, max] range, and
  * distances are computed on the integer codes. This is the FAISS
  * `SQ8` idea — 4x smaller vectors, integer SIMD-friendly distance —
  * re-expressed declaratively.
  *
  * Determinism discipline: raw floats are first floored to 1e6-scaled
  * longs (`floor(x * 1e6)` in IEEE double — identical on any engine),
  * so the per-dim ranges, the codes, and the code-space L2 distances
  * are all exact integer arithmetic the DuckDB oracle replays
  * bit-exactly. (Float min/max would already be exact, but the
  * (x-mn)*255/(mx-mn) code would hit engine-specific rounding; `div`
  * on scaled longs cannot.)
  *
  * 100 TB design: the per-dim range is one tiny (dims-row) aggregate
  * with map-side partials; it broadcasts back as two small arrays, so
  * encoding is a narrow map over the corpus — no shuffle. Search
  * broadcasts the (small) encoded query set against the encoded
  * corpus: one corpus scan, no corpus shuffle, same plan shape as the
  * brute-force path but on 4x-denser codes; compose with IVF
  * bucketing (d10/d16) to also cut the scanned fraction.
  */
object ScalarQuant {

  /** 1e6-scaled integer view of a float vector (exact on any engine). */
  def scaled(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1e6).cast("long"))

  /** Per-dimension [min,max] of the scaled corpus as a 1-row frame
    * with `mins`/`maxs` array columns (dims kept 1-indexed to match
    * `element_at`).
    */
  def dimRanges(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(scaled(col(vecCol))).as(Seq("dim", "xi")))
      .groupBy("dim").agg(min("xi").as("mn"), max("xi").as("mx"))
      .agg(
        expr("transform(sort_array(collect_list(struct(dim, mn))), p -> p.mn)")
          .as("mins"),
        expr("transform(sort_array(collect_list(struct(dim, mx))), p -> p.mx)")
          .as("maxs"))

  /** 8-bit code vector: ((xi-mn)*255) div (mx-mn), 0 where the
    * dimension is constant. `mins`/`maxs` must be in scope (from a
    * broadcast crossJoin of [[dimRanges]]).
    */
  def encode(vecCol: String): Column =
    expr(s"""transform(${vecCol}_scaled, (xi, i) ->
      CASE WHEN element_at(maxs, i+1) = element_at(mins, i+1) THEN 0L
           ELSE ((xi - element_at(mins, i+1)) * 255L)
                div (element_at(maxs, i+1) - element_at(mins, i+1)) END)""")

  /** Exact integer squared-L2 between two code vectors. */
  def codeDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Corpus encoded against its own dim ranges: adds a `code` column
    * (array<long> of 8-bit codes). */
  def encodeAll(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn(s"${vecCol}_scaled", scaled(col(vecCol)))
      .crossJoin(broadcast(dimRanges(df, vecCol)))
      .withColumn("code", encode(vecCol))
      .drop(s"${vecCol}_scaled", "mins", "maxs")
}
