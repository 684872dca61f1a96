package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split the d-dim vector
  * into M subspaces, map each subvector to its nearest codeword from
  * a per-subspace codebook of K entries, and search with ASYMMETRIC
  * distance (ADC) — the query stays exact, each corpus vector costs
  * M small integers, and per-query distances to all M*K codewords
  * are precomputed once into a lookup table.
  *
  * Scale shape (the reason PQ exists): encoding is a NARROW per-row
  * expression over the corpus (no join, no shuffle — codebooks are
  * literals compiled into codegen), so a 100 TB corpus encodes in
  * one scan and thereafter ships M bytes-ish per vector instead of
  * d floats (here 8 codes vs 64 floats = 32x bandwidth cut, 4x
  * beyond SQ8's). The ADC lookup table is query-side and
  * K*M-bounded — broadcast, never a corpus shuffle. This variant
  * uses a DETERMINISTIC hash-generated codebook rather than a
  * trained one: recall is whatever random codewords give, but every
  * pipeline stage (encode argmin, LUT build, ADC accumulation,
  * top-k) is the production machinery and — in exact integer
  * micro-units — replays bit-identically in the DuckDB oracle.
  * Training the codebook is m02's integer Lloyd, composable later.
  *
  * All arithmetic is exact integer micro-units (the d26/m02
  * discipline): values quantized to floor(x*1e6) BIGINT; squared
  * distances stay < 2^63 (|v|,|w| <= ~2.5e5 micro ⇒ per-term
  * <= 2.5e11, * 8 dims * 8 subs « 2^63).
  */
object Pq {

  val Dim = 64
  val SubDim = 8
  val M: Int = Dim / SubDim // 8 subspaces
  val K = 16                // codewords per subspace

  /** Deterministic codeword component in micro-units, uniform-ish in
    * [-250000, 250000] — same portable-hash construction as the
    * minhash coefficients (no RNG; any engine regenerates it).
    */
  def codeword(s: Int, c: Int, j: Int): Long = {
    val h = graft.expressions.Kernels.portableHash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"pq|$s|$c|$j"))
    math.floorMod(h, 500001L) - 250000L
  }

  /** (id, s, code) — the PQ encoding: per subspace, the argmin
    * codeword (lowest code id on ties). One codegen'd NARROW scan, no
    * join: the whole M*K*SubDim argmin runs in the
    * [[graft.expressions.PqEncode]] kernel (the composed-Column form
    * of the same math is a 1024-term expression tree that overflows
    * generated-method limits and drops to interpreted eval — 15.8 s
    * vs ~1 s at sf0.1).
    */
  def encode(df: DataFrame, id: String, emb: String): DataFrame =
    df.select(col(id),
      posexplode(graft.expressions.GraftFunctions.pq_encode(col(emb)))
        .as(Seq("s", "code")))

  /** Query-side ADC lookup table: (qid, s, c, d2) for ALL M*K
    * codewords — K*M rows per query, broadcast at any corpus size.
    * Kernel-computed ([[graft.expressions.PqAdcLut]]) for the same
    * reason as [[encode]]. */
  def adcTable(queries: DataFrame, id: String, emb: String): DataFrame =
    queries.select(col(id).as("q_id"),
        posexplode(graft.expressions.GraftFunctions.pq_adc_lut(col(emb)))
          .as(Seq("pos", "d2")))
      .select(col("q_id"),
        (col("pos") / K).cast("int").as("s"),
        (col("pos") % K).cast("int").as("c"),
        col("d2"))

  /** SQL literal VALUES list for the codebook — the oracle's mirror:
    * cb(s, c, j, w). */
  def codebookSql: String =
    (for (s <- 0 until M; c <- 0 until K; j <- 0 until SubDim)
      yield s"($s,$c,$j,${codeword(s, c, j)})").mkString(", ")
}
