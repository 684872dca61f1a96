package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (bottom-k / k-minimum-values) distinct sketch over pre-hashed
  * 60-bit portable hashes ([[Text.portableHash]]) — the
  * set-operation-capable companion to [[HllAgg]] (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM'02; the KMV
  * estimator form is Beyer et al., SIGMOD'07):
  *
  *  - state   = the k smallest DISTINCT hash values, sorted
  *  - |A|     ≈ (k-1) * 2^60 / h_k   (exact = state size when < k)
  *  - bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) — merge
  *    never loses information, so partial aggregation applies
  *  - |A ∩ B| ≈ ρ/k * |A ∪ B|est, where ρ = union-sketch members
  *    present in BOTH input sketches — the estimator HLL cannot give
  *
  * Everything the sketch stores and every comparison is an exact
  * integer on a deterministic hash, so unlike randomized sketches the
  * KMV state — and therefore the estimate — is reproducible in a SQL
  * oracle even in the APPROXIMATION regime (`ORDER BY hv LIMIT k` is
  * the sketch): d25 is hash-gated with n >> k. The only floats are
  * fixed left-to-right multiply/divide chains (the [[HllAgg]]
  * discipline — no rounding, no libm).
  *
  * Buffer layout (flat Array[Long]): [0] = n (kept count), [1..n] =
  * sorted ascending hash values; capacity k+1.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Array[Long] = new Array[Long](k + 1)

  override def reduce(buf: Array[Long], hv: Long): Array[Long] = {
    val n = buf(0).toInt
    if (n == k && hv >= buf(n)) return buf
    // binary search in buf[1..n] (ascending)
    var lo = 1; var hi = n + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < hv) lo = mid + 1 else hi = mid
    }
    if (lo <= n && buf(lo) == hv) return buf // distinct only
    if (n == k) {
      // shift (lo..k-1) right by one, dropping the current max
      System.arraycopy(buf, lo, buf, lo + 1, k - lo)
      buf(lo) = hv
    } else {
      System.arraycopy(buf, lo, buf, lo + 1, n + 1 - lo)
      buf(lo) = hv
      buf(0) = n + 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val nb = b(0).toInt
    var out = a
    var i = 1
    while (i <= nb) { out = reduce(out, b(i)); i += 1 }
    out
  }

  override def finish(buf: Array[Long]): Seq[Long] = {
    val n = buf(0).toInt
    buf.slice(1, n + 1).toSeq
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object KmvAgg {
  /** 2^60 — the portable-hash domain size, as an exactly-representable
    * double (61 significant bits of zeros past the leading 1). */
  val HashDomain: Double = 1152921504606846976.0d

  /** The d25 estimator as a Spark SQL fragment over a sketch ARRAY
    * column (sorted ascending). `n < k` means the sketch holds the
    * whole distinct set — return the exact count; otherwise the
    * classic (k-1) * 2^60 / h_k. The DuckDB oracle mirrors the same
    * CASE with its own list syntax (fixed IEEE multiply/divide chain,
    * no rounding — identical bits both sides).
    */
  def estimateSql(arr: String, k: Int): String =
    s"""CASE WHEN size($arr) < $k THEN CAST(size($arr) AS DOUBLE)
       |  ELSE CAST(${k - 1} AS DOUBLE) * ${HashDomain}D
       |    / CAST(element_at($arr, $k) AS DOUBLE) END""".stripMargin
}
