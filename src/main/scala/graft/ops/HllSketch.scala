package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed `Aggregator` over
  * pre-hashed 60-bit portable hashes ([[Text.portableHash]]) — the
  * mergeable-sketch surface of SURVEY §2e, with semantics chosen so a
  * SQL oracle can reproduce the estimate BIT-EXACTLY (unlike Spark's
  * built-in `approx_count_distinct`, whose xxHash-based sketch is
  * engine-private):
  *
  *  - bucket  = hv % m          (low bits of the portable hash)
  *  - rank    = index of the lowest set bit of (hv / m), plus 1
  *              (= `bit_count((rest & -rest) - 1) + 1` in SQL);
  *              51 when the remaining 50 bits are all zero
  *  - register m_j = max rank seen in bucket j
  *  - estimate = alpha * m^2 * 2^51 / sum_j 2^(51 - m_j)
  *
  * The harmonic sum is accumulated as an EXACT 64-bit integer
  * (2^(51-m_j) with m_j in [0,51]; max m * 2^51 = 2^61 < 2^63), so
  * the only float ops are a fixed left-to-right multiply/divide chain
  * — IEEE-deterministic and identical in DuckDB. The classic
  * small/large-range corrections are deliberately omitted: they
  * branch through `ln`, whose last-ulp differs across libm
  * implementations, and bit-reproducibility at 100 TB is worth more
  * than the low-cardinality bias (use exact distinct there anyway).
  *
  * reduce/merge are register-wise max — associative + commutative, so
  * Spark's partial aggregation applies and the result is independent
  * of partitioning (the same property [[Exact]] gives decimal sums).
  */
class HllAgg(m: Int = HllAgg.DefaultM)
    extends Aggregator[Long, Array[Byte], Double] {
  require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
  // restBits = 51 assumes rank <= 51; rank can reach
  // 60 - log2(m) + 1, so m < 512 would make `1L << (restBits - rank)`
  // a negative-amount shift (Java masks mod 64 — Long.MIN_VALUE into
  // the harmonic sum, a garbage estimate with no error)
  require(m >= 512, s"m must be >= 512 (rank range vs restBits), got $m")
  private val restBits = 51  // rank range for the hv/m remainder

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(regs: Array[Byte], hv: Long): Array[Byte] = {
    val bucket = (hv % m).toInt
    val rest = hv / m
    val rank =
      if (rest == 0L) restBits
      else java.lang.Long.numberOfTrailingZeros(rest) + 1
    if (rank > regs(bucket)) regs(bucket) = rank.toByte
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(regs: Array[Byte]): Double = {
    var intsum = 0L
    var i = 0
    while (i < m) { intsum += 1L << (restBits - regs(i)); i += 1 }
    val md = m.toDouble
    // no rounding: the harmonic sum is an exact integer and the
    // multiply/divide chain is a fixed left-to-right IEEE sequence,
    // identical in DuckDB — rounding would only reintroduce the
    // 1e-6-boundary hazard the rest of the engine was purged of
    0.7213 / (1.0 + 1.079 / md) * md * md *
      (1L << restBits).toDouble / intsum.toDouble
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HllAgg {
  val DefaultM = 1024

  /** The estimate the oracle must reproduce, as DuckDB SQL over a
    * relation exposing (grp, hv). Kept next to the Scala so the two
    * stay in lockstep.
    */
  def oracleSql(m: Int = DefaultM): String =
    s"""SELECT grp,
       |  0.7213/(1.0 + 1.079/$m.0)*$m.0*$m.0
       |    *(CAST(1 AS BIGINT) << 51)
       |    /CAST(CAST(SUM(CAST(1 AS BIGINT) << (51 - mj)) AS BIGINT)
       |          + ($m - COUNT(*)) * (CAST(1 AS BIGINT) << 51) AS DOUBLE)
       |    AS hll_nd
       |FROM (
       |  SELECT grp, hv % $m AS bucket,
       |    MAX(CASE WHEN hv // $m = 0 THEN 51
       |             ELSE bit_count(((hv // $m) & -(hv // $m)) - 1) + 1
       |        END) AS mj
       |  FROM hashed GROUP BY grp, hv % $m)
       |GROUP BY grp""".stripMargin
}
