package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-bin histogram quantile sketch as a typed `Aggregator` —
  * the approximate-quantile path whose answer is BIT-REPRODUCIBLE
  * across engines and partitionings (Spark's `approx_percentile`
  * and t-digest sketches are engine-private and merge-order
  * sensitive; this one is pure integer arithmetic):
  *
  *  - values land in `nBins` fixed-width integer bins
  *    (`clamp(x div width, 0, nBins-1)`);
  *  - the buffer is the per-bin count vector — merge is elementwise
  *    sum (associative + commutative → partial aggregation applies
  *    and partitioning can't change the result);
  *  - quantile q = num/den reports the MIDPOINT of the first bin
  *    whose cumulative count reaches `ceil(q * N)`.
  *
  * Error is bounded by width/2 in value space — pick the bin width
  * like any histogram (domain/width bins of 8 bytes each; the 100 TB
  * trade is sketch size vs value resolution, and the sketch ships
  * O(nBins) per group instead of the value multiset).
  */
class HistQuantileAgg(width: Long, nBins: Int, qNum: Long, qDen: Long)
    extends Aggregator[Long, Array[Long], Long] {
  require(width > 0 && nBins > 0 && qNum >= 0 && qNum <= qDen && qDen > 0,
    s"bad params: width=$width nBins=$nBins q=$qNum/$qDen")

  override def zero: Array[Long] = new Array[Long](nBins)

  override def reduce(counts: Array[Long], x: Long): Array[Long] = {
    val b = math.min(math.max(x / width, 0L), (nBins - 1).toLong).toInt
    counts(b) += 1
    counts
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBins) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(counts: Array[Long]): Long = {
    var n = 0L
    counts.foreach(n += _)
    if (n == 0) return -1L
    val rank = (qNum * n + qDen - 1) / qDen  // ceil(q * N), exact
    var cum = 0L
    var i = 0
    while (i < nBins) {
      cum += counts(i)
      if (cum >= rank) return i.toLong * width + width / 2
      i += 1
    }
    (nBins - 1).toLong * width + width / 2
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HistQuantileAgg {
  /** DuckDB mirror of the estimate over a relation `binned(grp, b)`
    * where `b` is the (already clamped) bin index — kept beside the
    * Scala so the two stay in lockstep.
    */
  def oracleSql(width: Long, qNum: Long, qDen: Long, as: String): String =
    s"""CAST(MIN(CASE WHEN cum >= ($qNum * tot + $qDen - 1) // $qDen
       |  THEN b * $width + ${width / 2} END) AS BIGINT) AS $as""".stripMargin
}
