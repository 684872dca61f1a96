package graft.ops

import graft.expressions.Kernels
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Count–min sketch as a typed `Aggregator` — one-pass approximate
  * frequency counts in O(d*w) memory regardless of key cardinality
  * (the heavy-hitter sketch of SURVEY §2e's mergeable-sketch family;
  * the reference's frequency analyses rescan with exact groupBys,
  * e.g. `gpu_bdb/queries/q01`'s pair counts).
  *
  * Determinism contract (same discipline as [[HllAgg]]): buckets come
  * from the salted 60-bit portable hash (`md5`-derived, engine-
  * portable — [[Text.saltedHash]]), counters are exact integers, and
  * reduce/merge are counter additions — associative + commutative, so
  * Spark's partial aggregation applies and the sketch is bit-identical
  * under any partitioning. A SQL oracle reproduces every counter with
  * d GROUP BYs.
  *
  * Estimate for key x: `min_i counters[i][h_i(x) mod w]` — an upper
  * bound on the true count (collisions only inflate), within
  * `2n/w` of exact with probability `1 - 2^-d`.
  *
  * At 100 TB: the sketch is ~d*w*8 bytes (96 KiB at 3x4096) per
  * partial — constant-size partials shuffle to one reducer, versus an
  * exact groupBy whose shuffle scales with key cardinality.
  */
class CmsAgg(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(d > 0 && w > 0, s"need d,w > 0, got d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < d) {
      // same salt scheme as Text.saltedHash: "key|s<i>"
      val h = Kernels.portableHash60(UTF8String.fromString(s"$key|s$i"))
      buf(i * w + (h % w).toInt) += 1L // h in [0, 2^60): % == pmod
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object Cms {

  /** Point-estimate column against a flattened counters column (the
    * [[CmsAgg]] output, broadcast alongside the keys to estimate):
    * `least` over the d counter rows, all index math in exact integers.
    */
  def estimate(counters: Column, key: Column, d: Int, w: Int): Column = {
    val lookups = (0 until d).map { i =>
      val bucket = (Text.saltedHash(key.cast("string"), i) % w).cast("int")
      element_at(counters, lit(i * w) + bucket + 1)
    }
    least(lookups: _*)
  }
}
