package graft.ops

import graft.expressions.Kernels
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signatures as a typed `Aggregator[IN, BUF, OUT]` — the
  * custom-aggregate surface SURVEY §2e reserves for sketch types. One
  * mutable k-long buffer per group replaces k separate `min()`
  * aggregate columns ([[Dedup.minhashSignatures]]); both forms are
  * bit-identical (same salted portable hashes) and the column form's
  * SQL oracle verifies this one too.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  // same affine universal-hash family as Dedup.minhashSignatures:
  // g_i = (c_i * h + d_i) mod p off one md5 digest per shingle
  private val coeffs = Dedup.minhashCoeffs(k)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val h = Kernels.portableHash60(
      UTF8String.fromString(shingle)) % Dedup.MinhashPrime
    var i = 0
    while (i < k) {
      val g = (h * coeffs(i)._1 + coeffs(i)._2) % Dedup.MinhashPrime
      if (g < buf(i)) buf(i) = g
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
