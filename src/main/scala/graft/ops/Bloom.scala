package graft.ops

import graft.expressions.Kernels
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter runtime join pruning: build a compact bitset over the
  * SMALL side's join keys, prefilter the BIG side before it shuffles,
  * then run the ordinary equi-join (which removes the bloom's false
  * positives — the end result is provably identical to the plain
  * join, so the filter is a pure optimization).
  *
  * This is the hand-rollable form of Spark's own runtime-filter
  * rewrite (`InjectRuntimeFilter`), with the engine's portable-hash
  * determinism contract: bit positions come from the salted 60-bit
  * md5 hash ([[Text.saltedHash]]), so the bitset is bit-identical on
  * any cluster/partitioning (reduce sets bits; merge ORs words —
  * associative, commutative, idempotent).
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling only rows that can match: the bitset is
  * `bits/8` bytes (64 KiB at 2^19 bits) — broadcast as a literal into
  * a codegen'd filter at the parquet scan, no extra shuffle. With m
  * bits, k hashes and n keys the false-positive rate is
  * `(1 - e^(-kn/m))^k` — size m ≈ 10 bits/key for ~1% at k=4.
  */
class BloomAgg(bits: Int, k: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(bits > 0 && bits % 64 == 0, s"bits must be a multiple of 64: $bits")
  require(k > 0, s"need k > 0, got $k")

  override def zero: Array[Long] = new Array[Long](bits / 64)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = Kernels.portableHash60(UTF8String.fromString(s"$key|s$i"))
      val pos = (h % bits).toInt // h in [0, 2^60): % == pmod
      buf(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object Bloom {

  /** Collect the bitset for `small`'s key column (one tiny job; the
    * small side is small by contract — it's the broadcast side).
    */
  def buildBits(small: DataFrame, key: Column, bits: Int, k: Int)
      : Seq[Long] = {
    val agg = udaf(new BloomAgg(bits, k))
    small.select(agg(key.cast("string")).as("bs"))
      .head.getSeq[Long](0)
  }

  /** Membership test as a codegen'd expression over the driver-built
    * bitset (embedded as an array literal — the "broadcast variable"
    * of the declarative world). May return true for a non-member
    * (false positive), never false for a member.
    */
  def mightContain(bitset: Seq[Long], key: Column, bits: Int, k: Int)
      : Column = {
    val arr = typedlit(bitset)
    (0 until k).map { i =>
      val pos = Text.saltedHash(key.cast("string"), i) % bits
      val word = element_at(arr, (pos / 64).cast("int") + 1)
      // functions.shiftleft only takes a literal shift — go through
      // the registry for a column-valued shift amount
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** The composed operator: equi-join `big ⋈ small` with the big side
    * bloom-prefiltered before the shuffle. Result == plain join.
    * `pos / 64` above is exact: pos < bits <= 2^30 « 2^53.
    */
  def prefilterJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column,
      bits: Int = 1 << 19, k: Int = 4): DataFrame = {
    val bs = buildBits(small, smallKey, bits, k)
    big.filter(mightContain(bs, bigKey, bits, k))
      .join(small, bigKey === smallKey)
  }
}
