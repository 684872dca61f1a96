package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter runtime join pruning: build a compact bitset over the
  * SMALL side's join keys, prefilter the BIG side before it shuffles,
  * then run the ordinary equi-join (which removes the bloom's false
  * positives — the end result is provably identical to the plain
  * join, so the filter is a pure optimization).
  *
  * This is the hand-rollable form of Spark's own runtime-filter
  * rewrite (`InjectRuntimeFilter`). Bit positions come from
  * `xxhash64(key, i)` — codegen'd native hashing on both the build
  * and probe side (the SAME [[Bloom.positions]] expression, so
  * no-false-negatives holds by construction). The bitset never
  * reaches a result: any hash family yields the identical join
  * output (false positives are removed by the join), so the
  * engine-portable md5 hash the data-visible operators use is not
  * needed here — and dropping it removes k MessageDigest calls per
  * probed fact row (d19 1.9 → sub-second at sf0.1). Merge ORs words:
  * associative, commutative, idempotent — partial aggregation
  * applies and the bitset is partitioning-invariant.
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling only rows that can match: the bitset is
  * `bits/8` bytes (64 KiB at 2^19 bits) — broadcast as a literal into
  * a codegen'd filter at the parquet scan, no extra shuffle. With m
  * bits, k hashes and n keys the false-positive rate is
  * `(1 - e^(-kn/m))^k` — size m ≈ 10 bits/key for ~1% at k=4.
  */
class BloomAgg(bits: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
  require(bits > 0 && bits % 64 == 0, s"bits must be a multiple of 64: $bits")

  override def zero: Array[Long] = new Array[Long](bits / 64)

  override def reduce(buf: Array[Long], pos: Seq[Int]): Array[Long] = {
    pos.foreach(p => buf(p >>> 6) |= 1L << (p & 63))
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

  /** The k bit positions of a key — the ONE definition both the
    * build aggregation and the probe filter evaluate (codegen'd
    * xxhash64; `pmod` because xxhash64 spans the full long range).
    */
  def positions(key: Column, bits: Int, k: Int): Column =
    array((0 until k).map(i =>
      pmod(xxhash64(key, lit(i)), lit(bits.toLong)).cast("int")): _*)

  /** Collect the bitset for `small`'s key column (one tiny job; the
    * small side is small by contract — it's the broadcast side).
    */
  def buildBits(small: DataFrame, key: Column, bits: Int, k: Int)
      : Seq[Long] = {
    val agg = udaf(new BloomAgg(bits))
    small.select(agg(positions(key, bits, k)).as("bs"))
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
      // each term computes ITS position directly — same expression as
      // positions()'s element i, so build/probe parity holds. Routing
      // through the positions() array here would inline the k-hash
      // array constructor once per REFERENCE (2 per term: word index
      // + shift amount), i.e. 2k^2 xxhash64 evaluations per probed
      // row — FilterExec codegen does not subexpression-eliminate
      // across the duplicated trees. Direct per-term positions cost
      // 2k (p is still referenced twice), k-fold less work on the
      // one hot path this operator exists to keep cheap.
      val p = pmod(xxhash64(key, lit(i)), lit(bits.toLong)).cast("int")
      val word = element_at(arr, (p / 64).cast("int") + 1)
      // functions.shiftleft only takes a literal shift — go through
      // the registry for a column-valued shift amount
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** The composed operator: equi-join `big ⋈ small` with the big side
    * bloom-prefiltered before the shuffle. Result == plain join.
    * `p / 64` above is exact: p < bits <= 2^30 « 2^53.
    *
    * No-false-negatives requires the build and probe sides to hash
    * IDENTICAL bytes for join-equal keys, but xxhash64 is
    * type-sensitive (int 5 and bigint 5 hash differently), so
    * differently-typed-but-coercible key columns are normalized to a
    * common hash type first: both integral → long, mixed numeric →
    * double (join-equal numerics coerce to the same double), anything
    * string-vs-numeric → double too, because that is the type Spark
    * coerces the join equality to (string '5.0' joins int 5, and both
    * cast to the same 5.0d — hashing the raw string bytes instead
    * would put join-equal keys at different bit positions and DROP
    * matching rows). Any other mixed-type pair has no
    * provably-coercion-matching hash type, so the bloom is SKIPPED
    * and the plain join returned — the contract (result == plain
    * join) always holds; only the optimization degrades. The JOIN
    * still runs on the original columns — normalization affects only
    * the bloom's bit positions.
    */
  def prefilterJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column,
      bits: Int = 1 << 19, k: Int = 4): DataFrame = {
    import org.apache.spark.sql.types._
    val bigT = big.select(bigKey).schema.head.dataType
    val smallT = small.select(smallKey).schema.head.dataType
    val integral: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    def numericish(t: DataType): Boolean =
      t.isInstanceOf[NumericType] || t == StringType
    val hashPair: Option[(Column, Column)] =
      if (bigT == smallT) Some((bigKey, smallKey))
      else if (integral(bigT) && integral(smallT))
        Some((bigKey.cast("long"), smallKey.cast("long")))
      else if (numericish(bigT) && numericish(smallT))
        // mixed numeric, or string-vs-numeric: Spark compares both as
        // double, so hash the double (unparseable strings cast to
        // null, which is never join-equal — no false negative)
        Some((bigKey.cast("double"), smallKey.cast("double")))
      else None
    hashPair match {
      case Some((hashBig, hashSmall)) =>
        val bs = buildBits(small, hashSmall, bits, k)
        big.filter(mightContain(bs, hashBig, bits, k))
          .join(small, bigKey === smallKey)
      case None => // no safe common hash type — skip the optimization
        big.join(small, bigKey === smallKey)
    }
  }
}
