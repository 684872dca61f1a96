package graft

import graft.ops.KllAgg
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the hand-rolled kernels whose edge cases
  * hide in size/parity/duplicate corners: the ArrayPairs generator's
  * combinatorial contract and the KLL sketch's exact-regime /
  * bounded-state invariants over arbitrary inputs (not just the
  * fixture shapes the oracle gate sees).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  // ---- ArrayPairs -------------------------------------------------

  private def pairsOf(a: Array[Long]): Seq[(Long, Long)] = {
    // drive the Generator directly through eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val gen = graft.expressions.ArrayPairs(
      Literal.create(ArrayData.toArrayData(a), ArrayType(LongType)))
    gen.eval(null).iterator.map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("array_pairs: emits exactly the i<j index pairs, in order") {
    check("count+content", Prop.forAll(
      Gen.containerOf[Array, Long](Gen.choose(-5L, 5L))) { a =>
      val got = pairsOf(a)
      val expect = for {
        i <- a.indices; j <- (i + 1) until a.length
      } yield (a(i), a(j))
      got == expect && got.size == a.length * (a.length - 1) / 2
    })
  }

  test("array_pairs on a sorted duplicate-free array == the a<b " +
      "self-join pair set") {
    check("selfjoin-equiv", Prop.forAll(
      Gen.containerOf[Array, Long](Gen.choose(0L, 40L))) { raw =>
      val a = raw.distinct.sorted
      val got = pairsOf(a).toSet
      val expect = (for {
        x <- a; y <- a if x < y
      } yield (x, y)).toSet
      got == expect
    })
  }

  // ---- KLL --------------------------------------------------------

  test("kll: exact regime returns the rank-ceil order statistic for " +
      "any data, quantile, and insertion order") {
    val gen = for {
      vs <- Gen.nonEmptyContainerOf[Array, Long](Gen.choose(-1000L, 1000L))
      den <- Gen.choose(1L, 100L)
      num <- Gen.choose(1L, den)
    } yield (vs, num, den)
    check("exact-regime", Prop.forAll(gen) { case (vs, num, den) =>
      val k = 1 << 14 // above any generated size: no compaction
      val agg = new KllAgg(num, den, k)
      var buf = agg.zero
      vs.foreach(v => buf = agg.reduce(buf, v))
      val sorted = vs.sorted
      val rank = ((num * vs.length + den - 1) / den).toInt.max(1)
      agg.finish(buf) == sorted(rank - 1)
    })
  }

  test("kll: merge of arbitrary splits == sequential build (exact regime)") {
    val gen = for {
      vs <- Gen.nonEmptyContainerOf[Array, Long](Gen.choose(0L, 500L))
      cut <- Gen.choose(0, 10)
    } yield (vs, cut)
    check("merge-split", Prop.forAll(gen) { case (vs, cut) =>
      val k = 1 << 14
      val agg = new KllAgg(1, 2, k)
      val splitAt = if (vs.length == 0) 0 else cut % (vs.length + 1)
      var a = agg.zero
      vs.take(splitAt).foreach(v => a = agg.reduce(a, v))
      var b = agg.zero
      vs.drop(splitAt).foreach(v => b = agg.reduce(b, v))
      val merged = agg.finish(agg.merge(a, b))
      var seq = agg.zero
      vs.foreach(v => seq = agg.reduce(seq, v))
      merged == agg.finish(seq)
    })
  }

  test("kmv: sketch is exactly the k smallest distinct values, " +
      "under any insertion order and split") {
    val gen = for {
      vs <- Gen.containerOf[Array, Long](Gen.choose(0L, 300L))
      k <- Gen.choose(2, 64)
      cut <- Gen.choose(0, 10)
    } yield (vs, k, cut)
    check("kmv-bottomk", Prop.forAll(gen) { case (vs, k, cut) =>
      val agg = new graft.ops.KmvAgg(k)
      var buf = agg.zero
      vs.foreach(v => buf = agg.reduce(buf, v))
      val expect = vs.distinct.sorted.take(k).toSeq
      val seq = agg.finish(buf) == expect
      // arbitrary two-way split + merge gives the identical state
      val splitAt = if (vs.length == 0) 0 else cut % (vs.length + 1)
      var a = agg.zero
      vs.take(splitAt).foreach(v => a = agg.reduce(a, v))
      var b = agg.zero
      vs.drop(splitAt).foreach(v => b = agg.reduce(b, v))
      seq && agg.finish(agg.merge(a, b)) == expect
    })
  }

  test("kll: state stays bounded under any input (approx regime)") {
    check("bounded-state", Prop.forAll(
      Gen.containerOfN[Array, Long](20000, Gen.choose(Long.MinValue / 2,
        Long.MaxValue / 2))) { vs =>
      val agg = new KllAgg(1, 2, 64)
      var buf = agg.zero
      vs.foreach(v => buf = agg.reduce(buf, v))
      val levels = buf(1).toInt
      KllAgg.retained(buf) <= 64 * levels && levels <= 16
    })
  }
}
