package graft

import graft.expressions.{CosIndex, Kernels}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial equivalence checks for the round-12 band-limited
  * round6 kernels: [[Kernels.argmaxCos]] rounds only candidates
  * within 1.01e-6 of the raw max, and [[Kernels.semdedupDups]] only
  * the 1e-6 band around tau — both claimed provably identical to
  * rounding EVERY cosine with the BigDecimal exact-expansion round.
  * Fixture gates rarely produce cosines within 1e-6 of each other or
  * of tau, so this spec drives the kernels with constructed near-tie
  * inputs (duplicate centroids = exact ties, scaled copies = equal
  * cosines with different ids, 1-ulp-ish perturbations, zero-norm
  * NaN rows) against a reference that rounds everything.
  */
class Round6BandSpec extends AnyFunSuite {

  private def round6(c: Double): Double =
    if (c.isNaN || c.isInfinite) c
    else new java.math.BigDecimal(c)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Reference argmax: round EVERY cosine (the pre-band-limit form). */
  private def refArgmax(v: Array[Float], cents: Array[Array[Float]],
      ids: Array[Long]): Long = {
    val dim = v.length
    var na = 0.0
    var j = 0
    while (j < dim) { val x = v(j).toDouble; na += x * x; j += 1 }
    val sna = math.sqrt(na)
    var best = Double.NegativeInfinity; var bestId = Long.MaxValue
    var haveBest = false
    var c = 0
    while (c < cents.length) {
      var dot = 0.0; var nc = 0.0
      var i = 0
      while (i < dim) {
        val x = cents(c)(i).toDouble
        dot += v(i).toDouble * x; nc += x * x; i += 1
      }
      val cos = round6(dot / (sna * math.sqrt(nc)))
      val cmp = java.lang.Double.compare(cos, best)
      if (!haveBest || cmp > 0 || (cmp == 0 && ids(c) < bestId)) {
        best = cos; bestId = ids(c); haveBest = true
      }
      c += 1
    }
    bestId
  }

  /** Reference dup scan: round EVERY pair cosine. */
  private def refDups(ids: Array[Long], vecs: Array[Array[Float]],
      tau: Double): Seq[Long] = {
    val dim = if (vecs.isEmpty) 0 else vecs(0).length
    val norms = vecs.map { v =>
      var s = 0.0; var j = 0
      while (j < dim) { val x = v(j).toDouble; s += x * x; j += 1 }
      math.sqrt(s)
    }
    (1 until vecs.length).filter { i =>
      (0 until i).exists { j =>
        var dot = 0.0; var k = 0
        while (k < dim) { dot += vecs(i)(k).toDouble * vecs(j)(k).toDouble; k += 1 }
        java.lang.Double.compare(round6(dot / (norms(i) * norms(j))), tau) >= 0
      }
    }.map(ids(_))
  }

  private val dim = 4

  /** Vectors drawn from a tiny integer lattice so distinct vectors
    * still produce many EXACTLY equal and near-equal cosines, plus
    * scaled copies (same direction, different id) and a zero vector
    * (NaN cosine) with real probability. */
  private val vecGen: Gen[Array[Float]] = Gen.frequency(
    (8, Gen.listOfN(dim, Gen.chooseNum(-2, 2).map(_.toFloat))
      .map(_.toArray)),
    (1, Gen.const(Array.fill(dim)(0f))))

  private def scaled(v: Array[Float], s: Float): Array[Float] =
    v.map(_ * s)

  test("argmaxCos band-limit == round-everything reference (near-tie inputs)") {
    val caseGen = for {
      q <- vecGen
      base <- Gen.nonEmptyListOf(vecGen).map(_.take(6))
      dups <- Gen.listOf(Gen.zip(Gen.chooseNum(0, base.length - 1),
        Gen.oneOf(1f, 2f, 0.5f))).map(_.take(4))
    } yield {
      // duplicate/scaled centroids: equal round-6 cosine, distinct id
      val cents = (base ++ dups.map { case (i, s) => scaled(base(i), s) })
        .toArray
      (q, cents, cents.indices.map(i => (i * 7 + 3).toLong).toArray)
    }
    val p = Prop.forAll(caseGen) { case (q, cents, ids) =>
      val idx = new CosIndex(cents.flatten, ids)
      val got = Kernels.argmaxCos(ArrayData.toArrayData(q), idx)
      val want = refArgmax(q, cents, ids)
      got == want
    }
    val r = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(2000), p)
    assert(r.passed, s"argmax-band: $r")
  }

  test("semdedupDups band-limit == round-everything reference (tau at a cosine value)") {
    val caseGen = for {
      base <- Gen.nonEmptyListOf(vecGen).map(_.take(6))
      dups <- Gen.listOf(Gen.zip(Gen.chooseNum(0, base.length - 1),
        Gen.oneOf(1f, 3f))).map(_.take(4))
      // tau choices that sit EXACTLY on reachable round-6 cosines
      // (0, ±0.5, 1) and just off them — the band edges
      tau <- Gen.oneOf(0.0, 0.5, 1.0, -0.5, 0.4999995, 0.5000005,
        1.0 - 1e-6, 0.716115)
    } yield {
      val vecs = (base ++ dups.map { case (i, s) => scaled(base(i), s) })
        .toArray
      (vecs, vecs.indices.map(i => (i * 3 + 1).toLong).toArray, tau)
    }
    val p = Prop.forAll(caseGen) { case (vecs, ids, tau) =>
      val got = Kernels.semdedupDups(
        ArrayData.toArrayData(ids),
        ArrayData.toArrayData(vecs.flatten), tau)
        .toLongArray().toSeq
      val want = refDups(ids, vecs, tau)
      got == want
    }
    val r = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(2000), p)
    assert(r.passed, s"dups-band: $r")
  }

  test("zero-norm query: NaN cosines tie, lowest id wins on both paths") {
    val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val ids = Array(9L, 4L)
    val idx = new CosIndex(cents.flatten, ids)
    val q = Array(0f, 0f, 0f, 0f)
    assert(Kernels.argmaxCos(ArrayData.toArrayData(q), idx) ==
      refArgmax(q, cents, ids))
    assert(Kernels.argmaxCos(ArrayData.toArrayData(q), idx) == 4L)
  }
}
