package graft

import graft.ops.KllAgg
import org.apache.spark.sql.functions._

/** ops/Kll — the MRL/KLL quantile sketch. The exact regime (n <= k)
  * is oracle-gated in d24; these tests cover what the oracle can't:
  * the approximation regime's rank-error bound, merge-shape
  * invariance within the bound, and the bounded-state property that
  * justifies the sketch at scale.
  */
class KllSpec extends SparkSpec {

  // deterministic pseudo-random longs (no java.util.Random seed drift
  // across JDKs): splitmix64 walk
  private def data(n: Int, seed: Long = 42L): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) & 0xffffffL // bounded domain, dense duplicates
    }
  }

  private def trueRank(sorted: Array[Long], v: Long): Int = {
    // rank of v = number of elements <= v (matches cumulative-weight
    // semantics)
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def sketchOf(vs: Array[Long], k: Int,
      num: Long = 1, den: Long = 2): (KllAgg, Array[Long]) = {
    val agg = new KllAgg(num, den, k)
    var buf = agg.zero
    vs.foreach(v => buf = agg.reduce(buf, v))
    (agg, buf)
  }

  test("exact regime: quantiles equal the rank-ceil order statistic") {
    val vs = data(5000)
    val sorted = vs.sorted
    for ((num, den) <- Seq((1L, 2L), (9L, 10L), (99L, 100L), (1L, 100L))) {
      val (agg, buf) = sketchOf(vs, k = 8192, num, den)
      val expect = sorted(((num * vs.length + den - 1) / den).toInt - 1)
      assert(agg.finish(buf) == expect, s"q=$num/$den")
    }
  }

  test("approx regime: rank error within 2% of n at k=512, n=100k") {
    val n = 100000
    val vs = data(n)
    val sorted = vs.sorted
    for ((num, den) <- Seq((1L, 2L), (9L, 10L), (99L, 100L))) {
      val (agg, buf) = sketchOf(vs, k = 512, num, den)
      val est = agg.finish(buf)
      val target = (num * n + den - 1) / den
      val err = math.abs(trueRank(sorted, est) - target).toDouble / n
      assert(err <= 0.02, s"q=$num/$den rank error $err")
    }
  }

  test("approx regime: bounded state (retained <= k * levels)") {
    val n = 200000
    val k = 512
    val (_, buf) = sketchOf(data(n), k)
    val retained = KllAgg.retained(buf)
    val levels = buf(1).toInt
    assert(retained <= k * levels, s"retained $retained, levels $levels")
    // levels grow logarithmically in n/k
    assert(levels <= 33 - java.lang.Integer.numberOfLeadingZeros(n / k) + 3,
      s"levels $levels for n=$n k=$k")
    assert(retained < n / 50, s"sketch retained $retained of $n — not a sketch")
  }

  test("merge-shape invariance: chunked merges stay within the bound") {
    val n = 100000
    val vs = data(n)
    val sorted = vs.sorted
    val agg = new KllAgg(9, 10, 512)
    for (chunks <- Seq(4, 16, 64)) {
      var buf = agg.zero
      vs.grouped(n / chunks + 1).foreach { chunk =>
        var part = agg.zero
        chunk.foreach(v => part = agg.reduce(part, v))
        buf = agg.merge(buf, part)
      }
      val est = agg.finish(buf)
      val target = (9L * n + 9) / 10
      val err = math.abs(trueRank(sorted, est) - target).toDouble / n
      assert(err <= 0.02, s"chunks=$chunks rank error $err")
    }
  }

  test("sketch/merge split (x22 pattern): persisted partials fold to " +
      "the one-shot answer in the exact regime") {
    val k = 1 << 14
    val sketch = udaf(new graft.ops.KllSketchAgg(k))
    val p50m = udaf(new graft.ops.KllMergeAgg(1, 2))
    val p50 = udaf(new KllAgg(1, 2, k))
    val df = spark.range(9000).select(
      (col("id") % 3).as("grp"),
      ((col("id") * 1103515245L) % 50000L).as("v"),
      (col("id") % 5).as("slice")) // 5 "batches"
    val partials = df.groupBy("grp", "slice").agg(sketch(col("v")).as("sk"))
    val merged = partials.groupBy("grp").agg(p50m(col("sk")).as("p50"))
      .orderBy("grp").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val oneShot = df.groupBy("grp").agg(p50(col("v")).as("p50"))
      .orderBy("grp").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged == oneShot)
  }

  test("exact regime in Spark: result invariant to partitioning") {
    val p50 = udaf(new KllAgg(1, 2, 1 << 16))
    val df = spark.range(10000).select(
      (col("id") % 7).as("grp"),
      ((col("id") * 2654435761L) % 100000L).as("v"))
    def run(parts: Int) =
      df.repartition(parts).groupBy("grp").agg(p50(col("v")).as("p50"))
        .orderBy("grp").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) == run(13))
  }
}
