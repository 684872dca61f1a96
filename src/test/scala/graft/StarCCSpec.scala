package graft

import graft.ops.StarCC
import org.apache.spark.sql.functions._

/** Star-contraction CC against ground truth on graphs where
  * convergence genuinely takes multiple alternations (chains — the
  * worst case for min-label propagation), plus invariance checks the
  * oracle can't express.
  */
class StarCCSpec extends SparkSpec {
  import spark.implicits._

  private def rootsOf(edges: Seq[(Long, Long)], nodes: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    val e = edges.toDF("u", "v")
    val r = StarCC.components(e, rounds)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    nodes.map(n => n -> r.getOrElse(n, n)).toMap
  }

  test("chains, cliques, and singletons resolve to component minima") {
    // chain 1-2-3-4-5-6-7-8 (depth 7), clique {10,11,12}, edge {20,21},
    // singleton 30
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
      (10, 11), (11, 12), (10, 12), (20, 21))
    val nodes = (1L to 8L) ++ Seq(10L, 11L, 12L, 20L, 21L, 30L)
    val got = rootsOf(edges, nodes, rounds = 4)
    (1L to 8L).foreach(n => assert(got(n) === 1L, s"node $n"))
    Seq(10L, 11L, 12L).foreach(n => assert(got(n) === 10L))
    assert(got(20L) === 20L && got(21L) === 20L)
    assert(got(30L) === 30L)
  }

  test("star contraction beats diameter: depth-15 chain in 4 rounds") {
    // label propagation would need 15 hops; each large+small
    // alternation at least halves star heights
    val edges = (1L until 16L).map(i => (i, i + 1))
    val got = rootsOf(edges, 1L to 16L, rounds = 4)
    (1L to 16L).foreach(n => assert(got(n) === 1L, s"node $n"))
  }

  test("random graphs match union-find ground truth") {
    // seeded random graphs (deterministic), roots = component minima
    // via a plain Scala union-find; log2(n)+2 alternations suffice
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(20)
      val edges = Seq.fill(n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      val truth = (0 until n).map { v =>
        // component root = min node of the component
        val root = (0 until n).filter(u => find(u) == find(v)).min
        v.toLong -> root.toLong
      }.toMap
      val rounds = (math.log(n.toDouble) / math.log(2)).ceil.toInt + 2
      val got = rootsOf(edges, (0L until n).toSeq, rounds)
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      touched.foreach { v =>
        assert(got(v) === truth(v), s"seed=$seed node=$v")
      }
    }
  }

  test("convergence fixpoint: one extra round changes nothing, and the " +
    "dedup cadence is result-inert") {
    // the hash-exact oracle replays the same fixed rounds, so it
    // verifies determinism, not convergence — this is the convergence
    // assertion: at the depth bound (2^rounds), running rounds+1
    // produces the identical root map, i.e. the groups ARE connected
    // components, not an artifact of stopping early
    val rnd = new scala.util.Random(42)
    val n = 40
    val edges = Seq.fill(60) {
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.filter { case (a, b) => a != b }
    val e = edges.toDF("u", "v")
    def run(rounds: Int, dedupEvery: Int = 1) =
      StarCC.components(e, rounds, dedupEvery = dedupEvery)
        .orderBy("node").collect().toSeq
    val base = run(7)
    assert(run(8) === base, "not converged: an extra round moved roots")
    // duplicates between dedups never change any window minimum or the
    // final min aggregate — cadence is purely a cost knob
    assert(run(7, dedupEvery = 2) === base)
    assert(run(7, dedupEvery = 7) === base)
  }

  test("result is invariant to edge orientation and input partitioning") {
    val edges = Seq[(Long, Long)]((5, 3), (3, 9), (9, 1), (2, 7))
    val flipped = edges.map { case (a, b) => (b, a) }
    val a = StarCC.components(edges.toDF("u", "v"), 3)
      .orderBy("node").collect().toSeq
    val b = StarCC.components(flipped.toDF("u", "v").repartition(7), 3)
      .orderBy("node").collect().toSeq
    assert(a === b)
  }

  /** groupSizes must match a window count over the coalesce labeling
    * for any NODE-UNIQUE (node, root) table (the components() output
    * contract, r17) — including NON-converged stars where a root
    * value still appears as a node (the case a fixed-round run can
    * produce and the correctness gates never do; a naive
    * member-count+1 is off by one and misattributed exactly there). */
  test("groupSizes == window count over the coalesce labeling, converged or not") {
    import org.apache.spark.sql.expressions.Window
    def check(rootRows: Seq[(Long, Long)], docs: Seq[Long]): Unit = {
      val roots = rootRows.toDF("node", "root")
      val base = docs.toDF("doc_id")
      val labeled = base
        .join(roots, col("doc_id") === col("node"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("root"), col("doc_id")).as("group_id"))
      val viaWindow = labeled
        .withColumn("nc",
          count(lit(1)).over(Window.partitionBy("group_id")))
        .select("doc_id", "nc").orderBy("doc_id").collect().toSeq
      val viaSizes = labeled
        .join(StarCC.groupSizes(roots), Seq("group_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("nc"), lit(1L)).as("nc"))
        .orderBy("doc_id").collect().toSeq
      assert(viaSizes === viaWindow, s"roots=$rootRows")
    }
    val docs = (1L to 8L)
    // converged: {1,2,3} rooted at 1; {5,6} at 5; 4,7,8 singletons
    check(Seq((2L, 1L), (3L, 1L)), docs)
    // NOT converged: 2 points at 1, 3 points at 2 — label "2" exists
    // as a group id (doc3) while doc2 itself is labeled 1
    check(Seq((2L, 1L), (3L, 2L)), docs)
    // deeper chain, multiple half-contracted groups
    check(Seq((2L, 1L), (3L, 2L), (4L, 3L), (6L, 5L), (8L, 7L)), docs)
    // star root also mid-chain elsewhere
    check(Seq((5L, 1L), (6L, 5L), (7L, 6L)), docs)
  }
}
