package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14) — the O(log n)-round CC algorithm.
  *
  * d12's min-label propagation needs GRAPH-DIAMETER rounds: a
  * 10^6-node chain needs 10^6 hops, each a full shuffle. Star
  * contraction halves component heights every alternation, so 100 TB
  * dup graphs (whose giant boilerplate components can be deep)
  * finish in tens of rounds worst-case.
  *
  * Cost shape per alternation: ONE node-keyed exchange per star (the
  * neighborhood minimum is a window aggregate over partitionBy(u) —
  * the groupBy-then-join form paid a second exchange and re-executed
  * the join once per union branch) plus the round-closing distinct.
  * Both exchanges are plain hash-partitionings on the node id —
  * shuffle-partitionable, AQE-coalescable, no new machinery.
  *
  * Determinism: every round's emitted edge SET is a pure function of
  * the round's input edge set (min over neighborhoods, ties
  * impossible on distinct ids), so a fixed round count replays
  * bit-exactly in the DuckDB oracle ([[graft.queries.StarSql]])
  * whether or not the graph has converged — same discipline as
  * d12/g01's unrolled iterations. Intermediate large-star output may
  * carry duplicate rows (deduplication is deferred to the
  * alternation-closing distinct); only the per-round SET is part of
  * the contract.
  */
object StarCC {

  /** Large-star: for every node u, connect each STRICTLY LARGER
    * neighbor v to m(u) = min(Γ(u) ∪ u). Input: undirected edges as
    * (u, v) pairs in either orientation, no self loops. Output: same
    * representation, NOT deduplicated (see object doc).
    */
  def largeStar(edges: DataFrame): DataFrame = {
    // one-pass symmetrize (explode, not a self-union): the input is
    // read ONCE, so the whole alternation chain stays a linear
    // pipeline with no double-consumed stage anywhere — which is what
    // lets components() run all rounds as one job without per-round
    // materialization
    val sym = edges
      .select(explode(array(
        struct(col("u").as("u"), col("v").as("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("s"))
      .select(col("s.u").as("u"), col("s.v").as("v"))
    val m = least(min(col("v")).over(Window.partitionBy("u")), col("u"))
    sym.withColumn("m", m)
      .filter(col("v") > col("u") && col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: orient every edge max→min; for every node u,
    * connect u and each of its smaller neighbors to
    * m(u) = min(smaller neighbors). Deduplicates (closes the
    * alternation) unless `dedup = false` — duplicates never change
    * any round's emitted SET or the final min aggregate, so the LAST
    * round of [[components]] skips the exchange and lets the closing
    * groupBy-min absorb them.
    */
  def smallStar(edges: DataFrame, dedup: Boolean = true): DataFrame = {
    val o = edges.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
    val out = o
      .withColumn("m", min(col("v")).over(Window.partitionBy("u")))
      .select(explode(array(
        struct(col("v").as("u"), col("m").as("v")),
        struct(col("u").as("u"), col("m").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .filter(col("u") =!= col("v"))
    if (dedup) out.distinct() else out
  }

  /** `rounds` alternations of large+small star. Every stage consumes
    * its input exactly once (one-pass symmetrize, window aggregates,
    * one-pass star emission), so the whole iteration is ONE linear
    * pipeline and runs as a single job — no per-round
    * materialization, whose fixed cost dominated at small scale (the
    * checkpointed form measured 2× slower at sf0.1). At cluster
    * scale, pass `checkpointEvery` > 0 to bound lineage depth /
    * failure-recovery re-execution to that many alternations.
    * Returns (node, root) for every NON-singleton node — union the
    * vertex set with root=self for isolated nodes.
    */
  def components(edges: DataFrame, rounds: Int,
      checkpointEvery: Int = 0,
      distinctInput: Boolean = true): DataFrame = {
    // callers whose edge stream is distinct by construction (a
    // groupBy-keyed pair aggregate, like d12's) pass
    // distinctInput = false and skip one exchange of the FULL edge
    // set — duplicates would be harmless anyway (window minima and
    // per-round distincts absorb them), the flag is purely cost.
    var e = edges.filter(col("u") =!= col("v"))
    if (distinctInput) e = e.distinct()
    for (r <- 1 to rounds) {
      e = smallStar(largeStar(e), dedup = r < rounds)
      if (checkpointEvery > 0 && r % checkpointEvery == 0)
        e = e.localCheckpoint()
    }
    // converged edges are (child, root); a node can still appear on
    // both sides mid-convergence, so take the min root per node
    // (this aggregate also absorbs the last round's skipped dedup)
    e.select(greatest(col("u"), col("v")).as("node"),
        least(col("u"), col("v")).as("r"))
      .groupBy("node").agg(min("r").as("root"))
  }
}
