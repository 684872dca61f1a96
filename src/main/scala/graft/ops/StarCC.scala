package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14) — the O(log n)-round CC algorithm.
  *
  * d12's min-label propagation needs GRAPH-DIAMETER rounds: a
  * 10^6-node chain needs 10^6 hops, each a full shuffle. Star
  * contraction halves component heights every alternation, so 100 TB
  * dup graphs (whose giant boilerplate components can be deep)
  * finish in tens of rounds worst-case, each round the same two
  * primitives: a node-keyed min aggregate and a node-keyed join —
  * shuffle-partitionable, partial-agg-friendly, no new machinery.
  *
  * Determinism: every emitted edge is a pure function of the round's
  * input edge set (min over neighborhoods, ties impossible on
  * distinct ids), so a fixed round count replays bit-exactly in the
  * DuckDB oracle whether or not the graph has converged — same
  * discipline as d12/g01's unrolled iterations.
  */
object StarCC {

  /** Large-star: for every node u, connect each STRICTLY LARGER
    * neighbor v to m(u) = min(Γ(u) ∪ u). Input: undirected edges as
    * (u, v) pairs in either orientation, no self loops. Output: same
    * representation.
    */
  def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
    val mn = sym.groupBy("u")
      .agg(least(min(col("v")), col("u")).as("m"))
    sym.join(mn, "u")
      .filter(col("v") > col("u") && col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: orient every edge max→min; for every node u,
    * connect u and each of its smaller neighbors to
    * m(u) = min(smaller neighbors).
    */
  def smallStar(edges: DataFrame): DataFrame = {
    val o = edges.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
    val mn = o.groupBy("u").agg(min(col("v")).as("m"))
    val linked = o.join(mn, "u")
    linked.select(col("v").as("u"), col("m").as("v"))
      .unionByName(linked.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** `rounds` alternations of large+small star, each round's edge set
    * eagerly materialized (the d12/g01 iterative-lineage discipline).
    * Returns (node, root) for every NON-singleton node — union the
    * vertex set with root=self for isolated nodes.
    */
  def components(edges: DataFrame, rounds: Int): DataFrame = {
    var e = edges.filter(col("u") =!= col("v")).distinct().localCheckpoint()
    for (_ <- 1 to rounds)
      e = smallStar(largeStar(e)).localCheckpoint()
    // converged edges are (child, root); a node can still appear on
    // both sides mid-convergence, so take the min root per node
    e.select(greatest(col("u"), col("v")).as("node"),
        least(col("u"), col("v")).as("r"))
      .groupBy("node").agg(min("r").as("root"))
  }
}
