package graft

import graft.ops.KCore
import org.apache.spark.sql.functions._

/** K-core peeling properties the oracle can't express: simultaneous
  * (not cascading) within-round semantics, pendant-chain removal with
  * a surviving dense core, and fixpoint convergence of the committed
  * round count on the gated corpus (the d12 convergence discipline).
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) = {
    val p = pairs.toDF("src", "dst")
    p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("peel round is SIMULTANEOUS: a path peels from both ends, one " +
    "layer per round") {
    // a-b-c-d, k=2: round 1 removes the endpoints only (b and c both
    // still had degree 2 when degrees were measured), round 2 empties
    val e = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val r1 = KCore.peelRound(e, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 === Set((2L, 3L), (3L, 2L)),
      "round 1 must keep exactly the middle edge (both directions)")
    val r2 = KCore.peel(e, 2, 2).count()
    assert(r2 === 0L, "round 2 must peel the now-degree-1 middle pair")
  }

  test("pendant chain peels away; the triangle core survives with " +
    "in-core degrees") {
    // triangle {1,2,3} with a tail 3-4-5
    val e = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val core = KCore.coreNodes(e, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      "only the triangle survives, every member at in-core degree 2")
  }

  test("g04's committed round count is a fixpoint on the gated corpus " +
    "(round 7 == round 6)") {
    val pairs = Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("_ps"))
      .select(graft.expressions.ArrayPairs.array_pairs(col("_ps"))
        .as(Seq("src", "dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2).select("src", "dst")
    val e0 = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint() // feeds both depths
    val at6 = KCore.peel(e0, 2, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val at7 = KCore.peel(e0, 2, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at6 === at7, "6 rounds must be a k=2 fixpoint at this scale")
    assert(at6.nonEmpty, "the sf0.001 co-purchase graph has a 2-core")
  }

  test("checkEvery probe: early-stops at the fixpoint with the same " +
    "result as the fixed-round form, and empties a chain") {
    // triangle + tail: fixpoint after 2 rounds; a 50-round budget with
    // checkEvery=1 must stop at the probe and match the fixed form
    val e = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val fixed = KCore.peel(e, 2, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = KCore.peel(e, 2, 50, checkEvery = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed === fixed)
    assert(probed === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (1L, 3L), (3L, 1L)))
    // pure chain peels to EMPTY and the zero-count probe halts there
    val chain = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(KCore.peel(chain, 2, 50, checkEvery = 2).count() === 0L)
    // coreNodes passes the flag through
    val core = KCore.coreNodes(e, k = 2, rounds = 50, checkEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
