package graft.queries

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on derived co-occurrence graphs.
  *
  * PageRank is kept in EXACT integer ppm space: ranks are integers,
  * each hop contributes `(r * 85) div (100 * deg)` (d = 0.85), and
  * the teleport base is `150000 div N` — every engine truncates
  * integer division identically, so 5 iterations of joins reproduce
  * bit-exactly in the DuckDB oracle (the same discipline as d12's
  * label propagation). Floating-point PageRank would be order-
  * dependent under partial aggregation; integer ppm is not.
  *
  * Scale shape: each iteration is one edge-rank equi-join + one
  * groupBy(dst) — both keyed on node, so the partitioning is reused
  * across iterations; on a real cluster checkpoint every few rounds
  * to flatten lineage (see d12 note in SCALE.md).
  */
object GraphQueries extends Suite {

  val qs: Seq[Q] = Seq(

    // g01: 5-iteration integer PageRank over brands co-purchased in
    // one order (the b29 pair graph, symmetrized and deduplicated).
    Q("g01_pagerank", (s, d) => {
      // one-shuffle pair generation (the o13/b29 form): collect the
      // distinct sorted brand set per order, then ArrayPairs emits
      // src<dst per row — replaces the distinct + self-join shape
      // (two shuffles + an SMJ over the duplicated basket rows)
      val e0 = Tables.load(s, d, "lineitem")
        .join(broadcast(Tables.load(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("p_brand"))).as("_brands"))
        .select(graft.expressions.ArrayPairs.array_pairs(col("_brands"))
          .as(Seq("src", "dst")))
      // the edge list feeds all 5 iterations plus the node table —
      // materialize ONCE (d12's localCheckpoint discipline) so each
      // iteration joins a flat in-memory table instead of re-running
      // the lineitem⋈part pair generation; at 100 TB the 5x scan
      // re-execution is the real cost. The (iteration-invariant)
      // out-degree is folded onto each edge row by a window COUNT
      // over the same src key — one exchange, no separate degree
      // aggregate + join-back, and no second checkpoint (the previous
      // two-checkpoint form paid a full extra materialization job)
      val edges = e0.select("src", "dst")
        .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .withColumn("deg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")))
        .localCheckpoint()
      val nodes = edges.select("src").distinct()
      // driver-side scalar splice (o29 pattern): node count feeds the
      // integer base constants
      val nNodes = nodes.count()
      if (nNodes == 0) {
        // degenerate empty edge set: empty result, not a /0 crash
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("brand",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("rank_ppm",
              org.apache.spark.sql.types.LongType))))
      } else {
        val init = 1000000L / nNodes
        val base = 150000L / nNodes
        var rank = nodes.select(col("src").as("node"), lit(init).as("r"))
        for (_ <- 1 to 5) {
          // broadcast the rank side: its cardinality is the node
          // count — distinct p_brand values, a dimension-bounded set
          // strictly smaller than the `part` broadcast feeding the
          // edge build — so each hop is a map-side join over the
          // checkpointed edges + ONE dst-keyed exchange, instead of
          // the SMJ pair (sort + exchange on both sides) per hop the
          // unhinted form planned
          rank = edges
            .join(broadcast(rank), col("src") === col("node"))
            .select(col("dst"), expr("(r * 85) div (100 * deg)").as("c"))
            .groupBy("dst")
            .agg(sum("c").as("cs"))
            .select(col("dst").as("node"), (lit(base) + col("cs")).as("r"))
          // NO per-round materialization: each rank is consumed
          // exactly once (by the next round's join) and the edge side
          // is the checkpointed RDD, so all 5 hops run as ONE linear
          // job — the StarCC lesson; checkpoints are for
          // multi-consumer stages, and each cost ~1.5 s of fixed
          // materialization at sf0.1
        }
        rank.select(col("node").as("brand"), col("r").as("rank_ppm"))
          .orderBy("brand")
      }
    }, {
      val iter = (1 to 5).map { k =>
        s"""r$k AS (
           |  SELECT ed.dst AS node,
           |    (SELECT 150000 // n FROM n)
           |      + CAST(SUM((r.r * 85) // (100 * d.deg)) AS BIGINT) AS r
           |  FROM ed JOIN r${k - 1} r ON ed.src = r.node
           |          JOIN deg d ON ed.src = d.src
           |  GROUP BY ed.dst)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH lp AS (
              |  SELECT DISTINCT l_orderkey, p_brand
              |  FROM lineitem JOIN part ON l_partkey = p_partkey),
              |e0 AS (
              |  SELECT a.p_brand AS src, b.p_brand AS dst
              |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
              |   AND a.p_brand < b.p_brand),
              |ed AS (
              |  SELECT DISTINCT src, dst FROM (
              |    SELECT src, dst FROM e0
              |    UNION ALL SELECT dst, src FROM e0)),
              |deg AS (SELECT src, COUNT(*) AS deg FROM ed GROUP BY 1),
              |n AS (SELECT COUNT(*) AS n FROM deg),
              |r0 AS (
              |  SELECT src AS node, CAST(1000000 // (SELECT n FROM n) AS BIGINT) AS r
              |  FROM deg),
              |$iter
              |SELECT node AS brand, CAST(r AS BIGINT) AS rank_ppm
              |FROM r5 ORDER BY brand""".stripMargin)
    }),

    // g02: per-node triangle count — the clustering-coefficient
    // numerator. Triangles enumerate once via the a<b<c ordered
    // three-way self-join on the deduplicated src<dst edge list (the
    // ordering kills the 6x symmetry); per-node counts then union the
    // three corner projections. The join chain is edge-keyed
    // throughout — at scale, partition edges by src and the first two
    // hops co-locate.
    Q("g02_triangles", (s, d) => {
      // same one-shuffle ArrayPairs edge generation as g01
      val e = Tables.load(s, d, "lineitem")
        .join(broadcast(Tables.load(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("p_brand"))).as("_brands"))
        .select(graft.expressions.ArrayPairs.array_pairs(col("_brands"))
          .as(Seq("u", "v")))
        .distinct()
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .join(e.as("e3"),
          col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
        .select(col("e1.u").as("a"), col("e1.v").as("b"),
          col("e2.v").as("c"))
      // one explode instead of a 3-branch union of corner projections:
      // the union form re-planned (and, wherever runtime exchange
      // reuse couldn't cap it, re-ran) the whole 3-way triangle join
      // once per corner — 36 scans / 58 Exchanges in the initial
      // plan; the explode emits the same three corner rows per
      // triangle from ONE execution of the join (guide §2.4)
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("brand"))
        .groupBy("brand").agg(count(lit(1)).as("n_triangles"))
        .orderBy("brand")
    },
      Some("""WITH lp AS (
             |  SELECT DISTINCT l_orderkey, p_brand
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |e AS (
             |  SELECT DISTINCT a.p_brand AS u, b.p_brand AS v
             |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
             |   AND a.p_brand < b.p_brand),
             |tri AS (
             |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
             |  FROM e e1 JOIN e e2 ON e1.v = e2.u
             |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
             |corners AS (
             |  SELECT a AS brand FROM tri
             |  UNION ALL SELECT b FROM tri
             |  UNION ALL SELECT c FROM tri)
             |SELECT brand, COUNT(*) AS n_triangles
             |FROM corners GROUP BY brand ORDER BY brand""".stripMargin)),

    // g03: connected components of the bag-of-words dup graph by
    // large-star/small-star contraction (ops/StarCC) — the
    // O(log n)-round CC that replaces d12's diameter-bounded label
    // propagation at 100 TB. 2 alternations; fixed-round determinism
    // (the oracle replays the identical rounds, converged or not —
    // on this graph the BoW groups are cliques, converged after 1).
    Q("g03_cc_star", (s, d) => {
      val base = Tables.load(s, d, "documents")
      val edges = base
        .select(col("doc_id"), Dedup.bagOfWordsKey(col("text")).as("k"))
        .groupBy("k").agg(sort_array(collect_list("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(graft.expressions.ArrayPairs.array_pairs(col("ids"))
          .as(Seq("u", "v")))
      // pairs are unique by construction (one k-group per doc)
      val roots = graft.ops.StarCC.components(edges, rounds = 2,
        distinctInput = false)
      base.select("doc_id")
        .join(roots, col("doc_id") === col("node"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("root"), col("doc_id")).as("root"))
        .orderBy("doc_id")
    }, {
      val rounds = StarSql.rounds(2)
      Some(s"""WITH b AS (
              |  SELECT doc_id,
              |    md5(array_to_string(list_sort(list_distinct(
              |      list_filter(string_split(text,' '), w -> w <> ''))),
              |      ' ')) AS k
              |  FROM documents),
              |e0 AS MATERIALIZED (
              |  SELECT DISTINCT a.doc_id AS u, b2.doc_id AS v
              |  FROM b a JOIN b b2 ON a.k = b2.k AND a.doc_id < b2.doc_id),
              |$rounds,
              |roots AS (
              |  SELECT GREATEST(u, v) AS node, MIN(LEAST(u, v)) AS root
              |  FROM e2 GROUP BY 1)
              |SELECT d.doc_id, COALESCE(r.root, d.doc_id) AS root
              |FROM documents d LEFT JOIN roots r ON d.doc_id = r.node
              |ORDER BY d.doc_id""".stripMargin)
    }),

    // g04: k-core of the part co-purchase graph (support >= 2) —
    // Seidman's dense-backbone extraction, the graph-side curation
    // gate (spam rings / boilerplate farms are high-core; singleton
    // chaff peels away). Edges are the one-shuffle o13 pair form
    // with a support filter; each peel round is ops/KCore's two
    // chained window counts (simultaneous-peel semantics, one LINEAR
    // job across all 6 rounds — no keep-node table, no per-round
    // checkpoint). 6 rounds reach the k=2 fixpoint at every gated
    // scale (GraphSpec asserts a 7th round changes nothing); the
    // oracle replays the identical rounds in materialized CTEs.
    Q("g04_kcore", (s, d) => {
      val pairs = Tables.load(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("_ps"))
        .select(graft.expressions.ArrayPairs.array_pairs(col("_ps"))
          .as(Seq("src", "dst")))
        .groupBy("src", "dst").agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2).select("src", "dst")
      val e0 = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.ops.KCore.coreNodes(e0, k = 2, rounds = 6)
        .orderBy("node")
    }, {
      val rounds = (1 to 6).map { r =>
        s"""e$r AS MATERIALIZED (
           |  SELECT src, dst FROM (
           |    SELECT src, dst,
           |      COUNT(*) OVER (PARTITION BY src) AS ds,
           |      COUNT(*) OVER (PARTITION BY dst) AS dd
           |    FROM e${r - 1})
           |  WHERE ds >= 2 AND dd >= 2)""".stripMargin
      }.mkString(",\n")
      Some(s"""WITH p0 AS (
              |  SELECT DISTINCT a.l_orderkey AS ok,
              |    a.l_partkey AS src, b.l_partkey AS dst
              |  FROM lineitem a JOIN lineitem b
              |    ON a.l_orderkey = b.l_orderkey
              |   AND a.l_partkey < b.l_partkey),
              |ps AS (
              |  SELECT src, dst FROM p0
              |  GROUP BY src, dst HAVING COUNT(*) >= 2),
              |e0 AS MATERIALIZED (
              |  SELECT src, dst FROM ps
              |  UNION ALL SELECT dst, src FROM ps),
              |$rounds
              |SELECT src AS node, COUNT(*) AS deg
              |FROM e6 GROUP BY src ORDER BY node""".stripMargin)
    })
  )
}
