package graft.queries

/** DuckDB-side unrolling of [[graft.ops.StarCC]]'s alternating
  * large-star / small-star contraction, so oracle SQL can replay the
  * identical fixed rounds the engine runs (every round is a pure
  * function of the previous edge set — min over neighborhoods on
  * distinct ids, no ties — so engine and oracle agree bit-exactly
  * whether or not the graph has converged).
  *
  * Input contract: a CTE named `e0(u, v)` holding the distinct
  * undirected edge set with `u <> v` (either orientation) — declare
  * it `AS MATERIALIZED`, and note the per-round CTEs here are too:
  * DuckDB inlines plain CTEs, so an unrolled iteration would
  * otherwise re-expand the whole upstream pipeline exponentially in
  * the round count (observed as fd exhaustion at 4 rounds). Emits CTEs
  * `sym$r/mn$r/ls$r/o$r/mns$r/e$r` for r = 1..rounds; the caller
  * finishes with the min-root aggregate over `e$rounds`:
  *
  *   SELECT GREATEST(u, v) AS node, MIN(LEAST(u, v)) AS root
  *   FROM e$rounds GROUP BY 1
  */
object StarSql {
  def rounds(n: Int): String =
    (1 to n).map { r =>
      s"""sym$r AS MATERIALIZED (
         |  SELECT u, v FROM e${r - 1}
         |  UNION SELECT v AS u, u AS v FROM e${r - 1}),
         |mn$r AS (
         |  SELECT u, LEAST(MIN(v), u) AS m FROM sym$r GROUP BY u),
         |ls$r AS (
         |  SELECT DISTINCT s.v AS u, m.m AS v
         |  FROM sym$r s JOIN mn$r m ON s.u = m.u
         |  WHERE s.v > s.u AND s.v <> m.m),
         |o$r AS (
         |  SELECT GREATEST(u, v) AS u, LEAST(u, v) AS v
         |  FROM ls$r WHERE u <> v),
         |mns$r AS (SELECT u, MIN(v) AS m FROM o$r GROUP BY u),
         |e$r AS MATERIALIZED (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT o.v AS u, m.m AS v
         |    FROM o$r o JOIN mns$r m ON o.u = m.u
         |    UNION ALL
         |    SELECT o.u AS u, m.m AS v
         |    FROM o$r o JOIN mns$r m ON o.u = m.u) t
         |  WHERE u <> v)""".stripMargin
    }.mkString(",\n")
}
