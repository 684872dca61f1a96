package graft

import graft.ops.Selection
import org.apache.spark.sql.functions._

/** Bucketed order-statistic selection against sorted ground truth —
  * random groups, ties, nulls, rank edges (0 and n-1), duplicate
  * requested ranks, constant-value groups (zero bucket width), and
  * out-of-range ranks.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def truth(rows: Seq[(String, java.lang.Double)],
      ranks: Seq[(String, Long)]): Set[(String, Long, Double)] = {
    val sorted = rows.filter(_._2 != null).groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2.doubleValue).sorted }
    ranks.flatMap { case (g, r) =>
      sorted.get(g).filter(vs => r >= 0 && r < vs.length)
        .map(vs => (g, r, vs(r.toInt)))
    }.toSet
  }

  private def run(rows: Seq[(String, java.lang.Double)],
      ranks: Seq[(String, Long)], buckets: Int): Set[(String, Long, Double)] = {
    val df = rows.toDF("g", "v")
    val rk = ranks.toDF("g", "rank")
    Selection.orderStatistics(df, "g", "v", rk, buckets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  test("random groups with ties and nulls match sorted truth") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(String, java.lang.Double)] =
      (0 until 5000).map { _ =>
        val g = s"g${rnd.nextInt(4)}"
        val v: java.lang.Double =
          if (rnd.nextInt(50) == 0) null
          else Double.box((rnd.nextInt(200) - 100).toDouble / 4)
        (g, v)
      } ++ Seq(("solo", Double.box(1.5)), ("flat", Double.box(3.0)),
        ("flat", Double.box(3.0)), ("flat", Double.box(3.0)))
    val n = rows.filter(_._2 != null).groupBy(_._1).view.mapValues(_.size)
    val ranks = n.flatMap { case (g, c) =>
      Seq(g -> 0L, g -> (c - 1).toLong, g -> (c / 2).toLong,
        g -> (c / 2).toLong, // duplicate request
        g -> c.toLong, g -> -1L) // out of range: no rows
    }.toSeq
    for (b <- Seq(4, 1024))
      assert(run(rows, ranks, b) === truth(rows, ranks), s"buckets=$b")
  }
}
