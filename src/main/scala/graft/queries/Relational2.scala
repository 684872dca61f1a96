package graft.queries

import graft.Tables
import graft.ops.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational batch: OLAP surface beyond the reference's own
  * usage (rollup/grouping sets, pivot, moving windows, typed Dataset
  * API, semi-structured JSON extraction, approximate distinct) — the
  * operators a user of a general analytics engine expects.
  */
object Relational2 extends Suite {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val qs: Seq[Q] = Seq(

    // ROLLUP: subtotals + grand total in one pass (partial-agg
    // friendly; Spark plans Expand + single aggregation).
    Q("o32_rollup", (s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty,
             |  COUNT(*) AS n
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // PIVOT: order-status spend per priority — Spark's relational
    // pivot; the oracle is the equivalent conditional aggregation
    // with matching column names.
    Q("o33_pivot", (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .na.fill(0.0, Seq("F", "O", "P"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE), 0) AS F,
             |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE), 0) AS O,
             |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE), 0) AS P
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Moving window: 7-day trailing average of daily revenue
    // (rangeBetween over day numbers — event-time windows in batch).
    Q("o34_moving_avg", (s, d) => {
      val daily = t(s, d, "orders")
        .withColumn("day",
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")))
        .groupBy("day")
        .agg(dsumDec(col("o_totalprice")).as("rev"))
      val w = Window.orderBy("day").rangeBetween(-6, 0)
      daily
        .withColumn("rev7", sum(col("rev")).over(w).cast("double"))
        .withColumn("n7", count(lit(1)).over(w))
        .select(col("day"), col("rev").cast("double").as("rev"),
          round(col("rev7") / col("n7"), 6).as("avg7"))
        .orderBy("day")
    },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             |    SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
             |  FROM orders GROUP BY 1)
             |SELECT day, CAST(rev AS DOUBLE) AS rev,
             |  round(CAST(SUM(rev) OVER w AS DOUBLE)
             |        / COUNT(*) OVER w, 6) AS avg7
             |FROM daily
             |WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             |ORDER BY day""".stripMargin)),

    // Typed Dataset API: case-class rows + groupByKey/mapGroups
    // (the reference's dataframe-vs-typed split, SURVEY §1).
    Q("o35_typed_mapgroups", (s, d) => {
      import s.implicits._
      case class Line(l_returnflag: String, l_quantity: Double)
      val ds = t(s, d, "lineitem")
        .select("l_returnflag", "l_quantity").as[(String, Double)]
      ds.groupByKey(_._1)
        .mapGroups { (flag, rows) =>
          var n = 0L; var maxQ = Double.MinValue
          rows.foreach { r => n += 1; if (r._2 > maxQ) maxQ = r._2 }
          (flag, n, maxQ)
        }
        .toDF("l_returnflag", "n", "max_qty")
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, COUNT(*) AS n, MAX(l_quantity) AS max_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Semi-structured: JSON property extraction from the events props
    // column (schema-on-read with get_json_object).
    Q("o36_json_extract", (s, d) =>
      t(s, d, "events")
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          max(col("k")).as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  COUNT(*) AS n,
             |  MAX(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // JSON sink + source roundtrip (schema-on-read back in).
    Q("o38_json_roundtrip", (s, d) => {
      val tmp = "/root/repo/target/graft-tmp/json_roundtrip"
      t(s, d, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite").json(tmp)
      s.read
        .schema("o_orderkey bigint, o_orderpriority string, o_totalprice double")
        .json(tmp)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderpriority")
    },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ORC sink + source roundtrip.
    Q("o39_orc_roundtrip", (s, d) => {
      val tmp = "/root/repo/target/graft-tmp/orc_roundtrip"
      t(s, d, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag")
    },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Approximate distinct (HLL) next to the exact count — the 100 TB
    // path for O20-class queries (sketches differ per engine, so the
    // oracle checks only the exact column; the test suite bounds the
    // sketch's relative error).
    Q("o37_approx_distinct", (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_nd"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_nd
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin))
  )
}
