package graft.queries

import graft.Tables
import graft.ops.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPCx-BB query shapes (SURVEY §2f) instantiated on the testdata
  * star schema. Shapes already covered elsewhere are not duplicated:
  * q01/q29→o13/b29, q02/q30→s04, q03→s06, q04→s07, q05→m03, q08→s05,
  * q09→o07, q10/q18/q19 sentiment→t06 (+slope o24), q11→o23, q12→s08,
  * q15→o24, q20/q25/q26 k-means→m01/m02, q23 CoV→o21, q27→t10,
  * q28→m04. This suite adds the remaining distinctive shapes:
  * q06/q13 (YoY ratio), q07 (above category average), q14 (am/pm),
  * q16 (pivot-date sales±returns), q17 (promo ratio), q21
  * (return-then-rebuy), q22 (before/after inventory ratio), q24
  * (cross-price elasticity), q25 (RFM features), q26 (class pivot),
  * q29 (pair counts on a second dimension).
  *
  * Channel / date-window constants are adapted to the testdata value
  * domains (o_orderstatus 'F'/'O' as the two channels, 1995/1996 as
  * the YoY years, 1998-01-01 as the pivot date).
  */
object BdbShapes extends Suite {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** lineitem ⋈ orders with the columns the shapes need. */
  private def lo(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").join(t(s, d, "orders"),
      col("l_orderkey") === col("o_orderkey"))

  val qs: Seq[Q] = Seq(

    // q06/q13: year-over-year spend ratio per customer and channel;
    // keep customers whose 'O'-channel growth beats 'F'-channel
    // growth, top-100 (ref: queries/q06/..._dask_sql.py:36-95).
    Q("b06_yoy_ratio", (s, d) => {
      val o = t(s, d, "orders")
        .withColumn("yr", year(to_date(col("o_orderdate"))))
        .filter(col("yr").isin(1995, 1996))
      def spend(st: String, yr: Int) =
        sum(when(col("o_orderstatus") === st && col("yr") === yr,
          col("o_totalprice").cast("decimal(14,2)"))).cast("double")
      val agg = o.groupBy("o_custkey").agg(
        spend("F", 1995).as("f1"), spend("F", 1996).as("f2"),
        spend("O", 1995).as("o1"), spend("O", 1996).as("o2"))
      agg.filter(col("f1") > 0 && col("o1") > 0)
        // raw ratios: per-customer sums stay far under 15 significant
        // digits, so the divisions are bit-identical across engines —
        // round-6 could flip membership on a 1e-6 boundary
        .withColumn("web_ratio", col("o2") / col("o1"))
        .withColumn("store_ratio", col("f2") / col("f1"))
        .filter(col("web_ratio") > col("store_ratio"))
        .select("o_custkey", "web_ratio", "store_ratio")
        .orderBy(desc("web_ratio"), col("o_custkey"))
        .limit(100)
    },
      Some("""WITH y AS (
             |  SELECT o_custkey,
             |    CAST(SUM(CASE WHEN o_orderstatus='F' AND year(CAST(o_orderdate AS DATE))=1995
             |        THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS f1,
             |    CAST(SUM(CASE WHEN o_orderstatus='F' AND year(CAST(o_orderdate AS DATE))=1996
             |        THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS f2,
             |    CAST(SUM(CASE WHEN o_orderstatus='O' AND year(CAST(o_orderdate AS DATE))=1995
             |        THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS o1,
             |    CAST(SUM(CASE WHEN o_orderstatus='O' AND year(CAST(o_orderdate AS DATE))=1996
             |        THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS o2
             |  FROM orders
             |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
             |  GROUP BY o_custkey)
             |SELECT o_custkey, o2/o1 AS web_ratio, f2/f1 AS store_ratio
             |FROM y WHERE f1 > 0 AND o1 > 0 AND o2/o1 > f2/f1
             |ORDER BY web_ratio DESC, o_custkey LIMIT 100""".stripMargin)),

    // q07: nations with >= 10 sales of parts priced > 1.2x their
    // brand's average (ref: queries/q07/..._dask_sql.py:31-66).
    Q("b07_above_brand_avg", (s, d) => {
      val p = t(s, d, "part")
      val brandAvg = p.groupBy("p_brand")
        .agg(davg(col("p_retailprice")).as("brand_avg"))
      val rich = p.join(broadcast(brandAvg), "p_brand")
        .filter(col("p_retailprice") > col("brand_avg") * 1.03)
        .select("p_partkey")
      lo(s, d)
        .join(broadcast(rich), col("l_partkey") === rich("p_partkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 10)
        .orderBy(desc("cnt"), col("n_name"))
    },
      Some("""WITH ba AS (
             |  SELECT p_brand,
             |    CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE)/COUNT(*) AS brand_avg
             |  FROM part GROUP BY p_brand),
             |rich AS (
             |  SELECT p_partkey FROM part JOIN ba USING (p_brand)
             |  WHERE p_retailprice > brand_avg * 1.03)
             |SELECT n_name, COUNT(*) AS cnt
             |FROM lineitem
             |JOIN rich ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name HAVING COUNT(*) >= 10
             |ORDER BY cnt DESC, n_name""".stripMargin)),

    // q14: am/pm activity ratio (ref: queries/q14/..._dask_sql.py:31-51).
    Q("b14_ampm_ratio", (s, d) => {
      val e = t(s, d, "events")
        .withColumn("hr", expr("(ts div 3600000000000) % 24"))
      e.filter(col("event_type") === "purchase")
        .agg(
          sum(when(col("hr") < 12, 1).otherwise(0)).as("n_am"),
          sum(when(col("hr") >= 12, 1).otherwise(0)).as("n_pm"))
        .withColumn("am_pm_ratio",
          col("n_am").cast("double") / col("n_pm"))
    },
      Some("""SELECT
             |  CAST(SUM(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_am,
             |  CAST(SUM(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_pm,
             |  CAST(SUM(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / SUM(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12 THEN 1 ELSE 0 END) AS am_pm_ratio
             |FROM events WHERE event_type = 'purchase'""".stripMargin)),

    // q16: sales +/- returns before/after a pivot date per brand
    // (ref: queries/q16/..._dask_sql.py:36-100).
    Q("b16_pivot_sales_returns", (s, d) => {
      val pivot = "1998-01-01"
      val j = lo(s, d).join(broadcast(t(s, d, "part")),
        col("l_partkey") === col("p_partkey"))
      def cond(flagNot: Boolean, before: Boolean) = {
        val fl = if (flagNot) col("l_returnflag") =!= "R"
          else col("l_returnflag") === "R"
        val tm = if (before) to_date(col("l_shipdate")) < lit(pivot)
          else to_date(col("l_shipdate")) >= lit(pivot)
        sum(when(fl && tm, col("l_quantity").cast("decimal(14,2)"))
          .otherwise(lit(0))).cast("double")
      }
      j.groupBy("p_brand").agg(
        cond(flagNot = true, before = true).as("sold_before"),
        cond(flagNot = true, before = false).as("sold_after"),
        cond(flagNot = false, before = true).as("ret_before"),
        cond(flagNot = false, before = false).as("ret_after"))
        .orderBy("p_brand")
    },
      Some("""SELECT p_brand,
             |  CAST(SUM(CASE WHEN l_returnflag <> 'R' AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
             |      THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE) AS sold_before,
             |  CAST(SUM(CASE WHEN l_returnflag <> 'R' AND CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
             |      THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE) AS sold_after,
             |  CAST(SUM(CASE WHEN l_returnflag = 'R' AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
             |      THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE) AS ret_before,
             |  CAST(SUM(CASE WHEN l_returnflag = 'R' AND CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
             |      THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE) AS ret_after
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // q17: promoted-sales ratio per brand (promo stand-in: discount
    // > 5%; ref: queries/q17/..._dask_sql.py:39-82).
    Q("b17_promo_ratio", (s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          sum(when(col("l_discount") > 0.05,
            col("l_extendedprice").cast("decimal(14,2)")).otherwise(lit(0)))
            .cast("double").as("promo_rev"),
          dsum(col("l_extendedprice")).as("total_rev"))
        .withColumn("promo_ratio", col("promo_rev") / col("total_rev"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand,
             |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE) AS promo_rev,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS total_rev,
             |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE)
             |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS promo_ratio
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // q21: returned then re-bought within 90 days, by nation
    // (ref: queries/q21/..._dask_sql.py:33-109).
    Q("b21_return_rebuy", (s, d) => {
      // one fact scan + one (cust, part) exchange: a RANGE-frame
      // window (days -90..-1) marks buy rows preceded by a return
      // within the rebuy window — the ret x buy self-join form
      // computed the lineitem⋈orders base TWICE and shuffled both
      // copies; the window form is a single pass, fully codegen'd.
      // b > r on DATE columns is exactly the [-90, -1) day frame
      // (same-day pairs are excluded by both).
      val w = Window.partitionBy("ck", "pk").orderBy("days")
        .rangeBetween(-90, -1)
      lo(s, d)
        .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"),
          col("l_returnflag"),
          datediff(to_date(col("l_shipdate")),
            to_date(lit("1992-01-01"))).as("days"))
        .withColumn("ret_near",
          max(when(col("l_returnflag") === "R", 1).otherwise(0)).over(w))
        .filter(col("l_returnflag") =!= "R" && col("ret_near") === 1)
        .select("ck", "pk").distinct()
        .join(t(s, d, "customer"), col("ck") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("n_name"))
    },
      Some("""WITH base AS (
             |  SELECT o_custkey, l_partkey, l_returnflag,
             |    CAST(l_shipdate AS DATE) AS ship
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |pairs AS (
             |  SELECT DISTINCT r.o_custkey, r.l_partkey
             |  FROM base r JOIN base b
             |    ON r.o_custkey = b.o_custkey AND r.l_partkey = b.l_partkey
             |   AND r.l_returnflag = 'R' AND b.l_returnflag <> 'R'
             |   AND b.ship > r.ship AND b.ship - r.ship <= 90
             |  WHERE r.l_returnflag = 'R')
             |SELECT n_name, COUNT(*) AS cnt
             |FROM pairs
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY cnt DESC, n_name""".stripMargin)),

    // q22: before/after pivot-date quantity ratio within [2/3, 3/2]
    // per part (ref: queries/q22/..._dask_sql.py:38-78).
    Q("b22_beforeafter_ratio", (s, d) => {
      val pivot = "1998-01-01"
      val j = t(s, d, "lineitem")
        .withColumn("ship", to_date(col("l_shipdate")))
        .filter(datediff(col("ship"), lit(pivot)).between(-30, 30))
      j.groupBy("l_partkey").agg(
          sum(when(col("ship") < lit(pivot),
            col("l_quantity").cast("decimal(14,2)")).otherwise(lit(0)))
            .cast("double").as("qty_before"),
          sum(when(col("ship") >= lit(pivot),
            col("l_quantity").cast("decimal(14,2)")).otherwise(lit(0)))
            .cast("double").as("qty_after"))
        .filter(col("qty_before") > 0 && col("qty_after") > 0)
        .withColumn("ratio", col("qty_after") / col("qty_before"))
        .filter(col("ratio") >= 2.0 / 3.0 && col("ratio") <= 1.5)
        .select("l_partkey", "qty_before", "qty_after", "ratio")
        .orderBy("l_partkey")
    },
      Some("""WITH w AS (
             |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS ship, l_quantity
             |  FROM lineitem
             |  WHERE CAST(l_shipdate AS DATE) - DATE '1998-01-01' BETWEEN -30 AND 30),
             |agg AS (
             |  SELECT l_partkey,
             |    CAST(SUM(CASE WHEN ship < DATE '1998-01-01'
             |        THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE) AS qty_before,
             |    CAST(SUM(CASE WHEN ship >= DATE '1998-01-01'
             |        THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE) AS qty_after
             |  FROM w GROUP BY l_partkey)
             |SELECT l_partkey, qty_before, qty_after,
             |  qty_after / qty_before AS ratio
             |FROM agg
             |WHERE qty_before > 0 AND qty_after > 0
             |  AND qty_after / qty_before >= 2.0/3.0
             |  AND qty_after / qty_before <= 1.5
             |ORDER BY l_partkey""".stripMargin)),

    // q24: cross-price elasticity per brand around the pivot date —
    // (dQ/Q)/(dP/P) from exact sums
    // (ref: queries/q24/..._dask_sql.py:32-75).
    Q("b24_elasticity", (s, d) => {
      val pivot = "1998-01-01"
      val j = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .withColumn("before", to_date(col("l_shipdate")) < lit(pivot))
      def qty(b: Boolean) =
        sum(when(col("before") === b, col("l_quantity").cast("decimal(14,2)")))
          .cast("double")
      def rev(b: Boolean) =
        sum(when(col("before") === b, col("l_extendedprice").cast("decimal(14,2)")))
          .cast("double")
      j.groupBy("p_brand")
        .agg(qty(true).as("qb"), qty(false).as("qa"),
          rev(true).as("rb"), rev(false).as("ra"))
        .filter(col("qb") > 0 && col("qa") > 0 && col("rb") > 0 && col("ra") > 0)
        .withColumn("pb", col("rb") / col("qb"))
        .withColumn("pa", col("ra") / col("qa"))
        .filter(col("pa") =!= col("pb"))
        .withColumn("elasticity",
          ((col("qa") - col("qb")) / col("qb")) /
            ((col("pa") - col("pb")) / col("pb")))
        .select("p_brand", "elasticity")
        .orderBy("p_brand")
    },
      Some("""WITH agg AS (
             |  SELECT p_brand,
             |    CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1998-01-01'
             |        THEN CAST(l_quantity AS DECIMAL(14,2)) END) AS DOUBLE) AS qb,
             |    CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
             |        THEN CAST(l_quantity AS DECIMAL(14,2)) END) AS DOUBLE) AS qa,
             |    CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1998-01-01'
             |        THEN CAST(l_extendedprice AS DECIMAL(14,2)) END) AS DOUBLE) AS rb,
             |    CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
             |        THEN CAST(l_extendedprice AS DECIMAL(14,2)) END) AS DOUBLE) AS ra
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY p_brand)
             |SELECT p_brand,
             |  ((qa - qb) / qb) / ((ra/qa - rb/qb) / (rb/qb)) AS elasticity
             |FROM agg
             |WHERE qb > 0 AND qa > 0 AND rb > 0 AND ra > 0 AND ra/qa <> rb/qb
             |ORDER BY p_brand""".stripMargin)),

    // q25: RFM (recency/frequency/monetary) feature build per customer
    // — the k-means feed (ref: queries/q25/..._dask_sql.py:55-147).
    Q("b25_rfm", (s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(
          max(datediff(to_date(col("o_orderdate")), lit("1970-01-01")))
            .as("recency_day"),
          count(lit(1)).as("frequency"),
          dsum(col("o_totalprice")).as("monetary"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
             |  MAX(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)) AS recency_day,
             |  COUNT(*) AS frequency,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS monetary
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // q26: per-customer pivot counts across the 5 priority classes
    // (the reference pivots 15 class ids; ref: q26_dask_sql.py:37-66).
    Q("b26_class_pivot", (s, d) => {
      val o = t(s, d, "orders")
      val cls = (1 to 5).map(i =>
        sum(when(substring(col("o_orderpriority"), 1, 1) === i.toString, 1)
          .otherwise(0)).as(s"cnt_$i"))
      o.groupBy("o_custkey")
        .agg(cls.head, cls.tail: _*)
        .withColumn("total", (1 to 5).map(i => col(s"cnt_$i")).reduce(_ + _))
        .filter(col("total") >= 5)
        .orderBy("o_custkey")
    },
      Some {
        val cols = (1 to 5).map(i =>
          s"CAST(SUM(CASE WHEN substr(o_orderpriority,1,1) = '$i' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_$i")
          .mkString(",\n  ")
        s"""SELECT o_custkey,
           |  $cols,
           |  CAST(COUNT(*) AS BIGINT) AS total
           |FROM orders GROUP BY o_custkey
           |HAVING COUNT(*) >= 5 ORDER BY o_custkey""".stripMargin
      }),

    // q29: co-purchase pairs on the brand dimension (distinct per
    // order, self-join, top-100; ref: q29_dask_sql.py:33-68).
    Q("b29_brand_pairs", (s, d) => {
      // one shuffle on the order key (collect_set dedupes brands,
      // ArrayPairs expands the sorted set — string sort_array order
      // IS the a.p_brand < b.p_brand condition) instead of
      // distinct + self-join shuffling the brand table twice
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("_brands"))
        .select(graft.expressions.ArrayPairs.array_pairs(col("_brands"))
          .as(Seq("brand_1", "brand_2")))
        .groupBy(col("brand_1"), col("brand_2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("brand_1"), col("brand_2"))
        .limit(100)
    },
      Some("""WITH b AS (
             |  SELECT DISTINCT l_orderkey, p_brand
             |  FROM lineitem JOIN part ON l_partkey = p_partkey)
             |SELECT x.p_brand AS brand_1, y.p_brand AS brand_2, COUNT(*) AS cnt
             |FROM b x JOIN b y
             |  ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
             |GROUP BY x.p_brand, y.p_brand
             |ORDER BY cnt DESC, brand_1, brand_2 LIMIT 100""".stripMargin)),

    // q23 shape: coefficient of variation (stddev/mean of daily
    // quantity sums) above a threshold in TWO CONSECUTIVE months for
    // the same supplier (ref: queries/q23/gpu_bdb_query_23_dask_sql
    // .py:38-92 — inventory CoV >= 1.3 in consecutive months). Exact-
    // component stddev per the engine's determinism discipline.
    Q("b23_cov_months", (s, d) => {
      val dt = col("l_shipdate").cast("date")
      // ONE shuffle total: (suppkey, date) is nearly unique (533k of
      // 600k rows at sf0.1), so map-side partials save nothing —
      // pre-partition the pruned scan by suppkey instead, and the
      // daily agg, the monthly agg AND the consecutive-month window
      // all run partition-local (suppkey is a subset of every key)
      val daily = Tables.load(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_quantity"))
        .repartition(col("l_suppkey"))
        .groupBy(col("l_suppkey"),
          ((year(dt) - 1992) * 12 + month(dt) - 1).as("m"),
          col("l_shipdate"))
        .agg(dsum(col("l_quantity")).as("dq"))
      // raw (unrounded) stddev + cov: components stay under 15
      // significant digits, so the doubles are bit-identical across
      // engines — rounding would ADD a boundary hazard here (see
      // Exact.dstddevRaw)
      val stats = daily.groupBy("l_suppkey", "m")
        .agg(dstddevRaw(col("dq")).as("sd"), davg(col("dq")).as("mean"))
        .filter(col("sd").isNotNull)
        .withColumn("cov", col("sd") / col("mean"))
      // consecutive-month pairing via lead() instead of a self-join:
      // (l_suppkey, m) is unique in stats, so lead over the month
      // order IS the m+1 row when months are consecutive — one window
      // pass over the aggregate instead of recomputing the two-level
      // aggregation on both join sides
      val w = Window.partitionBy("l_suppkey").orderBy("m")
      stats
        .withColumn("m_next", lead(col("m"), 1).over(w))
        .withColumn("cov_next", lead(col("cov"), 1).over(w))
        .filter(col("m_next") === col("m") + 1 &&
          col("cov") >= 0.5 && col("cov_next") >= 0.5)
        .select(col("l_suppkey").as("suppkey"), col("m"),
          col("cov").as("cov_m"), col("cov_next").as("cov_m1"))
        .orderBy("suppkey", "m")
    },
      Some("""WITH daily AS (
             |  SELECT l_suppkey,
             |    (year(CAST(l_shipdate AS DATE)) - 1992) * 12
             |      + month(CAST(l_shipdate AS DATE)) - 1 AS m,
             |    l_shipdate,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS dq
             |  FROM lineitem GROUP BY 1, 2, 3),
             |stats AS (
             |  SELECT l_suppkey, m,
             |    sqrt(GREATEST(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(dq AS DECIMAL(14,2)) * CAST(dq AS DECIMAL(14,2))) AS DOUBLE)
             |      - CAST(SUM(CAST(dq AS DECIMAL(14,2))) AS DOUBLE) * CAST(SUM(CAST(dq AS DECIMAL(14,2))) AS DOUBLE), 0.0)
             |      / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0))) AS sd,
             |    CAST(SUM(CAST(dq AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS mean
             |  FROM daily GROUP BY 1, 2
             |  HAVING COUNT(*) > 1),
             |cov AS (SELECT l_suppkey, m, sd / mean AS cov FROM stats)
             |SELECT a.l_suppkey AS suppkey, a.m AS m,
             |  a.cov AS cov_m, b.cov AS cov_m1
             |FROM cov a JOIN cov b
             |  ON a.l_suppkey = b.l_suppkey AND a.m + 1 = b.m
             |WHERE a.cov >= 0.5 AND b.cov >= 0.5
             |ORDER BY suppkey, m""".stripMargin))
  )
}
