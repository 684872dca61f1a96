package graft

import graft.bdb._
import org.apache.spark.sql.Row

/** Independent correctness checks for BDB queries: expected values are
  * recomputed from the collected fixture with plain Scala collections
  * (no Spark plan involved), then compared against the query output.
  */
class BdbCorrectnessSpec extends SparkSpec {

  private lazy val frames = {
    BdbFixture.register(spark)
    BdbFixture.frames(spark).map { case (k, df) => k -> df.collect() }
  }

  private def d(r: Row, i: Int): Double = r.getDecimal(i).doubleValue()

  test("q09 total quantity matches a Scala reimplementation") {
    val dd = frames("date_dim").filter(_.getInt(6) == 2001)
      .map(_.getLong(0)).toSet
    val cd = frames("customer_demographics")
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    val ca = frames("customer_address")
      .map(r => r.getLong(0) -> (r.getString(8), r.getString(10))).toMap
    val expected = frames("store_sales").filter { r =>
      val dateOk = !r.isNullAt(0) && dd.contains(r.getLong(0))
      if (!dateOk) false
      else {
        val (ms, es) = cd.getOrElse(r.getLong(4), ("", ""))
        val (state, country) = ca.getOrElse(r.getLong(6), ("", ""))
        val price = d(r, 13); val profit = d(r, 22)
        def demo(pmin: Int, pmax: Int) =
          ms == "M" && es == "4 yr Degree" && price >= pmin && price <= pmax
        def addr(states: Set[String], nmin: Int, nmax: Int) =
          country == "United States" && states(state) &&
            profit >= nmin && profit <= nmax
        (demo(100, 150) && addr(Set("KY", "GA", "NM"), 0, 2000)) ||
        (demo(50, 200) && addr(Set("MT", "OR", "IN"), 150, 3000)) ||
        (demo(150, 200) && addr(Set("WI", "MO", "WV"), 50, 25000))
      }
    }.map(_.getInt(10).toLong).sum
    val got = BdbQueries1.q09(spark).collect()
    val gotSum = if (got(0).isNullAt(0)) 0L else got(0).getLong(0)
    assert(gotSum === expected)
  }

  test("q12 click-then-buy users match a Scala reimplementation") {
    val items = frames("item")
      .filter(r => Set("Books", "Electronics")(r.getString(12)))
      .map(_.getLong(0)).toSet
    val clicks = frames("web_clickstreams")
      .filter(r => !r.isNullAt(5) && !r.isNullAt(3) && items(r.getLong(3)))
      .map(r => (r.getLong(5), r.getLong(0)))
    val sales = frames("store_sales")
      .filter(r => !r.isNullAt(3) && items(r.getLong(2)))
      .map(r => (r.getLong(3), r.getLong(0)))
    val expected = clicks.flatMap { case (u, cd) =>
      sales.collect { case (u2, sd)
        if u2 == u && cd < sd && sd - cd <= 90 => u }
    }.toSet
    val got = BdbQueries1.q12(spark).collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("q01 basket pair counts match a Scala reimplementation") {
    val catItems = frames("item")
      .filter(r => Set(1, 2, 3)(r.getInt(11))).map(_.getLong(0)).toSet
    val baskets = frames("store_sales")
      .filter(r => (1L to 5L).contains(r.getLong(7)) && catItems(r.getLong(2)))
      .map(r => (r.getLong(9), r.getLong(2))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val expected = baskets.flatMap { items =>
      for (i <- items.indices; j <- i + 1 until items.length
           if items(i) < items(j)) yield (items(i), items(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val got = BdbQueries1
      .q01(spark, stores = Seq(1, 2, 3, 4, 5), minCount = 0, limit = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("q22 inventory before/after ratios match a Scala reimplementation") {
    import java.time.LocalDate
    val pivot = LocalDate.parse("2001-05-08")
    val dates = frames("date_dim").map { r =>
      r.getLong(0) -> LocalDate.parse(r.getString(2))
    }.toMap
    val okItems = frames("item").filter { r =>
      val p = d(r, 5); p >= 0.98 && p <= 1.5
    }.map(r => r.getLong(0) -> r.getString(1)).toMap
    val names = frames("warehouse").map(r => r.getLong(0) -> r.getString(2)).toMap
    val rows = frames("inventory").flatMap { r =>
      val day = dates(r.getLong(0))
      val diff = java.time.temporal.ChronoUnit.DAYS.between(pivot, day)
      if (math.abs(diff) <= 30 && okItems.contains(r.getLong(1)))
        Some(((names(r.getLong(2)), okItems(r.getLong(1))),
          if (diff < 0) (r.getInt(3).toLong, 0L) else (0L, r.getInt(3).toLong)))
      else None
    }
    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.map(_._2._1).sum, vs.map(_._2._2).sum)
    }.filter { case (_, (b, a)) =>
      b > 0 && a.toDouble / b >= 2.0 / 3.0 && a.toDouble / b <= 1.5
    }
    val got = BdbQueries2.q22(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === expected)
  }

  test("q14 am/pm counts match a Scala reimplementation") {
    val hd = frames("household_demographics")
      .filter(_.getInt(3) == 5).map(_.getLong(0)).toSet
    val wp = frames("web_page")
      .filter(r => r.getInt(10) >= 5000 && r.getInt(10) <= 6000)
      .map(_.getLong(0)).toSet
    val td = frames("time_dim").map(r => r.getLong(0) -> r.getInt(3)).toMap
    val hours = frames("web_sales").filter { r =>
      !r.isNullAt(10) && hd(r.getLong(10)) &&
        !r.isNullAt(12) && wp(r.getLong(12)) && !r.isNullAt(1)
    }.flatMap(r => td.get(r.getLong(1)))
    val amc = hours.count(h => h >= 7 && h <= 8)
    val pmc = hours.count(h => h >= 19 && h <= 20)
    val got = BdbQueries1.q14(spark).collect()(0)
    assert(got.getLong(1) === amc.toLong)
    assert(got.getLong(2) === pmc.toLong)
  }

  test("q30 co-viewed category pairs match a Scala reimplementation") {
    BdbFixture.register(spark)
    // the stock fixture gives every user ONE category (click stride 40
    // is 0 mod the 5 categories), which smoke-passes the pair stage
    // vacuously — augment with an item-shifted copy of the clicks so
    // sessions really contain category pairs, for BOTH recomputations
    val aug = spark.table("web_clickstreams").unionByName(
      spark.table("web_clickstreams")
        .withColumn("wcs_item_sk",
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("wcs_item_sk"), 
            org.apache.spark.sql.functions.lit(60L)) + 1))
    aug.createOrReplaceTempView("web_clickstreams")
    try {
    val itemCat = spark.table("item")
      .select("i_item_sk", "i_category_id", "i_category").collect()
      .filter(r => !r.isNullAt(1))
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val clicks = spark.table("web_clickstreams")
      .select("wcs_user_sk", "wcs_click_date_sk", "wcs_click_time_sk",
        "wcs_item_sk").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(3))
      .flatMap { r =>
        itemCat.get(r.getLong(3))
          .map(c => (r.getLong(0), r.getLong(1) * 86400 + r.getLong(2), c))
      }
    // sessionize in plain Scala: boundaries depend only on the sorted
    // ts multiset per user (ties share a session either way). The
    // fixture's clicks are sparse, so a 1h timeout yields no
    // multi-category session — widen it (both sides) to exercise the
    // pair stage.
    val timeout = 10000000L
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    clicks.groupBy(_._1).foreach { case (_, evs) =>
      val sorted = evs.sortBy(_._2)
      var sid = 0L
      var last = Long.MinValue
      val sessions = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.Set[String]]
      sorted.foreach { case (_, ts, c) =>
        if (last == Long.MinValue || ts - last > timeout) sid += 1
        last = ts
        sessions.getOrElseUpdate(sid, scala.collection.mutable.Set()) += c
      }
      sessions.values.foreach { cats =>
        val cs = cats.toSeq.sorted
        for (i <- cs.indices; j <- (i + 1) until cs.size)
          pairCounts((cs(i), cs(j))) =
            pairCounts.getOrElse((cs(i), cs(j)), 0L) + 1
      }
    }
    val expected = pairCounts.toSeq
      .map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }
      .take(40)
    val got = BdbQueries2.q30(spark, timeoutSec = timeout).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected,
      s"q30 mismatch:\n got=${got.take(5)}\n exp=${expected.take(5)}")
    assert(got.nonEmpty)
    } finally BdbFixture.register(spark)   // restore the stock fixture
  }

  test("q02 co-viewed items match a Scala reimplementation") {
    BdbFixture.register(spark)
    // target an item that exists in the fixture (item 5) and a timeout
    // wide enough for sessions to hold several clicks
    val target = 5L
    val timeout = 10000000L
    val clicks = spark.table("web_clickstreams")
      .select("wcs_user_sk", "wcs_click_date_sk", "wcs_click_time_sk",
        "wcs_item_sk").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(3))
      .map(r => (r.getLong(0), r.getLong(1) * 86400 + r.getLong(2),
        r.getLong(3)))
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    clicks.groupBy(_._1).foreach { case (_, evs) =>
      val sorted = evs.sortBy(_._2)
      var sid = 0L; var last = Long.MinValue
      val sessions = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.Set[Long]]
      sorted.foreach { case (_, ts, item) =>
        if (last == Long.MinValue || ts - last > timeout) sid += 1
        last = ts
        sessions.getOrElseUpdate(sid, scala.collection.mutable.Set()) += item
      }
      sessions.values.filter(_.contains(target)).foreach { items =>
        (items - target).foreach(i => counts(i) = counts.getOrElse(i, 0L) + 1)
      }
    }
    val expected = counts.toSeq.map { case (i, n) => (i, n) }
      .sortBy { case (i, n) => (-n, i) }.take(30)
    val got = BdbQueries1.q02(spark, itemSk = target, timeoutSec = timeout)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected,
      s"q02 mismatch:\n got=${got.take(5)}\n exp=${expected.take(5)}")
    assert(got.nonEmpty, "q02 check is vacuous — no co-viewed items")
  }

  test("q08 review-revenue split matches a Scala reimplementation") {
    BdbFixture.register(spark)
    val start = "2001-09-02"; val end = "2002-09-02"
    val window = 259200L
    val dd = frames("date_dim").filter { r =>
      val s = r.getAs[String]("d_date")
      s != null && s >= start && s < end // ISO strings order by date
    }.map(_.getAs[Long]("d_date_sk")).toSet
    assert(dd.nonEmpty)
    val reviewPages = frames("web_page")
      .filter(_.getAs[String]("wp_type") == "review")
      .map(_.getAs[Long]("wp_web_page_sk")).toSet
    val clicks = frames("web_clickstreams").filter { r =>
      !r.isNullAt(r.fieldIndex("wcs_user_sk")) &&
        dd(r.getAs[Long]("wcs_click_date_sk"))
    }
    // boundary sessionization scan: running last-review timestamp per
    // user; a sale within `window` of it is review-driven. The query
    // orders ties by a monotonic id — assert the fixture has none, so
    // plain ts order is total and the check is deterministic.
    val reviewSales = clicks.groupBy(_.getAs[Long]("wcs_user_sk"))
      .values.flatMap { rows =>
        val evs = rows.map { r =>
          val ts = r.getAs[Long]("wcs_click_date_sk") * 86400 +
            r.getAs[Long]("wcs_click_time_sk")
          val isReview = !r.isNullAt(r.fieldIndex("wcs_web_page_sk")) &&
            reviewPages(r.getAs[Long]("wcs_web_page_sk"))
          val sale =
            if (r.isNullAt(r.fieldIndex("wcs_sales_sk"))) None
            else Some(r.getAs[Long]("wcs_sales_sk"))
          (ts, isReview, sale)
        }.sortBy(_._1)
        assert(evs.map(_._1).distinct.length === evs.length,
          "fixture has same-ts clicks for one user — tie-break ambiguous")
        var lastReview = Option.empty[Long]
        evs.flatMap { case (ts, isReview, sale) =>
          if (isReview) lastReview = Some(ts) // row includes itself
          sale.filter(_ => lastReview.exists(b => ts - b <= window))
        }
      }.toSet
    val ws = frames("web_sales").filter { r =>
      !r.isNullAt(r.fieldIndex("ws_sold_date_sk")) &&
        dd(r.getAs[Long]("ws_sold_date_sk"))
    }
    def total(rows: Seq[Row]): BigDecimal =
      rows.foldLeft(BigDecimal(0)) { (a, r) =>
        val v = r.getAs[java.math.BigDecimal]("ws_net_paid")
        if (v == null) a else a + BigDecimal(v)
      }
    val all = total(ws.toSeq)
    val rev = total(ws.filter(r =>
      reviewSales(r.getAs[Long]("ws_order_number"))).toSeq)
    val got = BdbQueries1.q08(spark).collect()(0)
    assert(BigDecimal(got.getString(0)) === rev)
    assert(BigDecimal(got.getString(1)) === all - rev)
    assert(rev > 0 && all - rev > 0,
      "q08 check is vacuous — one side of the split is empty")
  }
}
