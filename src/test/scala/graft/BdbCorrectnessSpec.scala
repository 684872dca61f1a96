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
}
