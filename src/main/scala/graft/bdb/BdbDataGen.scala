package graft.bdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Distributed synthetic generator for the 23-table TPCx-BB data
  * model, at an arbitrary scale factor — the stand-in for the
  * benchmark's external dataGen tool (whose pipe-CSV output format
  * and table layout this mirrors; `gpu_bdb_load_test.py:47-92` reads
  * each `<base>/<table>/` dir with sep '|' and no quoting).
  *
  * Shapes follow the in-memory test fixture (BdbFixture) — the same
  * modular key-alignment formulas so every query's parameter windows
  * and join paths are populated — but generated DISTRIBUTED
  * (spark.range + column expressions, no driver-side row lists) and
  * scaled: at sf=1 fact rows match TPC-DS sf1 orders of magnitude
  * (store_sales 2.88M, web_clickstreams 6.48M, inventory 1.17M, ...),
  * ~1 GB of pipe-CSV total. Returns-to-sales join alignment holds by
  * construction: store_returns row i carries the same
  * (ticket_number, item_sk) formula as store_sales row i, and
  * web_returns row i the same (order_number, item_sk) as web_sales
  * row i.
  *
  * Usage: BdbDataGen <csvOutBase> <scaleFactor>
  */
object BdbDataGen {

  /** Scaled table cardinalities. Dims with query-parameter value
    * domains derived via `% smallConstant` (category, brand, state,
    * page type, ...) keep those constants fixed — scaling row counts
    * never shifts the value domains the 30 queries filter on.
    */
  final case class Counts(sf: Double) {
    private def n(base: Long, floor: Long): Long =
      math.max(floor, (base * sf).toLong)
    val items: Long = n(18000, 60)
    val customers: Long = n(100000, 40)
    val demos: Long = n(19200, 20)
    val hds: Long = n(7200, 10)
    val addrs: Long = n(50000, 30)
    val stores: Long = n(100, 10)
    val warehouses: Long = n(20, 5)
    val webPages: Long = n(2000, 20)
    val promos: Long = n(300, 10)
    val webSites: Long = n(12, 3)
    val storeSales: Long = n(2880000, 400)
    val storeReturns: Long = n(288000, 120)
    val webSales: Long = n(720000, 400)
    val webReturns: Long = n(72000, 100)
    val clicks: Long = n(6480000, 600)
    val inventory: Long = n(1170000, 500)
    val reviews: Long = n(120000, 100)
  }

  private val categories = Seq("Books", "Electronics", "Home", "Sports", "Toys")
  private val states =
    Seq("KY", "GA", "NM", "MT", "OR", "IN", "WI", "MO", "WV", "CA")
  private val pageTypes = Seq("order", "dynamic", "review", "ad", "general")
  private val education =
    Seq("4 yr Degree", "College", "Advanced Degree", "Unknown")
  private val reviewTexts = Seq(
    "This product is good. StoreOne sold it fast!",
    "Terrible quality, really bad. Never again from StoreTwo.",
    "It was great and the Acme Corp support was excellent.",
    "Average item. Nothing special here?",
    "I love it! Best purchase ever from MegaMart.")

  private def strArr(vs: Seq[String]): String =
    vs.map(v => s"'$v'").mkString("array(", ", ", ")")

  /** element_at over a literal string array by `id % n` (1-based). */
  private def pick(vs: Seq[String], idx: String): String =
    s"element_at(${strArr(vs)}, CAST($idx AS INT) + 1)"

  private def d2(v: String): String = s"CAST($v AS DECIMAL(7,2))"

  def frames(spark: SparkSession, c: Counts): Map[String, DataFrame] = {
    def gen(table: String, n: Long, exprs: Seq[String],
        parts: Int): (String, DataFrame) = {
      val schema = BdbSchemas.schema(table)
      val named = exprs.zip(schema.fields).map { case (e, f) =>
        s"($e) AS ${f.name}"
      }
      require(exprs.length == schema.fields.length,
        s"$table: ${exprs.length} exprs vs ${schema.fields.length} fields")
      val df = spark.range(0, n, 1, parts).selectExpr(named: _*)
        .select(schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
      table -> df
    }
    val dimParts = 1
    val factParts = 32

    val dateDim = gen("date_dim", 1500, Seq(
      "id", "printf('D%06d', id)",
      "date_format(date_add(DATE'2001-01-01', CAST(id AS INT)), 'yyyy-MM-dd')",
      "(year(date_add(DATE'2001-01-01', CAST(id AS INT))) - 2001) * 12 + month(date_add(DATE'2001-01-01', CAST(id AS INT)))",
      "id div 7", "0",
      "year(date_add(DATE'2001-01-01', CAST(id AS INT)))",
      "dayofweek(date_add(DATE'2001-01-01', CAST(id AS INT)))",
      "month(date_add(DATE'2001-01-01', CAST(id AS INT)))",
      "day(date_add(DATE'2001-01-01', CAST(id AS INT)))",
      "quarter(date_add(DATE'2001-01-01', CAST(id AS INT)))",
      "year(date_add(DATE'2001-01-01', CAST(id AS INT)))",
      "0", "0",
      "date_format(date_add(DATE'2001-01-01', CAST(id AS INT)), 'EEEE')",
      "concat('Q', quarter(date_add(DATE'2001-01-01', CAST(id AS INT))))",
      "'N'",
      "CASE WHEN dayofweek(date_add(DATE'2001-01-01', CAST(id AS INT))) IN (1, 7) THEN 'Y' ELSE 'N' END",
      "'N'", "1", "28", "id", "id", "'N'", "'N'", "'N'", "'N'", "'N'"),
      dimParts)

    val item = gen("item", c.items, Seq(
      "id + 1", "printf('I%06d', id + 1)", "'2001-01-01'", "NULL",
      "concat('Item desc ', id + 1)",
      d2("0.9 + ((id + 1) % 40) * 0.05"), d2("0.5"),
      "(id + 1) % 10", "concat('brand', (id + 1) % 10)",
      "(id + 1) % 15 + 1", "concat('class', (id + 1) % 15)",
      "(id + 1) % 5 + 1", pick(categories, "(id + 1) % 5"),
      "(id + 1) % 7", "concat('manu', (id + 1) % 7)", "'M'", "NULL",
      "'red'", "'ea'", "'box'", "(id + 1) % 3",
      "concat('product', id + 1)"), dimParts)

    val customer = gen("customer", c.customers, Seq(
      "id + 1", "printf('C%06d', id + 1)",
      s"(id + 1) % ${c.demos} + 1", s"(id + 1) % ${c.hds} + 1",
      s"(id + 1) % ${c.addrs} + 1", "1", "1", "'Mr.'",
      "concat('First', id + 1)", "concat('Last', id + 1)",
      "CASE WHEN (id + 1) % 2 = 0 THEN 'Y' ELSE 'N' END",
      "(id + 1) % 28 + 1", "(id + 1) % 12 + 1", "1950 + (id + 1) % 50",
      "'United States'", "NULL",
      "concat('c', id + 1, '@example.com')", "'2001-01-01'"), dimParts)

    val demo = gen("customer_demographics", c.demos, Seq(
      "id + 1", "CASE WHEN (id + 1) % 2 = 0 THEN 'M' ELSE 'F' END",
      "CASE WHEN (id + 1) % 3 = 0 THEN 'S' ELSE 'M' END",
      pick(education, "(id + 1) % 4"), "((id + 1) % 10) * 500", "'Good'",
      "(id + 1) % 6", "(id + 1) % 3", "(id + 1) % 2"), dimParts)

    val hd = gen("household_demographics", c.hds, Seq(
      "id + 1", "(id + 1) % 3 + 1", "'5001-10000'", "(id + 1) % 8",
      "(id + 1) % 4"), dimParts)

    val addr = gen("customer_address", c.addrs, Seq(
      "id + 1", "printf('A%06d', id + 1)", "CAST(id + 1 AS STRING)",
      "'Main'", "'St'", "NULL", "'Springfield'", "'County'",
      pick(states, "(id + 1) % 10"), "'12345'", "'United States'",
      "CAST(-5.0 AS DECIMAL(5,2))", "'condo'"), dimParts)

    val store = gen("store", c.stores, Seq(
      "id + 1", "printf('S%06d', id + 1)", "'2001-01-01'", "NULL", "NULL",
      "concat('store', id + 1)", "10", "1000", "'9-5'",
      "concat('Mgr', id + 1)", "(id + 1) % 3", "'class'", "'desc'", "'mm'",
      "1", "'div'", "1", "'co'", "CAST(id + 1 AS STRING)", "'Market'",
      "'St'", "NULL", "'Springfield'", "'County'",
      pick(states, "(id + 1) % 10"), "'12345'", "'United States'",
      "CAST(-5.0 AS DECIMAL(5,2))", "CAST(0.08 AS DECIMAL(5,2))"), dimParts)

    val warehouse = gen("warehouse", c.warehouses, Seq(
      "id + 1", "printf('W%06d', id + 1)",
      "concat('Warehouse ', id + 1)", "5000", "CAST(id + 1 AS STRING)",
      "'Dock'", "'Rd'", "NULL", "'Springfield'", "'County'",
      pick(states, "(id + 1) % 10"), "'12345'", "'United States'",
      "CAST(-5.0 AS DECIMAL(5,2))"), dimParts)

    val webPage = gen("web_page", c.webPages, Seq(
      "id + 1", "printf('WP%06d', id + 1)", "'2001-01-01'", "NULL", "1",
      "1", "'N'", "NULL", "concat('http://example.com/', id + 1)",
      pick(pageTypes, "(id + 1) % 5"), "4500 + ((id + 1) % 10) * 200",
      "(id + 1) % 10", "(id + 1) % 5", "2"), dimParts)

    val promo = gen("promotion", c.promos, Seq(
      "id + 1", "printf('P%06d', id + 1)", "1", "100",
      s"(id + 1) % ${c.items} + 1", "CAST(1000 AS DECIMAL(15,2))", "1",
      "concat('promo', id + 1)",
      "CASE WHEN (id + 1) % 2 = 0 THEN 'Y' ELSE 'N' END",
      "CASE WHEN (id + 1) % 3 = 0 THEN 'Y' ELSE 'N' END", "'N'",
      "CASE WHEN (id + 1) % 4 = 0 THEN 'Y' ELSE 'N' END",
      "'N'", "'N'", "'N'", "'N'", "NULL", "'sale'", "'Y'"), dimParts)

    val timeDim = gen("time_dim", 144, Seq(
      "id", "printf('T%06d', id)", "CAST(id * 600 AS INT)",
      "CAST(id * 600 div 3600 AS INT)",
      "CAST((id * 600 % 3600) div 60 AS INT)", "0",
      "CASE WHEN id * 600 < 43200 THEN 'AM' ELSE 'PM' END",
      "'shift'", "'sub'", "'meal'"), dimParts)

    val storeSales = gen("store_sales", c.storeSales, Seq(
      "(id * 3 + 7) % 1460", "(id * 600 % 86400) div 600",
      s"id % ${c.items} + 1", s"id % ${c.customers} + 1",
      s"id % ${c.demos} + 1", s"id % ${c.hds} + 1",
      s"id % ${c.addrs} + 1", s"id % ${c.stores} + 1",
      s"id % ${c.promos} + 1", "id div 2 + 1", "id % 5 + 1",
      d2("10"), d2("20"), d2("100 + (id % 120)"), d2("1"), d2("110"),
      d2("10"), d2("120"), d2("8"), d2("2"), d2("110 + (id % 120)"),
      d2("118"), d2("50 + (id % 3000)")), factParts)

    val storeReturns = gen("store_returns", c.storeReturns, Seq(
      "(id * 3 + 37) % 1460", "id % 144", s"id % ${c.items} + 1",
      s"id % ${c.customers} + 1", s"id % ${c.demos} + 1",
      s"id % ${c.hds} + 1", s"id % ${c.addrs} + 1",
      s"id % ${c.stores} + 1", "id % 3 + 1", "id div 2 + 1",
      "id % 3 + 1", d2("30"), d2("2"), d2("32"), d2("1"), d2("3"),
      d2("25"), d2("2"), d2("3"), d2("5")), factParts)

    val webSales = gen("web_sales", c.webSales, Seq(
      "(id * 3 + 11) % 1460", "(id * 600 % 86400) div 600",
      "(id * 3 + 11) % 1460 + 2", s"id % ${c.items} + 1",
      s"id % ${c.customers} + 1", s"id % ${c.demos} + 1",
      s"id % ${c.hds} + 1", s"id % ${c.addrs} + 1",
      s"id % ${c.customers} + 1", s"id % ${c.demos} + 1",
      s"id % ${c.hds} + 1", s"id % ${c.addrs} + 1",
      s"id % ${c.webPages} + 1", s"id % ${c.webSites} + 1", "id % 5 + 1",
      s"id % ${c.warehouses} + 1", s"id % ${c.promos} + 1",
      "id div 2 + 1", "id % 5 + 1", d2("10"), d2("20"), d2("15"),
      d2("1"), d2("110"), d2("10"), d2("120"), d2("8"), d2("2"), d2("5"),
      d2("110 + (id % 100)"), d2("118"), d2("120"), d2("125"),
      d2("40 + (id % 2000)")), factParts)

    val webReturns = gen("web_returns", c.webReturns, Seq(
      "(id * 5 + 41) % 1460", "id % 144", s"id % ${c.items} + 1",
      s"id % ${c.customers} + 1", s"id % ${c.demos} + 1",
      s"id % ${c.hds} + 1", s"id % ${c.addrs} + 1",
      s"id % ${c.customers} + 1", s"id % ${c.demos} + 1",
      s"id % ${c.hds} + 1", s"id % ${c.addrs} + 1",
      s"id % ${c.webPages} + 1", "id % 3 + 1", "id div 2 + 1",
      "id % 3 + 1", d2("30"), d2("2"), d2("32"), d2("1"), d2("3"),
      d2("25"), d2("2"), d2("3"), d2("5")), factParts)

    val clicks = gen("web_clickstreams", c.clicks, Seq(
      "(id * 2 + 5) % 1460", "id * 97 % 86400",
      "CASE WHEN id % 7 = 0 THEN id div 2 + 1 ELSE NULL END",
      s"id % ${c.items} + 1", s"id % ${c.webPages} + 1",
      s"id % ${c.customers} + 1"), factParts)

    val inventory = gen("inventory", c.inventory, Seq(
      "(id * 3 + 3) % 1460", s"id % ${c.items} + 1",
      s"id % ${c.warehouses} + 1", "(id * 13) % 300"), factParts)

    val reviews = gen("product_reviews", c.reviews, Seq(
      "id + 1",
      "date_format(date_add(DATE'2003-01-01', CAST(id % 700 AS INT)), 'yyyy-MM-dd')",
      "'12:00:00'", "id % 5 + 1", s"id % ${c.items} + 1",
      s"id % ${c.customers} + 1", "id % 200 + 1",
      // fixture sentences plus a varying tail token so the review
      // vocabulary grows with the corpus (q28's hashed features)
      s"concat(${pick(reviewTexts, "id % 5")}, ' topic', id % 97)"),
      factParts)

    val marketPrices = gen("item_marketprices", c.items, Seq(
      "id + 1", s"id % ${c.items} + 1",
      "concat('Competitor', id % 5)", d2("0.8 + (id % 50) * 0.06"),
      "(id * 7) % 1400 + 30", "(id * 7) % 1400 + 60"), dimParts)

    val incomeBand = gen("income_band", 5, Seq(
      "id + 1", "CAST((id + 1) * 10000 AS INT)",
      "CAST((id + 1) * 20000 AS INT)"), dimParts)

    val shipMode = gen("ship_mode", 5, Seq(
      "id + 1", "printf('SM%05d', id + 1)", "'GROUND'",
      "concat('code', id + 1)", "'Carrier'", "NULL"), dimParts)

    val reason = gen("reason", 5, Seq(
      "id + 1", "printf('R%05d', id + 1)",
      "concat('reason ', id + 1)"), dimParts)

    val webSite = gen("web_site", c.webSites, Seq(
      "id + 1", "printf('WS%05d', id + 1)", "'2001-01-01'", "NULL",
      "concat('site', id + 1)", "1", "NULL", "'class'", "'mgr'", "1",
      "'mktclass'", "'mktdesc'", "'mktmgr'", "1", "'company'",
      "CAST(id + 1 AS STRING)", "'Web'", "'Way'", "NULL", "'Springfield'",
      "'County'", "'CA'", "'12345'", "'United States'",
      "CAST(-5.0 AS DECIMAL(5,2))", "CAST(0.08 AS DECIMAL(5,2))"),
      dimParts)

    Map(dateDim, item, customer, demo, hd, addr, store, warehouse,
      webPage, promo, timeDim, storeSales, storeReturns, webSales,
      webReturns, clicks, inventory, reviews, marketPrices, incomeBand,
      shipMode, reason, webSite)
  }

  /** Write every table as dataGen-style pipe-CSV under
    * `<csvBase>/<table>/`. No field ever contains '|', '"' or a
    * newline, so the unquoted format round-trips exactly through
    * BdbCatalog's quote-less readers.
    */
  def writeCsv(spark: SparkSession, csvBase: String, c: Counts): Unit =
    frames(spark, c).foreach { case (t, df) =>
      df.write.mode("overwrite")
        .option("sep", "|").option("quote", "")
        .csv(s"$csvBase/$t")
    }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BdbDataGen <csvOutBase> <scaleFactor>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bdb-datagen")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try writeCsv(spark, args(0), Counts(args(1).toDouble))
    finally spark.stop()
  }
}
