package graft

import graft.bdb.{BdbCatalog, BdbSchemas}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.time.LocalDate

/** Deterministic in-memory fixture data for all 23 TPCx-BB tables —
  * enough semantic structure (key alignment, value domains used by the
  * query parameters) for every query to resolve and execute.
  */
object BdbFixture {

  private val categories =
    Seq("Books", "Electronics", "Home", "Sports", "Toys")
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

  private val epoch = LocalDate.of(2001, 1, 1)

  /** ~4 years of calendar starting 2001-01-01, d_date_sk = day index. */
  private def dateDimRows: Seq[Row] = (0 until 1500).map { i =>
    val d = epoch.plusDays(i.toLong)
    Row(i.toLong, f"D$i%06d", d.toString, (d.getYear - 2001) * 12 + d.getMonthValue,
      i / 7, 0, d.getYear, d.getDayOfWeek.getValue, d.getMonthValue,
      d.getDayOfMonth, (d.getMonthValue - 1) / 3 + 1, d.getYear, 0, 0,
      d.getDayOfWeek.toString, "Q" + ((d.getMonthValue - 1) / 3 + 1), "N",
      if (d.getDayOfWeek.getValue >= 6) "Y" else "N", "N",
      1, 28, i, i, "N", "N", "N", "N", "N")
  }

  private def dec(v: Double): java.math.BigDecimal =
    new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_UP)

  def frames(spark: SparkSession): Map[String, DataFrame] = {
    def df(table: String, rows: Seq[Row]): (String, DataFrame) =
      table -> spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), BdbSchemas.schema(table))

    val nItems = 60L; val nCust = 40L; val nStores = 10L
    val items = (1L to nItems).map { i =>
      Row(i, f"I$i%06d", "2001-01-01", null, s"Item desc $i",
        dec(0.9 + (i % 40) * 0.05), dec(0.5), (i % 10).toInt, s"brand${i % 10}",
        (i % 15 + 1).toInt, s"class${i % 15}", (i % 5 + 1).toInt,
        categories((i % 5).toInt), (i % 7).toInt, s"manu${i % 7}", "M",
        null, "red", "ea", "box", (i % 3).toInt, s"product$i")
    }
    val customers = (1L to nCust).map { i =>
      Row(i, f"C$i%06d", i % 20 + 1, i % 10 + 1, i % 30 + 1, 1L, 1L, "Mr.",
        s"First$i", s"Last$i", if (i % 2 == 0) "Y" else "N",
        (i % 28 + 1).toInt, (i % 12 + 1).toInt, (1950 + i % 50).toInt,
        "United States", null, s"c$i@example.com", "2001-01-01")
    }
    val demo = (1L to 20L).map { i =>
      Row(i, if (i % 2 == 0) "M" else "F", if (i % 3 == 0) "S" else "M",
        education((i % 4).toInt), (i % 10).toInt * 500, "Good",
        (i % 6).toInt, (i % 3).toInt, (i % 2).toInt)
    }
    val hd = (1L to 10L).map { i =>
      Row(i, i % 3 + 1, "5001-10000", (i % 8).toInt, (i % 4).toInt)
    }
    val addr = (1L to 30L).map { i =>
      Row(i, f"A$i%06d", s"$i", "Main", "St", null, "Springfield", "County",
        states((i % 10).toInt), "12345", "United States", dec(-5.0), "condo")
    }
    val stores = (1L to nStores).map { i =>
      Row(i, f"S$i%06d", "2001-01-01", null, null, s"store$i", 10, 1000,
        "9-5", s"Mgr$i", (i % 3).toInt, "class", "desc", "mm", 1, "div", 1,
        "co", s"$i", "Market", "St", null, "Springfield", "County",
        states((i % 10).toInt), "12345", "United States", dec(-5.0), dec(0.08))
    }
    val warehouses = (1L to 5L).map { i =>
      Row(i, f"W$i%06d", s"Warehouse $i", 5000, s"$i", "Dock", "Rd", null,
        "Springfield", "County", states((i % 10).toInt), "12345",
        "United States", dec(-5.0))
    }
    val webPages = (1L to 20L).map { i =>
      Row(i, f"WP$i%06d", "2001-01-01", null, 1L, 1L, "N", null,
        s"http://example.com/$i", pageTypes((i % 5).toInt),
        (4500 + (i % 10) * 200).toInt, (i % 10).toInt, (i % 5).toInt, 2)
    }
    val promos = (1L to 10L).map { i =>
      Row(i, f"P$i%06d", 1L, 100L, i % nItems + 1, new java.math.BigDecimal(1000),
        1, s"promo$i", if (i % 2 == 0) "Y" else "N",
        if (i % 3 == 0) "Y" else "N", "N", if (i % 4 == 0) "Y" else "N",
        "N", "N", "N", "N", null, "sale", "Y")
    }
    val timeDim = (0L until 86400L by 600L).zipWithIndex.map { case (t, i) =>
      Row(i.toLong, f"T$i%06d", t.toInt, (t / 3600).toInt,
        ((t % 3600) / 60).toInt, (t % 60).toInt,
        if (t < 43200) "AM" else "PM", "shift", "sub", "meal")
    }
    // fact tables: 400 store sales spread over 2001-2004 incl. months
    // hitting every query's window; ticket = row/2 so baskets have 2 items
    val storeSales = (0L until 400L).map { i =>
      val dsk = (i * 3 + 7) % 1460
      Row(dsk, (i * 600 % 86400) / 600, i % nItems + 1,
        i % nCust + 1, i % 20 + 1, i % 10 + 1, i % 30 + 1, i % nStores + 1,
        i % 10 + 1, i / 2 + 1, (i % 5 + 1).toInt, dec(10), dec(20),
        dec(100 + (i % 120)), dec(1), dec(110), dec(10), dec(120), dec(8),
        dec(2), dec(110 + (i % 120)), dec(118), dec(50 + (i % 3000)))
    }
    val storeReturns = (0L until 120L).map { i =>
      val dsk = (i * 3 + 37) % 1460
      Row(dsk, i % 144, i % nItems + 1, i % nCust + 1, i % 20 + 1,
        i % 10 + 1, i % 30 + 1, i % nStores + 1, i % 3 + 1, i / 2 + 1,
        (i % 3 + 1).toInt, dec(30), dec(2), dec(32), dec(1), dec(3),
        dec(25), dec(2), dec(3), dec(5))
    }
    val webSales = (0L until 400L).map { i =>
      val dsk = (i * 3 + 11) % 1460
      Row(dsk, (i * 600 % 86400) / 600, dsk + 2, i % nItems + 1,
        i % nCust + 1, i % 20 + 1, i % 10 + 1, i % 30 + 1, i % nCust + 1,
        i % 20 + 1, i % 10 + 1, i % 30 + 1, i % 20 + 1, 1L, i % 5 + 1,
        i % 5 + 1, i % 10 + 1, i / 2 + 1, (i % 5 + 1).toInt, dec(10),
        dec(20), dec(15), dec(1), dec(110), dec(10), dec(120), dec(8),
        dec(2), dec(5), dec(110 + (i % 100)), dec(118), dec(120), dec(125),
        dec(40 + (i % 2000)))
    }
    val webReturns = (0L until 100L).map { i =>
      val dsk = (i * 5 + 41) % 1460
      Row(dsk, i % 144, i % nItems + 1, i % nCust + 1, i % 20 + 1,
        i % 10 + 1, i % 30 + 1, i % nCust + 1, i % 20 + 1, i % 10 + 1,
        i % 30 + 1, i % 20 + 1, i % 3 + 1, i / 2 + 1, (i % 3 + 1).toInt,
        dec(30), dec(2), dec(32), dec(1), dec(3), dec(25), dec(2), dec(3),
        dec(5))
    }
    val clicks = (0L until 600L).map { i =>
      val dsk = (i * 2 + 5) % 1460
      Row(dsk, i * 97 % 86400,
        if (i % 7 == 0) i / 2 + 1 else null, // sales_sk: purchases
        i % nItems + 1, i % 20 + 1, i % nCust + 1)
    }
    val inventory = (0L until 500L).map { i =>
      val dsk = (i * 3 + 3) % 1460
      Row(dsk, i % nItems + 1, i % 5 + 1, ((i * 13) % 300).toInt)
    }
    val reviews = (0L until 100L).map { i =>
      Row(i + 1, LocalDate.of(2003, 1, 1).plusDays(i % 700).toString,
        "12:00:00", (i % 5 + 1).toInt, i % nItems + 1, i % nCust + 1,
        i % 200 + 1, reviewTexts((i % 5).toInt))
    }
    val marketPrices = (0L until 60L).map { i =>
      Row(i + 1, i % nItems + 1, s"Competitor${i % 5}",
        dec(0.8 + (i % 50) * 0.06), (i * 7) % 1400 + 30, (i * 7) % 1400 + 60)
    }
    val incomeBand = (1L to 5L).map(i => Row(i, (i * 10000).toInt, (i * 20000).toInt))
    val shipMode = (1L to 5L).map(i => Row(i, f"SM$i%05d", "GROUND", s"code$i", "Carrier", null))
    val reason = (1L to 5L).map(i => Row(i, f"R$i%05d", s"reason $i"))
    val webSite = (1L to 3L).map { i =>
      Row(i, f"WS$i%05d", "2001-01-01", null, s"site$i", 1L, null, "class",
        "mgr", 1, "mktclass", "mktdesc", "mktmgr", 1, "company", s"$i",
        "Web", "Way", null, "Springfield", "County", "CA", "12345",
        "United States", dec(-5.0), dec(0.08))
    }

    Map(
      df("date_dim", dateDimRows), df("item", items),
      df("customer", customers), df("customer_demographics", demo),
      df("household_demographics", hd), df("customer_address", addr),
      df("store", stores), df("warehouse", warehouses),
      df("web_page", webPages), df("promotion", promos),
      df("time_dim", timeDim), df("store_sales", storeSales),
      df("store_returns", storeReturns), df("web_sales", webSales),
      df("web_returns", webReturns), df("web_clickstreams", clicks),
      df("inventory", inventory), df("product_reviews", reviews),
      df("item_marketprices", marketPrices), df("income_band", incomeBand),
      df("ship_mode", shipMode), df("reason", reason),
      df("web_site", webSite))
  }

  def register(spark: SparkSession): Unit =
    BdbCatalog.registerFrames(frames(spark))
}
