package graft.bdb

import graft.queries.{Q, Suite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Direct DuckDB gates for the 23-table BDB instantiations.
  *
  * The b01–b30 series re-expresses every BDB query SHAPE on the
  * driver's testdata schema (direct oracle), while the 23-table
  * originals were gated by goldens + independent reimplementations —
  * the one "trust me" left in the coverage story. These queries close
  * it for representative members: they run the REAL `BdbQueries1/2`
  * code against the committed deterministic fixture parquet
  * (`bench/bdb_oracle/`, written by [[graft.tools.BdbOracleDump]] at
  * the goldens' floor scale), and the oracle SQL reads the SAME files
  * by absolute path via `read_parquet` — no table registration
  * needed, so the driver's DuckDB gate reaches the second dataset.
  *
  * Chosen trio (the verdict's pick): q01 (basket pairs — collect_set +
  * ArrayPairs vs a relational self-join), q06 (YoY ratio — dual
  * channel conditional sums + float ratio compare), q16 (pivot-date
  * sales±returns — left-join decimal arithmetic). Decimal sums are
  * cast to DOUBLE on both sides (DuckDB's DECIMAL(38,2) vs Spark's
  * DECIMAL(17,2) would otherwise dtype-drift through the gate).
  */
object BdbDirect extends Suite {

  /** Committed fixture location — absolutized at session start from
    * the repo-relative path (the JVM and the driver's DuckDB both
    * start in the repo root), so the gate works from any checkout
    * location; GRAFT_BDB_ORACLE_DIR overrides for odd layouts. */
  val Base: String = sys.env.getOrElse("GRAFT_BDB_ORACLE_DIR",
    new java.io.File("bench/bdb_oracle").getAbsolutePath)

  private def reg(s: SparkSession): Unit =
    BdbSchemas.tables.foreach { t =>
      s.read.parquet(s"$Base/$t.parquet").createOrReplaceTempView(t)
    }

  private def rp(t: String): String = s"read_parquet('$Base/$t.parquet')"

  val qs: Seq[Q] = Seq(

    // the golden fixture parameterization (stores 1–5 exist at floor
    // scale; minCount=0 keeps the template pairs in range)
    Q("b31_bdb_q01", (s, _) => {
      reg(s)
      BdbQueries1.q01(s, stores = Seq(1, 2, 3, 4, 5), minCount = 0)
    },
      Some(s"""WITH it AS (SELECT i_item_sk FROM ${rp("item")}
              |           WHERE i_category_id IN (1,2,3)),
              |b AS (
              |  SELECT DISTINCT ss_ticket_number, ss_item_sk
              |  FROM ${rp("store_sales")}
              |  WHERE ss_store_sk IN (1,2,3,4,5)
              |    AND ss_item_sk IN (SELECT i_item_sk FROM it)),
              |p AS (
              |  SELECT a.ss_item_sk AS item_sk_1, c.ss_item_sk AS item_sk_2,
              |         COUNT(*) AS cnt
              |  FROM b a JOIN b c ON a.ss_ticket_number = c.ss_ticket_number
              |    AND a.ss_item_sk < c.ss_item_sk
              |  GROUP BY 1, 2)
              |SELECT item_sk_1, item_sk_2, cnt FROM p WHERE cnt > 0
              |ORDER BY cnt DESC, CAST(item_sk_1 AS VARCHAR),
              |  CAST(item_sk_2 AS VARCHAR)
              |LIMIT 100""".stripMargin)),

    Q("b32_bdb_q06", (s, _) => {
      reg(s)
      BdbQueries1.q06(s, year = 2001)
    },
      Some(s"""WITH dd AS (SELECT d_date_sk, d_year FROM ${rp("date_dim")}
              |            WHERE d_year IN (2001, 2002)),
              |web AS (
              |  SELECT ws_bill_customer_sk AS cust,
              |    SUM(CASE WHEN d_year = 2001 THEN ws_net_paid END) AS y1,
              |    SUM(CASE WHEN d_year = 2002 THEN ws_net_paid END) AS y2
              |  FROM ${rp("web_sales")}
              |  JOIN dd ON ws_sold_date_sk = d_date_sk
              |  GROUP BY 1
              |  HAVING y1 IS NOT NULL AND y2 IS NOT NULL AND y1 > 0),
              |st AS (
              |  SELECT ss_customer_sk AS cust,
              |    SUM(CASE WHEN d_year = 2001 THEN ss_net_paid END) AS y1,
              |    SUM(CASE WHEN d_year = 2002 THEN ss_net_paid END) AS y2
              |  FROM ${rp("store_sales")}
              |  JOIN dd ON ss_sold_date_sk = d_date_sk
              |  GROUP BY 1
              |  HAVING y1 IS NOT NULL AND y2 IS NOT NULL AND y1 > 0),
              |j AS (
              |  SELECT w.cust,
              |    CAST(w.y2 AS DOUBLE) / CAST(w.y1 AS DOUBLE) AS web_ratio,
              |    CAST(st.y2 AS DOUBLE) / CAST(st.y1 AS DOUBLE) AS store_ratio
              |  FROM web w JOIN st ON w.cust = st.cust
              |  WHERE CAST(w.y2 AS DOUBLE) / CAST(w.y1 AS DOUBLE)
              |      > CAST(st.y2 AS DOUBLE) / CAST(st.y1 AS DOUBLE))
              |SELECT j.cust AS c_customer_sk, web_ratio, store_ratio,
              |       c_first_name, c_last_name
              |FROM j JOIN ${rp("customer")} cu ON j.cust = cu.c_customer_sk
              |ORDER BY web_ratio DESC, c_customer_sk LIMIT 100""".stripMargin)),

    Q("b33_bdb_q16", (s, _) => {
      reg(s)
      BdbQueries2.q16(s)
        .select(col("w_state"), col("i_item_id"),
          col("sales_before").cast("double").as("sales_before"),
          col("sales_after").cast("double").as("sales_after"))
    },
      Some(s"""WITH dd AS (
              |  SELECT d_date_sk, CAST(d_date AS DATE) AS dd
              |  FROM ${rp("date_dim")}
              |  WHERE abs(datediff('day', DATE '2001-03-16',
              |    CAST(d_date AS DATE))) <= 30),
              |j AS (
              |  SELECT w.w_state, i.i_item_id, dd.dd,
              |    ws.ws_sales_price - COALESCE(wr.wr_refunded_cash,
              |      CAST(0 AS DECIMAL(7,2))) AS net
              |  FROM ${rp("web_sales")} ws
              |  JOIN dd ON ws.ws_sold_date_sk = dd.d_date_sk
              |  LEFT JOIN ${rp("web_returns")} wr
              |    ON ws.ws_order_number = wr.wr_order_number
              |   AND ws.ws_item_sk = wr.wr_item_sk
              |  JOIN ${rp("warehouse")} w
              |    ON ws.ws_warehouse_sk = w.w_warehouse_sk
              |  JOIN ${rp("item")} i ON ws.ws_item_sk = i.i_item_sk)
              |SELECT w_state, i_item_id,
              |  CAST(SUM(CASE WHEN dd < DATE '2001-03-16' THEN net END)
              |    AS DOUBLE) AS sales_before,
              |  CAST(SUM(CASE WHEN dd >= DATE '2001-03-16' THEN net END)
              |    AS DOUBLE) AS sales_after
              |FROM j GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100""".stripMargin)),

    // q02 (sessionize + co-view): the REAL timeout sessionization on
    // the fixture clickstream. Item 2 is the fixture's most-clicked
    // item; the fixture has no (user, ts) collisions, so the oracle's
    // untie-broken window ordering reproduces the Spark session ids
    // exactly.
    Q("b34_bdb_q02", (s, _) => {
      reg(s)
      BdbQueries1.q02(s, itemSk = 2L)
    },
      Some(s"""WITH c AS (
              |  SELECT wcs_user_sk AS u, wcs_item_sk AS i,
              |    wcs_click_date_sk * 86400 + wcs_click_time_sk AS ts
              |  FROM ${rp("web_clickstreams")}
              |  WHERE wcs_user_sk IS NOT NULL AND wcs_item_sk IS NOT NULL),
              |f AS (
              |  SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY u ORDER BY ts) IS NULL
              |      OR ts - lag(ts) OVER (PARTITION BY u ORDER BY ts) > 3600
              |    THEN 1 ELSE 0 END AS new_s
              |  FROM c),
              |sess AS (
              |  SELECT u, i, CAST(SUM(new_s) OVER (PARTITION BY u ORDER BY ts
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seq
              |  FROM f),
              |su AS (SELECT DISTINCT u, seq, i FROM sess),
              |tgt AS (SELECT DISTINCT u, seq FROM su WHERE i = 2)
              |SELECT i AS item_sk_1, COUNT(*) AS cnt
              |FROM su JOIN tgt USING (u, seq)
              |WHERE i <> 2
              |GROUP BY 1 ORDER BY cnt DESC, item_sk_1 LIMIT 30""".stripMargin)),

    // q08 (boundary sessionization): review-page boundary, purchases
    // within 3 days after. Spark returns the two revenue decimals as
    // strings (BigDecimal.toString); cast BOTH sides to DOUBLE for
    // the gate.
    Q("b35_bdb_q08", (s, _) => {
      reg(s)
      BdbQueries1.q08(s)
        .select(col("review_revenue").cast("double").as("review_revenue"),
          col("no_review_revenue").cast("double").as("no_review_revenue"))
    },
      Some(s"""WITH dd AS (
              |  SELECT d_date_sk FROM ${rp("date_dim")}
              |  WHERE CAST(d_date AS DATE) >= DATE '2001-09-02'
              |    AND CAST(d_date AS DATE) < DATE '2002-09-02'),
              |c AS (
              |  SELECT wcs_user_sk AS u, wcs_sales_sk AS sales,
              |    wcs_click_date_sk * 86400 + wcs_click_time_sk AS ts,
              |    wcs_web_page_sk IN (SELECT wp_web_page_sk
              |      FROM ${rp("web_page")} WHERE wp_type = 'review') AS is_review
              |  FROM ${rp("web_clickstreams")}
              |  JOIN dd ON wcs_click_date_sk = d_date_sk
              |  WHERE wcs_user_sk IS NOT NULL),
              |b AS (
              |  SELECT *, MAX(CASE WHEN is_review THEN ts END) OVER
              |    (PARTITION BY u ORDER BY ts
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS boundary_ts
              |  FROM c),
              |rs AS (
              |  SELECT DISTINCT sales FROM b
              |  WHERE sales IS NOT NULL AND boundary_ts IS NOT NULL
              |    AND ts - boundary_ts <= 259200),
              |ws AS (
              |  SELECT ws_net_paid, ws_order_number FROM ${rp("web_sales")}
              |  JOIN dd ON ws_sold_date_sk = d_date_sk),
              |t AS (SELECT COALESCE(SUM(ws_net_paid), 0) AS total FROM ws),
              |r AS (SELECT COALESCE(SUM(ws_net_paid), 0) AS rev FROM ws
              |      WHERE ws_order_number IN (SELECT sales FROM rs))
              |SELECT CAST(r.rev AS DOUBLE) AS review_revenue,
              |  CAST(t.total - r.rev AS DOUBLE) AS no_review_revenue
              |FROM t, r""".stripMargin)),

    // q10 (sentence/word explode + lexicon): the REAL NLP splitters on
    // the fixture reviews — sentence split on [.?!] via the è
    // sentinel, word split on whitespace runs after punctuation
    // scrub, broadcast lexicon join. DuckDB regexp_replace needs the
    // 'g' flag to match Spark's replace-all.
    Q("b36_bdb_q10", (s, _) => {
      reg(s)
      BdbQueries1.q10(s)
    },
      Some {
        val lexValues =
          (BdbQueries1.defaultPositive.map(w => s"('$w','POS')") ++
            BdbQueries1.defaultNegative.map(w => s"('$w','NEG')"))
            .mkString(", ")
        s"""WITH lex(sentiment_word, sentiment) AS (VALUES $lexValues),
           |r AS (
           |  SELECT pr_item_sk, lower(pr_review_content) AS content
           |  FROM ${rp("product_reviews")}
           |  WHERE pr_review_content IS NOT NULL),
           |sen AS (
           |  SELECT pr_item_sk,
           |    unnest(string_split(
           |      regexp_replace(content, '[.?!]', 'è', 'g'), 'è')) AS sentence
           |  FROM r),
           |sen2 AS (SELECT * FROM sen WHERE len(trim(sentence)) > 0),
           |w AS (
           |  SELECT pr_item_sk, sentence,
           |    unnest(string_split_regex(
           |      trim(regexp_replace(sentence, '[,;"-]', ' ', 'g')), ' +')) AS word
           |  FROM sen2)
           |SELECT pr_item_sk AS item_sk, sentence AS review_sentence,
           |  sentiment, sentiment_word
           |FROM w JOIN lex ON word = sentiment_word
           |WHERE len(word) > 0""".stripMargin
      })
  )
}
