package graft.queries

import graft.Tables
import graft.ops.{Exact, Sessionize}
import graft.ops.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization & time-series suite — SURVEY §2b (S1–S8) on the
  * `events` table (event_id, ts [epoch nanos], user_id, event_type,
  * value, props). The reference's per-partition Python kernels
  * (`bdb_tools/sessionization.py`, `q03_utils.py`, `q04_utils.py`,
  * `q08_utils.py`) all collapse into window functions here.
  *
  * Constants mirror the reference's:
  * 3600 s session timeout (`bdb_tools/q02_utils.py:21`),
  * 259200 s review-to-purchase window (`q08_utils.py:27`),
  * 864000 s lookback bound + 5 events (`q03_utils.py:24,56`).
  */
object Sessions extends Suite {

  private val TimeoutNs = 3600L * 1000000L
  private val PurchaseWindowNs = 259200L * 1000000L
  private val LookbackNs = 864000L * 1000000L

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), expr("ts div 1000").as("tsn"))

  /** Shared DuckDB CTE: events with exact nano timestamps + timeout
    * session ids (mirror of [[Sessionize.byTimeout]]). */
  private val OracleBase =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tsn
      |  FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn, event_id) IS NULL
      |                   OR tsn - lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn, event_id) > 3600000000
      |            THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |), sess AS (
      |  SELECT event_id, user_id, event_type, value, tsn,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsn, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |""".stripMargin

  val qs: Seq[Q] = Seq(

    // S1: timestamp synthesis — exact integer epoch arithmetic
    // (ref: q02_dask_sql.py:43 builds date_sk*86400+time_sk).
    Q("s01_ts_epoch",
      (s, d) => events(s, d)
        .select(col("event_id"), col("tsn"),
          expr("tsn div 1000000").as("sec"),
          expr("tsn div 60000000").as("minute_bucket"))
        .orderBy("event_id"),
      Some("""SELECT event_id, epoch_us(ts) AS tsn,
             |  epoch_us(ts) // 1000000 AS sec,
             |  epoch_us(ts) // 60000000 AS minute_bucket
             |FROM events ORDER BY event_id""".stripMargin)),

    // S2: timeout sessionization -> per-session stats
    // (ref: bdb_tools/sessionization.py:54-97).
    Q("s02_sessions", (s, d) =>
      Sessionize.byTimeout(events(s, d), "user_id", "tsn", "event_id", TimeoutNs)
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min("tsn").as("start_ns"), max("tsn").as("end_ns"),
          dsum(col("value")).as("session_value"))
        .orderBy("user_id", "session_seq"),
      Some(OracleBase +
        """SELECT user_id, session_seq, COUNT(*) AS n_events,
          |  MIN(tsn) AS start_ns, MAX(tsn) AS end_ns,
          |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS session_value
          |FROM sess GROUP BY user_id, session_seq
          |ORDER BY user_id, session_seq""".stripMargin)),

    // S3: distinct (user, session, item) — dedup after sessionize
    // (ref: sessionization.py:100-109).
    Q("s03_session_distinct", (s, d) =>
      Sessionize.byTimeout(events(s, d), "user_id", "tsn", "event_id", TimeoutNs)
        .select("user_id", "session_seq", "event_type").distinct()
        .orderBy("user_id", "session_seq", "event_type"),
      Some(OracleBase +
        """SELECT DISTINCT user_id, session_seq, event_type FROM sess
          |ORDER BY user_id, session_seq, event_type""".stripMargin)),

    // S4: pairs co-occurring in one session — the q30 shape
    // (ref: sessionization.py:112-128, q30_dask_sql.py:76-81).
    Q("s04_session_pairs", (s, d) => {
      val sess = Sessionize.byTimeout(
        events(s, d), "user_id", "tsn", "event_id", TimeoutNs)
      Sessionize.sessionPairs(sess, "user_id", "session_seq", "event_type")
        .groupBy("item_1", "item_2").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("item_1"), col("item_2"))
    },
      Some(OracleBase +
        """, su AS (SELECT DISTINCT user_id, session_seq, event_type FROM sess)
          |SELECT a.event_type AS item_1, b.event_type AS item_2, COUNT(*) AS cnt
          |FROM su a JOIN su b
          |  ON a.user_id = b.user_id AND a.session_seq = b.session_seq
          | AND a.event_type < b.event_type
          |GROUP BY a.event_type, b.event_type
          |ORDER BY cnt DESC, item_1, item_2""".stripMargin)),

    // S5: event-boundary sessions — purchases within 259200 s of the
    // user's latest 'signup' (ref: bdb_tools/q08_utils.py:92-160,
    // boundary = review page view, window = q08_SECONDS_BEFORE_PURCHASE).
    Q("s05_boundary_sessions", (s, d) =>
      Sessionize.byBoundaryEvent(events(s, d), "user_id", "tsn", "event_id",
          col("event_type") === "signup")
        .filter(col("event_type") === "purchase" &&
          col("boundary_ts").isNotNull &&
          col("tsn") - col("boundary_ts") <= PurchaseWindowNs)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("purchase_value"))
        .orderBy("user_id"),
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tsn
             |  FROM events
             |), b AS (
             |  SELECT *, MAX(CASE WHEN event_type = 'signup' THEN tsn END)
             |    OVER (PARTITION BY user_id ORDER BY tsn, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS boundary_ts
             |  FROM e)
             |SELECT user_id, COUNT(*) AS n_purchases,
             |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS purchase_value
             |FROM b
             |WHERE event_type = 'purchase' AND boundary_ts IS NOT NULL
             |  AND tsn - boundary_ts <= 259200000000
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // S6: "last 5 events before event X" lookback — views within
    // 864000 s preceding each purchase. The reference needs a CUDA
    // kernel (`q03_utils.py:56-111`); here it's five lag() columns in
    // one window pass.
    Q("s06_lookback", (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
      val nViews = (1 to 5).map { i =>
        when(lag(col("event_type"), i).over(w) === "view" &&
          col("tsn") - lag(col("tsn"), i).over(w) <= LookbackNs, 1)
          .otherwise(0)
      }.reduce(_ + _)
      events(s, d)
        .withColumn("n_recent_views", nViews)
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "n_recent_views")
        .orderBy("event_id")
    },
      Some {
        val terms = (1 to 5).map { i =>
          s"""CASE WHEN lag(event_type,$i) OVER (PARTITION BY user_id ORDER BY tsn, event_id) = 'view'
             |  AND tsn - lag(tsn,$i) OVER (PARTITION BY user_id ORDER BY tsn, event_id) <= 864000000000
             |THEN 1 ELSE 0 END""".stripMargin
        }.mkString(" + ")
        s"""WITH e AS (
           |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tsn FROM events
           |), lb AS (
           |  SELECT event_id, user_id, event_type, ($terms) AS n_recent_views FROM e)
           |SELECT event_id, user_id, n_recent_views FROM lb
           |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin
      }),

    // S7: abandoned-session detection — sessions whose LAST event is an
    // 'error' (ref: bdb_tools/q04_utils.py:52-101 — last dynamic-vs-
    // order page decides an abandoned cart).
    Q("s07_session_last_event", (s, d) => {
      val sess = Sessionize.byTimeout(
        events(s, d), "user_id", "tsn", "event_id", TimeoutNs)
      val wLast = Window.partitionBy("user_id", "session_seq")
        .orderBy(desc("tsn"), desc("event_id"))
      sess.withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("event_type") === "error", 1).otherwise(0))
            .as("n_error_ended"))
        .orderBy("user_id")
    },
      Some(OracleBase +
        """, last AS (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
          |    ORDER BY tsn DESC, event_id DESC) AS rn
          |  FROM sess)
          |SELECT user_id, COUNT(*) AS n_sessions,
          |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error_ended
          |FROM last WHERE rn = 1
          |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // S8: sequence predicate — users whose first signup precedes their
    // first purchase (ref: queries/q12/gpu_bdb_query_12_dask_sql.py:
    // 34-59 — clicked before bought).
    Q("s08_sequence_predicate", (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("tsn"))).as("first_signup"),
          min(when(col("event_type") === "purchase", col("tsn"))).as("first_purchase"))
        .filter(col("first_signup") < col("first_purchase"))
        .select("user_id", "first_signup", "first_purchase")
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup,
             |  MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase
             |FROM events GROUP BY user_id
             |HAVING MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
             |     < MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
             |ORDER BY user_id""".stripMargin)),

    // S9: ordered funnel — per user the earliest view, the earliest
    // click AFTER that view, and the earliest purchase AFTER that
    // click (strict event-order semantics, not just min-per-type like
    // S8). Each stage is a groupBy(user)+min over a filtered re-join;
    // every shuffle in the chain is keyed on user_id, so one hash
    // partitioning is reused end-to-end — at 100 TB the funnel costs
    // one fact-scan plus user-keyed exchanges that AQE coalesces.
    Q("s09_funnel", (s, d) => {
      val e = events(s, d).select("user_id", "event_type", "tsn")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("tsn").as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("tsn") > col("t_view"))
        .groupBy("user_id").agg(min("tsn").as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("tsn") > col("t_click"))
        .groupBy("user_id").agg(min("tsn").as("t_purchase"))
      v.join(c, Seq("user_id"), "left_outer")
        .join(p, Seq("user_id"), "left_outer")
        .withColumn("stage",
          lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
            + when(col("t_purchase").isNotNull, 1).otherwise(0))
        .select("user_id", "t_view", "t_click", "t_purchase", "stage")
        .orderBy("user_id")
    },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS tsn FROM events),
             |v AS (
             |  SELECT user_id, MIN(tsn) AS t_view FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, MIN(tsn) AS t_click
             |  FROM e JOIN v ON e.user_id = v.user_id
             |  WHERE event_type = 'click' AND tsn > t_view GROUP BY 1),
             |p AS (
             |  SELECT e.user_id, MIN(tsn) AS t_purchase
             |  FROM e JOIN c ON e.user_id = c.user_id
             |  WHERE event_type = 'purchase' AND tsn > t_click GROUP BY 1)
             |SELECT v.user_id, t_view, t_click, t_purchase,
             |  1 + CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END
             |    + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END AS stage
             |FROM v LEFT JOIN c ON v.user_id = c.user_id
             |       LEFT JOIN p ON v.user_id = p.user_id
             |ORDER BY v.user_id""".stripMargin)),

    // S10: per-session roll-up — duration, size, type diversity,
    // purchase flag. One window pass (the sessionizer's single
    // user-keyed exchange) feeds a groupBy on the SAME key prefix, so
    // no second shuffle is needed for the aggregate.
    Q("s10_session_metrics", (s, d) =>
      Sessionize.byTimeout(events(s, d), "user_id", "tsn", "event_id",
          TimeoutNs)
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          (max("tsn") - min("tsn")).as("duration_us"),
          countDistinct("event_type").as("n_types"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("has_purchase"))
        .orderBy("user_id", "session_seq"),
      Some(OracleBase +
        """SELECT user_id, session_seq, COUNT(*) AS n_events,
          |  MAX(tsn) - MIN(tsn) AS duration_us,
          |  COUNT(DISTINCT event_type) AS n_types,
          |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |    AS has_purchase
          |FROM sess GROUP BY user_id, session_seq
          |ORDER BY user_id, session_seq""".stripMargin)),

    // S11: sequence-pattern matching (MATCH_RECOGNIZE-lite): encode
    // each user's event history as a one-char-per-event string in
    // exact (ts, event_id) order, then count non-overlapping regex
    // matches — view->clicks->purchase runs here. The encode is one
    // sort_array+transform over a per-user collect (bounded by the
    // user's history length); the regex scan is per-user, linear, and
    // stays inside codegen. Left-to-right non-overlapping match
    // semantics are identical in Java regex and RE2-family engines
    // for this backref-free pattern.
    Q("s11_pattern_match", (s, d) => {
      val enc = when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .otherwise("o")
      val seq = events(s, d)
        .select(col("user_id"),
          struct(col("tsn"), col("event_id"), enc.as("ch")).as("e"))
        .groupBy("user_id")
        .agg(concat_ws("",
          expr("transform(sort_array(collect_list(e)), x -> x.ch)"))
          .as("seq"))
      seq.select(col("user_id"),
          length(col("seq")).as("n_events"),
          expr("size(regexp_extract_all(seq, 'vc*p', 0))").as("n_funnels"))
        .filter(col("n_funnels") >= 1)
        .orderBy("user_id")
    },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS tsn, event_id,
             |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
             |         WHEN 'purchase' THEN 'p' ELSE 'o' END AS ch
             |  FROM events),
             |seqs AS (
             |  SELECT user_id,
             |    string_agg(ch, '' ORDER BY tsn, event_id) AS seq
             |  FROM e GROUP BY user_id)
             |SELECT user_id, len(seq) AS n_events,
             |  len(regexp_extract_all(seq, 'vc*p')) AS n_funnels
             |FROM seqs
             |WHERE len(regexp_extract_all(seq, 'vc*p')) >= 1
             |ORDER BY user_id""".stripMargin)),

    // S12: cohort retention — users cohorted by first-activity day,
    // retention = distinct active users per (cohort, day offset).
    // Two user-keyed aggregations (first-day, then activity join) and
    // one (cohort, offset) count-distinct; the user-keyed shuffles
    // reuse one partitioning, the final distinct is the only wide
    // re-key.
    Q("s12_retention", (s, d) => {
      val e = events(s, d)
        .withColumn("day", expr("tsn div 86400000000"))
      val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .filter(col("day_offset") <= 7)
        .orderBy("cohort_day", "day_offset")
    },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
             |  FROM events),
             |c AS (SELECT user_id, MIN(day) AS cohort_day
             |      FROM e GROUP BY 1)
             |SELECT cohort_day, day - cohort_day AS day_offset,
             |  COUNT(DISTINCT e.user_id) AS n_active
             |FROM e JOIN c ON e.user_id = c.user_id
             |GROUP BY 1, 2 HAVING day - cohort_day <= 7
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // S13: time-to-conversion distribution — per user the latency
    // from first signup to the first purchase AFTER it (exact integer
    // micros), then the population's exact interpolated percentiles
    // (o42's discipline: round-6 on both engines). The funnel chain
    // is user-keyed; the percentile is the only global aggregation.
    Q("s13_conversion_latency", (s, d) => {
      val e = events(s, d)
      val su = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("tsn").as("t_signup"))
      val latency = e.filter(col("event_type") === "purchase")
        .join(su, "user_id").filter(col("tsn") > col("t_signup"))
        .groupBy("user_id")
        .agg((min("tsn") - min("t_signup")).as("latency_us"))
      latency.agg(
          count(lit(1)).as("n_converted"),
          round(expr("percentile(latency_us, 0.5)"), 6).as("p50_us"),
          round(expr("percentile(latency_us, 0.9)"), 6).as("p90_us"),
          max("latency_us").as("max_us"))
    },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS tsn FROM events),
             |su AS (
             |  SELECT user_id, MIN(tsn) AS t_signup FROM e
             |  WHERE event_type = 'signup' GROUP BY 1),
             |lat AS (
             |  SELECT e.user_id, MIN(tsn) - MIN(t_signup) AS latency_us
             |  FROM e JOIN su ON e.user_id = su.user_id
             |  WHERE event_type = 'purchase' AND tsn > t_signup
             |  GROUP BY 1)
             |SELECT COUNT(*) AS n_converted,
             |  round(quantile_cont(latency_us, 0.5), 6) AS p50_us,
             |  round(quantile_cont(latency_us, 0.9), 6) AS p90_us,
             |  MAX(latency_us) AS max_us
             |FROM lat""".stripMargin))
  )
}
