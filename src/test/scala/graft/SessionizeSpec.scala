package graft

import graft.ops.Sessionize
import org.apache.spark.sql.functions._

/** Sessionization invariants the reference lacks tests for
  * (SURVEY §5): monotone session ids, timeout boundaries exact,
  * pair counts = C(n,2).
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val timeout = 100L

  test("timeout sessionization: crafted boundaries") {
    // user 1: gaps 50, 150 (new session), 100 (boundary: > 100 only)
    val df = Seq(
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 200L, 3L), (1L, 300L, 4L),
      (2L, 10L, 5L)
    ).toDF("user", "ts", "eid")
    val out = Sessionize.byTimeout(df, "user", "ts", "eid", timeout)
      .select("user", "ts", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      (1L, 0L, 1L), (1L, 50L, 1L), (1L, 200L, 2L), (1L, 300L, 2L),
      (2L, 10L, 1L)))
  }

  test("reserved/output name collisions fail fast") {
    val df = Seq((1L, 10L, 1L, 7L)).toDF("u", "ts", "e", "session_seq")
    intercept[IllegalArgumentException] {
      Sessionize.byTimeout(df, "u", "ts", "e", 100L)
    }
    val df2 = Seq((1L, 10L, 1L, 7L)).toDF("u", "ts", "e", "boundary_ts")
    intercept[IllegalArgumentException] {
      Sessionize.byBoundaryEvent(df2, "u", "ts", "e", col("e") === 1L)
    }
  }

  test("exactly-timeout gap does NOT split (strict >)") {
    val df = Seq((1L, 0L, 1L), (1L, timeout, 2L)).toDF("user", "ts", "eid")
    val sessions = Sessionize.byTimeout(df, "user", "ts", "eid", timeout)
      .select("session_seq").distinct().count()
    assert(sessions === 1L)
  }

  test("property: session ids monotone, no intra-session gap > timeout") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val evs = List.fill(40)((1L + rnd.nextInt(3), rnd.nextLong(2000L)))
      val df = evs.zipWithIndex
        .map { case ((u, ts), i) => (u, ts, i.toLong) }
        .toDF("user", "ts", "eid")
      val rows = Sessionize.byTimeout(df, "user", "ts", "eid", timeout)
        .select("user", "ts", "session_seq")
        .orderBy("user", "ts", "eid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      rows.groupBy(_._1).foreach { case (_, userRows) =>
        val seqs = userRows.map(_._3)
        assert(seqs.head === 1L)
        seqs.sliding(2).foreach {
          case Array(a, b) => assert(b === a || b === a + 1)
          case _ =>
        }
        userRows.sliding(2).foreach {
          case Array((_, t1, s1), (_, t2, s2)) =>
            if (s1 == s2) assert(t2 - t1 <= timeout)
            else assert(t2 - t1 > timeout)
          case _ =>
        }
      }
    }
  }

  test("density gate: property corpora and the BDB fixture have multi-event sessions") {
    // The round-5 regression class: a data-generator drift to
    // all-singleton sessions makes every sessionization gate pass
    // vacuously (empty == empty). Assert the corpora the gates run on
    // actually contain multi-event sessions, so a degenerate
    // generator FAILS here instead of silently weakening the suite.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val evs = List.fill(40)((1L + rnd.nextInt(3), rnd.nextLong(2000L)))
      val df = evs.zipWithIndex
        .map { case ((u, ts), i) => (u, ts, i.toLong) }
        .toDF("user", "ts", "eid")
      val sizes = Sessionize.byTimeout(df, "user", "ts", "eid", timeout)
        .groupBy("user", "session_seq").count()
        .select("count").as[Long].collect()
      assert(sizes.exists(_ >= 2), "all-singleton property corpus")
    }
    val clicks = BdbFixture.frames(spark)("web_clickstreams")
      .filter(col("wcs_user_sk").isNotNull)
      .select(col("wcs_user_sk").as("user"),
        (col("wcs_click_date_sk") * 86400 + col("wcs_click_time_sk")).as("ts"))
      .withColumn("eid", monotonically_increasing_id())
    val sizes = Sessionize.byTimeout(clicks, "user", "ts", "eid", 3600L)
      .groupBy("user", "session_seq").count()
    val n = sizes.count()
    val multi = sizes.filter(col("count") >= 3).count()
    assert(n > 0 && multi.toDouble / n >= 0.5,
      s"BDB fixture sessions degenerate: only $multi of $n have >=3 events")
  }

  test("clickSkew option concentrates clicks on a hot user, sessions stay dense") {
    import graft.bdb.BdbDataGen
    def topShare(skew: Double): (Long, Double) = {
      val byUser = BdbDataGen
        .frames(spark, BdbDataGen.Counts(0.0), clickSkew = skew)("web_clickstreams")
        .filter(col("wcs_user_sk").isNotNull)
        .groupBy("wcs_user_sk").count()
        .orderBy(col("count").desc)
        .select("count").as[Long].collect()
      (byUser.head, byUser.head.toDouble / byUser.sum)
    }
    val (_, uniformShare) = topShare(1.0)
    val (hotClicks, hotShare) = topShare(3.0)
    // floor cardinalities: 40 customers — the power-law draw should
    // give the hottest user ~(1/40)^(1/3) ≈ 29% of bursts vs the
    // uniform round-robin's ~2.5%
    assert(hotShare >= 3 * uniformShare && hotShare > 0.1,
      s"skew draw not skewed: hot=$hotShare uniform=$uniformShare")
    assert(hotClicks >= 20L)
    // burst structure survives the skewed assignment: multi-event
    // sessions still dominate
    val clicks = BdbDataGen
      .frames(spark, BdbDataGen.Counts(0.0), clickSkew = 3.0)("web_clickstreams")
      .filter(col("wcs_user_sk").isNotNull)
      .select(col("wcs_user_sk").as("user"),
        (col("wcs_click_date_sk") * 86400 + col("wcs_click_time_sk")).as("ts"))
      .withColumn("eid", monotonically_increasing_id())
    val sizes = Sessionize.byTimeout(clicks, "user", "ts", "eid", 3600L)
      .groupBy("user", "session_seq").count()
    val n = sizes.count()
    val multi = sizes.filter(col("count") >= 3).count()
    assert(n > 0 && multi.toDouble / n >= 0.5,
      s"skewed fixture sessions degenerate: $multi of $n have >=3 events")
  }

  test("session pairs emit C(n,2) ordered pairs per basket") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 1L, "b"), (1L, 1L, "c"), (1L, 1L, "a"),
      (2L, 1L, "x")
    ).toDF("user", "session_seq", "item")
    val pairs = Sessionize.sessionPairs(df, "user", "session_seq", "item")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}
