package graft

import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.Ev
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Multi-batch state carry: the stateful sessionizer must merge an
  * open session across micro-batches (the single-batch case is
  * oracle-verified by x03; this drives the incremental path the
  * oracle can't).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState carries open sessions across batches") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/root/repo/target"),
        "stream-batches").toString
    // the file source lists plain files (not nested write dirs): write
    // each batch, then move its part file up with a controlled mtime
    // so batch order is deterministic
    def placeBatch(rows: Seq[(Long, Long)], name: String, mtime: Long): Unit = {
      val tmp = s"$dir/_$name"
      rows.toDF("user_id", "tsu").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$dir/$name.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    // batch 1: user 1 events at t=0,100; user 2 at t=50
    placeBatch(Seq((1L, 0L), (1L, 100L), (2L, 50L)), "b1", 1000000L)
    // batch 2: user 1 continues within timeout (t=150) then a gap
    // (t=10000 > timeout 1000) -> closes first session
    placeBatch(Seq((1L, 150L), (1L, 10000L)), "b2", 2000000L)

    val schema = "user_id long, tsu long"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = stream.as[Ev].groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StatefulSessionize.fold(1000L, evict = false))
    val q = out.writeStream.format("memory")
      .queryName("stream_carry_test").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val rows = spark.table("stream_carry_test")
      .select("user_id", "start_us", "end_us", "n_events", "closed")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

    // the CLOSED session for user 1 must span batches: t=0..150, 3 events
    assert(rows.contains((1L, 0L, 150L, 3L, true)),
      s"missing merged closed session; got ${rows.mkString(", ")}")
    // final open sessions: user 1 at t=10000, user 2 at t=50
    assert(rows.contains((1L, 10000L, 10000L, 1L, false)))
    assert(rows.contains((2L, 50L, 50L, 1L, false)))

    // the raw append stream carries a superseded batch-1 snapshot of
    // user 1's first session; latestSessions must collapse it so each
    // (user, start) surfaces exactly its final state
    val collapsed = StatefulSessionize
      .latestSessions(spark.table("stream_carry_test"))
      .select("user_id", "start_us", "end_us", "n_events", "closed")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toSet
    assert(collapsed == Set(
      (1L, 0L, 150L, 3L, true),
      (1L, 10000L, 10000L, 1L, false),
      (2L, 50L, 50L, 1L, false)),
      s"collapse wrong: $collapsed")
  }

  test("watermark drops late data from windowed aggregation") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/root/repo/target"),
        "late-data").toString
    def placeBatch(epochSecs: Seq[Long], name: String, mtime: Long): Unit = {
      val tmp = s"$dir/_$name"
      epochSecs.toDF("sec").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$dir/$name.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    val H = 3600L
    // batch 0: events at 10:00 and 12:00 -> watermark (30 min delay)
    // advances to 11:30 after this batch
    placeBatch(Seq(10 * H, 12 * H), "w1", 1000000L)
    // batch 1: on-time event; the 11:30 watermark EVICTS window
    // [10:00, 11:00) (emitted n=1) at this batch's end
    placeBatch(Seq(13 * H), "w2", 2000000L)
    // batch 2: a LATE event at 10:30 — its window is long evicted and
    // the row is behind the late-events watermark -> dropped (Spark
    // drops with the PREVIOUS batch's watermark, which is why the
    // late row must arrive two batches after the one that passed it)
    placeBatch(Seq(10 * H + 1800), "w3", 3000000L)

    val stream = spark.readStream.schema("sec long")
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withColumn("ets", timestamp_seconds(col("sec")))
      .withWatermark("ets", "30 minutes")
      .groupBy(window(col("ets"), "1 hour")).agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory")
      .queryName("late_data_test").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val rows = spark.table("late_data_test")
      .select(col("window.start").cast("long").as("w"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exactly ONE row for the 10:00 window, with n=1: the late row
    // neither merged in (no n=2) nor re-opened the window (no
    // duplicate emission)
    assert(rows.count(_._1 == 10 * H) === 1, s"got $rows")
    assert(rows.contains((10 * H, 1L)), s"got $rows")
    val dropped = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    assert(dropped >= 1L, "late row was not dropped by the watermark")
  }

  test("streaming pack over ordered batches == batch Pack.pack") {
    import graft.streaming.StreamingPack
    import graft.streaming.StreamingPack.Doc
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/root/repo/target"),
        "stream-pack").toString
    def placeBatch(rows: Seq[(Long, Int, Long)], name: String,
        mtime: Long): Unit = {
      val tmp = s"$dir/_$name"
      rows.toDF("doc_id", "shard", "n_tok").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$dir/$name.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    // two shards, docs split across two ordered batches (per-shard
    // arrival order = doc id order, as the contract requires)
    placeBatch(Seq((1L, 0, 100L), (2L, 1, 300L), (3L, 0, 200L)),
      "b1", 1000000L)
    placeBatch(Seq((4L, 0, 50L), (5L, 1, 10L)), "b2", 2000000L)

    val schema = "doc_id long, shard int, n_tok long"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = stream.as[Doc].groupByKey(_.shard)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StreamingPack.fold(256L))
    val q = out.toDF().writeStream.format("memory")
      .queryName("stream_pack_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_pack_test")
      .select("doc_id", "shard", "n_tok", "off", "bin")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    // ground truth: per-shard prefix sums over doc-id order
    // shard 0: 1(100)@0 bin0, 3(200)@100 bin0, 4(50)@300 bin1
    // shard 1: 2(300)@0 bin0, 5(10)@300 bin1
    val want = Set(
      (1L, 0, 100L, 0L, 0L), (3L, 0, 200L, 100L, 0L),
      (4L, 0, 50L, 300L, 1L),
      (2L, 1, 300L, 0L, 0L), (5L, 1, 10L, 300L, 1L))
    assert(got === want, s"got $got")
  }

  test("streaming pack FAILS (not silently diverges) on out-of-order arrival") {
    import graft.streaming.StreamingPack
    import graft.streaming.StreamingPack.{Doc, ShardState}
    import org.apache.spark.sql.streaming.TestGroupState
    // batch 1 places docs 1,3; batch 2 delivers doc 2 late — a source
    // whose file order disagrees with doc order. The contract is
    // enforcement, not trust: the fold must throw.
    import org.apache.spark.api.java.Optional
    val s1 = TestGroupState.create[ShardState](
      optionalState = Optional.empty[ShardState](),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    StreamingPack.fold(256L)(0,
      Iterator(Doc(1L, 0, 10L), Doc(3L, 0, 10L)), s1).toList
    val carried = TestGroupState.create[ShardState](
      optionalState = Optional.of(s1.get),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val e = intercept[IllegalStateException] {
      StreamingPack.fold(256L)(0, Iterator(Doc(2L, 0, 10L)), carried).toList
    }
    assert(e.getMessage.contains("doc_id order"), e.getMessage)
  }

  test("streaming pack FAILS on a duplicate doc within one micro-batch") {
    import graft.streaming.StreamingPack
    import graft.streaming.StreamingPack.{Doc, ShardState}
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[ShardState](
      optionalState = Optional.empty[ShardState](),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    // a re-delivered doc inside the batch slips past the cross-batch
    // head check; placing it twice would shift every later offset
    val e = intercept[IllegalStateException] {
      StreamingPack.fold(256L)(0,
        Iterator(Doc(5L, 0, 3L), Doc(5L, 0, 3L)), st).toList
    }
    assert(e.getMessage.contains("delivered twice"), e.getMessage)
  }

  test("sessionizer eviction timeout closes, emits, and removes state") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    import graft.streaming.StatefulSessionize.{Open, SessionOut}
    val st = TestGroupState.create[Open](
      optionalState = Optional.of(Open(10L, 20L, 2L)),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = true)
    val out = StatefulSessionize.fold(3600000000L)(
      7L, Iterator.empty, st).toList
    assert(out === List(SessionOut(7L, 10L, 20L, 2L, closed = true)))
    assert(st.isRemoved, "timed-out state must be evicted")
  }
}
