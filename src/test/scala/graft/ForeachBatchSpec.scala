package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** foreachBatch sink pattern: incremental merge of per-batch partial
  * aggregates into a running state table — the operational form of a
  * streaming upsert (Delta MERGE stands in for the target at scale;
  * here an in-memory running map keyed by event_type).
  */
class ForeachBatchSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch merges per-batch partial counts into running totals") {
    val running = scala.collection.mutable.Map.empty[String, Long]

    val static = Tables.load(spark, sf, "events")
    val stream = Tables.loadStream(spark, sf, "events",
      Map("maxFilesPerTrigger" -> "1"))

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch partial aggregate, then merge (the upsert step)
        batch.groupBy("event_type").count().collect().foreach { r =>
          val k = r.getString(0)
          running(k) = running.getOrElse(k, 0L) + r.getLong(1)
        }
      }
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    val expected = static.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(running.toMap === expected)
    assert(expected.values.sum === 1000L) // sf0.001 events
  }

  test("checkpointed query resumes after a crash: exactly-once via idempotent sink") {
    val base = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/root/repo/target"),
        "ckpt-restart").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    def placeFile(v: Long, name: String, mtime: Long): Unit = {
      val tmp = s"$in/_$name"
      Seq(v).toDF("v").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$in/$name.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    placeFile(1L, "f1", 1000000L)
    placeFile(2L, "f2", 2000000L)
    placeFile(3L, "f3", 3000000L)

    @volatile var failOnce = true
    def start() = spark.readStream.schema("v long")
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        // idempotent sink: overwrite the per-batch directory, so a
        // replayed batch rewrites rather than appends
        df.write.mode("overwrite").parquet(s"$out/batch=$id")
        if (id == 1L && failOnce) {
          failOnce = false
          // crash AFTER the write, BEFORE the checkpoint commit — the
          // worst-case window for duplicates
          throw new RuntimeException("injected crash after batch-1 write")
        }
        ()
      }
      .start()

    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    // restart from the same checkpoint: batch 1 replays (its offsets
    // never committed), batch 2 follows
    val q2 = start()
    try { q2.processAllAvailable() } finally { q2.stop() }

    val vals = spark.read.option("basePath", out).parquet(out)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(vals === Seq(1L, 2L, 3L),
      s"loss or duplication across restart: $vals")
  }
}
