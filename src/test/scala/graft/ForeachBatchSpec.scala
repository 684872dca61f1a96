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
    val stream = spark.readStream.schema(static.schema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(sf)

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
}
