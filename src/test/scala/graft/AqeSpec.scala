package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning: skewed shuffle partitions are split at
  * execution time — the mechanism SCALE.md relies on for heavy-hitter
  * user keys in clickstream shuffles (the reference handles the same
  * skew with hand-tuned repartitioning).
  */
class AqeSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // one hot key carrying ~90% of a few-MB table, joined to a dim
      // too large to broadcast (threshold disabled) -> sort-merge join
      // whose hot partition AQE must split
      val fact = spark.range(0, 200000)
        .select(when(col("id") < 180000, 1L).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as("pad"))
      val dim = spark.range(0, 50000).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("label"))
      val joined = fact.join(dim, "k")
      // execute THIS plan (count() would build a different query tree
      // whose AQE instance finalizes instead of joined's)
      val n = joined.collect().length
      // hot key 1 matches dim row 1: 180000 rows; cold keys in
      // [180000, 200000) have no dim match (dim stops at 50000)
      assert(n === 180000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skew split:\n${finalPlan.take(4000)}")
    }
  }
}
