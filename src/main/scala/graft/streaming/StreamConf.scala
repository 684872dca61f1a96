package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming-query tuning shared by the x-series runners.
  *
  * A stateful streaming operator creates one state store per shuffle
  * partition, and every micro-batch commits a delta file per store —
  * at bench scale (single node, one batch) 32 partitions is pure
  * checkpoint-IO overhead (the stream-stream join pays it twice, once
  * per side). 4 keeps the run parallel while cutting that 8x
  * (measured: the stream-stream join 22s → 7.8s at sf0.1); on a
  * real cluster size it to the executor count like any shuffle.
  */
object StreamConf {
  def withStatePartitions[T](s: SparkSession, n: Int = 4)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }
}
