package graft.tools

import graft.ops.Multimodal
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timer for x06's real-WAV decode pass: isolates scan+md5,
  * +synthesis-cache, +decode so the expensive stage is measured, not
  * guessed (the ProfileD23c discipline). Run:
  * `sbt "runMain graft.tools.ProfileX06 bench/engine_sf1"`.
  */
object ProfileX06 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("bench/engine_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val media = Multimodal.asBinary(
      Tables.load(spark, dir, "documents"), "doc_id", "text", "audio")
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
    println(s"partitions: ${media.rdd.getNumPartitions}")

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }

    time("scan+md5      ")(media.mapPartitions(_.map { case (i, b) =>
      Multimodal.StubCodec.hash60(b)
    }).filter(_ != 0L).count())

    time("  +synthesize ")(media.mapPartitions(_.map { case (i, b) =>
      Multimodal.WavCodec.synthesizeWav(
        Multimodal.StubCodec.hash60(b)).length.toLong
    }).filter(_ != 0L).count())

    time("  +decode     ")(media.mapPartitions(_.map { case (i, b) =>
      val wav = Multimodal.WavCodec.synthesizeWav(
        Multimodal.StubCodec.hash60(b))
      Multimodal.WavCodec.decode(wav)._1.toLong
    }).filter(_ != 0L).count())

    spark.stop()
  }
}
