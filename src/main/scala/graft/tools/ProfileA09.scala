package graft.tools

import graft.Tables
import graft.ops.{Dedup, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split for a09's bigram LM score (dev only). */
object ProfileA09 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bench/engine_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[a09] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    val base = Tables.load(spark, d, "documents")
    time("scan")(base.agg(count(lit(1))).first())
    val uniH = Text.words(base, "doc_id", "text")
      .groupBy(xxhash64(col("word")).as("w1h"))
      .agg(count(lit(1)).as("c1"))
    time("uniH count")(uniH.agg(count(lit(1))).first())
    val biRaw = Dedup.ngrams(base, "doc_id", "text", 2)
      .select(col("doc_id"), xxhash64(col("sh")).as("h"),
        xxhash64(substring_index(col("sh"), " ", 1)).as("w1h"))
    time("bigram stream count")(biRaw.agg(count(lit(1))).first())
    val bi = time("localCheckpoint")(biRaw.localCheckpoint())
    val biCount = bi.groupBy("h").agg(count(lit(1)).as("c2"))
    time("biCount")(biCount.agg(count(lit(1))).first())
    val joined = bi.join(biCount, "h").join(uniH, "w1h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum((c2 * 1000000) div c1) div count(1)").as("lm_ppm"))
    time("full rest")(joined.agg(count(lit(1))).first())
    time("full a09")(graft.queries.CurationQueries.queries("a09_lm_score")(spark, d)
      .agg(count(lit(1))).first())
    time("full a09 again")(graft.queries.CurationQueries.queries("a09_lm_score")(spark, d)
      .agg(count(lit(1))).first())
    spark.stop()
  }
}
