package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for t21 (PMI co-occurrence) — isolates pair
  * emission vs pair aggregation vs dictionary join.
  * `sbt "runMain graft.tools.ProfileT21 [sfDir]"`.
  */
object ProfileT21 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench/engine_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-t21")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s  -> $r")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    val wordsArr = docs.select(col("doc_id"),
      sort_array(array_distinct(
        filter(split(col("text"), " "), w => length(w) > 0))).as("ws"))
    time("wordsArr")(wordsArr.count())
    val wh = wordsArr
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos"), xxhash64(col("word")).as("h"))
    time("wh explode")(wh.count())
    val joined = wh.as("a").join(wh.as("b"),
      col("a.doc_id") === col("b.doc_id") && col("a.pos") < col("b.pos"))
    time("join pair emission")(joined.count())
    val agg = joined.groupBy(col("a.h").as("h1"), col("b.h").as("h2"))
      .agg(count(lit(1)).as("c_xy"))
    time("pair agg (hash keys)")(agg.count())
    time("pair agg + filter>=20")(agg.filter(col("c_xy") >= 20).count())
    // string-key variant for comparison
    val wd = graft.ops.Text.words(docs, "doc_id", "text")
      .select("doc_id", "word").distinct()
    time("wd distinct (old)")(wd.count())
    val aggS = wd.as("a").join(wd.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.word") < col("b.word"))
      .groupBy(col("a.word").as("w1"), col("b.word").as("w2"))
      .agg(count(lit(1)).as("c_xy"))
    time("pair agg (string keys, old)")(aggS.count())
    // narrow emission + hash-key agg (no self-join at all)
    val hsArr = wordsArr.select(
      transform(col("ws"), w => xxhash64(w)).as("hs"))
    val aggN = hsArr
      .select(graft.expressions.ArrayPairs.array_pairs(col("hs"))
        .as(Seq("h1", "h2")))
      .groupBy("h1", "h2").agg(count(lit(1)).as("c_xy"))
    time("narrow ArrayPairs + hash agg")(aggN.count())
    spark.stop()
  }
}
