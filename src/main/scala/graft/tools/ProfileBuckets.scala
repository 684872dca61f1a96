package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-stage profiler for the bucket pair-expansion shared by
  * d05/d12/d20 — times bucket build, pair emission, and pair
  * aggregation separately. `sbt "runMain graft.tools.ProfileBuckets"`.
  */
object ProfileBuckets {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-buckets")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s  -> $r")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    val sh = Dedup.ngramShingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.count())
    val buckets = sh.groupBy(col("sh"))
      .agg(collect_list(col("doc_id")).as("ids"))
    time("buckets")(buckets.count())
    val guarded = buckets.filter(size(col("ids")).between(2, 10000))
    val pairs = guarded.select(graft.expressions.ArrayPairs
      .array_pairs(sort_array(col("ids"))).as(Seq("id_1", "id_2")))
    time("pair emission")(pairs.count())
    val grouped = pairs.groupBy("id_1", "id_2")
      .agg(count(lit(1)).as("n_common"))
    time("grouped pairs")(grouped.count())
    time("grouped again")(grouped.count())
    // variant: single packed long key (ids fit 2^31)
    val packed = pairs
      .select((col("id_1") * 4294967296L + col("id_2")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_common"))
    time("grouped packed")(packed.count())
    time("grouped packed 2")(packed.count())
    // variant: per-doc sorted hash sets + distinct candidate pairs +
    // sorted intersection (the d04-verify machinery)
    val hs = sh.select(col("doc_id"),
      graft.ops.Text.portableHash(col("sh")).as("h"))
    val sets = hs.groupBy("doc_id")
      .agg(sort_array(collect_list("h")).as("hset"))
    time("hash sets")(sets.count())
    val cand = pairs.distinct()
    time("distinct cands")(cand.count())
    val verified = cand
      .join(sets.select(col("doc_id").as("id_1"), col("hset").as("s1")), "id_1")
      .join(sets.select(col("doc_id").as("id_2"), col("hset").as("s2")), "id_2")
      .select(graft.expressions.GraftFunctions
        .intersect_count_sorted(col("s1"), col("s2")).as("n_common"))
    time("verify intersect")(verified.filter(col("n_common") >= 5).count())
    guarded.select(size(col("ids")).as("c"))
      .groupBy("c").count().orderBy(desc("c")).show(5)
    spark.stop()
  }
}
