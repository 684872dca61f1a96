package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for d12 (edge stage vs star rounds) — targets the
  * round-10 recovery work. `sbt "runMain graft.tools.ProfileD12 [sfDir]"`.
  */
object ProfileD12 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-d12")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm-up

    val sh = Dedup.ngramShingles(docs, "doc_id", "text", 3)
    time("shingles narrow")(sh.count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    time("sizes groupBy (shuffle)")(sizes.count())
    val commonB = Dedup.commonCountsFromBuckets(sh, "doc_id", 10000)
    time("bucket pair counts")(commonB.count())
    val edges = Dedup.jaccardAllPairs(sh, "doc_id")
      .filter(col("jaccard") >= 0.1)
      .select(col("id_1").as("u"), col("id_2").as("v"))
    val nEdges = time("edges (jaccard>=0.1)")(edges.count())
    println(s"[profile] n_edges = $nEdges")
    val ec = edges.localCheckpoint()
    time("starcc 4 rounds (edges pinned)")(
      graft.ops.StarCC.components(ec, rounds = 4, distinctInput = false)
        .write.format("noop").mode("overwrite").save())
    (1 to 2).foreach { i =>
      time(s"full d12 #$i")(
        graft.SparkEntry.queries("d12_dup_groups")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
