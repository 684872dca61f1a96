package graft.tools

import graft.ops.{Dedup, Text}
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (dev only, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    val docs = Tables.load(spark, d, "documents")
    val sh = time("shingles.checkpoint") {
      Dedup.wordShingles(docs, "doc_id", "text").localCheckpoint()
    }
    time("shingle rows")(sh.count())
    val sigs = Dedup.minhashSignatures(sh, "doc_id", 8)
    val bands = Dedup.lshBands(sigs, "doc_id", 8, 2)
    time("band rows")(bands.count())
    time("bucket profile") {
      bands.groupBy("band_id", "band_hash").count()
        .agg(max("count"), sum(col("count") * col("count")), count(lit(1)))
        .collect().mkString
    }
    val sigs2 = Dedup.minhashSignatures(sh, "doc_id", 8)
    val candsOnce = Dedup.lshCandidatesOnce(sigs2, "doc_id", 8, 2)
    time("candidatesOnce")(candsOnce.count())
    val v3 = Dedup.jaccardVerifyHashedSets(candsOnce, sh, "doc_id", 90)
      .filter(col("jaccard") >= 0.9)
    time("verified3 (pipeline)")(v3.count())
    spark.stop()
  }
}
