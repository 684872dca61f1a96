package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-size distribution probe for d23 (dev only). */
object ProfileD23b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/repo/bench/engine_sf0.1gen", "/root/repo/bench/engine_sf1")) {
      val e = Tables.load(spark, d, "embeddings").select("vec_id", "embedding")
      val asg = graft.ops.SemDedup.assignCos(e)
      val sizes = asg.groupBy("cid").agg(count(lit(1)).as("n"))
      val top = sizes.orderBy(desc("n")).limit(10).collect()
        .map(r => r.getLong(1)).mkString(",")
      val sumsq = sizes.agg(sum(col("n") * col("n"))).first().getLong(0)
      val n = e.count()
      println(s"[dist] $d n=$n k=${sizes.count()} top10=[$top] sum_sq=$sumsq")
    }
    spark.stop()
  }
}
