package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split for d23's semdedup pipeline (dev only): where do the
  * seconds go between the centroid sample+collect, the argmax_cos
  * assignment scan, the cid-keyed collect_list, and the semdedup_dups
  * kernel? Run:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileD23"`
  */
object ProfileD23 {
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
      println(f"[d23] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    val e = Tables.load(spark, d, "embeddings")
      .select("vec_id", "embedding")
    time("scan")(e.agg(count(lit(1))).first())
    val sampled = graft.ops.SemDedup.sampledCentroids(e)
    time("sampled.count")(sampled.count())
    time("sampled.count again")(sampled.count())
    val asg = time("assignCos build (incl eager count)")(
      graft.ops.SemDedup.assignCos(e))
    time("assignment scan")(asg.agg(count(lit(1))).first())
    val grouped = asg
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
          .as("mem"))
    time("cid collect_list")(grouped.agg(count(lit(1))).first())
    val dups = grouped
      .select(col("cluster"), col("n_docs"),
        size(graft.expressions.GraftFunctions.semdedup_dups(
          expr("transform(mem, x -> x.vec_id)"),
          flatten(expr("transform(mem, x -> x.embedding)")), 0.45))
          .cast("long").as("n_dups"))
    time("semdedup_dups kernel")(dups.agg(count(lit(1))).first())
    time("full d23")(
      graft.queries.DedupQueries.queries("d23_semdedup")(spark, d)
        .collect().length)
    time("full d23 again")(
      graft.queries.DedupQueries.queries("d23_semdedup")(spark, d)
        .collect().length)
    spark.stop()
  }
}
