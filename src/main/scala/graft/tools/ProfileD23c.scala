package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d23 phase split with pruning-proof actions (dev only). */
object ProfileD23c {
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
      println(f"[d23c] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    val e = Tables.load(spark, d, "embeddings").select("vec_id", "embedding")
    time("scan")(e.agg(count(lit(1))).first())
    val asg = graft.ops.SemDedup.assignCos(e)
    // sum(cid) forces the kernel to actually run
    time("assignment (sum cid)")(asg.agg(sum("cid")).first())
    time("assignment again")(asg.agg(sum("cid")).first())
    val grouped = asg
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
          .as("mem"))
    // force the arrays to materialize fully
    time("collect_list (sum sizes)")(
      grouped.agg(sum(size(col("mem")))).first())
    val dups = grouped
      .select(col("cluster"), col("n_docs"),
        size(graft.expressions.GraftFunctions.semdedup_dups(
          expr("transform(mem, x -> x.vec_id)"),
          flatten(expr("transform(mem, x -> x.embedding)")), 0.45))
          .cast("long").as("n_dups"))
    time("full incl kernel (sum n_dups)")(dups.agg(sum("n_dups")).first())
    time("again")(dups.agg(sum("n_dups")).first())
    spark.stop()
  }
}
