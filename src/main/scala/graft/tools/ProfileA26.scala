package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Phase split for a26's near-dup manifest (dev only). */
object ProfileA26 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[a26] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r }
    val base = Tables.load(spark, d, "documents")
    time("scan")(base.agg(count(lit(1))).first())
    val edges = Dedup.dupEdges(base, "doc_id", "text", 3, tPct = 10)
    time("dupEdges")(edges.agg(count(lit(1))).first())
    val roots = graft.ops.StarCC.components(edges, rounds = 4,
      distinctInput = false, dedupEvery = 2)
    time("starcc")(roots.agg(count(lit(1))).first())
    val g = base.select(col("doc_id"), col("source"),
        expr("size(filter(split(text, ' '), w -> w != ''))")
          .cast("long").as("dl"))
      .join(roots, col("doc_id") === col("node"), "left_outer")
      .select(col("doc_id"), col("source"), col("dl"),
        coalesce(col("root"), col("doc_id")).as("group_id"))
    val gw = g.withColumn("nc",
      count(lit(1)).over(Window.partitionBy("group_id")))
    time("join+window")(gw.agg(sum("nc")).first())
    time("full a26")(graft.queries.DedupQueries
      .queries("a26_neardup_manifest")(spark, d).collect().length)
    time("full again")(graft.queries.DedupQueries
      .queries("a26_neardup_manifest")(spark, d).collect().length)
    spark.stop()
  }
}
