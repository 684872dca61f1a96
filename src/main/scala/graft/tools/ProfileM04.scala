package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split for m04's NB pipeline (dev only): where do the seconds
  * go between the train-side explode+count, the vocab/denominator
  * stage, the test-side scoring join, and the argmax? Run:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileM04"`
  */
object ProfileM04 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[m04] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    val base = Tables.load(spark, d, "documents")
    val isTest = pmod(col("doc_id"), lit(10)) === 0
    // warm the scan
    time("scan")(base.agg(count(lit(1))).first())
    val trw = base.filter(!isTest)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    time("train explode count")(trw.agg(count(lit(1))).first())
    val cw = trw.groupBy("lang", "word").agg(count(lit(1)).as("c"))
    time("cw groupBy(lang,word)")(cw.agg(count(lit(1))).first())
    val tew = graft.ops.Text.words(base.filter(isTest), "doc_id", "text")
    time("test explode count")(tew.agg(count(lit(1))).first())
    // full query end to end
    time("full m04")(
      graft.queries.MlQueries.queries("m04_nb_ppm_text")(spark, d)
        .collect().length)
    time("full m04 again")(
      graft.queries.MlQueries.queries("m04_nb_ppm_text")(spark, d)
        .collect().length)
    spark.stop()
  }
}
