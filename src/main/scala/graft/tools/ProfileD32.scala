package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler + plan dump for d32 (PQ-ADC semdedup assignment).
  * `sbt "runMain graft.tools.ProfileD32 [sfDir]"`.
  */
object ProfileD32 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench/engine_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-d32")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s  -> $r")
      r
    }
    import graft.expressions.GraftFunctions.{pq_adc_lut, pq_encode}
    val K = graft.ops.Pq.K; val M = graft.ops.Pq.M
    val e = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    e.count()
    val centCodes = e.filter(col("vec_id") % 61 === 0)
      .select(col("vec_id").as("cid"), pq_encode(col("embedding")).as("ccodes"))
    time("centCodes")(centCodes.count())
    val withLut = e.select(col("vec_id"), col("embedding"),
      pq_adc_lut(col("embedding")).as("lut"))
    time("withLut")(withLut.count())
    val adc = (0 until M).map(s0 =>
      element_at(col("lut"),
        element_at(col("ccodes"), s0 + 1) + lit(s0 * K + 1)))
      .reduce(_ + _)
    val joined = withLut.crossJoin(broadcast(centCodes)).withColumn("adc", adc)
    time("join+adc")(joined.select(max(col("adc"))).head())
    val asg = joined
      .groupBy("vec_id")
      .agg(min(struct(col("adc"), col("cid"))).as("_m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("_m.cid").as("cid"), col("embedding"))
    time("asg agg")(asg.count())
    println("==== asg plan ====")
    println(asg.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
