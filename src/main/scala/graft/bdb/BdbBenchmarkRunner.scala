package graft.bdb

import org.apache.spark.sql.SparkSession

/** Whole-benchmark runner — the E3 equivalent of the reference's
  * `gpu_bdb/benchmark_runner.py`: one shared session, every query run
  * `repeats` times (reference N_REPEATS=5, `benchmark_runner.py:9`),
  * per-run wall-clock written as a CSV results table (the reference
  * pushes the same rows to a sheet, `bdb_tools/utils.py:800-841`).
  *
  * Usage: BdbBenchmarkRunner <bdbParquetBasePath> <outCsv> [repeats]
  */
object BdbBenchmarkRunner {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BdbBenchmarkRunner <bdbParquetBasePath> <outCsv> [repeats]")
    val basePath = args(0)
    val outCsv = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bdb-benchmark")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, basePath, outCsv, repeats)
    finally spark.stop()
  }

  /** Core loop, reusable against any session (tests pass their own).
    * `queries` defaults to the reference-parameter set; callers on
    * tiny data can override individual entries (e.g. q28 with a
    * vocabulary-sized feature space instead of the 2^23 default,
    * whose dense NB model costs ~200 MB per broadcast).
    */
  def run(spark: SparkSession, basePath: String, outCsv: String,
      repeats: Int,
      queries: Map[String, SparkSession => org.apache.spark.sql.DataFrame]
        = BdbQueries.all): Unit = {
    BdbCatalog.registerParquet(spark, basePath)
    val rows = new scala.collection.mutable.ListBuffer[String]
    rows += "query,run,seconds,status"
    queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      (1 to repeats).foreach { run =>
        val t0 = System.nanoTime()
        val status =
          try { fn(spark).write.format("noop").mode("overwrite").save(); "ok" }
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bdb-bench] $name run $run: ${e.getMessage}")
            "error"
          }
        val secs = (System.nanoTime() - t0) / 1e9
        rows += f"$name,$run,$secs%.3f,$status"
        println(f"[bdb-bench] $name run $run: $secs%.3f s ($status)")
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outCsv),
      rows.mkString("\n").getBytes("UTF-8"))
  }
}
