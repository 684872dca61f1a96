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
    *
    * Timing is phase-split the way the reference clocks each query
    * (`bdb_tools/utils.py:54-84`: read-graph / main / write):
    *  - read_secs: building the DataFrame graph (catalog lookups,
    *    plan construction — Spark's analogue of the reference's
    *    read-graph step; scans are lazy so this is cheap by design),
    *  - main_secs: materializing the result via localCheckpoint —
    *    every scan/shuffle/compute runs here,
    *  - write_secs: writing the ALREADY-materialized result as
    *    parquet, so the write clock contains no recompute (the
    *    reference's to_parquet step).
    * A regression that shows up in main but not write is compute- or
    * scan-side; one in write alone is sink-side. Caveat: the ML
    * queries (q05/q20/q25/q26/q28) train eagerly while the graph is
    * built, so their fit cost lands in read_secs — same attribution
    * as the reference, whose q25-style queries also fit inside the
    * "main" closure they time as a unit.
    */
  def run(spark: SparkSession, basePath: String, outCsv: String,
      repeats: Int,
      queries: Map[String, SparkSession => org.apache.spark.sql.DataFrame]
        = BdbQueries.all): Unit = {
    BdbCatalog.registerParquet(spark, basePath)
    val writeDir = java.nio.file.Files
      .createTempDirectory("bdb-bench-write").toString
    val rows = new scala.collection.mutable.ListBuffer[String]
    rows += "query,run,read_secs,main_secs,write_secs,total_secs,status"
    queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      (1 to repeats).foreach { run =>
        var status = "ok"
        val t0 = System.nanoTime()
        var tRead = 0L; var tMain = 0L; var tWrite = 0L
        try {
          val df = fn(spark)
          tRead = System.nanoTime()
          val mat = df.localCheckpoint() // eager: full compute
          tMain = System.nanoTime()
          mat.write.mode("overwrite").parquet(s"$writeDir/$name")
          tWrite = System.nanoTime()
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bdb-bench] $name run $run: ${e.getMessage}")
          status = "error"
        } finally {
          // drop the checkpoint blocks so query N's result doesn't
          // occupy execution memory during query N+1
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        }
        val end = if (tWrite != 0L) tWrite else System.nanoTime()
        val readS = if (tRead != 0L) (tRead - t0) / 1e9 else 0.0
        val mainS = if (tMain != 0L) (tMain - tRead) / 1e9 else 0.0
        val writeS = if (tWrite != 0L) (tWrite - tMain) / 1e9 else 0.0
        val totalS = (end - t0) / 1e9
        rows += f"$name,$run,$readS%.3f,$mainS%.3f,$writeS%.3f,$totalS%.3f,$status"
        println(f"[bdb-bench] $name run $run: read=$readS%.3f main=$mainS%.3f " +
          f"write=$writeS%.3f total=$totalS%.3f s ($status)")
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outCsv),
      rows.mkString("\n").getBytes("UTF-8"))
  }
}
