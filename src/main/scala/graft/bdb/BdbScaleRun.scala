package graft.bdb

import org.apache.spark.sql.SparkSession

/** One-command multi-scale E3 run: synthesize dataGen-style pipe-CSV
  * at a scale factor, convert it through the load test
  * (BdbCatalog.loadTest — the reference's CSV→parquet phase,
  * `gpu_bdb_load_test.py:31-92`), then drive all 30 queries through
  * the phase-split benchmark runner. Artifacts land under
  * `<workDir>/sf<sf>/`: `load_test.csv` (per-table rows + seconds),
  * `results.csv` (every pass), `results_summary.csv` (best pass per
  * query + rows).
  *
  * Data-validity gate: every query the generator's shapes imply is
  * non-empty must return rows > 0 at EVERY scale, or the run fails
  * (round-5 lesson: q01–q04/q30 silently benchmarked empty pipelines).
  * Reference-default parameters that probe a specific item (10001)
  * are rescaled to the catalog's midpoint when the catalog is smaller
  * than the probe — the reference's defaults assume SF≥1 data.
  *
  * A clickSkew > 1 (4th arg) routes the clickstream's user draw
  * through BdbDataGen's power-law option — the hot-user stress
  * variant for the session/pair queries (artifacts then land under
  * `sf<sf>-skew<alpha>/` so uniform runs are never overwritten).
  *
  * Usage: BdbScaleRun <workDir> <scaleFactor> [repeats] [clickSkew]
  */
object BdbScaleRun {

  /** Queries allowed to be empty: none of the generator's current
    * shapes leave a query empty at sf≥0.1. (q19's store↔web
    * balanced-returns band can go empty below that — the fixture's
    * 120 sampled returns don't week-align — but at benchmark scales
    * the per-item sums smooth out; keep it gated so a regression in
    * the returns shapes is caught.)
    */
  val mayBeEmpty: Set[String] = Set.empty

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BdbScaleRun <workDir> <sf> [repeats]")
    val workDir = args(0)
    val sf = args(1).toDouble
    val repeats = if (args.length > 2) args(2).toInt else 2
    val clickSkew = if (args.length > 3) args(3).toDouble else 1.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bdb-scale-run")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val base =
        if (clickSkew > 1.0) s"$workDir/sf$sf-skew$clickSkew"
        else s"$workDir/sf$sf"
      val c = BdbDataGen.Counts(sf)
      // SPARK_GRAFT_BDB_REUSE=1 re-benchmarks an existing parquet
      // tree (skips datagen + load test) — for re-timing query-code
      // changes without paying the generate/convert phases again.
      // load_test.csv is left as written by the generating run.
      val reuse = sys.env.get("SPARK_GRAFT_BDB_REUSE").contains("1") &&
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$base/parquet"))
      if (reuse) {
        println(s"[bdb-scale] sf$sf: reusing existing $base/parquet")
      } else {
        val t0 = System.nanoTime()
        BdbDataGen.writeCsv(spark, s"$base/csv", c, clickSkew)
        println(f"[bdb-scale] sf$sf datagen: ${(System.nanoTime() - t0) / 1e9}%.1f s")
        val report = BdbCatalog.loadTest(spark, s"$base/csv", s"$base/parquet")
        val lt = "table,rows,seconds" +: report.map { case (t, n, s) =>
          f"$t,$n,$s%.3f"
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$base/load_test.csv"),
          lt.mkString("\n").getBytes("UTF-8"))
        report.foreach { case (t, n, s) =>
          println(f"[bdb-scale] load $t: $n rows in $s%.1f s")
        }
      }
      // item-probe parameters: reference default 10001 when the
      // catalog holds it, else the catalog midpoint
      val probeItem = if (c.items >= 10001L) 10001L else c.items / 2 + 1
      // q28 runs at the reference's 2^23 feature space (its default):
      // the sparse (label, bucket)-keyed NB aggregation materializes
      // only touched buckets, so the model no longer needs the dense
      // classes x 2^23 x task buffers that OOM'd one 24 g JVM and
      // forced a 2^18 de-rating through round 8.
      val queries = BdbQueries.all ++ Map[String, SparkSession => org.apache.spark.sql.DataFrame](
        "q02" -> (s => BdbQueries1.q02(s, itemSk = probeItem)),
        "q03" -> (s => BdbQueries1.q03(s, purchasedItem = probeItem)),
        "q24" -> (s => BdbQueries2.q24(s, itemSk = probeItem)),
        "q27" -> (s => BdbQueries2.q27(s, itemSk = probeItem)))
      // SPARK_GRAFT_BDB_ONLY=q01,q06 limits the run (slope probes of
      // individual queries without paying the 30-query suite) — the
      // SPARK_GRAFT_ONLY convention; results.csv then only carries
      // the probed queries, so point it at a scratch file.
      val only = sys.env.get("SPARK_GRAFT_BDB_ONLY")
        .map(_.split(",").map(_.trim).toSet)
      val selected = only match {
        case Some(names) =>
          val sel = queries.filter { case (n, _) => names(n) }
          val missing = names -- queries.keySet
          require(missing.isEmpty,
            s"SPARK_GRAFT_BDB_ONLY names unknown queries: " +
              s"${missing.toSeq.sorted.mkString(",")} " +
              s"(known: ${queries.keys.toSeq.sorted.mkString(",")})")
          require(sel.nonEmpty, "SPARK_GRAFT_BDB_ONLY selected nothing")
          sel
        case None => queries
      }
      val resultsPath = only match {
        case Some(_) => s"$base/results_probe.csv"
        case None => s"$base/results.csv"
      }
      BdbBenchmarkRunner.run(spark, s"$base/parquet",
        resultsPath, repeats, selected,
        mustHaveRows = selected.keySet -- mayBeEmpty)
    } finally spark.stop()
  }
}
