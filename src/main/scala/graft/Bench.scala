package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are forced through the `noop` sink — unlike `count()`,
  * noop materializes every output column, so projection-heavy work
  * (cosines, hashes, string pipelines) is actually measured. This
  * mirrors the reference's timing discipline, which writes results to
  * parquet and clocks the write (`bdb_tools/utils.py:54-84,117-147`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up so JIT/codegen startup isn't billed to the
    // alphabetically-first query
    try SparkEntry.queries("o15_multi_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }
    // SPARK_GRAFT_ONLY=q1,q2 limits the run for local profiling;
    // SPARK_GRAFT_REPEATS=N takes the min of N runs per query (the
    // reference's N_REPEATS=5 discipline, benchmark_runner.py:9) —
    // the driver calls with neither, timing one cold run of each.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val repeats = sys.env.get("SPARK_GRAFT_REPEATS")
      .map(_.toInt).getOrElse(1).max(1)
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // The driver keeps only the last ~2000 chars of output and parses
    // the JSON line from that tail — a per-query map over the full
    // suite (~2.6k chars) gets truncated and the round records no
    // bench number. Emit the total + a fixed headline subset (one per
    // operator family, plus the heaviest stages) and the failure list;
    // full per-query timings go to stderr for local profiling.
    val headline = Seq(
      "a01_lang_id", "b25_rfm", "b29_brand_pairs",
      "d01_dedup_exact", "d04_minhash_lsh_neardup", "d07_simhash_neardup",
      "d09_knn_bruteforce", "d12_dup_groups", "m01_kmeans_lloyd",
      "o08_join_agg", "o13_basket_pairs", "o26_topk", "o28_window_rank",
      "s02_sessions", "s04_session_pairs", "t03_word_counts",
      "x02_streaming_sessions", "x04_tumbling_window", "x05_asof_join")
    val byName = results.toMap
    results.foreach { case (k, v) =>
      System.err.println(f"[bench] $k%-28s $v%.3f s") }
    val qs = headline.flatMap(h => byName.get(h).map(v =>
        "\"" + h + f"""\":$v%.2f"""))
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sfName = new java.io.File(sfDir).getName
    val failedJs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val avg = if (results.nonEmpty) total / results.size else 0.0
    println(
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","n_queries":${results.size},"sec_per_query":$avg%.2f,"failed":$failedJs,"queries":$qs,"sf":"$sfName"}""")
    spark.stop()
  }
}
