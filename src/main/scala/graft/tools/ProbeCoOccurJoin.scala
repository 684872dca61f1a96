package graft.tools

import graft.Tables
import graft.ops.CoOccur
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.CoOccur.pairCountsJoin]] — the
  * beyond-driver-memory vocab-id route added in round 14. The
  * broadcast paths (dense/sparse) carry the gated queries and are
  * slope-measured through t21; this probe gives the JOIN path its own
  * growing-data evidence: same corpus, same minCount, sparse
  * (broadcast ids) vs join (distributed ids) timed side by side, and
  * the outputs cross-checked row-for-row (the CoOccurSpec equality,
  * re-asserted at bench scale).
  *
  * Usage: `sbt "runMain graft.tools.ProbeCoOccurJoin <dir> [repeats]"`
  * where <dir> is an EngineDataGen output (e.g. mult=10 / mult=30).
  */
object ProbeCoOccurJoin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_engine_sf1")
    val repeats = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe-cooccur-join")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def minOf(name: String)(f: => Long): Long = {
      var best = Long.MaxValue
      var out = 0L
      (1 to repeats).foreach { _ =>
        val t0 = System.nanoTime()
        out = f
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"[probe] $name%-28s min-of-$repeats ${best / 1e9}%.3f s  rows=$out")
      out
    }

    // t21's docWords shape: per-doc sorted distinct non-empty tokens
    val wordsArr = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), sort_array(array_distinct(
        filter(split(col("text"), " "), w => length(w) > 0))).as("ws"))
      .localCheckpoint()
    println(s"[probe] docs = ${wordsArr.count()}")

    val vocabDf = wordsArr
      .select(explode(col("ws")).as("word")).distinct()
    val vocab = vocabDf.orderBy("word").collect().map(_.getString(0))
    println(s"[probe] vocab = ${vocab.length}")

    val minCount = 20L
    val sparseN = minOf("pairCountsSparse (broadcast)") {
      CoOccur.pairCountsSparse(wordsArr, "ws", vocab, minCount, 32).count()
    }
    val joinN = minOf("pairCountsJoin (distributed)") {
      val ids = CoOccur.vocabIds(vocabDf, "word")
      val n = CoOccur.pairCountsJoin(
        wordsArr, "doc_id", "ws", ids, minCount, 32).count()
      ids.unpersist()
      n
    }
    require(sparseN == joinN,
      s"path divergence: sparse=$sparseN join=$joinN")
    // row-level equality, not just counts
    val ids = CoOccur.vocabIds(vocabDf, "word")
    val diff = CoOccur.pairCountsJoin(
        wordsArr, "doc_id", "ws", ids, minCount, 32)
      .exceptAll(CoOccur.pairCountsSparse(
        wordsArr, "ws", vocab, minCount, 32)).count()
    println(s"[probe] row diff (must be 0) = $diff")
    require(diff == 0, "join path diverges from sparse path")

    // the round-15 auto-route, both routes at bench scale: the
    // broadcast arm measures the routing probe's overhead (one
    // distinct count) on top of the dense kernel; the forced-join arm
    // measures the full beyond-driver-memory plan including the
    // distributed decode. Counts must agree (route independence).
    val autoBroadcastN = minOf("pairCountsAuto (broadcast)") {
      CoOccur.pairCountsAuto(
        wordsArr, "doc_id", "ws", vocabDf, "word", minCount, 32).count()
    }
    // NOTE: no SessionHygiene.unpersistAll here — wordsArr is
    // localCheckpointed above (truncated lineage), so unpersisting
    // everything between repeats kills its blocks unrecoverably
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). The per-repeat internal id
    // tables are vocab-sized and die with the JVM.
    val autoJoinN = minOf("pairCountsAuto (forced join)") {
      CoOccur.pairCountsAuto(
        wordsArr, "doc_id", "ws", vocabDf, "word", minCount, 32,
        maxBroadcastVocab = 16).count()
    }
    require(autoBroadcastN == autoJoinN && autoBroadcastN == sparseN,
      s"auto-route divergence: broadcast=$autoBroadcastN " +
        s"join=$autoJoinN sparse=$sparseN")
    spark.stop()
  }
}
