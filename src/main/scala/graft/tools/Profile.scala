package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy dedup pipeline — times each
  * stage of d05 separately so optimization targets the real cost.
  * Usage: `sbt "runMain graft.tools.Profile [sfDir]"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    // warm-up
    docs.count()

    time("split+explode words")(
      docs.select(explode(split(col("text"), " "))).count())
    val sh = Dedup.ngramShingles(docs, "doc_id", "text", 3)
    time("shingles distinct")(sh.count())
    time("shingles x2 (reuse?)")(sh.union(sh).count())
    // variant: materialize the words array in its own projection so
    // the transform lambda's element_at hits a stored array
    def shingles2 = {
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val idx = when(size(col("__w")) >= 3,
        sequence(lit(1), size(col("__w")) - 2))
        .otherwise(array().cast("array<int>"))
      docs.select(col("doc_id"), words.as("__w"))
        .select(col("doc_id"), explode(transform(idx, i =>
          concat_ws(" ", element_at(col("__w"), i),
            element_at(col("__w"), i + 1),
            element_at(col("__w"), i + 2)))).as("sh"))
        .distinct()
    }
    time("shingles2 materialized")(shingles2.count())
    time("shingles2 again")(shingles2.count())
    // variant: slice + array_join (no element_at chain)
    def shingles3 = {
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val idx = when(size(col("__w")) >= 3,
        sequence(lit(1), size(col("__w")) - 2))
        .otherwise(array().cast("array<int>"))
      docs.select(col("doc_id"), words.as("__w"))
        .select(col("doc_id"), explode(transform(idx, i =>
          array_join(slice(col("__w"), i, lit(3)), " "))).as("sh"))
        .distinct()
    }
    time("shingles3 slice/join")(shingles3.count())
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_1"), col("b.doc_id").as("id_2"))
      .agg(count(lit(1)).as("n_common"))
    time("self-join pairs")(common.count())
    time("full d05")(
      graft.SparkEntry.queries("d05_ngram_jaccard")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    // ---- d04 stages ----
    val base = docs.filter(col("doc_id") < 1000)
    val K = 8; val RowsPerBand = 2
    val sh4 = time("d04 shingles lc")(
      Dedup.wordShingles(base, "doc_id", "text").localCheckpoint())
    val sigs = Dedup.minhashSignatures(sh4, "doc_id", K)
    time("d04 sigs")(sigs.count())
    val cands = Dedup.lshCandidates(
      Dedup.lshBands(sigs, "doc_id", K, RowsPerBand), "doc_id")
    time("d04 cands")(cands.count())
    val cl = time("d04 cands lc")(cands.localCheckpoint())
    println(s"[profile] n_cands = ${cl.count()}  n_shingles = ${sh4.count()}")
    time("d04 verify explode")(Dedup.jaccardVerify(cl, sh4, "doc_id")
      .filter(col("jaccard") >= 0.9).count())
    time("d04 verify explode 2")(Dedup.jaccardVerify(cl, sh4, "doc_id")
      .filter(col("jaccard") >= 0.9).count())
    time("d04 verify sets")(Dedup.jaccardVerifySets(cl, sh4, "doc_id")
      .filter(col("jaccard") >= 0.9).count())
    time("d04 verify sets 2")(Dedup.jaccardVerifySets(cl, sh4, "doc_id")
      .filter(col("jaccard") >= 0.9).count())
    time("full d04")(
      graft.SparkEntry.queries("d04_minhash_lsh_neardup")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    // ---- d05 stage breakdown (round 8: post narrow-dedup) ----
    val shN = Dedup.ngramShingles(docs, "doc_id", "text", 3)
    time("d05 shingles (narrow)")(shN.count())
    val sizesAgg = shN.groupBy("doc_id").agg(count(lit(1)).as("n"))
    time("d05 sizes groupBy")(sizesAgg.count())
    val commonB = Dedup.commonCountsFromBuckets(shN, "doc_id", 10000)
    time("d05 bucket pairs")(commonB.count())
    time("full d05 again")(
      graft.SparkEntry.queries("d05_ngram_jaccard")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    // ---- d12 stage breakdown ----
    time("d12 edges")(Dedup.jaccardAllPairs(shN, "doc_id")
      .filter(col("jaccard") >= 0.1).count())
    time("full d12")(
      graft.SparkEntry.queries("d12_dup_groups")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
