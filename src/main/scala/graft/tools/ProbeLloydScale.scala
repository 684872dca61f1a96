package graft.tools

import graft.bdb.{BdbCatalog, BdbQueries1, BdbQueries2}
import graft.ops.{ExactLinFit, ExactLloyd}
import org.apache.spark.sql.SparkSession

/** Scale probe for the deterministic fit machinery itself: run
  * [[ExactLloyd.fitLabels]] over the REAL q20/q25/q26 feature frames
  * and [[ExactLinFit.fitStats]] over the REAL q05 feature frame on
  * the BdbDataGen parquet trees (the b61-b64 gate bodies, but on
  * growing data instead of the committed fixture) and print min-of-N
  * seconds — evidence that the quantize/assign/recenter loop and the
  * moment-sum/score passes cost tracks the feature-frame size, not
  * something worse.
  *
  * Usage: `sbt "runMain graft.tools.ProbeLloydScale bench/bdb/sf1.0 4"`.
  */
object ProbeLloydScale {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("bench/bdb/sf1.0")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    BdbCatalog.registerParquet(spark, s"$base/parquet")

    def timeMin(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      println(f"[lloyd-scale] $label: min ${times.map(_._1).min}%.2f s " +
        f"over $reps (rows=${times.head._2}, " +
        s"passes=${times.map(t => f"${t._1}%.2f").mkString(",")})")
    }

    timeMin("q20 ExactLloyd k=8 it=3")(ExactLloyd.fitLabels(
      BdbQueries2.q20Features(spark), "cust",
      Seq("order_ratio", "item_ratio", "amount_ratio"), 8, 3, 1000000L))
    timeMin("q25 ExactLloyd k=8 it=3")(ExactLloyd.fitLabels(
      BdbQueries2.q25Features(spark), "cid",
      Seq("recency", "frequency", "totalspend"), 8, 3, 100L))
    timeMin("q26 ExactLloyd k=8 it=3 (15-dim)")(ExactLloyd.fitLabels(
      BdbQueries2.q26Features(spark), "cid",
      (1 to 15).map(i => s"id$i"), 8, 3, 1L))
    timeMin("q05 ExactLinFit (closed-form)")(ExactLinFit.fitStats(
      BdbQueries1.q05Features(spark),
      "clicks_total", "college_education", "male", "label"))
    spark.stop()
  }
}
