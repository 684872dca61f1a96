package graft.tools

import graft.bdb.BdbCatalog
import graft.ops.Sessionize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (dev only, not part of the driver contract).
  * Current target: q30's phase split at scale — where do the seconds
  * go between the clickstream shuffle+sort, the per-session set
  * aggregation, and the pair expansion? Run:
  * `SPARK_GRAFT_BDB_DIR=target/bdb-scale/sf10.0/parquet
  *  sbt "runMain graft.tools.Probe"`
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_BDB_DIR",
      "target/bdb-scale/sf1.0/parquet")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    BdbCatalog.registerParquet(spark, d)

    val i = spark.table("item").select("i_item_sk", "i_category_id", "i_category")
    val clicks = spark.table("web_clickstreams")
      .filter(col("wcs_user_sk").isNotNull && col("wcs_item_sk").isNotNull)
      .join(broadcast(i), col("wcs_item_sk") === col("i_item_sk"))
      .filter(col("i_category_id").isNotNull)
      .select(col("wcs_user_sk"),
        (col("wcs_click_date_sk") * 86400 + col("wcs_click_time_sk")).as("ts"),
        col("i_category"))
      .withColumn("eid", monotonically_increasing_id())

    // phase 0: scan + broadcast join only (no shuffle)
    time("scan+join")(clicks.agg(sum(col("ts"))).first().get(0))

    // phase 1: + shuffle + sort + window (sum forces session_seq)
    val sess = Sessionize.byTimeout(clicks, "wcs_user_sk", "ts", "eid", 3600)
    time("sessionize")(sess.agg(sum(col("session_seq"))).first().get(0))

    // phase 2: + per-session set aggregation
    val sets = sess.groupBy(col("wcs_user_sk"), col("session_seq"))
      .agg(sort_array(collect_set(col("i_category"))).as("_items"))
    time("session sets")(sets.agg(sum(size(col("_items")))).first().get(0))

    // phase 3: full pair expansion + pair counting (q30 core)
    val pairs = Sessionize.sessionPairs(sess, "wcs_user_sk", "session_seq",
      "i_category")
      .groupBy(col("item_1"), col("item_2")).agg(count(lit(1)).as("cnt"))
    time("pairs+count")(pairs.agg(sum(col("cnt"))).first().get(0))

    spark.stop()
  }
}
