package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver testdata (TESTDATA.md): one parquet file per
  * table under `sfDir`. Mirrors the reference's reader utility
  * (`gpu_bdb/bdb_tools/readers.py:87-135`) — but column pruning /
  * predicate pushdown are left to Catalyst rather than hand-passed
  * `relevant_cols`: callers just `.select(...)`/`.filter(...)` and the
  * parquet scan prunes automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor
    * (the reference repartitions these to 1 partition for map-side
    * joins, `readers.py:129-134`; Spark's equivalent is a broadcast
    * hint / AQE auto-broadcast).
    */
  val broadcastable: Set[String] =
    Set("region", "nation", "supplier", "part", "customer")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read nanos as an exact BIGINT instead (DuckDB
    // equivalent: epoch_ns(ts)). Integer nanos are also the right
    // currency for deterministic sessionization arithmetic.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
