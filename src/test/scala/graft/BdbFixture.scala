package graft

import graft.bdb.{BdbCatalog, BdbDataGen}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic fixture data for all 23 TPCx-BB tables: the scale
  * generator evaluated at its floor cardinalities (items 60,
  * customers 40, store_sales 400, clicks 600, ...). One source of
  * truth — the goldens verify exactly the shapes [[graft.bdb.BdbScaleRun]]
  * benchmarks at sf0.1/sf1+, including the density invariants
  * (multi-event sessions, 4-line baskets, aligned returns) documented
  * on [[graft.bdb.BdbDataGen]].
  */
object BdbFixture {

  def frames(spark: SparkSession): Map[String, DataFrame] =
    BdbDataGen.frames(spark, BdbDataGen.Counts(0.0))

  def register(spark: SparkSession): Unit =
    BdbCatalog.registerFrames(frames(spark))
}
