package graft.tools

import graft.bdb.BdbDataGen
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-shot dump of the deterministic BDB fixture (the 23-table
  * generator at its floor cardinalities — exactly [[graft.BdbFixture]]'s
  * `Counts(0.0)`, the scale the goldens pin) to committed parquet under
  * `bench/bdb_oracle/`, one FILE per table.
  *
  * Purpose: the b-series queries re-express the 30 BDB shapes on the
  * driver's testdata schema for a direct DuckDB gate, while the
  * 23-table instantiations were gated only by goldens + independent
  * reimplementations. This dump closes that gap: DuckDB reads these
  * files by absolute path inside the oracle SQL (`read_parquet`), so
  * selected 23-table queries (bdb/BdbDirect) get the SAME
  * hash-exact oracle gate as everything else.
  *
  * The generator is a pure function of row ids (no RNG), so the dump
  * is reproducible; the committed files are the fixture of record.
  *
  * Usage: `sbt "runMain graft.tools.BdbOracleDump [outDir]"`
  */
object BdbOracleDump {

  private def writeOne(df: DataFrame, outDir: String, name: String): Unit = {
    val tmp = s"$outDir/_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(tmp)
    val part = dir.listFiles().find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file for $name"))
    val dest = new java.io.File(s"$outDir/$name.parquet")
    if (dest.exists()) dest.delete()
    java.nio.file.Files.move(part.toPath, dest.toPath)
    def rm(f: java.io.File): Unit = {
      val fs = f.listFiles(); if (fs != null) fs.foreach(rm); f.delete()
    }
    rm(dir)
    println(s"[bdb-oracle-dump] wrote $name")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("bench/bdb_oracle")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("bdb-oracle-dump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()
    BdbDataGen.frames(spark, BdbDataGen.Counts(0.0)).toSeq.sortBy(_._1)
      .foreach { case (name, df) => writeOne(df, out, name) }
    spark.stop()
  }
}
