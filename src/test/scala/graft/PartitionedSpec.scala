package graft

import graft.ops.Partitioned
import org.apache.spark.sql.functions._

class PartitionedSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with no Exchange") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Partitioned.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Partitioned.writeBucketed(o, "b_orders", "l_orderkey", 8)
    val joined = spark.sql(
      """SELECT /*+ MERGE(b_orders) */ * FROM b_lineitem
        |JOIN b_orders USING (l_orderkey)""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n${plan.take(3000)}")
    // and it is still correct
    val expected = li.join(o, "l_orderkey").count()
    assert(joined.count() === expected)
  }

  test("salted join returns identical results to plain join") {
    val skewed = Seq.tabulate(1000)(i =>
      (if (i < 900) 1L else i.toLong, i.toLong)).toDF("k", "row_id")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("k", "label")
    val plain = skewed.join(dim, "k")
      .select("k", "row_id", "label").collect().toSet
    val salted = Partitioned
      .saltedJoin(skewed, dim, "k", col("row_id"), saltFactor = 8)
      .select("k", "row_id", "label").collect().toSet
    assert(salted === plain)
    assert(plain.size === 901)
  }

  test("morton2 interleaves bits (known values, monotone locality)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (3L, 5L), (0x7FFFFFFFL, 0x7FFFFFFFL)).toDF("x", "y")
    val got = df.select(Partitioned.morton2(col("x"), col("y")))
      .as[Long].collect().toSeq
    // interleave(x,y) with y in the odd bits: (3,5)=0b11,0b101 ->
    // y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 0x27; 31 ones each -> 62 ones
    assert(got === Seq(0L, 1L, 2L, 3L, 0x27L, 0x3FFFFFFFFFFFFFFFL))
  }

  test("z-order layout prunes 2-D rectangles better than linear sort") {
    val base = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/root/repo/target"),
        "zorder").toString
    val o = Tables.load(spark, sf, "orders")
      .withColumn("day",
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")))
    val zPath = s"$base/z"; val linPath = s"$base/lin"
    Partitioned.zorderWrite(o, zPath, col("o_custkey"), col("day"), 16)
    // linear baseline: same file count, sorted by o_custkey only
    o.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(linPath)
    // candidate files = files whose (min,max) box intersects the
    // rectangle — what parquet footer stats let a scan skip
    def candidates(path: String): Int = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min("o_custkey"), max("o_custkey"), min("day"), max("day"))
          .collect()(0)
        !(r.getLong(1) < 100 || r.getLong(0) > 400 ||
          r.getInt(3) < 9131 || r.getInt(2) > 9496)
      }
    }
    val zc = candidates(zPath); val lc = candidates(linPath)
    // the custkey rectangle is ~20% of the domain: a custkey-sorted
    // layout already skips on custkey but reads every file for the
    // day bound alone; z-order must beat it and prune most files
    assert(zc < lc, s"z-order candidates $zc !< linear $lc")
    assert(zc <= 6, s"z-order should prune most of 16 files, got $zc")
    // layout preserves content
    assert(spark.read.parquet(zPath).count() === o.count())
  }

  test("compact collapses a small-file directory preserving rows") {
    val base = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/root/repo/target"),
        "compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    // 32 tiny files
    Tables.load(spark, sf, "orders").repartition(32).write.parquet(in)
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(in) === 32)
    val inBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target half the input -> exactly 2 output files
    val n = Partitioned.compact(spark, in, out, (inBytes + 1) / 2)
    assert(n === 2, s"expected 2 files, planner said $n")
    assert(parts(out) === 2)
    assert(spark.read.parquet(out).count() ===
      spark.read.parquet(in).count())
  }
}
