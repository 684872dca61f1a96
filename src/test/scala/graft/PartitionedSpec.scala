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
