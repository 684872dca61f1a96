package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def day0 = lit("1992-01-01").cast("date")

  private def pts = Tables.load(spark, sf, "lineitem")
    .select(col("l_orderkey"),
      datediff(col("l_shipdate").cast("date"), day0).as("pd"))

  private def iv = Tables.load(spark, sf, "orders")
    .filter(col("o_orderkey") < 200)
    .select(col("o_orderkey"),
      datediff(col("o_orderdate").cast("date"), day0).as("lo_d"))
    .withColumn("hi_d", col("lo_d") + 45)

  test("binned range join == naive range-predicate join") {
    val got = RangeJoin.binned(pts, iv,
        col("pd"), col("lo_d"), col("hi_d"), binWidth = 16)
      .select("l_orderkey", "o_orderkey", "pd")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val naive = pts.join(iv,
        col("pd") >= col("lo_d") && col("pd") <= col("hi_d"))
      .select("l_orderkey", "o_orderkey", "pd")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("binned range join plans as an equi-join (no nested loop)") {
    val plan = RangeJoin.binned(pts, iv,
        col("pd"), col("lo_d"), col("hi_d"), binWidth = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      plan.take(2000))
  }

  test("negative keys bin exactly (floor semantics, no double rounding)") {
    import spark.implicits._
    // points straddling zero; intervals crossing the origin — a
    // truncate-toward-zero bin would put -1 and +1 in the same bin 0
    // but a FLOOR bin must separate them; matches must equal naive.
    val p = Seq(-100L, -17L, -1L, 0L, 1L, 16L, 99L).toDF("p")
    val ivs = Seq((-50L, -10L), (-5L, 5L), (10L, 20L), (90L, 120L))
      .toDF("lo", "hi").withColumn("iv_id", monotonically_increasing_id())
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select("p", "lo").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = keyset(RangeJoin.binned(p, ivs,
      col("p"), col("lo"), col("hi"), binWidth = 16))
    val naive = keyset(p.join(ivs,
      col("p") >= col("lo") && col("p") <= col("hi")))
    assert(got === naive)
    assert(got.contains((-17L, -50L)) && got.contains((-1L, -5L)))
  }

  test("reserved __bin collision fails fast on either input") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("p", "__bin")
    val ivs = Seq((0L, 10L)).toDF("lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.binned(pts, ivs, col("p"), col("lo"), col("hi"), 4L)
    }
    val pts2 = Seq((1L, 5L)).toDF("p", "x")
    val ivs2 = Seq((0L, 10L, 1L)).toDF("lo", "hi", "__bin")
    intercept[IllegalArgumentException] {
      RangeJoin.binned(pts2, ivs2, col("p"), col("lo"), col("hi"), 4L)
    }
  }

  test("bin width 1 and huge width agree (duplication-selectivity trade)") {
    def run(w: Long) = RangeJoin.binned(pts, iv,
        col("pd"), col("lo_d"), col("hi_d"), binWidth = w)
      .select("l_orderkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1L) === run(100000L))
  }
}
