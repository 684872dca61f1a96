package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** Edge-case coverage for the as-of join that the no-null testdata
  * can't exercise: genuinely-NULL payloads, NULL keys, tolerance.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def right = Seq(
    (7L, 10L, Some(5.0)),   // older row, non-null payload
    (7L, 20L, None),        // newer row, NULL payload
    (9L, 15L, Some(3.0))
  ).toDF("k", "t", "v")

  test("NULL payload of the matched row is preserved (no stale carry)") {
    val left = Seq((7L, 25L, "a")).toDF("k", "t", "tag")
    val out = AsOf.joinAsOf(left, right, "k", "t", Seq("v")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("_asof_ts") === 20L) // matched the t=20 row
    assert(out(0).isNullAt(out(0).fieldIndex("v"))) // ...with its real NULL
  }

  test("NULL keys never match") {
    val left = Seq((Option.empty[Long], 30L, "n")).toDF("k", "t", "tag")
    val r = Seq((Option.empty[Long], 10L, 2.0)).toDF("k", "t", "v")
    val out = AsOf.joinAsOf(left, r, "k", "t", Seq("v")).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("v")))
    assert(out(0).isNullAt(out(0).fieldIndex("_asof_ts")))
  }

  test("tolerance bound nulls out too-old matches") {
    val left = Seq((7L, 100L, "a")).toDF("k", "t", "tag")
    val out = AsOf.joinAsOf(left, right, "k", "t", Seq("v"),
      tolerance = Some(50L)).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("_asof_ts"))) // 100-20=80 > 50
    val out2 = AsOf.joinAsOf(left, right, "k", "t", Seq("v"),
      tolerance = Some(90L)).collect()
    assert(out2(0).getAs[Long]("_asof_ts") === 20L)
  }

  test("left rows before any right row get NULLs") {
    val left = Seq((7L, 5L, "early")).toDF("k", "t", "tag")
    val out = AsOf.joinAsOf(left, right, "k", "t", Seq("v")).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("_asof_ts")))
  }

  test("reserved-name collisions fail fast") {
    val left = Seq((7L, 25L, 1)).toDF("k", "t", "_side")
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left, right, "k", "t", Seq("v"))
    }
    // _m is claimed internally too (the carry column) — pre-fix it was
    // missing from the guard and a caller's _m silently disappeared
    val leftM = Seq((7L, 25L, 1)).toDF("k", "t", "_m")
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(leftM, right, "k", "t", Seq("v"))
    }
  }

  test("TopK.perKey rejects k < 1") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      graft.plans.TopK.perKey(df, Seq("a"), Seq(col("b").asc), 0)
    }
  }
}
