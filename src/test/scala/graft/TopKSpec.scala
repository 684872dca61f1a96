package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("TopKPerKey == window row_number filter (same row set)") {
    val o = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val viaOp = TopK.perKey(o, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaOp === viaWindow)
    assert(viaOp.nonEmpty)
  }

  test("TopKPerKey plans the custom exec with a single exchange") {
    val o = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = TopK.perKey(o, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(2000))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(!plan.contains("Window"), "fell back to window exec")
  }
}
