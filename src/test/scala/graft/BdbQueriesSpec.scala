package graft

import graft.bdb._

/** Smoke-runs all 30 TPCx-BB queries on the deterministic in-memory
  * fixture: every query must resolve, execute, and produce its schema.
  * Parameterized item/store keys are adapted to fixture key ranges.
  */
class BdbQueriesSpec extends SparkSpec {

  private lazy val ready: Unit = BdbFixture.register(spark)

  private def run(name: String)(body: => org.apache.spark.sql.DataFrame): Unit =
    test(s"$name runs on fixture") {
      ready
      val df = body
      val n = df.count()
      assert(n >= 0)
    }

  run("q01")(BdbQueries1.q01(spark, stores = Seq(1, 2, 3, 4, 5), minCount = 0))
  run("q02")(BdbQueries1.q02(spark, itemSk = 1))
  run("q03")(BdbQueries1.q03(spark, purchasedItem = 1, categories = Seq(1, 2, 3)))
  run("q04")(BdbQueries1.q04(spark))
  run("q05")(BdbQueries1.q05(spark))
  run("q06")(BdbQueries1.q06(spark, year = 2001))
  run("q07")(BdbQueries1.q07(spark, year = 2004, moy = 7, minCnt = 1))
  run("q08")(BdbQueries1.q08(spark))
  run("q09")(BdbQueries1.q09(spark))
  run("q10")(BdbQueries1.q10(spark))
  run("q11")(BdbQueries1.q11(spark))
  run("q12")(BdbQueries1.q12(spark))
  run("q13")(BdbQueries1.q13(spark))
  run("q14")(BdbQueries1.q14(spark))
  run("q15")(BdbQueries1.q15(spark, storeSk = 1))
  run("q16")(BdbQueries2.q16(spark))
  run("q17")(BdbQueries2.q17(spark))
  run("q18")(BdbQueries2.q18(spark))
  run("q19")(BdbQueries2.q19(spark))
  run("q20")(BdbQueries2.q20(spark))
  run("q21")(BdbQueries2.q21(spark))
  run("q22")(BdbQueries2.q22(spark))
  run("q23")(BdbQueries2.q23(spark, coefficient = 0.1))
  run("q24")(BdbQueries2.q24(spark, itemSk = 1))
  run("q25")(BdbQueries2.q25(spark))
  run("q26")(BdbQueries2.q26(spark, minItems = 0))
  run("q27")(BdbQueries2.q27(spark, itemSk = 1))
  run("q28")(BdbQueries2.q28(spark))
  run("q29")(BdbQueries2.q29(spark))
  run("q30")(BdbQueries2.q30(spark))

  test("q01 pair semantics on fixture: pairs share a ticket") {
    ready
    val rows = BdbQueries1
      .q01(spark, stores = Seq(1, 2, 3, 4, 5), minCount = 0, limit = 10)
      .collect()
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }
}
