package graft

/** Driver-contract smoke tests. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qk = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qk
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("no oracle is null or blank (object-init ordering hazard)") {
    // a `val` declared below `qs` in a suite object is still null
    // when qs captures it — one null oracle crashes the whole Verify
    // dump and zeroes the round's correctness
    val bad = SparkEntry.oracleSql.collect {
      case (k, v) if v == null || v.trim.isEmpty => k
    }
    assert(bad.isEmpty, s"null/blank oracles: $bad")
  }

  test("query names are unique across suites") {
    import graft.queries._
    val all = Seq(Relational, Sessions, TextQueries, DedupQueries,
      MlQueries, BdbShapes, BdbShapes2, Extras, Relational2, TextQueries2,
      CurationQueries, GraphQueries, graft.bdb.BdbDirect)
      .flatMap(_.qs.map(_.name))
    assert(all.size === all.distinct.size,
      all.diff(all.distinct).mkString("duplicate names: ", ", ", ""))
    // and the suite list above is complete — a suite missing from it
    // (as CurationQueries once was) would let a cross-suite collision
    // silently drop a query in SparkEntry's Map
    assert(all.size === SparkEntry.queries.size)
  }

  test("exact stats: dstddev/dcorr match closed form on a fixture") {
    import spark.implicits._
    import graft.ops.Exact._
    import org.apache.spark.sql.functions._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x").withColumn("y", col("x") * 2)
    val r = df.agg(dstddev(col("x")).as("sd"), dcorr(col("x"), col("y")).as("c"))
      .first()
    assert(math.abs(r.getDouble(0) - 1.290994) < 1e-6)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }
}
