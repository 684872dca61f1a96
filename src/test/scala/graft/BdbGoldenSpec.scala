package graft

/** Golden-output verification of all 30 TPCx-BB queries on the
  * deterministic fixture — the per-query validation-file compare the
  * reference runs (`bdb_tools/utils.py:616-752`), with the
  * 6-significant-digit tolerance baked into the canonical rendering
  * ([[BdbGolden.canonicalize]]).
  *
  * On an intentional semantic change, regenerate with
  * `sbt -Dgraft.golden.update=1 "testOnly graft.BdbGoldenSpec"` and
  * review the golden diff like any other code change.
  */
class BdbGoldenSpec extends SparkSpec {

  private lazy val ready: Unit = BdbFixture.register(spark)

  private val update = sys.props.get("graft.golden.update").nonEmpty

  (1 to 30).map(i => f"q$i%02d").foreach { name =>
    test(s"$name matches golden output") {
      ready
      val df = BdbGolden.queries(spark).toMap.apply(name)()
      val got = BdbGolden.canonicalize(df)
      // every BDB query must be NON-EMPTY at fixture scale — a
      // header-only golden proves nothing about the query logic
      // (round-7 verdict: q19 passed vacuously for five rounds)
      assert(got.size > 1,
        s"$name returned zero rows on the fixture — vacuous golden; " +
          "adapt the query parameters in BdbGolden.queries")
      if (update) {
        BdbGolden.write(name, got)
        info(s"golden updated: ${BdbGolden.goldenFile(name)} (${got.size - 1} rows)")
      } else {
        BdbGolden.read(name) match {
          case None =>
            fail(s"golden file missing for $name — run with " +
              "-Dgraft.golden.update=1 to create it")
          case Some(want) =>
            assert(got.size == want.size,
              s"$name: ${got.size - 1} rows, golden has ${want.size - 1}")
            got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
              assert(g == w, s"$name line $i differs:\n  got    $g\n  golden $w")
            }
        }
      }
    }
  }
}
