package graft

import graft.ops.Guards

/** The vocabulary-collect guard behind t21/t26: within-bound collects
  * return the complete (ordered) set; over-bound collects fail fast
  * with the scale-path diagnosis instead of a driver OOM.
  */
class GuardsSpec extends SparkSpec {
  import spark.implicits._

  test("within bound: complete ordered set, one bounded action (t21 shape)") {
    val df = Seq("c", "a", "b").toDF("word").orderBy("word")
    val rows = Guards.boundedCollect(df, "test vocab", "n/a", bound = 3)
    assert(rows.map(_.getString(0)).toList == List("a", "b", "c"))
  }

  test("over bound: fails fast naming the operator and scale path (t26 shape)") {
    val df = (1 to 10).toDF("n_bpe")
    val e = intercept[IllegalStateException] {
      Guards.boundedCollect(df, "t26 BPE symbol-count vocabulary",
        "swap word_lookup_sums for a keyed equi-join", bound = 4)
    }
    assert(e.getMessage.contains("t26 BPE symbol-count vocabulary"))
    assert(e.getMessage.contains("equi-join"))
  }

  test("bound is exact: exactly-bound-sized inputs pass") {
    val df = (1 to 5).toDF("v")
    assert(Guards.boundedCollect(df, "x", "y", bound = 5).length == 5)
  }
}
