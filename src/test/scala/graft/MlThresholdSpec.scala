package graft

/** Metric-threshold checks for the ML queries — the reference's own
  * verification stance for ML (WSSSE / AUC thresholds, not row
  * equality; `bdb_tools/utils.py:517-581`).
  */
class MlThresholdSpec extends SparkSpec {

  test("kmeans: WSSSE below the no-clustering baseline (total variance)") {
    import org.apache.spark.sql.functions._
    import graft.ops.Similarity
    val out = SparkEntry.queries("m02_kmeans_mllib")(spark, sf).collect()
    val wssse = out(0).getAs[Double]("wssse")
    assert(out.map(_.getAs[Long]("n")).sum === 500L)
    // unit-norm 64-dim vectors, near-orthogonal: total variance around
    // the global mean is close to n (=500); k=8 must do better
    assert(wssse > 0 && wssse < 500.0, s"wssse=$wssse")
  }

  test("logreg: AUC above chance on the held-out split") {
    val r = SparkEntry.queries("m03_logreg")(spark, sf).collect()(0)
    val auc = r.getAs[Double]("auc")
    val n = r.getAs[Long]("n_test")
    assert(n > 0)
    assert(auc > 0.45, s"auc=$auc") // embeddings are weakly predictive
  }

  test("naive bayes: accuracy at least majority-class rate") {
    val conf = SparkEntry.queries("m04_naivebayes_text")(spark, sf).collect()
    val total = conf.map(_.getAs[Long]("n")).sum
    val correct = conf.filter(r =>
      r.getAs[Double]("true_lang") == r.getAs[Double]("pred_lang"))
      .map(_.getAs[Long]("n")).sum
    val byClass = conf.groupBy(_.getAs[Double]("true_lang"))
      .map(_._2.map(_.getAs[Long]("n")).sum)
    val majority = byClass.max
    assert(correct >= majority,
      s"accuracy ${correct.toDouble / total} below majority baseline " +
        s"${majority.toDouble / total}")
  }
}
