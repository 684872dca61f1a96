package graft.queries

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.ml.classification.{LogisticRegression, NaiveBayes}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML suite — SURVEY §2d (M1–M4) on `embeddings`/`documents` via
  * Spark MLlib, mirroring the reference's configurations:
  * K-means k=8 / maxIter=20 (`bdb_tools/utils.py:957-1018`),
  * LogisticRegression regParam=0 / 100 iter / tol 1e-9
  * (`bdb_tools/q05_utils.py:37-43`), multinomial NaiveBayes
  * smoothing=0.001 over hashed text features
  * (`bdb_tools/q28_utils.py:36-82`), hand-rolled distributed metrics
  * (`q28_utils.py:106-257`).
  *
  * Model outputs aren't ANSI-SQL-expressible → rows-only driver checks
  * (the reference takes the same stance: ML queries verify via metric
  * thresholds, not row equality, `utils.py:517-581`). m01 and m07 are
  * the exceptions: a Lloyd iteration from fixed seeds and the k-fold
  * held-out evaluation ARE pure relational algebra, so the clustering
  * core and its CV harness get real oracles.
  */
object MlQueries extends Suite {

  private def embs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** embeddings with an ML Vector column. */
  private def withVec(df: DataFrame): DataFrame =
    df.withColumn("features",
      array_to_vector(col("embedding").cast("array<float>")))

  private def dist2Sql(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, len($a.embedding)+1),
       |  i -> (CAST($a.embedding[i] AS DOUBLE) - CAST($b.embedding[i] AS DOUBLE))
       |     * (CAST($a.embedding[i] AS DOUBLE) - CAST($b.embedding[i] AS DOUBLE)))), 6)""".stripMargin

  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    round(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double"); diff * diff
      }),
      lit(0.0), (acc, x) => acc + x), 6)

  val qs: Seq[Q] = Seq(

    // M1a: one Lloyd iteration of k-means (k=8, seeds = vec_id 0..7)
    // as pure relational algebra — assignment by squared euclidean
    // distance, then per-cluster mean of the first 4 dims. Verifiable
    // against the SQL oracle, unlike the iterated MLlib fit.
    Q("m01_kmeans_lloyd", (s, d) => {
      val e = embs(s, d).select("vec_id", "embedding")
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val wAsg = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
      e.crossJoin(broadcast(cents))
        .withColumn("d2", dist2(col("embedding"), col("cvec")))
        .withColumn("arn", row_number().over(wAsg))
        .filter(col("arn") === 1)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"),
          round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("c1"),
          round(avg(element_at(col("embedding"), 2).cast("double")), 6).as("c2"),
          round(avg(element_at(col("embedding"), 3).cast("double")), 6).as("c3"),
          round(avg(element_at(col("embedding"), 4).cast("double")), 6).as("c4"))
        .orderBy("cid")
    },
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
              |cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8),
              |scored AS (
              |  SELECT e.vec_id, c.cid, ${dist2Sql("e", "c")} AS d2
              |  FROM e, cents c),
              |asg AS (
              |  SELECT vec_id, cid FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              |      ORDER BY d2, cid) AS arn FROM scored)
              |  WHERE arn = 1)
              |SELECT cid, COUNT(*) AS n,
              |  round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c1,
              |  round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c2,
              |  round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS c3,
              |  round(avg(CAST(embedding[4] AS DOUBLE)), 6) AS c4
              |FROM asg JOIN e ON e.vec_id = asg.vec_id
              |GROUP BY cid ORDER BY cid""".stripMargin)),

    // M1b: full MLlib K-means (k=8, maxIter=20, fixed seed) — cluster
    // size distribution + WSSSE (trainingCost), the reference's
    // verification metric (utils.py:517-545). Rows-only check.
    Q("m02_kmeans_mllib", (s, d) => {
      val data = withVec(embs(s, d))
      val km = new KMeans().setK(8).setMaxIter(20).setSeed(42L)
        .setFeaturesCol("features")
      val model = km.fit(data)
      val cost = model.summary.trainingCost
      val sizes = model.summary.predictions
        .groupBy("prediction").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("prediction"))
        .withColumn("size_rank",
          row_number().over(Window.orderBy(desc("n"), col("prediction"))))
      sizes.select(col("size_rank"), col("n"))
        .withColumn("wssse", round(lit(cost), 3))
    }, None),

    // M2: logistic regression (no penalty, 100 iter, tol 1e-9,
    // standardization on) — label = upper half of the label space;
    // outputs precision / AUC / confusion counts like the reference's
    // q05 metrics block (q05_utils.py:75-120). Rows-only check.
    Q("m03_logreg", (s, d) => {
      val data = withVec(embs(s, d))
        .withColumn("y", when(col("label") >= 5, 1.0).otherwise(0.0))
      val Array(train, test) =
        Array(data.filter(pmod(col("vec_id"), lit(10)) =!= 0),
          data.filter(pmod(col("vec_id"), lit(10)) === 0))
      val lr = new LogisticRegression().setRegParam(0.0).setMaxIter(100)
        .setTol(1e-9).setLabelCol("y").setFeaturesCol("features")
      val model = lr.fit(train)
      val pred = model.transform(test)
      val auc = new BinaryClassificationEvaluator().setLabelCol("y")
        .setRawPredictionCol("rawPrediction").evaluate(pred)
      pred.agg(
        count(lit(1)).as("n_test"),
        sum(when(col("prediction") === col("y"), 1).otherwise(0)).as("n_correct"),
        sum(when(col("prediction") === 1.0 && col("y") === 1.0, 1).otherwise(0)).as("tp"),
        sum(when(col("prediction") === 1.0 && col("y") === 0.0, 1).otherwise(0)).as("fp"),
        sum(when(col("prediction") === 0.0 && col("y") === 1.0, 1).otherwise(0)).as("fn"),
        sum(when(col("prediction") === 0.0 && col("y") === 0.0, 1).otherwise(0)).as("tn"))
        .withColumn("auc", round(lit(auc), 4))
    }, None),

    // M3: multinomial naive bayes (alpha=0.001) on hashed text
    // features; 90/10 split via doc_id % 10 (the reference's modulo
    // split, q28_dask_sql.py:39-56). Rows-only check.
    Q("m04_naivebayes_text", (s, d) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val langIdx = langs.zipWithIndex
        .foldLeft(lit(-1.0)) { case (acc, (l, i)) =>
          when(col("lang") === l, lit(i.toDouble)).otherwise(acc)
        }
      val feats = new HashingTF().setInputCol("wordarr")
        .setOutputCol("features").setNumFeatures(1 << 18)
      val data = feats.transform(
        docs(s, d).withColumn("wordarr", split(col("text"), " "))
          .withColumn("y", langIdx))
      val train = data.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val test = data.filter(pmod(col("doc_id"), lit(10)) === 0)
      val nb = new NaiveBayes().setSmoothing(0.001)
        .setModelType("multinomial").setLabelCol("y")
        .setFeaturesCol("features")
      val pred = nb.fit(train).transform(test)
      pred.groupBy(col("y").as("true_lang"), col("prediction").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_lang", "pred_lang")
    }, None),

    // M4: distributed multiclass metrics (accuracy, per-class
    // precision/recall) as a plain aggregation pipeline — the
    // reference hand-rolls these as tree reductions
    // (q28_utils.py:106-257); here they're one groupBy.
    Q("m05_multiclass_metrics", (s, d) => {
      val confusion = qs.find(_.name == "m04_naivebayes_text").get
        .fn(s, d)
      val perClass = confusion.groupBy("true_lang")
        .agg(sum("n").as("n_true"),
          sum(when(col("true_lang") === col("pred_lang"), col("n"))
            .otherwise(0L)).as("n_correct"))
        .withColumn("recall",
          round(col("n_correct").cast("double") / col("n_true"), 4))
      perClass.orderBy("true_lang")
    }, None),

    // T11: hashing vectorizer surface (1-gram, 2^18 features) —
    // per-doc non-zero feature count + total term mass. Rows-only.
    Q("m06_hashing_tf", (s, d) => {
      val feats = new HashingTF().setInputCol("wordarr")
        .setOutputCol("features").setNumFeatures(1 << 18)
      import org.apache.spark.ml.linalg.Vector
      val data = feats.transform(
        docs(s, d).withColumn("wordarr", split(col("text"), " ")))
      val nnz = udf((v: Vector) => v.numNonzeros)
      // sum over ACTIVE entries only — v.toArray would densify the
      // 2^18-dim vector per row (gigabytes of allocation at sf0.1)
      val mass = udf { (v: Vector) =>
        var s = 0.0; v.foreachActive((_, x) => s += x); s
      }
      data.select(col("doc_id"), nnz(col("features")).as("nnz"),
        round(mass(col("features")), 2).as("term_mass"))
        .orderBy("doc_id")
    }, None),

    // M7: deterministic 3-fold cross-validated clustering evaluation —
    // folds by salted-hash id (Split.fold: partitioning/engine-
    // invariant, unlike randomSplit), seeds = the 8 lowest train ids
    // per fold, held-out vectors assigned to their nearest seed, and
    // per (fold, cluster) the held-out WSS in INTEGER micro-units
    // (each round-6 distance scaled to an exact integer before the
    // sum, so the aggregate is order-independent and the oracle is
    // bit-exact — no float accumulation across rows).
    Q("m07_cv_kmeans", (s, d) => {
      val e = embs(s, d).select("vec_id", "embedding")
      val folded = e.withColumn("fold",
        graft.ops.Split.fold(col("vec_id"), 3))
      (0 until 3).map { f =>
        val train = folded.filter(col("fold") =!= f)
        val test = folded.filter(col("fold") === f)
        val seeds = train.orderBy("vec_id").limit(8)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
        test.crossJoin(broadcast(seeds))
          .withColumn("d2", dist2(col("embedding"), col("cvec")))
          .withColumn("arn", row_number().over(w))
          .filter(col("arn") === 1)
          .withColumn("d2_us",
            expr("CAST(round(d2 * 1000000, 0) AS BIGINT)"))
          .groupBy(lit(f).as("fold"), col("cid"))
          .agg(count(lit(1)).as("n"), sum("d2_us").as("wss_us"))
      }.reduce(_ unionByName _).orderBy("fold", "cid")
    }, {
      val foldSql =
        "CAST(CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '|fold'),1,15) AS BIGINT) % 3 AS INT)"
      val blocks = (0 until 3).map { f =>
        s"""SELECT $f AS fold, cid, COUNT(*) AS n,
           |  CAST(SUM(d2_us) AS BIGINT) AS wss_us
           |FROM (
           |  SELECT vec_id, cid, d2_us, ROW_NUMBER() OVER (
           |    PARTITION BY vec_id ORDER BY d2, cid) AS arn
           |  FROM (
           |    SELECT t.vec_id, s.cid, ${dist2Sql("t", "s")} AS d2,
           |      CAST(round(${dist2Sql("t", "s")} * 1000000, 0) AS BIGINT)
           |        AS d2_us
           |    FROM (SELECT * FROM e WHERE fold = $f) t,
           |         (SELECT vec_id AS cid, embedding
           |          FROM e WHERE fold <> $f
           |          ORDER BY vec_id LIMIT 8) s))
           |WHERE arn = 1 GROUP BY cid""".stripMargin
      }.mkString("\nUNION ALL\n")
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, $foldSql AS fold
              |  FROM embeddings)
              |SELECT * FROM (
              |$blocks
              |) ORDER BY fold, cid""".stripMargin)
    })
  )
}
