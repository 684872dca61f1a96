package graft

import graft.ops.{Pack, ScalarQuant, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing + scalar quantization: the properties the DuckDB
  * oracles can't express — partitioning invariance, stream-coverage
  * (every token lands in exactly one bin slot), code range, and SQ8
  * top-k recall against the exact float ranking.
  */
class PackQuantSpec extends SparkSpec {

  private def toks = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))

  test("Pack: offsets are a gapless per-shard prefix sum, any partitioning") {
    val packed = Pack.pack(toks, "doc_id", "n_tok", nShards = 4, ctx = 128)
      .select("doc_id", "shard", "n_tok", "off", "bin")
    val rows = packed.orderBy("shard", "doc_id").collect()
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      var expect = 0L
      rs.foreach { r =>
        assert(r.getLong(3) === expect,
          s"gap/overlap at doc ${r.getLong(0)}")
        assert(r.getLong(4) === expect / 128)
        expect += r.getInt(2)
      }
    }
    val repart = Pack.pack(toks.repartition(13), "doc_id", "n_tok", 4, 128)
      .select("doc_id", "shard", "n_tok", "off", "bin")
    assert(packed.except(repart).isEmpty && repart.except(packed).isEmpty,
      "packing must not depend on input partitioning")
  }

  test("SQ8: codes in [0,255]; top-10 recall vs exact cosine >= 0.5") {
    val e = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    val enc = ScalarQuant.encodeAll(e, "embedding")
    val bad = enc.filter(exists(col("code"),
      c => c < 0 || c > 255)).count()
    assert(bad === 0L, "code outside [0,255]")

    // Code-space L2 top-10 must substantially agree with exact float
    // L2 top-10 (same metric family; SQ8's whole point). L2, not
    // cosine: codes are not norm-invariant.
    val q = enc.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("code").as("q_code"),
        col("embedding").as("q_emb"))
    val wApprox = Window.partitionBy("q_id").orderBy(asc("dist"), col("vec_id"))
    val approx = enc.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dist", ScalarQuant.codeDist(col("q_code"), col("code")))
      .withColumn("rnk", row_number().over(wApprox))
      .filter(col("rnk") <= 10).select("q_id", "vec_id")
    val l2 = aggregate(zip_with(col("q_emb"), col("embedding"),
        (x, y) => (x.cast("double") - y.cast("double"))
          * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val wExact = Window.partitionBy("q_id").orderBy(asc("d2"), col("vec_id"))
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", l2)
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= 10).select("q_id", "vec_id")
    val hits = approx.intersect(exact).count()
    assert(hits >= 25L, s"SQ8 recall too low: $hits/50")
  }

  test("DSIR weights: pure-target docs score 1e6-ish, disjoint-vocab score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src0", "aa bb aa"), (2L, "src0", "bb aa"),
      (3L, "src9", "cc dd"), (4L, "src9", "dd cc cc"))
      .toDF("doc_id", "source", "text")
    val w = docs.withColumn("is_t",
        col("source").isin("src0").cast("long"))
      .select(col("doc_id"), col("is_t"),
        explode(split(col("text"), " ")).as("word"))
    val r = w.groupBy("word")
      .agg(count(lit(1)).as("c_all"), sum("is_t").as("c_t"))
      .select(col("word"), expr("(c_t * 1000000) div c_all").as("r_ppm"))
    val scored = w.join(broadcast(r), "word").groupBy("doc_id")
      .agg(expr("sum(r_ppm) div count(1)").as("dsir_ppm"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(scored(1L) === 1000000L && scored(2L) === 1000000L)
    assert(scored(3L) === 0L && scored(4L) === 0L)
  }

  test("IVF-PQ: coarse cell is the exact integer-L2 argmin; residual " +
      "codes reconstruct with less error than raw-codebook PQ") {
    import spark.implicits._
    import graft.expressions.GraftFunctions.{ivfpq_encode, pq_encode}
    val Dim = graft.ops.Pq.Dim; val M = graft.ops.Pq.M
    val K = graft.ops.Pq.K; val SD = graft.ops.Pq.SubDim
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(4, Dim)(rnd.nextFloat() * 2f - 1f)
    val vecs = (0 until 40).map { i =>
      val c = centers(i % 4)
      (i.toLong,
        (0 until Dim).map(j => c(j) + (rnd.nextFloat() - 0.5f) * 0.2f)
          .toArray)
    }
    val centsFlat =
      centers.flatten.map(f => math.floor(f.toDouble * 1e6).toLong)
    val cbFlat = (for (s0 <- 0 until M; c <- 0 until K; j <- 0 until SD)
      yield graft.ops.Pq.codeword(s0, c, j)).toArray
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        ivfpq_encode(col("embedding"), typedlit(centsFlat.toSeq),
          typedlit(cbFlat.toSeq)).as("enc"),
        pq_encode(col("embedding")).as("raw"))
      .collect()
    assert(got.length === 40)
    var resErr = 0L; var rawErr = 0L
    got.foreach { r =>
      val id = r.getLong(0)
      val enc = r.getSeq[Int](1); val raw = r.getSeq[Int](2)
      assert(enc.length === 1 + M && enc.forall(_ >= 0))
      val v = vecs(id.toInt)._2.map(f => math.floor(f.toDouble * 1e6).toLong)
      val dists = (0 until 4).map { c =>
        (0 until Dim).map { j =>
          val t = v(j) - centsFlat(c * Dim + j); t * t
        }.sum
      }
      assert(enc.head === dists.indexOf(dists.min),
        s"vec $id: kernel cell ${enc.head} vs argmin ${dists.indexOf(dists.min)}")
      val cell = enc.head
      for (s0 <- 0 until M; j <- 0 until SD) {
        val rres = v(s0 * SD + j) - centsFlat(cell * Dim + s0 * SD + j) -
          cbFlat((s0 * K + enc(1 + s0)) * SD + j)
        resErr += rres * rres
        val rraw =
          v(s0 * SD + j) - cbFlat((s0 * K + raw(s0)) * SD + j)
        rawErr += rraw * rraw
      }
    }
    assert(resErr < rawErr,
      s"residual reconstruction error $resErr !< raw-PQ $rawErr")
  }
}
