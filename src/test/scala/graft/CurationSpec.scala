package graft

import graft.ops.{Bloom, BloomAgg, Cms, CmsAgg, Split, Text}
import org.apache.spark.sql.functions._

/** Sketch + splitting operators: the properties the oracles can't
  * express — CMS overestimate bound, bloom no-false-negatives and
  * actual pruning, split determinism under repartitioning, and the
  * ln-based TF-IDF weighting (kept off the oracle: libm ulp drift).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("CmsAgg: estimate >= exact, within 2n/w, partitioning-invariant") {
    val D = 3; val W = 256
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_suppkey").cast("string").as("k"))
    val cms = udaf(new CmsAgg(D, W))
    def counters(parts: Int) =
      li.repartition(parts).agg(cms(col("k")).as("cs"))
        .head.getSeq[Long](0)
    val c1 = counters(1)
    assert(c1 === counters(13), "sketch must not depend on partitioning")
    val n = li.count()
    val est = li.distinct()
      .crossJoin(broadcast(li.agg(cms(col("k")).as("cs"))))
      .withColumn("est", Cms.estimate(col("cs"), col("k"), D, W))
      .join(li.groupBy("k").agg(count(lit(1)).as("exact")), "k")
      .select("est", "exact").collect()
    est.foreach { r =>
      val (e, x) = (r.getLong(0), r.getLong(1))
      assert(e >= x, s"CMS must overestimate: $e < $x")
      assert(e - x <= 2 * n / W, s"error bound blown: $e vs $x (n=$n)")
    }
  }

  test("BloomAgg: no false negatives; prefilter join == plain join") {
    val li = Tables.load(spark, sf, "lineitem")
    val sel = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_orderpriority")
    val bits = 1 << 16; val k = 4
    val bs = Bloom.buildBits(sel, col("o_orderkey"), bits, k)
    // every true member passes
    val misses = sel.filter(
      !Bloom.mightContain(bs, col("o_orderkey"), bits, k)).count()
    assert(misses === 0L, "bloom dropped a true member")
    // the prefilter actually prunes (selective key set)
    val kept = li.filter(
      Bloom.mightContain(bs, col("l_orderkey"), bits, k)).count()
    assert(kept < li.count() / 2,
      s"prefilter kept $kept of ${li.count()} — not pruning")
    // end-to-end result identical to the plain join
    val viaBloom = Bloom.prefilterJoin(li, sel,
        col("l_orderkey"), col("o_orderkey"), bits, k)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = li.join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaBloom === plain)
  }

  test("prefilterJoin: mixed int/bigint key types lose no join rows") {
    import spark.implicits._
    // int-typed probe keys vs long-typed build keys: xxhash64 hashes
    // the two types differently, so without hash-type normalization
    // build/probe bit positions diverge -> silent false negatives
    val big = (1 to 2000).map(i => (i, s"r$i")).toDF("k", "payload")
    val small = Seq(5L, 700L, 1999L).toDF("sk")
    val got = Bloom.prefilterJoin(big, small, col("k"), col("sk"),
        bits = 1 << 12, k = 4)
      .select("k").collect().map(_.getInt(0)).toSet
    assert(got === Set(5, 700, 1999), s"rows dropped or added: $got")
  }

  test("bloom bitset merge is partitioning-invariant") {
    val keys = Tables.load(spark, sf, "orders").select(
      col("o_orderkey").cast("string").as("k"))
    val agg = udaf(new BloomAgg(1 << 14))
    def bits(parts: Int) = keys.repartition(parts)
      .agg(agg(Bloom.positions(col("k"), 1 << 14, 4)).as("bs"))
      .head.getSeq[Long](0)
    assert(bits(1) === bits(17))
  }

  test("leakage-safe split: word-multiset duplicates always co-assign") {
    import spark.implicits._
    // same bag of words under reordering/repetition-preserving
    // permutations -> same BoW key -> same split, for any salt
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma alpha beta"),
      (3L, "beta gamma alpha"), (4L, "delta alpha")).toDF("doc_id", "text")
    val keyed = docs.select(col("doc_id"),
      graft.ops.Dedup.bagOfWordsKey(col("text")).as("k"))
    val s = Split.assign(keyed, "k", Seq("train" -> 5000, "test" -> 5000),
        saltName = "lsplit")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s(1L) === s(2L) && s(2L) === s(3L),
      "reordered duplicates must share a split")
  }

  test("Split.assign: fractions ~honored, deterministic, exhaustive") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Split.assign(docs, "doc_id",
      Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
    val byS = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(byS.keySet === Set("train", "val", "test"))
    assert(byS("train") / n > 0.7 && byS("train") / n < 0.9)
    // determinism: same assignment regardless of partitioning
    val a1 = a.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = Split.assign(docs.repartition(11), "doc_id",
        Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1 === a2)
    intercept[IllegalArgumentException] {
      Split.assign(docs, "doc_id", Seq("a" -> 9000, "b" -> 2000))
    }
    // fractions below 10000 need an explicit rest label (silent NULL
    // splits would vanish from split-equality filters)...
    intercept[IllegalArgumentException] {
      Split.assign(docs, "doc_id", Seq("a" -> 8000, "b" -> 1000))
    }
    // ...and with one, the remainder is labeled, nothing is NULL
    val withRest = Split.assign(docs, "doc_id",
      Seq("train" -> 8000), rest = Some("holdout"))
    assert(withRest.filter(col("split").isNull).count() === 0L)
    assert(withRest.filter(col("split") === "holdout").count() > 0L)
  }

  test("balanceStrata: strata sizes converge to the rarest, deterministic") {
    val docs = Tables.load(spark, sf, "documents")
    val byLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = byLang.values.min
    val balanced = Split.balanceStrata(docs, "doc_id", "lang")
    val outLang = balanced.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outLang.keySet === byLang.keySet)
    outLang.foreach { case (l, n) =>
      // hash-threshold sampling has binomial variance around the
      // target; all strata must land near minN, none above 1.5x
      assert(n <= minN * 3 / 2 && n >= minN / 2,
        s"lang $l: $n not near target $minN")
    }
    // deterministic under repartitioning
    val ids1 = balanced.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Split.balanceStrata(docs.repartition(13), "doc_id", "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("balanceStrata: NULL is a real stratum — kept, not dropped") {
    // pre-fix, the NULL group set the global min (downsampling every
    // real stratum) while the plain equi-join dropped its own rows
    val df = Seq.tabulate(40)(i => (i.toLong, if (i < 36) "en" else null))
      .toDF("doc_id", "lang")
    val out = Split.balanceStrata(df, "doc_id", "lang")
    val nullKept = out.filter(col("lang").isNull).count()
    assert(nullKept === 4L,
      s"all 4 NULL-stratum rows must survive (threshold 10000), got $nullKept")
    val enKept = out.filter(col("lang") === "en").count()
    assert(enKept > 0L && enKept < 36L,
      s"en must downsample toward the 4-row floor, got $enKept")
  }

  test("Split.assign rejects non-positive fractions") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Split.assign(df, "doc_id",
        Seq("a" -> 5000, "b" -> -100, "c" -> 5100))
    }
  }

  test("corpus invariant: single-spaced text (oracle empty-token parity)") {
    // Every text oracle splits on ' ' WITHOUT an empty-token guard in
    // some CTEs, while the Spark side always filters empties. That
    // parity is safe only while the corpus has no consecutive /
    // leading / trailing spaces — assert the precondition so a future
    // data change fails HERE, not as an oracle hash mismatch.
    val bad = Tables.load(spark, sf, "documents")
      .filter(col("text").contains("  ") ||
        col("text").startsWith(" ") || col("text").endsWith(" "))
      .count()
    assert(bad === 0L, s"$bad docs violate single-spacing")
  }

  test("Split: fold and sample salts are independent of split salt") {
    val docs = Tables.load(spark, sf, "documents")
    // if salts collided, every test-split doc would land in one fold
    val folds = Split.assign(docs, "doc_id", Seq("train" -> 5000, "test" -> 5000))
      .withColumn("fold", Split.fold(col("doc_id"), 5))
      .groupBy("split", "fold").count()
    assert(folds.count() === 10L, "every (split, fold) cell populated")
  }

  test("redact: emails, phones, IPs replaced; counts match; clean text unchanged") {
    val df = Seq(
      "contact bob@example.com or +1-555-123-4567 from 10.0.0.1",
      "no pii here at all",
      "two mails: a@b.co and c.d@e-f.org").toDF("text")
      .withColumn("red", Text.redact(col("text")))
      .withColumn("n", Text.redactionCount(col("text")))
    val rows = df.collect()
    assert(rows(0).getString(1) ===
      "contact <EMAIL> or <PHONE> from <IP>")
    assert(rows(0).getInt(2) === 3)
    assert(rows(1).getString(1) === "no pii here at all")
    assert(rows(1).getInt(2) === 0)
    assert(rows(2).getString(1) === "two mails: <EMAIL> and <EMAIL>")
    assert(rows(2).getInt(2) === 2)
    // overlap: the IP-shaped substring inside the email local part is
    // consumed by the email pass — count must agree with redact (1)
    val overlap = Seq("mail a1.2.3.4@x.com now").toDF("text")
      .select(Text.redact(col("text")).as("red"),
        Text.redactionCount(col("text")).as("n")).head
    assert(overlap.getString(0) === "mail <EMAIL> now")
    assert(overlap.getInt(1) === 1)
  }

  test("repetition filter: degenerate doc rejected, diverse doc kept") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog")).toDF("doc_id", "text")
    val tok = Text.words(df, "doc_id", "text").groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("word").as("n_distinct"))
    val gs = graft.ops.Dedup.ngrams(df, "doc_id", "text", 2)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top2"), sum("c").as("n2"))
    val kept = tok.join(gs, "doc_id")
      .filter(col("n_distinct").cast("double") / col("n_tokens") >= 0.4 &&
        col("top2").cast("double") / col("n2") <= 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L))
  }

  test("tfIdfLog: tf * ln(ratio), zero for ubiquitous terms, monotone in df") {
    val df = Seq((10L, 100L, 1L), (10L, 100L, 9L), (10L, 100L, 100L))
      .toDF("tf", "n", "df")
      .withColumn("w", Text.tfIdfLog(col("tf"), col("n"), col("df")))
    val ws = df.select("w").collect().map(_.getDouble(0))
    assert(ws(0) > ws(1) && ws(1) > ws(2), "idf must fall as df rises")
    assert(math.abs(ws(2)) < 1e-12, "df == N (in every doc) → ln(1) == 0")
    assert(math.abs(ws(0) - 10.0 * math.log(101.0 / 2.0)) < 1e-12)
  }

  test("a24 manifest: allocations fit the half-total budget (and fill " +
    "most of it), rates capped at 1e6 ppm") {
    val rows = SparkEntry.queries("a24_full_curation")(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = rows.map(_.getAs[Long]("tokens_kept"))
    val alloc = rows.map(_.getAs[Long]("alloc_tokens"))
    assert(toks.forall(_ > 0))
    val budget = toks.sum / 2
    assert(alloc.sum <= budget, "over-allocated the token budget")
    assert(alloc.sum > (budget * 8) / 10,
      "integer floors should not eat more than ~20% of the budget")
    rows.foreach { r =>
      val rp = r.getAs[Long]("rate_ppm")
      assert(rp >= 0 && rp <= 1000000L, s"rate out of range: $rp")
      assert(r.getAs[Long]("docs_kept") > 0)
    }
  }
}
