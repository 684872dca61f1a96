package graft

import graft.bdb.Ner
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property equivalence behind the b58 direct gate: the q27 default
  * tagger ([[Ner.capitalizedSpans]], an imperative per-sentence scan)
  * equals the relational gaps-and-islands formulation the DuckDB
  * oracle uses — maximal runs of capitalized letter-tokens grouped by
  * `pos - row_number()` — here executed by Spark SQL on random
  * sentences, so the equivalence is checked over the whole ASCII
  * sentence domain, not just the committed fixture's six spans. (The
  * SQL islands logic is engine-portable: the same text functions the
  * DuckDB oracle uses; the domain is ASCII because the oracle's
  * `[a-zA-Z]`/`A..Z` tests are the ASCII projection of Scala's
  * Unicode isLetter/isUpper.)
  */
class NerSqlEquivSpec extends SparkSpec {

  /** The islands formulation, as one Spark SQL query over
    * (sid, sentence) rows: tokens split on \s+, letters-only filter,
    * capitalized-first-letter keep, islands by pos - rank, spans
    * re-joined in position order, distinct per sentence row. */
  private def sqlSpans(sentences: Seq[String]): Set[(Int, String)] = {
    import spark.implicits._
    val df = sentences.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("sid", "sentence")
    df.createOrReplaceTempView("ner_sentences")
    spark.sql(
      """WITH tok AS (
        |  SELECT sid, posexplode(split(sentence, '\\s+')) AS (pos, t)
        |  FROM ner_sentences),
        |w AS (
        |  SELECT sid, pos, regexp_replace(t, '[^a-zA-Z]', '') AS wl
        |  FROM tok),
        |kept AS (
        |  SELECT sid, pos, wl,
        |    pos - row_number() OVER (PARTITION BY sid ORDER BY pos) AS isl
        |  FROM w
        |  WHERE length(wl) > 0 AND substring(wl, 1, 1) RLIKE '[A-Z]'),
        |spans AS (
        |  SELECT sid,
        |    array_join(transform(array_sort(
        |      collect_list(struct(pos, wl))), x -> x.wl), ' ') AS span
        |  FROM kept GROUP BY sid, isl)
        |SELECT DISTINCT sid, span FROM spans""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
  }

  private val asciiToken: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      (6, Gen.alphaChar),
      (2, Gen.numChar),
      (1, Gen.oneOf('.', ',', '\'', '-', '!', '"'))))
  } yield cs.mkString

  private val sentenceGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ts <- Gen.listOfN(n, asciiToken)
    lead <- Gen.oneOf("", " ", "  ")
    sep <- Gen.oneOf(" ", "  ")
  } yield lead + ts.mkString(sep)

  test("capitalizedSpans == SQL gaps-and-islands on random ASCII sentences") {
    val p = Prop.forAll(Gen.listOfN(20, sentenceGen)) { sentences =>
      val imperative = sentences.zipWithIndex.flatMap { case (s, i) =>
        Ner.capitalizedSpans(s).map(span => (i, span))
      }.toSet
      val relational = sqlSpans(sentences)
      val ok = imperative == relational
      if (!ok) {
        val d1 = imperative -- relational
        val d2 = relational -- imperative
        println(s"MISMATCH only-imperative=$d1 only-sql=$d2")
      }
      ok
    }
    val r = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(30), p)
    assert(r.passed, s"ner-sql-equiv: $r")
  }

  test("fixture-shaped sentences produce the known spans") {
    val s = Seq("This product is good", " StoreOne sold it fast",
      " Service at store1 was terrible", " the store2 team was great")
    val expect = Set((0, "This"), (1, "StoreOne"), (2, "Service"))
    assert(sqlSpans(s) == expect)
    assert(s.zipWithIndex.flatMap { case (t, i) =>
      Ner.capitalizedSpans(t).map((i, _))
    }.toSet == expect)
  }
}
