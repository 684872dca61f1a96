package graft

import graft.ops.{Dedup, Text}
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizer never emits empty tokens") {
    val df = Seq((1L, "a  b   c"), (2L, " x "), (3L, "")).toDF("id", "text")
    val words = Text.words(df, "id", "text").select("word")
      .collect().map(_.getString(0))
    assert(words.forall(_.nonEmpty))
    assert(words.sorted.toSeq === Seq("a", "b", "c", "x"))
  }

  test("positional tokenizer: 1-based contiguous positions") {
    val df = Seq((1L, "p q r")).toDF("id", "text")
    val out = Text.wordsWithPos(df, "id", "text")
      .orderBy("pos").collect().map(r => (r.getAs[Int]("pos"), r.getAs[String]("word")))
    assert(out.toSeq === Seq((1, "p"), (2, "q"), (3, "r")))
  }

  test("portable hash matches the documented DuckDB formula") {
    // md5('abc') = 900150983cd24fb0...; first 15 hex digits as int:
    val got = Seq("abc").toDF("s")
      .select(Text.portableHash(col("s"))).first().getLong(0)
    assert(got === 648541476951500027L)
  }

  test("marker count via length trick") {
    val df = Seq((1L, "the cat the dog a mouse")).toDF("id", "text")
    val r = df.select(
      Text.markerCount(col("text"), "the").as("nthe"),
      Text.markerCount(col("text"), "a").as("na")).first()
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 1L)
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A  b C", "a b c")).toDF("x", "y")
    val r = df.select(
      (Text.fingerprint(col("x")) === Text.fingerprint(col("y"))).as("eq"))
      .first()
    assert(r.getBoolean(0))
  }

  test("ngram shingles: n=2 over 4 words -> 3 shingles") {
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    val sh = Dedup.ngramShingles(df, "id", "text", 2)
      .select("sh").collect().map(_.getString(0)).sorted
    assert(sh.toSeq === Seq("a b", "b c", "c d"))
  }

  test("BPE merge fold is greedy left-to-right on overlapping runs") {
    // the t25 merge-application lambda, pinned on the cases where
    // naive string replace diverges from reference BPE
    val cases = Seq(
      ("yyyy", "y", "y", Seq("yy", "yy")),   // runs merge left-first
      ("yyy", "y", "y", Seq("yy", "y")),
      ("aab", "a", "b", Seq("a", "ab")),     // merge after a non-match
      ("abab", "a", "b", Seq("ab", "ab")),   // every occurrence merges
      ("ba", "a", "b", Seq("b", "a")))       // order matters
    val df = cases.map(c => (c._1, c._2, c._3)).toDF("w", "mx", "my")
    val out = df.withColumn("m", expr(
      """aggregate(split(w, ''), CAST(array() AS array<string>),
        |  (acc, c) -> CASE WHEN size(acc) > 0
        |      AND element_at(acc, -1) = mx AND c = my
        |    THEN concat(slice(acc, 1, size(acc) - 1),
        |                array(concat(mx, my)))
        |    ELSE concat(acc, array(c)) END)""".stripMargin))
      .select("w", "m").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    cases.foreach { case (w, _, _, want) =>
      assert(out(w) === want, s"word $w")
    }
  }
}
