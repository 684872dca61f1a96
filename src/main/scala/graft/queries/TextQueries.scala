package graft.queries

import graft.Tables
import graft.ops.Text
import graft.ops.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text / NLP suite — SURVEY §2c (T1–T12) + training-data text
  * analysis (language ID, quality, token stats, fingerprints) on the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * The reference's text machinery (`bdb_tools/text.py`,
  * `q18_utils.py:110-141` multi-needle search, `q27_utils.py` NER,
  * q10's lexicon join) is re-expressed as explode/join/aggregate —
  * fully codegen'd, no UDFs. At 100 TB the explode output is the big
  * intermediate: everything aggregates immediately after the explode
  * (map-side partial agg) and lexicons/gazetteers are broadcast.
  */
object TextQueries extends Suite {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Sentiment lexicon (stand-in for the TPC kit's non-redistributable
    * negativeSentiment.txt/positiveSentiment.txt,
    * ref: queries/q10/gpu_bdb_query_10_dask_sql.py:94-104). */
  private val PosWords = Seq("fast", "big", "value")
  private val NegWords = Seq("slow", "small", "error")

  private val LexValues =
    (PosWords.map(w => s"('$w','POS')") ++ NegWords.map(w => s"('$w','NEG')"))
      .mkString(", ")

  val qs: Seq[Q] = Seq(

    // T1/T2: lowercase + literal replace chain
    // (ref: q10_dask_sql.py:55-60).
    Q("t01_normalize",
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          substring(regexp_replace(lower(col("text")), "spark", "SPARK"), 1, 60)
            .as("snippet"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  substr(replace(lower(text), 'spark', 'SPARK'), 1, 60) AS snippet
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // T3/T4: split -> explode -> filter empties -> corpus word counts
    // (ref: bdb_tools/text.py:46-69).
    Q("t03_word_counts",
      (s, d) => Text.words(docs(s, d), "doc_id", "text")
        .groupBy("word").agg(count(lit(1)).as("cnt"),
          countDistinct(col("doc_id")).as("df"))
        .orderBy(desc("cnt"), col("word")),
      Some("""SELECT w AS word, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS df
             |FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
             |WHERE len(w) > 0
             |GROUP BY w ORDER BY cnt DESC, word""".stripMargin)),

    // T4+: positional tokenization (posexplode), small slice.
    Q("t04_word_positions",
      (s, d) => Text.wordsWithPos(
          docs(s, d).filter(col("doc_id") < 20), "doc_id", "text")
        .select("doc_id", "pos", "word")
        .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id,
             |  generate_subscripts(string_split(text,' '),1) AS pos,
             |  unnest(string_split(text,' ')) AS word
             |FROM documents WHERE doc_id < 20
             |ORDER BY doc_id, pos""".stripMargin)),

    // T5: global ordinal ids (the reference's cumsum join keys,
    // ref: q10_dask_sql.py:69-71) + per-doc token counts.
    Q("t05_ordinal_id",
      (s, d) => docs(s, d)
        .withColumn("ord", row_number().over(Window.orderBy("doc_id")))
        .select(col("doc_id"), col("ord"),
          size(split(col("text"), " ")).as("n_words"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS ord,
             |  len(string_split(text,' ')) AS n_words
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // T6: sentiment-lexicon join (broadcast) + per-doc sentiment
    // (ref: q10_dask_sql.py:92-147).
    Q("t06_lexicon_sentiment", (s, d) => {
      import s.implicits._
      val lex = (PosWords.map((_, "POS")) ++ NegWords.map((_, "NEG")))
        .toDF("word", "tag")
      val base = docs(s, d)
      val counts = Text.words(base, "doc_id", "text")
        .join(broadcast(lex), "word")
        .groupBy("doc_id")
        .agg(sum(when(col("tag") === "POS", 1).otherwise(0)).as("np"),
          sum(when(col("tag") === "NEG", 1).otherwise(0)).as("nn"))
      base.select("doc_id")
        .join(counts, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("np"), lit(0L)).as("n_pos"),
          coalesce(col("nn"), lit(0L)).as("n_neg"))
        .withColumn("sentiment",
          when(col("n_pos") > col("n_neg"), "POS")
            .when(col("n_pos") < col("n_neg"), "NEG").otherwise("NEUT"))
        .orderBy("doc_id")
    },
      Some(s"""WITH lex(word, tag) AS (VALUES $LexValues),
              |w AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
              |m AS (SELECT doc_id,
              |    SUM(CASE WHEN tag = 'POS' THEN 1 ELSE 0 END) AS np,
              |    SUM(CASE WHEN tag = 'NEG' THEN 1 ELSE 0 END) AS nn
              |  FROM w JOIN lex USING (word) GROUP BY doc_id)
              |SELECT d.doc_id,
              |  CAST(COALESCE(np, 0) AS BIGINT) AS n_pos, CAST(COALESCE(nn, 0) AS BIGINT) AS n_neg,
              |  CASE WHEN COALESCE(np,0) > COALESCE(nn,0) THEN 'POS'
              |       WHEN COALESCE(np,0) < COALESCE(nn,0) THEN 'NEG'
              |       ELSE 'NEUT' END AS sentiment
              |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // T7: multi-needle substring search — docs mentioning each part
    // name (ref: bdb_tools/q18_utils.py:110-141 find_multiple; Spark
    // form: crossJoin vs broadcast needles + instr).
    Q("t07_multi_needle", (s, d) => {
      val needles = Text.words(
          t7needles(s, d).withColumn("gid", lit(0L)), "gid", "p_name")
        .select(col("word").as("needle")).distinct()
      docs(s, d).crossJoin(broadcast(needles))
        .filter(expr("instr(text, needle) > 0"))
        .groupBy("needle").agg(count(lit(1)).as("n_docs"))
        .orderBy("needle")
    },
      Some("""WITH needles AS (
             |  SELECT DISTINCT unnest(string_split(p_name,' ')) AS needle FROM part)
             |SELECT needle, COUNT(*) AS n_docs
             |FROM needles, documents
             |WHERE strpos(text, needle) > 0
             |GROUP BY needle ORDER BY needle""".stripMargin)),

    // T8/T9: string concat + substring containment
    // (ref: q18_dask_sql.py:60-61, q04_utils.py:71-74).
    Q("t08_concat_contains",
      (s, d) => docs(s, d)
        .withColumn("tag",
          concat_ws(":", col("source"), col("lang"), col("n_chars").cast("string")))
        .filter(expr("instr(text, 'join') > 0") &&
          !expr("instr(text, 'error') > 0"))
        .select("doc_id", "tag")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  source || ':' || lang || ':' || CAST(n_chars AS VARCHAR) AS tag
             |FROM documents
             |WHERE strpos(text, 'join') > 0 AND NOT strpos(text, 'error') > 0
             |ORDER BY doc_id""".stripMargin)),

    // T10: gazetteer "NER" — extract entity words (from part names)
    // appearing in each doc. The reference's NER is a pluggable
    // per-partition tagger (`bdb_tools/q27_utils.py:42-54`, results
    // explicitly unverified); the declarative gazetteer form keeps the
    // extraction inside codegen and IS verifiable.
    Q("t10_gazetteer_ner", (s, d) => {
      val gaz = Text.words(
          t7needles(s, d).withColumn("gid", lit(0L)), "gid", "p_name")
        .select(col("word").as("entity")).distinct()
      Text.words(docs(s, d), "doc_id", "text")
        .join(broadcast(gaz), col("word") === col("entity"))
        .select("doc_id", "entity").distinct()
        .orderBy("doc_id", "entity")
    },
      Some("""WITH gaz AS (
             |  SELECT DISTINCT unnest(string_split(p_name,' ')) AS entity FROM part),
             |w AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)
             |SELECT DISTINCT doc_id, entity FROM w JOIN gaz ON word = entity
             |ORDER BY doc_id, entity""".stripMargin)),

    // T12: date-string -> day number + calendar parts
    // (ref: bdb_tools/utils.py:943-954).
    Q("t12_date_parts",
      (s, d) => Tables.load(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("odate")).distinct()
        .withColumn("day_num", datediff(col("odate"), lit("1970-01-01")))
        .withColumn("yr", year(col("odate")))
        .withColumn("moy", month(col("odate")))
        .withColumn("dom", dayofmonth(col("odate")))
        .orderBy("odate"),
      Some("""SELECT DISTINCT CAST(o_orderdate AS DATE) AS odate,
             |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT) AS day_num,
             |  year(CAST(o_orderdate AS DATE)) AS yr,
             |  month(CAST(o_orderdate AS DATE)) AS moy,
             |  day(CAST(o_orderdate AS DATE)) AS dom
             |FROM orders ORDER BY odate""".stripMargin)),

    // Text analysis A1: language-ID heuristic (marker stopword counts,
    // argmax). One codegen'd pass over the corpus.
    Q("a01_lang_id", (s, d) => {
      val markers = Seq(
        "en" -> Seq("the", "a"), "de" -> Seq("der", "und"),
        "es" -> Seq("el", "y"), "fr" -> Seq("le", "et"))
      docs(s, d).select(col("doc_id"),
        Text.markerCount(col("text"), "the").as("n_the"),
        Text.markerCount(col("text"), "a").as("n_a"),
        Text.langId(col("text"), markers).as("pred_lang"))
        .orderBy("doc_id")
    },
      Some("""WITH c AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    len(list_filter(w, x -> x = 'the')) AS n_the,
             |    len(list_filter(w, x -> x = 'a')) AS n_a,
             |    len(list_filter(w, x -> x = 'der'))
             |      + len(list_filter(w, x -> x = 'und')) AS s_de,
             |    len(list_filter(w, x -> x = 'el'))
             |      + len(list_filter(w, x -> x = 'y')) AS s_es,
             |    len(list_filter(w, x -> x = 'le'))
             |      + len(list_filter(w, x -> x = 'et')) AS s_fr
             |  FROM c)
             |SELECT doc_id, n_the, n_a,
             |  CASE
             |    WHEN n_the + n_a >= greatest(n_the + n_a, s_de, s_es, s_fr)
             |         AND n_the + n_a > 0 THEN 'en'
             |    WHEN s_de >= greatest(s_de, s_es, s_fr) AND s_de > 0 THEN 'de'
             |    WHEN s_es >= greatest(s_es, s_fr) AND s_es > 0 THEN 'es'
             |    WHEN s_fr > 0 THEN 'fr'
             |    ELSE 'unknown' END AS pred_lang
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Text analysis A2: quality scoring — length/stopword features
    // (the training-data filtering pass).
    Q("a02_quality_score", (s, d) =>
      docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).as("n_words"),
        length(col("text")).as("n_chars_m"),
        Text.markerCount(col("text"), "the").as("n_stop"))
        .withColumn("avg_word_len",
          (col("n_chars_m") - (col("n_words") - 1)).cast("double") / col("n_words"))
        .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
        .withColumn("quality",
          when(col("n_words").between(30, 1000) && col("stop_ratio") < 0.2, "good")
            .otherwise("low"))
        .orderBy("doc_id"),
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    len(string_split(text,' ')) AS n_words,
             |    len(text) AS n_chars_m,
             |    len(list_filter(string_split(text,' '), x -> x = 'the')) AS n_stop
             |  FROM documents)
             |SELECT doc_id, n_words, n_chars_m, n_stop,
             |  CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
             |  CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
             |  CASE WHEN n_words BETWEEN 30 AND 1000
             |        AND CAST(n_stop AS DOUBLE) / n_words < 0.2
             |       THEN 'good' ELSE 'low' END AS quality
             |FROM f ORDER BY doc_id""".stripMargin)),

    // Text analysis A3: token counting — whitespace + regex ("BPE-ish")
    // tokenizers side by side.
    Q("a03_token_count", (s, d) =>
      docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+', 0))").as("n_re_tokens"),
        length(col("text")).as("n_chars_m"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(string_split(text,' ')) AS n_ws_tokens,
             |  len(regexp_extract_all(text, '[a-z]+')) AS n_re_tokens,
             |  len(text) AS n_chars_m
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Text analysis A4: document fingerprinting — md5 of normalized
    // text + a positional rolling hash over tokens (portable 60-bit
    // md5-based word hashes; see Text.portableHash).
    Q("a04_fingerprint", (s, d) => {
      val fp2 = Text.wordsWithPos(docs(s, d), "doc_id", "text")
        .withColumn("h", Text.portableHash(col("word")) % 1000000007L)
        .groupBy("doc_id")
        .agg(sum(col("pos") * col("h")).as("roll_hash"))
      docs(s, d)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp_md5"))
        .join(fp2, "doc_id")
        .orderBy("doc_id")
    },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    generate_subscripts(string_split(text,' '),1) AS pos,
             |    unnest(string_split(text,' ')) AS word
             |  FROM documents),
             |r AS (
             |  SELECT doc_id,
             |    CAST(SUM(pos * (CAST('0x' || substr(md5(word),1,15) AS BIGINT) % 1000000007)) AS BIGINT) AS roll_hash
             |  FROM w GROUP BY doc_id)
             |SELECT d.doc_id,
             |  md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp_md5,
             |  roll_hash
             |FROM documents d JOIN r ON d.doc_id = r.doc_id
             |ORDER BY d.doc_id""".stripMargin))
  )

  private def t7needles(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "part").select("p_name").distinct()
}
