package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Text / NLP operator library — SURVEY §2c (T1–T12) plus the
  * text-analysis operators a large-scale training-data pipeline needs
  * (language ID, quality scoring, token counting, fingerprinting).
  *
  * Everything is built from codegen'd `functions._` expressions — no
  * UDFs — so the whole pipeline stays inside whole-stage codegen. The
  * reference implements these as cuDF string kernels + explode
  * (`gpu_bdb/bdb_tools/text.py:28-69`).
  */
object Text {

  /** Load a one-word-per-line lexicon file into a single-column
    * DataFrame — how the reference loads the TPC kit's sentiment word
    * lists at runtime (`queries/q10/gpu_bdb_query_10_dask_sql.py:94-104`,
    * `read_csv(names=["sentiment_word"])`). Works for any newline-
    * separated word list (sentiment lexicons, gazetteers, stopwords).
    */
  def lexiconFromCsv(s: SparkSession, path: String,
      colName: String = "sentiment_word"): DataFrame =
    s.read.schema(StructType(Seq(StructField(colName, StringType))))
      .csv(path)

  /** Two-file positive/negative sentiment lexicon labeled POS/NEG —
    * the shape q10/q18/q19 join against (positiveSentiment.txt /
    * negativeSentiment.txt in the reference kit).
    */
  def sentimentLexicon(s: SparkSession, positivePath: String,
      negativePath: String): DataFrame =
    lexiconFromCsv(s, positivePath).withColumn("sentiment", lit("POS"))
      .unionByName(
        lexiconFromCsv(s, negativePath).withColumn("sentiment", lit("NEG")))

  /** Driver-side word list from a lexicon file — for the multi-needle
    * scan paths (q18/q19) that compile the (small) list into a
    * codegen'd OR-of-instr predicate rather than a join.
    */
  def wordList(s: SparkSession, path: String): Seq[String] =
    lexiconFromCsv(s, path, "w").collect().toSeq
      .map(_.getString(0).trim).filter(_.nonEmpty)

  /** The one non-empty tokenization: split on single spaces, drop
    * empty tokens. Sites whose values must agree (a17/a23/x23 pack
    * offsets vs emission; quality-metric token counts) share THIS
    * definition — two hand-rolled copies drifting apart would
    * desynchronize offsets from emitted tokens while both stay
    * internally consistent, the failure no per-site test catches.
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** Tokenize: split on single spaces, explode, drop empty tokens
    * (ref: bdb_tools/text.py:46-69 — strip, split, explode, filter).
    */
  def words(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("word"))

  /** Tokenize keeping 1-based token positions (posexplode).
    * DELIBERATELY divergent numbering from `posexplode(tokens(...))`:
    * `pos` here counts RAW split slots (empties included, then
    * filtered) — the numbering the t04-family oracles replay via
    * unfiltered generate_subscripts. Don't "unify" it with the
    * filtered numbering without migrating those oracles. */
  def wordsWithPos(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos0", "word")))
      .filter(length(col("word")) > 0)
      .withColumn("pos", col("pos0") + 1).drop("pos0")

  /** 60-bit engine-portable hash: first 15 hex digits of md5, read as
    * an integer. Identical in any engine with md5 (DuckDB:
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`). Used as the
    * deterministic base hash for minhash/simhash/fingerprints instead
    * of Spark's murmur3 `hash()` (engine-specific). Dispatches to the
    * native codegen'd kernel ([[graft.expressions.PortableHash60]]),
    * which skips the md5-hex-string/conv detour of [[portableHashSql]].
    */
  def portableHash(c: Column): Column =
    graft.expressions.GraftFunctions.portable_hash60(c)

  /** Composed-builtins form (kept for equivalence testing). */
  def portableHashSql(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Salted variant — k independent hash functions for minhash. */
  def saltedHash(c: Column, salt: Int): Column =
    portableHash(concat(c, lit(s"|s$salt")))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text
    * (exact-dup detection key).
    */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), " +", " ")))

  /** PII scrubbing: replace emails / E.164-ish phone numbers / IPv4
    * addresses with typed placeholder tags. Patterns stick to
    * char-classes and counted quantifiers, which behave identically
    * in Java regex and RE2-family engines — no backrefs, no
    * lookaround — so the operator ports to any engine. The synthetic
    * corpus contains no PII, so the oracle gate injects deterministic
    * synthetic emails/phones/IPs per doc and requires the redacted
    * string to match DuckDB's RE2 replay exactly (a16_pii_redact);
    * TextOpsSpec covers crafted edge cases besides.
    */
  val RedactPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}" -> "<PHONE>",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "<IP>")

  def redact(text: Column,
      patterns: Seq[(String, String)] = RedactPatterns): Column =
    patterns.foldLeft(text) { case (c, (p, tag)) =>
      regexp_replace(c, p, tag)
    }

  /** Count of PII matches that [[redact]] would replace. Each pattern
    * is counted against the text AFTER the earlier patterns' redaction
    * (mirroring redact's sequential passes) — counting every pattern
    * on the original would double-count overlaps, e.g. an IP-shaped
    * substring inside an already-redacted email local part.
    */
  def redactionCount(text: Column,
      patterns: Seq[(String, String)] = RedactPatterns): Column =
    patterns.foldLeft((text, lit(0))) { case ((t, n), (p, tag)) =>
      (regexp_replace(t, p, tag),
        n + size(regexp_extract_all(t, lit(p), lit(0))))
    }._2

  /** Smoothed TF-IDF weight `tf * ln((N+1)/(df+1))`. The ratio is an
    * exact small-integer division (oracle-verified in `t18_tfidf`);
    * the `ln` itself is NOT oracle-gated — JVM `Math.log` and DuckDB
    * `ln` disagree in the last ulp on ~0.1% of inputs (measured on
    * 22k samples), so the log stays on the Scala side and is
    * property-tested instead (CurationSpec).
    */
  def tfIdfLog(tf: Column, nDocs: Column, df: Column): Column =
    tf * log((nDocs + 1).cast("double") / (df + 1).cast("double"))

  /** Count space-delimited occurrences of a literal one-word marker:
    * the number of tokens equal to it. Token-filter form, portable to
    * any SQL engine (`list_filter(string_split(...))` in DuckDB), no
    * regex semantics. The previous padded-replace length-difference
    * trick undercounted ADJACENT repeats ("the the the" -> 2, not 3)
    * because consecutive words share one delimiter space and replace
    * is non-overlapping — deflating stopword counts on exactly the
    * stopword-dense text quality scoring cares about.
    */
  def markerCount(text: Column, marker: String): Column =
    size(filter(split(text, " "), w => w === lit(marker))).cast("long")

  /** Language-ID heuristic: count per-language stopword markers and
    * take the argmax (ties → language order). On real multilingual
    * corpora the marker lists are per-language stopwords; structure is
    * what matters — one codegen'd pass, no UDF.
    */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val scores = markers.map { case (lang, ws) =>
      (lang, ws.map(markerCount(text, _)).reduce(_ + _))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
