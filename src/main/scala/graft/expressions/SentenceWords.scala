package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sentence+word tokenizer as a custom Catalyst `Generator`
  * (SURVEY §2e — the reference tokenizes in two explode passes,
  * `bdb_tools/text.py:28-69`, materializing the full sentence table
  * before the word explode; this emits (sentence_idx, word_idx,
  * sentence, word) rows in a single traversal).
  *
  * Semantics (mirrored by the SQL oracle): sentences are the
  * '.'-split of the text with raw 1-based positions; words are the
  * ' '-split of the trimmed sentence with raw 1-based positions;
  * empty words / blank sentences are skipped but positions keep their
  * raw values.
  */
case class SentenceWords(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("sentence_idx", IntegerType, nullable = false),
    StructField("word_idx", IntegerType, nullable = false),
    StructField("sentence", StringType, nullable = false),
    StructField("word", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val text = v.asInstanceOf[UTF8String].toString
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      val sentences = text.split("\\.", -1)
      var si = 0
      while (si < sentences.length) {
        // SPACE-only trim: the oracle side is SQL trim(), which strips
        // ' ' alone — Java's String.trim strips every char <= U+0020
        // (tabs, newlines), which would silently diverge on any corpus
        // with non-space whitespace
        val sent = SentenceWords.spaceTrim(sentences(si))
        if (sent.nonEmpty) {
          val sentU = UTF8String.fromString(sent)
          val words = sent.split(" ", -1)
          var wi = 0
          while (wi < words.length) {
            if (words(wi).nonEmpty) {
              out += InternalRow(si + 1, wi + 1, sentU,
                UTF8String.fromString(words(wi)))
            }
            wi += 1
          }
        }
        si += 1
      }
      out
    }
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"sentence_words needs string, got ${child.dataType}")

  override protected def withNewChildInternal(c: Expression): SentenceWords =
    copy(child = c)
}

object SentenceWords {
  def sentence_words(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SentenceWords(org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)))

  /** Trim of ' ' only — SQL trim() semantics, NOT Java trim()'s
    * every-char-below-U+0021. */
  private[expressions] def spaceTrim(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }
}
