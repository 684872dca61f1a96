package graft.bdb

/** The PRETRAINED NER extractor (#4 behind the q27 seam): loads a
  * frozen averaged-perceptron model from the committed classpath
  * resource `/graft/ner/org_weights.tsv` and only ever reads it —
  * zero training on the query path. This is the exact seam shape the
  * reference fills with spaCy `en_core_web_sm` / a BERT checkpoint
  * (`bdb_tools/q27_utils.py:42-54`, `q27_bert_utils.py:28-60`):
  * model artifact produced OFFLINE ([[graft.tools.TrainNer]] over the
  * committed CoNLL-style corpus `/graft/ner/org_train.conll`), loaded
  * once per JVM, shared read-only by every partition closure
  * (`q27_utils.py:31-39`'s load-model-once-per-worker discipline).
  *
  * Features and span decoding are [[PerceptronNer]]'s — a weight file
  * is only meaningful against the feature extractor it was trained
  * with, so both extractors share one implementation and differ ONLY
  * in where the weights come from (in-JVM training vs the committed
  * artifact).
  */
object PretrainedNer {

  /** Frozen weights, loaded once per JVM from the classpath. */
  lazy val weights: Map[String, Double] = {
    val in = getClass.getResourceAsStream("/graft/ner/org_weights.tsv")
    require(in != null,
      "missing /graft/ner/org_weights.tsv on the classpath — run " +
        "`sbt \"runMain graft.tools.TrainNer\"` and rebuild")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val i = line.lastIndexOf('\t')
      line.substring(0, i) -> line.substring(i + 1).toDouble
    }.toMap
    finally src.close()
  }

  /** Tag one sentence with the frozen pretrained model. Same
    * signature as the other extractors — plugs into
    * `q27(extractor = _)`.
    */
  def orgSpans(sentence: String): Seq[String] =
    PerceptronNer.spansWith(weights, sentence)
}
