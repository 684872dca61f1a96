package graft.tools

/** Offline trainer for the PRETRAINED NER model: reads the committed
  * CoNLL-style corpus (`src/main/resources/graft/ner/org_train.conll`,
  * `token<TAB>tag` lines, blank line between sentences, tags ORG/O),
  * trains the averaged perceptron ([[graft.bdb.PerceptronNer.train]] —
  * deterministic: fixed order, fixed epochs, no randomness), and
  * writes the frozen model to
  * `src/main/resources/graft/ner/org_weights.tsv` (feature<TAB>weight,
  * sorted by feature so the artifact is byte-stable across runs).
  *
  * This is the train-offline/load-frozen seam the reference fills
  * with spaCy's `en_core_web_sm` / a BERT checkpoint
  * (`bdb_tools/q27_utils.py:42-54`, `q27_bert_utils.py:28-60`): the
  * model artifact is committed, the runtime ([[graft.bdb
  * .PretrainedNer]]) only LOADS it — no training on the query path.
  *
  * Usage: `sbt "runMain graft.tools.TrainNer"` (then commit both
  * resource files together — the weights are a pure function of the
  * corpus).
  */
object TrainNer {

  def parseConll(lines: Iterator[String])
      : Seq[IndexedSeq[(String, Boolean)]] = {
    val sents = scala.collection.mutable.ListBuffer
      .empty[IndexedSeq[(String, Boolean)]]
    val cur = scala.collection.mutable.ListBuffer.empty[(String, Boolean)]
    lines.foreach { line =>
      val t = line.stripLineEnd
      if (t.isEmpty) {
        if (cur.nonEmpty) { sents += cur.toIndexedSeq; cur.clear() }
      } else t.split("\t") match {
        case Array(tok, tag) => cur += ((tok, tag == "ORG"))
        case other => sys.error(s"bad conll line: '$t' (${other.length} cols)")
      }
    }
    if (cur.nonEmpty) sents += cur.toIndexedSeq
    sents.toSeq
  }

  def main(args: Array[String]): Unit = {
    val res = "src/main/resources/graft/ner"
    val src = scala.io.Source.fromFile(s"$res/org_train.conll")
    val corpus = try parseConll(src.getLines()) finally src.close()
    println(s"[trainner] ${corpus.size} sentences, " +
      s"${corpus.map(_.size).sum} tokens")
    val w = graft.bdb.PerceptronNer.train(corpus)
    val out = new java.io.PrintWriter(s"$res/org_weights.tsv")
    try w.toSeq.sortBy(_._1).foreach { case (f, v) =>
      out.println(s"$f\t$v")
    } finally out.close()
    println(s"[trainner] wrote ${w.size} weights to $res/org_weights.tsv")
  }
}
