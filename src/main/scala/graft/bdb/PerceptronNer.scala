package graft.bdb

import scala.collection.mutable

/** Statistical NER: an averaged-perceptron token tagger for ORG spans
  * — the model-driven third extractor behind the q27 seam, standing in
  * for the reference's spaCy/BERT per-partition taggers
  * (`bdb_tools/q27_utils.py:42-54`, `q27_bert_utils.py:28-60`). The
  * construction is the classic averaged perceptron for sequence
  * tagging (Collins 2002, "Discriminative Training Methods for HMMs"),
  * reduced to per-token binary org/not-org with span grouping —
  * public-knowledge throughout.
  *
  * Unlike the rule taggers ([[Ner.capitalizedSpans]] /
  * [[Ner.gazetteerOrgs]]) nothing here hard-codes a decision rule: the
  * model LEARNS capitalization shape, corporate-suffix, and left-
  * context cues from the embedded training corpus, and generalizes to
  * org names never seen in training (the spec asserts this on held-out
  * names). Training is deterministic — fixed corpus order, fixed
  * epochs, no randomness — so tagging is reproducible across JVMs and
  * partitions; the model trains once per JVM (lazy val) and the
  * per-partition closure only reads the frozen weight map, mirroring
  * the reference's load-model-once-per-worker discipline
  * (`q27_utils.py:31-39`).
  */
object PerceptronNer {

  // ---- features ----------------------------------------------------
  // private[bdb]: shared with the pretrained extractor
  // ([[PretrainedNer]]) and its trainer — both must score the EXACT
  // feature set the weights were learned on.

  private[bdb] def shape(t: String): String =
    if (t.isEmpty) "EMPTY"
    else if (t.forall(_.isUpper)) "AA"
    else if (t.head.isUpper) "Aa"
    else if (t.forall(_.isDigit)) "00"
    else "aa"

  /** Letters-only view of a raw token (punctuation-insensitive, same
    * normalization as [[Ner.capitalizedSpans]]). */
  private[bdb] def clean(t: String): String = t.filter(_.isLetter)

  private[bdb] def features(toks: IndexedSeq[String], i: Int): Seq[String] = {
    val w = clean(toks(i))
    val lw = w.toLowerCase
    val sh = shape(w)
    val prev = if (i == 0) "<s>" else clean(toks(i - 1)).toLowerCase
    val prevSh = if (i == 0) "<s>" else shape(clean(toks(i - 1)))
    val next = if (i == toks.length - 1) "</s>" else clean(toks(i + 1)).toLowerCase
    val nextSh = if (i == toks.length - 1) "</s>" else shape(clean(toks(i + 1)))
    Seq(
      s"w=$lw", s"shape=$sh", s"suf3=${lw.takeRight(3)}",
      s"prev=$prev", s"prevShape=$prevSh",
      s"next=$next", s"nextShape=$nextSh",
      s"first=${i == 0}", s"shape|prev=$sh|$prev",
      s"shape|first=$sh|${i == 0}", "bias")
  }

  // ---- training corpus ---------------------------------------------

  /** Template corpus: org mentions in mid-sentence contexts vs
    * sentence-initial capitalized distractors. Tokens are (raw,
    * isOrg). The org inventory deliberately EXCLUDES the fixture's
    * names (StoreOne/StoreTwo/MegaMart/Acme Corp) so fixture tagging
    * is a generalization test, not recall of memorized words.
    */
  private def corpus: Seq[IndexedSeq[(String, Boolean)]] = {
    def s(parts: (String, Boolean)*): IndexedSeq[(String, Boolean)] =
      parts.flatMap { case (txt, org) =>
        txt.split(" ").filter(_.nonEmpty).map((_, org))
      }.toIndexedSeq
    val orgs = Seq("Globex Corp", "Initech LLC", "Umbrella Group",
      "Stark Labs", "Hooli Ltd", "Vandelay Inc", "WidgetMart",
      "Contoso Co", "NorthWind Inc", "SuperMart")
    val mids = orgs.flatMap { o =>
      Seq(
        s(("I bought this from", false), (o, true), ("last week", false)),
        s(("the service at", false), (o, true), ("was terrible", false)),
        s(("shipping from", false), (o, true), ("was fast and cheap", false)),
        s(("support by", false), (o, true), ("was excellent", false)),
        s((o, true), ("delivered it quickly", false)))
    }
    val negatives = Seq(
      s(("This product is good", false)),
      s(("Terrible quality really bad", false)),
      s(("Average item nothing special here", false)),
      s(("I love it", false)),
      s(("Never buying this again", false)),
      s(("The box arrived damaged", false)),
      s(("Great value for the price", false)),
      s(("It broke after two days", false)),
      s(("It was great overall", false)),
      s(("The delivery was slow", false)),
      s(("This was not worth it", false)),
      s(("Works exactly as described", false)),
      s(("My family liked the color", false)))
    mids ++ negatives
  }

  // ---- averaged perceptron -----------------------------------------

  private val Epochs = 8

  /** Deterministic averaged-perceptron training over a labeled corpus
    * (Collins 2002): fixed sentence order, fixed epochs, no
    * randomness — identical weights on every JVM. Shared with the
    * offline trainer behind the pretrained extractor
    * ([[graft.tools.TrainNer]]).
    */
  private[graft] def train(
      data: Seq[IndexedSeq[(String, Boolean)]],
      epochs: Int = Epochs): Map[String, Double] = {
    val w = mutable.Map.empty[String, Double].withDefaultValue(0.0)
    // averaging via accumulated-sum trick: acc holds the step-weighted
    // updates; averaged weight = w - acc/steps
    val acc = mutable.Map.empty[String, Double].withDefaultValue(0.0)
    var step = 1
    for (_ <- 1 to epochs; sent <- data) {
      val toks = sent.map(_._1)
      sent.indices.foreach { i =>
        val fs = features(toks, i)
        val score = fs.iterator.map(w).sum
        val predicted = score > 0
        val gold = sent(i)._2
        if (predicted != gold) {
          val delta = if (gold) 1.0 else -1.0
          fs.foreach { f =>
            w(f) += delta
            acc(f) += step * delta
          }
        }
        step += 1
      }
    }
    // divide by COMPLETED steps (step was initialized to 1 and
    // incremented once per token, so N = step - 1): Collins averaging
    // is avg = w - acc/N; the former /step was an off-by-one that
    // slightly over-weighted the final weight vector near the margin
    val n = math.max(step - 1, 1)
    w.map { case (f, v) => f -> (v - acc(f) / n) }
      .filter(_._2 != 0.0).toMap
  }

  /** Frozen averaged weights, trained once per JVM. */
  lazy val weights: Map[String, Double] = train(corpus)

  /** Decode with an arbitrary frozen weight map: score each token,
    * group consecutive positive tokens into spans. Shared by this
    * extractor and [[PretrainedNer]].
    */
  private[bdb] def spansWith(weights: Map[String, Double],
      sentence: String): Seq[String] = {
    val toks = sentence.split("\\s+").filter(_.nonEmpty).toIndexedSeq
    val pos = toks.indices.map { i =>
      features(toks, i).iterator.map(f => weights.getOrElse(f, 0.0)).sum > 0
    }
    val spans = mutable.ListBuffer.empty[String]
    val cur = mutable.ListBuffer.empty[String]
    toks.indices.foreach { i =>
      if (pos(i)) cur += clean(toks(i))
      else {
        if (cur.nonEmpty) spans += cur.mkString(" ")
        cur.clear()
      }
    }
    if (cur.nonEmpty) spans += cur.mkString(" ")
    spans.map(_.trim).filter(_.nonEmpty).distinct.toSeq
  }

  /** Tag one sentence with the in-JVM-trained model. Same signature
    * as the other extractors — plugs straight into
    * `q27(extractor = _)`.
    */
  def orgSpans(sentence: String): Seq[String] = spansWith(weights, sentence)
}
