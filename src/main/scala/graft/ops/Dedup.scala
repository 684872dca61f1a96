package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operator family for training-data pipelines:
  * exact (hash-groupBy), bag-of-words canonical key, MinHash+LSH
  * (shingle → k-min signature → banded buckets → candidate pairs →
  * exact-Jaccard verify), SimHash, n-gram Jaccard.
  *
  * All hashes are the engine-portable md5-based 60-bit hash
  * ([[Text.portableHash]]) so a SQL oracle can reproduce every stage.
  *
  * 100 TB design: every stage is linear except candidate-pair
  * generation, which is confined to LSH band buckets (shuffle by
  * band hash, pairs only within a bucket). Signatures are one
  * map-side-combinable aggregation over the shingle explode; no
  * driver-side state anywhere.
  */
object Dedup {

  /** Exact-duplicate groups: normalize → md5 fingerprint → groupBy. */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), Text.fingerprint(col(text)).as("fp"))
      .groupBy("fp")
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Canonical bag-of-words key: md5 of the sorted distinct token set.
    * Catches docs that are permutations/repetitions of the same
    * vocabulary — a cheap linear near-dup pass.
    */
  def bagOfWordsKey(text: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(split(text, " ")))))

  /** Distinct word-level 1-shingles per document. */
  def wordShingles(df: DataFrame, id: String, text: String): DataFrame =
    Text.words(df, id, text).select(col(id), col("word").as("sh")).distinct()

  /** Distinct word n-gram shingles per document — built NARROW from
    * the token array (sequence + transform + element_at), no
    * positional self-join: zero shuffles before the final distinct.
    * (The join formulation shuffles the exploded words table n-1
    * times — 8x slower at 5k docs, catastrophically worse at scale.)
    */
  def ngramShingles(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    ngrams(df, id, text, n).distinct()

  /** Word n-grams WITH multiplicity (one row per occurrence) — the
    * input for repetition analysis, where how often the top n-gram
    * repeats is the signal ([[ngramShingles]] is this + distinct).
    */
  def ngrams(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val words = filter(split(col(text), " "), w => length(w) > 0)
    // Materialize the words array in its OWN projection before the
    // transform: the lambda body references it n times per shingle,
    // and inlined (single-projection) each element_at re-evaluated
    // the split — O(doc_len) per access, quadratic per doc. Stored as
    // an attribute it's split once per row (measured 7x on d05 sf0.1).
    val w = col("__w")
    // sequence(a, b) descends when b < a -> guard short docs explicitly
    val idx = when(size(w) >= n, sequence(lit(1), size(w) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    val shingles = transform(idx,
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))
    df.select(col(id), words.as("__w"))
      .select(col(id), explode(shingles).as("sh"))
  }

  /** MinHash signatures: k salted portable hashes, min per doc.
    * One aggregation over the shingle set (map-side partial min).
    */
  def minhashSignatures(shingles: DataFrame, id: String, k: Int): DataFrame =
    shingles.groupBy(col(id))
      .agg(min(Text.saltedHash(col("sh"), 0)).as("sig_0"),
        (1 until k).map(i =>
          min(Text.saltedHash(col("sh"), i)).as(s"sig_$i")): _*)

  /** LSH band keys: md5 over each band's r signature values.
    * Returns (id, band_id, band_hash) — shuffle-by-band_hash then
    * pair-within-bucket is the candidate generation.
    */
  def lshBands(sigs: DataFrame, id: String, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => col(s"sig_${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band_id"),
        md5(concat_ws("#", cols: _*)).as("band_hash"))
    }
    sigs.select(col(id), explode(array(bands: _*)).as("b"))
      .select(col(id), col("b.band_id"), col("b.band_hash"))
  }

  /** Candidate pairs from shared LSH buckets (distinct over bands). */
  def lshCandidates(bands: DataFrame, id: String): DataFrame =
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_1"), col(s"b.$id").as("id_2"))
      .distinct()

  /** Exact Jaccard over shingle sets, restricted to candidate pairs.
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|), all-integer inputs so the
    * double division is engine-deterministic.
    */
  /** `minJaccardPct` (0-100): exact size-bound prune — jaccard can
    * never exceed min(|A|,|B|)/max(|A|,|B|), so when the caller will
    * filter `jaccard >= p/100`, pairs failing `100*min >= p*max` are
    * eliminated BEFORE the expensive common-shingle join using only
    * the (cheap) size table. Integer arithmetic, no float compare —
    * a necessary condition, so the final row set is unchanged.
    */
  def jaccardVerify(candidates: DataFrame, shingles: DataFrame,
      id: String, minJaccardPct: Int = 0): DataFrame = {
    val sizes = shingles.groupBy(col(id)).agg(count(lit(1)).as("n"))
    val withSizes = candidates
      .join(sizes.as("za"), col("id_1") === col(s"za.$id"))
      .join(sizes.as("zb"), col("id_2") === col(s"zb.$id"))
      .select(col("id_1"), col("id_2"),
        col("za.n").as("na"), col("zb.n").as("nb"))
    val pruned =
      if (minJaccardPct <= 0) withSizes
      else withSizes.filter(
        least(col("na"), col("nb")) * 100 >=
          greatest(col("na"), col("nb")) * minJaccardPct)
    pruned
      .join(shingles.as("sa"), col("id_1") === col(s"sa.$id"))
      .join(shingles.as("sb"),
        col("id_2") === col(s"sb.$id") && col("sa.sh") === col("sb.sh"))
      .groupBy("id_1", "id_2", "na", "nb")
      .agg(count(lit(1)).as("n_common"))
      .select(col("id_1"), col("id_2"),
        (col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common"))).as("jaccard"))
  }

  /** Exact Jaccard for candidate pairs via per-doc shingle ARRAYS:
    * two set-table joins (one row per pair) and an `array_intersect`,
    * instead of exploding each pair into its shingle-match rows and
    * re-aggregating. Bit-identical jaccard to [[jaccardVerify]] (same
    * integer inputs); different cost shape: rows stay |pairs| and the
    * (pairs x shingles) shuffle disappears, but each pair pays an
    * O(|A|+|B|) intersection. Wins when docs are long and candidates
    * few; on d04's shape at sf0.1 (tiny docs, 364k candidate pairs —
    * the synthetic corpus is near-dup-heavy) the explode form
    * measured faster (2.1s vs 2.9s), so d04 keeps [[jaccardVerify]].
    */
  def jaccardVerifySets(candidates: DataFrame, shingles: DataFrame,
      id: String): DataFrame = {
    val sets = shingles.groupBy(col(id))
      .agg(collect_list(col("sh")).as("shs")) // already distinct per doc
    candidates
      .join(sets.as("za"), col("id_1") === col(s"za.$id"))
      .join(sets.as("zb"), col("id_2") === col(s"zb.$id"))
      .select(col("id_1"), col("id_2"),
        size(array_intersect(col("za.shs"), col("zb.shs"))).as("n_common"),
        size(col("za.shs")).as("na"), size(col("zb.shs")).as("nb"))
      .select(col("id_1"), col("id_2"),
        (col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common"))).as("jaccard"))
  }

  /** All-pairs Jaccard over shingle sets in ONE self-join: the
    * shingle-equality join directly yields common counts per pair
    * (group by pair), then sizes join in. Use when candidates ARE
    * "pairs sharing a shingle" — no separate verify pass needed.
    */
  def jaccardFromSelfJoin(shingles: DataFrame, id: String): DataFrame = {
    val sizes = shingles.groupBy(col(id)).agg(count(lit(1)).as("n"))
    val common = shingles.as("a")
      .join(shingles.as("b"),
        col("a.sh") === col("b.sh") && col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id_1"), col(s"b.$id").as("id_2"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.as("za"), col("id_1") === col(s"za.$id"))
      .join(sizes.as("zb"), col("id_2") === col(s"zb.$id"))
      .select(col("id_1"), col("id_2"),
        (col("n_common").cast("double") /
          (col("za.n") + col("zb.n") - col("n_common"))).as("jaccard"))
  }

  /** All-pairs asymmetric containment over shingle sets, same single
    * self-join shape as [[jaccardFromSelfJoin]]: c_1in2 = |A∩B|/|A|
    * detects doc 1 CONTAINED in doc 2 (quotation, boilerplate wrap,
    * partial scrape) even when symmetric Jaccard is low because the
    * container is much larger — the subset-dup case Jaccard misses.
    */
  def containmentFromSelfJoin(shingles: DataFrame, id: String): DataFrame = {
    val sizes = shingles.groupBy(col(id)).agg(count(lit(1)).as("n"))
    val common = shingles.as("a")
      .join(shingles.as("b"),
        col("a.sh") === col("b.sh") && col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id_1"), col(s"b.$id").as("id_2"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.as("za"), col("id_1") === col(s"za.$id"))
      .join(sizes.as("zb"), col("id_2") === col(s"zb.$id"))
      .select(col("id_1"), col("id_2"), col("n_common"),
        (col("n_common").cast("double") / col("za.n")).as("c_1in2"),
        (col("n_common").cast("double") / col("zb.n")).as("c_2in1"))
  }

  /** SimHash fingerprint (`bits`-wide) over token occurrences:
    * per bit j, sum +1/-1 by hash bit; fingerprint sets bit j where
    * the sum is positive.
    */
  def simhash(words: DataFrame, id: String, bits: Int): DataFrame = {
    val h = Text.portableHash(col("word"))
    val bitSums = (0 until bits).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b_$j")
    }
    words.groupBy(col(id))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(id),
        (0 until bits).map(j =>
          when(col(s"b_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }
}
