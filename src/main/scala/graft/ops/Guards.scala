package graft.ops

import org.apache.spark.sql.{DataFrame, Row}

/** Fail-fast bounds for driver-side collects of broadcast state.
  *
  * Several operators legitimately collect VOCABULARY-sized state to
  * the driver and broadcast it (the lexicon/centroid discipline):
  * t21's head-vocabulary id assignment, t26's per-word BPE symbol
  * counts. Those sets are Heaps-bounded (a df>=20 head vocabulary
  * grows sublinearly in corpus size) so they stay small at any
  * realistic scale — but "bounded by an empirical law" is not
  * "bounded by code". This guard makes the bound explicit: a
  * misconfigured df cut or a pathological corpus gets a one-line
  * diagnosis naming the documented scale path instead of a driver
  * OOM with a 100 TB stack trace.
  */
object Guards {

  /** Upper bound for vocabulary-sized broadcast collects: ~2M
    * entries ≈ 100-200 MB of broadcast map — the practical ceiling
    * before broadcast itself becomes the problem. */
  val MaxBroadcastVocab: Int = 1 << 21

  /** Collect `df` iff it has at most `bound` rows, else throw with a
    * message naming the operator and its scale path. Costs ONE
    * bounded action (`limit(bound+1)`): bound+1 rows back means the
    * bound is exceeded — no separate count job, and on an ordered
    * frame the rows come back in order (TakeOrdered), so a
    * within-bound result is the complete ordered set.
    */
  def boundedCollect(df: DataFrame, what: String, scalePath: String,
      bound: Int = MaxBroadcastVocab): Array[Row] = {
    require(bound < Int.MaxValue, s"$what: bound must leave probe headroom")
    val rows = df.limit(bound + 1).collect()
    if (rows.length > bound)
      throw new IllegalStateException(
        s"$what exceeds the $bound-entry driver-broadcast bound; " +
          s"scale path: $scalePath")
    rows
  }
}
