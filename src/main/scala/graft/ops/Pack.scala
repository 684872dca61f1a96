package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining output: concatenate documents
  * into fixed-size context windows ("bins") so the trainer reads dense
  * token blocks instead of one padded sequence per document.
  *
  * The packing rule is the GPT-style concatenative one: documents are
  * laid end-to-end in a deterministic order and the token stream is
  * cut every `ctx` tokens — a document may straddle a bin boundary
  * (the trainer masks across the seam). That rule, unlike first-fit
  * bin packing, is a pure prefix-sum: bin(d) = floor(offset(d) / ctx)
  * where offset is the cumulative token count before d. Prefix sums
  * are engine-replayable (the DuckDB oracle runs the same window sum),
  * and deterministic on any partitioning.
  *
  * 100 TB design: a global prefix-sum would serialize on one ordered
  * partition, so the corpus is first split into `nShards` hash shards
  * (shard = portable hash of the id — deterministic, uniform) and the
  * prefix-sum runs per shard: one hash-partition shuffle, then each
  * shard packs independently — shards are the unit of parallelism AND
  * the unit of training-data files, so 100 TB packs as thousands of
  * independent window computations with no global barrier. This
  * mirrors how distributed tokenize-and-pack pipelines shard before
  * packing; the window-per-shard plan is one Exchange + one sort.
  */
object Pack {

  /** Adds `shard`, `n_tok`, `off` (token offset of the document inside
    * its shard's stream) and `bin` (context-window index) columns.
    * `tokExpr` must be an integer token count column.
    *
    * CONTRACT: `idCol` must be UNIQUE per row (globally unique ids —
    * what every caller's doc_id is — satisfy this). The per-shard
    * prefix sum orders by `idCol` alone, so rows sharing an id get an
    * engine/partitioning-dependent relative order and their `off`/
    * `bin` values swap between runs — silently breaking the file's
    * any-partitioning determinism guarantee and the oracle replay.
    * There is no generic in-operator repair: a tie-break over unknown
    * payload columns can't exist, and a uniqueness assertion would
    * cost a corpus-wide aggregate per call; dedup ids upstream.
    */
  def pack(df: DataFrame, idCol: String, tokCol: String,
      nShards: Int, ctx: Int, saltName: String = "pack"): DataFrame = {
    require(nShards > 0 && ctx > 0, s"bad pack params: $nShards/$ctx")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard",
        Split.saltedMod(col(idCol), saltName, nShards).cast("int"))
      .withColumn("off", sum(col(tokCol)).over(w) - col(tokCol))
      .withColumn("bin", call_function("div", col("off"), lit(ctx.toLong)))
  }
}
