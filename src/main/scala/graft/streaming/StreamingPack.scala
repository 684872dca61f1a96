package graft.streaming

import graft.ops.Text
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the incremental form of
  * [[graft.ops.Pack.pack]]: a continuously-ingesting pretraining
  * writer assigns every arriving document its token offset and
  * context-window index WITHOUT re-packing what's already written.
  *
  * State per shard is ONE long (the next free token offset) — bounded
  * by the shard count forever, the cheapest state shape a stateful
  * operator can have. Each micro-batch folds its documents (sorted by
  * doc id — the shard's append order) onto the carried offset and
  * emits final placements; offsets never change once emitted, so the
  * output is append-only by construction.
  *
  * Batch-slicing invariance: a document's placement depends only on
  * the total token count of the documents before it in its shard, so
  * any batch slicing that preserves per-shard arrival order yields
  * the identical packing as the one-shot batch operator — asserted
  * against [[graft.ops.Pack.pack]] in StreamingSpec. The fold
  * ENFORCES that contract rather than trusting the caller's file
  * layout: state carries the highest doc id already placed per shard,
  * and an arrival at or below it (a later micro-batch delivering an
  * earlier document — e.g. maxFilesPerTrigger over files whose
  * modification-time order disagrees with doc order) fails the query
  * instead of silently emitting a packing that diverges from the
  * batch operator.
  */
object StreamingPack {

  case class Doc(doc_id: Long, shard: Int, n_tok: Long)
  case class ShardState(nextOff: Long, maxDocId: Long)
  case class Placed(doc_id: Long, shard: Int, n_tok: Long,
      off: Long, bin: Long)

  def fold(ctx: Long)(shard: Int, docs: Iterator[Doc],
      state: GroupState[ShardState]): Iterator[Placed] = {
    val sorted = docs.toSeq.sortBy(_.doc_id)
    val st = state.getOption.getOrElse(ShardState(0L, Long.MinValue))
    sorted.headOption.filter(_.doc_id <= st.maxDocId).foreach { d =>
      throw new IllegalStateException(
        s"StreamingPack shard $shard: doc ${d.doc_id} arrived after " +
          s"doc ${st.maxDocId} was already placed — the source is not " +
          "delivering per-shard doc_id order; its packing would " +
          "diverge from the batch operator")
    }
    // same contract WITHIN the batch: a duplicate doc_id (source
    // re-delivery) would be placed twice, shifting every later offset
    // in the shard versus the batch operator — silently, since the
    // head check above only compares across batches
    var di = 1
    while (di < sorted.length) {
      if (sorted(di).doc_id == sorted(di - 1).doc_id)
        throw new IllegalStateException(
          s"StreamingPack shard $shard: doc ${sorted(di).doc_id} " +
            "delivered twice in one micro-batch — a duplicate " +
            "placement would diverge from the batch operator")
      di += 1
    }
    var off = st.nextOff
    val out = sorted.map { d =>
      val o = off
      off += d.n_tok
      Placed(d.doc_id, shard, d.n_tok, o, o / ctx)
    }
    state.update(ShardState(off,
      sorted.lastOption.map(_.doc_id).getOrElse(st.maxDocId)))
    out.iterator
  }

  /** The x23 query surface: pack the (static) documents parquet as a
    * stream, 8 hash shards, ctx=256 — same parameters and result as
    * the batch `a17_sequence_pack`.
    */
  def pack(spark: SparkSession, sfDir: String,
      nShards: Int = 8, ctx: Int = 256): DataFrame = {
    import spark.implicits._
    val stream = graft.Tables.loadStream(spark, sfDir, "documents")
    val docs: Dataset[Doc] = stream.select(
        col("doc_id"),
        // the SAME shard key and non-empty tokenization as the batch
        // packer, by shared definition (Split.saltedMod / Text.tokens)
        // — hand-rolled copies here could drift and silently diverge
        // the streaming packing from a17/a23
        graft.ops.Split.saltedMod(col("doc_id"), "pack", nShards)
          .cast("int").as("shard"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .as[Doc]
    val placed = docs.groupByKey(_.shard)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fold(ctx.toLong))
    StreamConf.runToTable(spark, placed.toDF(),
        "graft_stream_pack", "append")
      .select("doc_id", "shard", "n_tok", "off", "bin")
      .orderBy("doc_id")
  }
}
