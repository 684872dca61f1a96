package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 TableProvider: a deterministic synthetic event table
  * generated ON the executors — the pattern for any non-file source
  * (message bus, REST-paged API, internal KV store) in this engine.
  *
  * `spark.read.format("graft.sources.SyntheticSource")
  *   .option("rows", n).option("slices", p).load()`
  *
  * Row i derives every field from the 60-bit portable hash of "e|i"
  * ([[graft.expressions.Kernels.portableHash60]]), so the content is
  * reproducible in ANY engine with md5 — the DuckDB oracle replays it
  * from `generate_series` (query `o60_custom_source`).
  *
  * Scale properties:
  *  - generation is partition-local: `slices` InputPartitions, each
  *    producing its contiguous id range — no driver materialization,
  *    no shuffle; parallelism is a knob exactly like file splits;
  *  - column pruning is pushed into the reader
  *    (SupportsPushDownRequiredColumns): unprojected columns are
  *    never computed — the DSv2 contract that replaces the
  *    reference's hand-passed `relevant_cols`
  *    (`bdb_tools/readers.py:108-127`);
  *  - range predicates on the ordering column `id` push down
  *    (SupportsPushDownFilters) and NARROW THE GENERATED RANGE before
  *    partition planning — the custom-source analog of partition
  *    pruning: slices outside [lo, hi) are never scheduled. The
  *    filters are fully handled (exactly, not best-effort), so Spark
  *    plans no residual Filter for them;
  *  - LIMIT pushes down (SupportsPushDownLimit) and truncates the
  *    range — `df.limit(k)` generates k rows, not `rows`.
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.Full
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SyntheticTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt,
      properties.getOrDefault("clusterByUser", "false").toBoolean)
}

object SyntheticSource {
  val Full: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("amount_cents", LongType, nullable = false),
    StructField("category", StringType, nullable = false)))

  /** ONE definition of the user count: userOf, row, and the clustered
    * scan's KeyGroupedPartitioning must agree or a declared partition
    * key would never match any generated row. */
  private[sources] val Users = 100L

  /** Row hash — the single source of every derived column. */
  private[sources] def hashOf(i: Long): Long =
    graft.expressions.Kernels.portableHash60(
      UTF8String.fromString(s"e|$i"))

  /** user_id of row `i` (the clustered scan's partition key). */
  private[sources] def userOf(i: Long): Long = hashOf(i) % Users

  /** Field values of row `i` for the pruned schema; pass the row's
    * already-computed hash when the caller has one (the clustered
    * reader's per-emit filter) to avoid a second md5. */
  private[sources] def row(i: Long, schema: StructType,
      hash: Long = Long.MinValue): InternalRow = {
    lazy val h = if (hash != Long.MinValue) hash else hashOf(i)
    InternalRow.fromSeq(schema.fields.toSeq.map(_.name match {
      case "id" => i
      case "user_id" => h % Users
      case "amount_cents" => h % 10000
      case "category" => UTF8String.fromString("c" + (h % 7))
    }))
  }
}

private class SyntheticTable(rows: Long, slices: Int, clustered: Boolean)
    extends Table with SupportsRead {
  require(rows >= 0 && slices > 0)
  override def name(): String = s"synthetic($rows rows, $slices slices)"
  override def schema(): StructType = SyntheticSource.Full
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, slices, clustered)
}

private class SyntheticScanBuilder(rows: Long, slices: Int,
    clustered: Boolean)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit {
  private var required: StructType = SyntheticSource.Full
  private var lo = 0L        // inclusive id lower bound
  private var hi = rows      // exclusive id upper bound
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // id is the generation order, so range predicates on it narrow the
  // generated interval EXACTLY — accept those, reject the rest.
  private var accepted: Array[Filter] = Array.empty
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, rejected) = filters.partition {
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case GreaterThan("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case _ => false
    }
    accepted = acc
    acc.foreach {
      case GreaterThanOrEqual(_, v: java.lang.Long) => lo = lo max v
      case GreaterThan(_, v: java.lang.Long) =>
        // saturate: v+1 would wrap at Long.MaxValue into a full range
        lo = if (v < Long.MaxValue) lo max (v + 1) else hi
      case LessThan(_, v: java.lang.Long) => hi = hi min v
      case LessThanOrEqual(_, v: java.lang.Long) =>
        if (v < Long.MaxValue) hi = hi min (v + 1) // else: no-op bound
      case _ =>
    }
    rejected // residual filters Spark must still apply post-scan
  }
  // reported for EXPLAIN; the accepted range bounds are exact, so no
  // residual re-evaluation is needed for them
  override def pushedFilters(): Array[Filter] = accepted

  override def pushLimit(limit: Int): Boolean = {
    hi = hi min (lo + limit)
    true // fully applied
  }

  override def build(): Scan =
    if (clustered) new SyntheticClusteredScan(lo, hi max lo, required)
    else new SyntheticScan(lo, hi max lo, slices, required)
}

private case class SyntheticSlice(start: Long, end: Long)
    extends InputPartition

private class SyntheticScan(lo: Long, hi: Long, slices: Int,
    schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"SyntheticScan range=[$lo, $hi) slices=$slices"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    (0 until slices).map { s =>
      SyntheticSlice(lo + n * s / slices, lo + n * (s + 1) / slices)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(schema)
}

private class SyntheticReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val slice = p.asInstanceOf[SyntheticSlice]
    new PartitionReader[InternalRow] {
      private var i = slice.start - 1
      override def next(): Boolean = { i += 1; i < slice.end }
      override def get(): InternalRow = SyntheticSource.row(i, schema)
      override def close(): Unit = ()
    }
  }
}

/** One InputPartition per distinct user_id, declaring its key
  * ([[HasPartitionKey]]) — models a backend whose data is physically
  * clustered by user (a KV store's hash ranges, a bucketed table).
  */
private case class SyntheticUserSlice(user: Long, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(user)
}

/** Clustered-by-user scan: reports [[KeyGroupedPartitioning]] on
  * `user_id`, one partition per user value, each partition declaring
  * its key — the DSv2 storage-partitioning contract. With
  * `spark.sql.sources.v2.bucketing.enabled`, Spark then ELIDES the
  * exchange for aggregations/joins keyed on user_id: the shuffle the
  * reference pays on every per-user query disappears because the
  * source already delivers user-complete partitions. The synthetic
  * stand-in generates each user's rows by scanning its id range and
  * filtering (|users| x range work — a real clustered backend reads
  * only its bucket; the PLAN is the point here, and it is asserted
  * in SourcesSpec).
  */
private class SyntheticClusteredScan(lo: Long, hi: Long,
    schema: StructType) extends Scan with Batch
    with SupportsReportPartitioning {
  private val Users = SyntheticSource.Users // one shared definition
  override def readSchema(): StructType = schema
  override def description(): String =
    s"SyntheticClusteredScan range=[$lo, $hi) users=$Users"
  override def toBatch: Batch = this
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity("user_id")), Users.toInt)
  override def planInputPartitions(): Array[InputPartition] =
    (0L until Users).map(u => SyntheticUserSlice(u, lo, hi)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticClusteredReaderFactory(schema, Users)
}

private class SyntheticClusteredReaderFactory(schema: StructType,
    users: Long) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val slice = p.asInstanceOf[SyntheticUserSlice]
    new PartitionReader[InternalRow] {
      private var i = slice.lo - 1
      private var h = 0L
      override def next(): Boolean = {
        i += 1
        // keep the accepted row's hash: row() derives every column
        // from it, so recomputing the md5 in get() would double the
        // per-emit hash cost of a scan that is already |users| x range
        h = if (i < slice.hi) SyntheticSource.hashOf(i) else 0L
        while (i < slice.hi && h % SyntheticSource.Users != slice.user) {
          i += 1
          if (i < slice.hi) h = SyntheticSource.hashOf(i)
        }
        i < slice.hi
      }
      override def get(): InternalRow = SyntheticSource.row(i, schema, h)
      override def close(): Unit = ()
    }
  }
}
