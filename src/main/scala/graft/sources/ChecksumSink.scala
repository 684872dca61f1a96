package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, MapType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 BatchWrite sink: per-task writers fold their rows
  * into a constant-size (count, order-independent checksum) state;
  * task commit messages carry ONLY that state to the driver, and the
  * job-level commit aggregates messages from COMMITTED attempts only
  * — the DSv2 commit protocol that makes speculative / retried tasks
  * exactly-once without any coordination among writers. This is the
  * write-side pattern for any non-file sink (KV store, message bus,
  * index service): idempotence comes from the commit protocol, not
  * from the target.
  *
  * `df.write.format("graft.sources.ChecksumSink")
  *    .option("name", "runA").mode("append").save()`
  * then `ChecksumSink.result("runA")` → (rowCount, checksum).
  *
  * The checksum is the 64-bit sum of each row's portable hash over a
  * '|'-joined field rendering — commutative, so it is identical for
  * any partitioning or write order (the property that lets a 1000-
  * executor write be verified without sorting anything).
  */
class ChecksumSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // accepts whatever schema the query writes
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ChecksumTable(schema, properties.getOrDefault("name", "default"))
}

object ChecksumSink {
  private val results =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  def result(name: String): Option[(Long, Long)] = Option(results.get(name))
  private[sources] def record(name: String, count: Long, sum: Long): Unit =
    results.put(name, (count, sum))

  /** Row checksum: portable hash of the length-prefixed field
    * rendering. Every embedded value is framed as `<len>:<content>`
    * and null as the prefix-free sentinel `N` — length prefixes make
    * the rendering injective up to real value differences (a '|' or
    * ',' INSIDE a string can't alias a field boundary, and "", [null]
    * and [""] all render distinctly — without the frames a
    * verification sink would silently pass exactly the differences it
    * exists to catch). Rendering is canonical per type — binary as
    * lowercase hex, arrays/structs recursively, map entries sorted —
    * because the JVM default `toString` on internal values
    * (Array[Byte], ArrayData, InternalRow) is an identity-hash string
    * that would change across runs.
    */
  private def framed(v: Any, dt: DataType, isNull: Boolean): String =
    if (isNull) "N" else { val s = render(v, dt); s"${s.length}:$s" }

  private[sources] def render(v: Any, dt: DataType): String = dt match {
    case BinaryType =>
      v.asInstanceOf[Array[Byte]].map("%02x".format(_)).mkString
    case ArrayType(et, _) =>
      val a = v.asInstanceOf[ArrayData]
      (0 until a.numElements()).map { i =>
        framed(if (a.isNullAt(i)) null else a.get(i, et), et, a.isNullAt(i))
      }.mkString("[", ",", "]")
    case st: StructType =>
      val r = v.asInstanceOf[InternalRow]
      st.fields.indices.map { i =>
        val ft = st.fields(i).dataType
        framed(if (r.isNullAt(i)) null else r.get(i, ft), ft, r.isNullAt(i))
      }.mkString("{", ",", "}")
    case MapType(kt, vt, _) =>
      val m = v.asInstanceOf[MapData]
      val ks = m.keyArray(); val vs = m.valueArray()
      // map iteration order is engine-internal: sort rendered entries
      (0 until m.numElements()).map { i =>
        framed(ks.get(i, kt), kt, isNull = false) + "->" +
          framed(if (vs.isNullAt(i)) null else vs.get(i, vt), vt,
            vs.isNullAt(i))
      }.sorted.mkString("{", ",", "}")
    case _ => v.toString // primitives/UTF8String/Decimal: value-based
  }

  private[sources] def rowHash(row: InternalRow, schema: StructType): Long = {
    val rendered = schema.fields.indices.map { i =>
      val ft = schema.fields(i).dataType
      framed(if (row.isNullAt(i)) null else row.get(i, ft), ft,
        row.isNullAt(i))
    }.mkString("|")
    graft.expressions.Kernels.portableHash60(UTF8String.fromString(rendered))
  }
}

private class ChecksumTable(schema0: StructType, name: String)
    extends Table with SupportsWrite {
  override def name(): String = s"checksum_sink($name)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ChecksumBatchWrite(name, info.schema())
      }
    }
}

private case class ChecksumCommit(count: Long, sum: Long)
    extends WriterCommitMessage

private class ChecksumBatchWrite(name: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ChecksumWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // only COMMITTED task attempts reach here — aborted/speculative
    // duplicates are excluded by the protocol
    var count = 0L; var sum = 0L
    messages.foreach {
      case ChecksumCommit(c, s) => count += c; sum += s
      case null => // a task that produced no commit message: skip
      case other => throw new IllegalStateException(
        s"checksum_sink($name): unexpected commit message $other")
    }
    ChecksumSink.record(name, count, sum)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class ChecksumWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var count = 0L
      private var sum = 0L
      override def write(row: InternalRow): Unit = {
        count += 1
        sum += ChecksumSink.rowHash(row, schema)
      }
      override def commit(): WriterCommitMessage =
        ChecksumCommit(count, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
