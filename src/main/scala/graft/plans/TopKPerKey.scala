package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension demo (SURVEY §2e path (c)): top-k rows
  * per key as a first-class operator — logical node + planner
  * Strategy + physical exec with a bounded per-group buffer.
  *
  * Why it beats the built-in formulation: `row_number().over(...)
  * .filter(rn <= k)` must SORT every partition's full group before
  * discarding all but k rows; this exec keeps only k rows per group
  * at any moment (O(n log k), no full sort, no rank column
  * materialized). Same single hash exchange on the key.
  *
  * Memory contract: the exec holds k rows per DISTINCT key of a
  * partition on heap (no spill) — total k x nKeys. Right-sized for
  * selective keys (customers, queries); for near-unique keys prefer
  * the window form, whose sort spills to disk.
  *
  * Registered via `spark.experimental.extraStrategies` (see
  * [[TopK.install]]) — the stable public hook for planner strategies.
  */
case class TopKPerKeyNode(k: Int, partitionExprs: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

case class TopKPerKeyExec(k: Int, partitionExprs: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  // mapPartitions preserves the child's partitioning; without this
  // override Spark sees UnknownPartitioning and re-shuffles any
  // downstream operator keyed on the same columns
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partitionExprs, schema)
      val ordering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(order, schema)
      // per-key bounded sorted buffers (k is small by contract)
      val groups = new java.util.HashMap[InternalRow,
        scala.collection.mutable.ArrayBuffer[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var buf = groups.get(key)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[InternalRow](k + 1)
          groups.put(key.copy(), buf)
        }
        if (buf.length < k || ordering.compare(row, buf.last) < 0) {
          val copied = row.copy()
          // insertion sort into the bounded buffer
          var i = buf.length
          buf += copied
          while (i > 0 && ordering.compare(copied, buf(i - 1)) < 0) {
            buf(i) = buf(i - 1); i -= 1
          }
          buf(i) = copied
          if (buf.length > k) buf.remove(k)
        }
      }
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, parts, order, child) =>
      TopKPerKeyExec(k, parts, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per key, ordered by `order` (use Column.desc/asc —
    * include a unique tiebreak for determinism).
    */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // empty keys dies later in an opaque ClusteredDistribution
    // assertion; an empty order would make every comparison a tie and
    // silently return k ARBITRARY rows per key
    require(keys.nonEmpty, "TopK.perKey: keys must be non-empty")
    require(order.nonEmpty, "TopK.perKey: order must be non-empty " +
      "(an empty order would keep k arbitrary rows per key)")
    val spark = df.sparkSession
    install(spark)
    val plan = df.queryExecution.analyzed
    // session-conf-aware resolution (case sensitivity) + ambiguity check
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute = {
      val matches = plan.output.filter(a => resolver(a.name, n))
      matches match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"no column $n in ${plan.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.mkString(", ")}")
      }
    }
    val keyExprs = keys.map(attr)
    val sortOrders = order.map { c =>
      ColumnBridge.expr(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    val resolved = sortOrders.map { so =>
      so.transform {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          attr(u.name)
      }.asInstanceOf[SortOrder]
    }
    PlanBridge.ofRows(spark, TopKPerKeyNode(k, keyExprs, resolved, plan))
  }
}
