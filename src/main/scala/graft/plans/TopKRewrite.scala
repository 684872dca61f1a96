package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, EqualTo, Expression, IntegerLiteral, LessThan,
  LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite (SURVEY §2e: `Rule[LogicalPlan]` surface): the
  * declarative top-k-per-key idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W)).filter($"rn" <= k).drop("rn") }}}
  *
  * is rewritten to the bounded-buffer [[TopKPerKeyNode]] operator
  * whenever the rank column itself is projected away — the user keeps
  * the portable window formulation and the engine substitutes the
  * specialized operator (no full per-group sort, no rank column
  * materialized; see [[TopKPerKeyExec]]'s memory contract).
  *
  * Fires only when ALL of:
  *  - the Window computes exactly one expression: `row_number()` over
  *    the same partition/order spec as the Window node itself;
  *  - the Filter bounds that rank from above by an integer literal
  *    (`rn <= k`, `rn < k`, `rn = 1`), alone or in a conjunction
  *    (remaining conjuncts are kept as a Filter on the rewrite — rank
  *    is computed before the filter, so top-k-then-filter commutes);
  *  - the Project above references the rank attribute nowhere, so no
  *    consumer observes the rank values;
  *  - k is within [[MaxK]] (the exec buffers k rows per key on heap).
  *
  * Ties: `row_number` over a non-total order is already
  * nondeterministic in Spark, and the rewrite picks an equally valid
  * tie subset — use a unique tiebreak in the order (same discipline
  * the window form needs for reproducible results).
  *
  * Registered through `spark.experimental.extraOptimizations`, which
  * runs AFTER Spark's own `InferWindowGroupLimit` — that rule inserts
  * a [[WindowGroupLimit]] below the Window, which this rewrite strips
  * (the bounded buffer subsumes the group-limit prefilter).
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** Per-key heap-buffer bound — above this the window form's
    * spillable sort is the safer plan. */
  val MaxK = 10000

  private def boundFromConjunct(c: Expression, rank: Attribute): Option[Int] =
    c match {
      case LessThanOrEqual(r: Attribute, IntegerLiteral(k))
        if r.semanticEquals(rank) => Some(k)
      case LessThan(r: Attribute, IntegerLiteral(k))
        // k - 1 underflows for Int.MinValue (an always-false conjunct
        // would become bound Int.MaxValue and be silently DROPPED when
        // another conjunct makes the rewrite fire) — leave it in
        // `rest`, whose rank reference then disables the rewrite
        if r.semanticEquals(rank) && k != Int.MinValue => Some(k - 1)
      case EqualTo(r: Attribute, IntegerLiteral(1))
        if r.semanticEquals(rank) => Some(1)
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond, Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
          parts, order, wchild, _)))
        if parts.nonEmpty && order.nonEmpty &&
          spec.partitionSpec == parts && spec.orderSpec == order =>
      val rank = alias.toAttribute
      val conjuncts = splitConjuncts(cond)
      val bounds = conjuncts.flatMap(boundFromConjunct(_, rank))
      val rest = conjuncts.filter(boundFromConjunct(_, rank).isEmpty)
      val rewritable =
        bounds.nonEmpty && bounds.min >= 1 && bounds.min <= MaxK &&
          !projList.exists(_.references.contains(rank)) &&
          !rest.exists(_.references.contains(rank))
      if (!rewritable) p
      else {
        // InferWindowGroupLimit may have inserted its prefilter node
        // below the Window; the bounded-buffer exec subsumes it.
        val source = wchild match {
          case WindowGroupLimit(_, _, _, _, inner) => inner
          case other => other
        }
        val topk = TopKPerKeyNode(bounds.min, parts, order, source)
        val filtered =
          if (rest.isEmpty) topk
          else Filter(rest.reduce(And), topk)
        Project(projList, filtered)
      }
  }
}

object TopKRewrite {
  /** Install the rewrite rule (and the strategy that plans the node it
    * produces) on a live session via the stable experimental hooks. */
  def install(spark: SparkSession): Unit = {
    TopK.install(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }
}
