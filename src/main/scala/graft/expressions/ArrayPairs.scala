package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** array_pairs(array<T>) — generate the (item_1, item_2) rows for
  * every index pair i < j of the input array, one output row per
  * pair, as a custom Catalyst `Generator`.
  *
  * This is the inner loop of session-scoped pair generation
  * (reference S4, `bdb_tools/sessionization.py:112-128`): after
  * `sort_array(collect_set(item))` per session, the ordered pairs
  * item_1 < item_2 are exactly the index pairs of the sorted
  * duplicate-free array. The composed-builtins form —
  * flatten(transform(a, (x,i) -> transform(slice(a, i+2, ...),
  * y -> struct(x,y)))) then explode — evaluates interpreted lambda
  * closures and allocates the nested intermediate arrays per row;
  * this Generator emits the rows in one pass with no intermediate
  * structure (~2x on the pair stage of BDB q30 at sf30, where the
  * expansion runs over ~100M sessions).
  *
  * Ordering contract: pairs are emitted in lexicographic index
  * order; whether item_1 < item_2 holds VALUE-wise is up to the
  * caller sorting the input (sessionPairs does). Null/short (<2)
  * arrays emit nothing. Element type is generic.
  */
case class ArrayPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(Seq(
    StructField("item_1", elemType, nullable = true),
    StructField("item_2", elemType, nullable = true)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"array_pairs needs array, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n < 2) Nil
      else {
        // size in LONG: n*(n-1)/2 overflows Int at n >= 46342 — a
        // single hot key emitting 2^31 pairs is a skew disaster the
        // caller must handle (salt/split the key), so name it rather
        // than crash with NegativeArraySizeException mid-generation
        val nPairs = n.toLong * (n - 1) / 2
        require(nPairs <= Int.MaxValue,
          s"array_pairs: $n elements -> $nPairs pairs exceeds the " +
            "per-row limit; split or salt the hot group upstream")
        val vals = a.toObjectArray(elemType)
        val out = new Array[InternalRow](nPairs.toInt)
        var k = 0
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            out(k) = InternalRow(vals(i), vals(j))
            k += 1
            j += 1
          }
          i += 1
        }
        out
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): ArrayPairs =
    copy(child = c)
}

object ArrayPairs {
  def array_pairs(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ArrayPairs(org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)))
}
