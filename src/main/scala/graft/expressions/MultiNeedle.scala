package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern substring matcher over UTF-8 bytes.
  *
  * Motivation: the reference's q18 scans every review sentence for
  * every (data-dependent) store name
  * (`gpu_bdb/queries/q18/gpu_bdb_query_18.py` — per-name string
  * search over the review corpus). Composed built-ins express that
  * only as needles × rows `instr` work — a crossJoin against the
  * name list, O(needles · textLen) per row, which at sf10 (~500
  * surviving names × millions of sentences) is the suite's worst
  * stage. One Aho-Corasick pass is O(textLen + matches) per row
  * regardless of needle count.
  *
  * Matching is on raw UTF-8 bytes: a byte-level match of a needle is
  * exactly a character-level substring match because UTF-8 is
  * self-synchronizing (no code point's encoding is a suffix of
  * another's continuation). Same semantics as `instr(text, needle) > 0`
  * per needle.
  *
  * Scale notes: the trie stores children as per-node sorted
  * byte/child arrays traversed by binary search, with classic BFS
  * failure links and output links — memory O(total needle bytes),
  * NOT the O(nodes × 256) full-DFA table, so a 100k-name gazetteer
  * costs megabytes, not gigabytes. The automaton is built lazily
  * per JVM from the needle list (everything mutable is
  * `@transient lazy`), so shipping the expression to executors
  * serializes only the needle strings.
  */
final class AhoCorasick(val needles: Array[Array[Byte]]) extends Serializable {

  // ---- trie build (lazy: runs once per JVM on first match call) ----
  // nodes: childBytes(v) sorted ascending, childNodes(v) parallel;
  // fail(v) = longest proper suffix of v's string that is a node;
  // endsNeedle(v) = needle index ending exactly at v, else -1;
  // outLink(v) = nearest fail-ancestor (v included) with endsNeedle.
  @transient private lazy val automaton: (Array[Array[Byte]], Array[Array[Int]],
      Array[Int], Array[Int], Array[Int]) = {
    val bytesBuf = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Byte, Int])
    // insert all needles
    var ni = 0
    val ends = scala.collection.mutable.ArrayBuffer(-1)
    while (ni < needles.length) {
      val w = needles(ni)
      var v = 0
      var i = 0
      while (i < w.length) {
        val b = w(i)
        v = bytesBuf(v).getOrElse(b, {
          bytesBuf += scala.collection.mutable.TreeMap.empty[Byte, Int]
          ends += -1
          val nv = bytesBuf.length - 1
          bytesBuf(v).put(b, nv)
          nv
        })
        i += 1
      }
      if (w.length > 0) ends(v) = ni
      ni += 1
    }
    val n = bytesBuf.length
    val childBytes = new Array[Array[Byte]](n)
    val childNodes = new Array[Array[Int]](n)
    var v = 0
    while (v < n) {
      val m = bytesBuf(v)
      childBytes(v) = m.keysIterator.toArray
      childNodes(v) = m.valuesIterator.toArray
      v += 1
    }
    // BFS failure + output links
    val fail = new Array[Int](n)
    val out = new Array[Int](n)
    java.util.Arrays.fill(out, -1)
    val queue = new java.util.ArrayDeque[Integer]()
    var ci = 0
    while (ci < childNodes(0).length) {
      queue.add(childNodes(0)(ci)); ci += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      out(u) = if (ends(u) >= 0) u else out(fail(u))
      var k = 0
      while (k < childNodes(u).length) {
        val b = childBytes(u)(k)
        val c = childNodes(u)(k)
        // fail(c): walk u's fail chain for a b-child
        var f = fail(u)
        var fc = -1
        while (fc < 0) {
          fc = childAt(childBytes(f), childNodes(f), b)
          if (fc < 0) {
            if (f == 0) fc = 0 else f = fail(f)
          }
        }
        fail(c) = fc
        queue.add(c)
        k += 1
      }
    }
    (childBytes, childNodes, fail, out, ends.toArray)
  }

  private def childAt(bs: Array[Byte], cs: Array[Int], b: Byte): Int = {
    var lo = 0; var hi = bs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val d = bs(mid) - b
      if (d == 0) return cs(mid)
      else if (d < 0) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  // per-thread dedupe scratch: seen(i) == gen(0) marks needle i
  // matched in the current call — no per-row allocation, and the
  // generation counter lives in the same ThreadLocal (a shared
  // counter would race across Spark's task threads)
  // gen is a LONG: an Int generation wraps after 2^32 calls on one
  // long-lived executor thread, colliding with stale seen[] entries
  // and silently dropping matches; a long never wraps in practice
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Long], Array[Int], Array[Long])] {
      override def initialValue(): (Array[Long], Array[Int], Array[Long]) =
        (new Array[Long](needles.length), new Array[Int](needles.length),
          new Array[Long](1))
    }

  /** Distinct needles occurring in `text`, in needle-list order —
    * element-wise equal to filtering the needle list on
    * `instr(text, needle) > 0`. Returns the interned UTF8String
    * needles, so no per-match copying.
    */
  def matches(text: UTF8String, needleStrings: Array[UTF8String]): ArrayData = {
    val (childBytes, childNodes, fail, out, ends) = automaton
    val (seen, hits, genBox) = scratch.get()
    genBox(0) += 1
    val gen = genBox(0)
    var nHits = 0
    val bytes = text.getBytes
    var v = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      var next = -1
      while (next < 0) {
        next = childAt(childBytes(v), childNodes(v), b)
        if (next < 0) {
          if (v == 0) next = 0 else v = fail(v)
        }
      }
      v = next
      // walk output links (out(v) includes v itself when it ends a
      // needle), dedupe by generation
      var o = out(v)
      while (o > 0) {
        val ni = ends(o)
        if (seen(ni) != gen) {
          seen(ni) = gen
          hits(nHits) = ni
          nHits += 1
        }
        o = out(fail(o))
      }
      i += 1
    }
    if (nHits == 0) AhoCorasick.emptyArray
    else {
      val idx = java.util.Arrays.copyOf(hits, nHits)
      java.util.Arrays.sort(idx)
      val res = new Array[Any](nHits)
      var k = 0
      while (k < nHits) { res(k) = needleStrings(idx(k)); k += 1 }
      new GenericArrayData(res)
    }
  }
}

object AhoCorasick {
  private val emptyArray = new GenericArrayData(Array.empty[Any])
}

/** multi_needle_matches(text, array<string> literal) -> array<string>:
  * the distinct needles that occur as substrings of `text`, in
  * needle-list order. Engine-portable semantics: identical to
  * DuckDB's `list_filter(needles, n -> contains(text, n))` and to
  * Spark's `filter(needles, n -> instr(text, n) > 0)` — the
  * automaton is an execution strategy, not a semantic change, and
  * the oracle gate (t24) holds the expression to the composed form.
  *
  * The needle list must be foldable (a literal): the automaton is
  * compiled once per JVM, not per row. Empty-string needles are
  * rejected (they'd "match" everywhere; DuckDB's contains says true,
  * Java's indexOf says true, but a caller almost certainly fed a bad
  * list — fail loudly at plan time).
  */
case class MultiNeedleMatches(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(
            "multi_needle_matches needs a literal needle array")
        else if (needleStrings.exists(n => n == null || n.numBytes == 0))
          TypeCheckResult.TypeCheckFailure(
            "multi_needle_matches: empty/null needle in list")
        else if (needleStrings.distinct.length != needleStrings.length)
          // the automaton keys matches by needle STRING, so duplicate
          // list entries would be silently collapsed to one hit —
          // diverging from the documented list_filter equivalence,
          // which keeps every copy. Fail at plan time instead.
          TypeCheckResult.TypeCheckFailure(
            "multi_needle_matches: duplicate needle in list")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"multi_needle_matches needs (string, array<string>), got ($l, $r)")
    }

  @transient private lazy val needleStrings: Array[UTF8String] = {
    right.eval(null).asInstanceOf[ArrayData] match {
      case null => Array.empty[UTF8String]
      case arr => (0 until arr.numElements())
        .map(i => arr.getUTF8String(i)).toArray
    }
  }

  @transient private lazy val ac =
    new AhoCorasick(needleStrings.map(_.getBytes))

  override def nullSafeEval(text: Any, _needles: Any): Any =
    ac.matches(text.asInstanceOf[UTF8String], needleStrings)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // reference the pre-built automaton + interned needle array from
    // generated code — one virtual call per row, the codegen'd
    // pipeline around it stays whole-stage
    val acRef = ctx.addReferenceObj("ahoCorasick", ac,
      classOf[AhoCorasick].getName)
    val needlesRef = ctx.addReferenceObj("needleStrings", needleStrings,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = $acRef.matches($text, $needlesRef);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): MultiNeedleMatches = copy(left = l, right = r)
}
