package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via Aho–Corasick (1975) — the dictionary
  * tagger a blocklist / policy / PII-keyword pass needs at corpus scale:
  * counts[i] = occurrences of `terms(i)` in the input (overlaps counted,
  * nested terms counted independently — "scan" also fires inside
  * "table scan").
  *
  * The 100 TB shape is the point: K dictionary terms cost ONE automaton
  * transition per input character (O(text + matches)), not K separate
  * regex/contains scans of the corpus (O(K·text) — the plan Spark builds
  * for `K × contains(...)` columns). The automaton is built once per
  * executor JVM from the serialized term list (@transient lazy val, the
  * expression-local analogue of a broadcast dictionary); per-row work never
  * rescans.
  *
  * Reference scope note: basenine's BFL has only single-pattern
  * `contains()` (server/lib/eval.go helpers) — this is a beyond-parity
  * pipeline operator.
  */
case class AhoCorasickCountsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression
    with CodegenFallback {

  require(terms.nonEmpty, "aho_corasick_counts: empty dictionary")
  require(terms.forall(_.nonEmpty), "aho_corasick_counts: empty term")
  require(terms.distinct.size == terms.size, "aho_corasick_counts: duplicate terms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"aho_corasick_counts requires a string column, got ${other.sql}")
    }

  /** goto/fail/output tables, built once per JVM the expression lands in.
    * Nodes are dense ints; transitions are per-node char maps (dictionaries
    * are small — thousands of terms — so a map lookup beats a 64k-wide
    * dense row per node); outputs are pre-merged through the fail chain
    * (out(u) = own(u) ++ out(fail(u)), valid in BFS order since fail links
    * point strictly up in depth) so the scan loop never walks it.
    */
  @transient private lazy val automaton
      : (Array[mutable.Map[Char, Int]], Array[Int], Array[Array[Int]]) = {
    val goto = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val own = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    terms.zipWithIndex.foreach { case (t, ti) =>
      var s = 0
      t.foreach { ch =>
        s = goto(s).getOrElseUpdate(ch, {
          goto += mutable.Map.empty[Char, Int]
          own += mutable.ArrayBuffer.empty[Int]
          goto.size - 1
        })
      }
      own(s) += ti
    }
    val n = goto.size
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = own(0).toArray
    val queue = mutable.Queue.empty[Int]
    goto(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) = (own(u) ++ out(fail(u))).toArray
      goto(u).foreach { case (ch, v) =>
        // deepest proper suffix of path(v) that is also a trie node
        var f = fail(u)
        while (f != 0 && !goto(f).contains(ch)) f = fail(f)
        fail(v) = goto(f).get(ch).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
    (goto.toArray, fail, out)
  }

  override def nullSafeEval(v: Any): Any = {
    val (goto, fail, out) = automaton
    val text = v.asInstanceOf[UTF8String].toString
    val counts = new Array[Long](terms.size)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !goto(s).contains(ch)) s = fail(s)
      s = goto(s).getOrElse(ch, 0)
      val o = out(s)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += 1
    }
    ArrayData.toArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression): AhoCorasickCountsExpr =
    copy(child = c)
  override def prettyName: String = "aho_corasick_counts"
}

object AhoCorasickExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** counts[i] = overlapping occurrence count of terms(i) in `text`. */
  def counts(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(AhoCorasickCountsExpr(ColumnBridge.expression(text), terms))
}
