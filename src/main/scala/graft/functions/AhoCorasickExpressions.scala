package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring statistics in ONE text pass — the
  * Aho-Corasick (1975) automaton as a native codegen'd expression.
  *
  * The term-list gate (banned-word filters a la C4's badwords list,
  * boilerplate-phrase detectors, policy lexicons) is textbook
  * multi-pattern matching, and the naive Spark spelling — one
  * `rlike`/`contains` Column per term — scans the document once PER
  * TERM: a 500-term lexicon over a 10^12-doc corpus pays 500 full
  * text passes per document, and each `rlike` is a regex engine
  * invocation besides. The automaton pays one pass total, independent
  * of term count: amortized O(len) transitions via goto/fail links,
  * with per-node match counts and term bitmasks precomputed at build
  * time so the scan itself is allocation-free.
  *
  * Returns `array<bigint> [n_matches, n_terms]`:
  *   - `n_matches` — every (term, end_position) occurrence, overlaps
  *     included ("scan" hits "scan"/"can"/"an" at 3 positions);
  *     this is the well-defined position-set semantics an oracle can
  *     re-derive exactly (non-overlapping replace()-counting is
  *     greedy-order-dependent and not what a lexicon gate wants).
  *   - `n_terms` — DISTINCT terms that occur at least once (what a
  *     "≥ k distinct banned terms" gate thresholds on).
  *
  * Matching is case-sensitive and byte-exact over the input; pass
  * `lower(text)` and lowercase terms for case-insensitive gating.
  * Term-id tracking uses one Long bitmask, so the build REJECTS more
  * than 64 terms (and empty terms, which would match everywhere);
  * larger lexicons split into 64-term groups and sum the stats —
  * still one pass per group instead of one per term.
  *
  * The automaton is built once on the driver at expression-creation
  * time and ships to executors as a codegen reference object (same
  * mechanism Spark's own `StringSplit` uses for compiled patterns);
  * the match loop reads only immutable arrays/maps, so concurrent
  * tasks share it safely.
  */
case class AhoCorasickStats(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    terms: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "ac_stats"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val automaton = new AcAutomaton(terms.toArray)

  override protected def nullSafeEval(v: Any): Any =
    automaton.stats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.stats($c)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}

object AhoCorasickStats {
  def apply(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      AhoCorasickStats(
        org.apache.spark.sql.graftbridge.Bridge.expression(text), terms))
}

/** Goto/fail automaton over the term set; see [[AhoCorasickStats]].
  * Per node: goto map (char -> node), fail link, total patterns ending
  * here INCLUDING via the fail chain (`hits`), and the bitmask of
  * term ids ditto (`mask`) — both folded in at build time so the scan
  * never walks output links.
  */
final class AcAutomaton(terms: Array[String]) extends Serializable {
  require(terms.nonEmpty && terms.length <= 64,
    s"AcAutomaton needs 1..64 terms, got ${terms.length}")
  require(terms.forall(t => t != null && t.nonEmpty),
    "AcAutomaton terms must be non-empty")
  require(terms.distinct.length == terms.length,
    "AcAutomaton terms must be distinct")

  private val (gotoMaps, fail, hits, mask) = {
    val gotos = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(0L) // term-id bits ending exactly here
    // trie
    terms.zipWithIndex.foreach { case (t, ti) =>
      var n = 0
      t.foreach { ch =>
        n = gotos(n).getOrElseUpdate(ch, {
          gotos += scala.collection.mutable.HashMap.empty[Char, Int]
          ends += 0L
          gotos.length - 1
        })
      }
      ends(n) |= (1L << ti)
    }
    val size = gotos.length
    val failA = new Array[Int](size)
    val maskA = new Array[Long](size)
    val hitsA = new Array[Int](size)
    // BFS fail links; fold fail-chain outputs into each node
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotos(0).valuesIterator.foreach { c => failA(c) = 0; queue += c }
    maskA(0) = ends(0)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      maskA(n) = ends(n) | maskA(failA(n))
      gotos(n).foreach { case (ch, c) =>
        var f = failA(n)
        while (f != 0 && !gotos(f).contains(ch)) f = failA(f)
        failA(c) = gotos(f).get(ch).filter(_ != c).getOrElse(0)
        queue += c
      }
    }
    var i = 0
    while (i < size) { hitsA(i) = java.lang.Long.bitCount(maskA(i)); i += 1 }
    // hits at a node = patterns ending here incl. fail chain — but a
    // pattern can end at a node only once per end position, so the
    // per-position match count IS the popcount of the folded mask
    (gotos.map(m => m.toMap).toArray, failA, hitsA, maskA)
  }

  def stats(text: UTF8String): ArrayData = {
    val s = text.toString
    var node = 0
    var matches = 0L
    var seen = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val ch = s.charAt(i)
      var n = node
      while (n != 0 && !gotoMaps(n).contains(ch)) n = fail(n)
      node = gotoMaps(n).getOrElse(ch, 0)
      if (mask(node) != 0L) {
        matches += hits(node)
        seen |= mask(node)
      }
      i += 1
    }
    new GenericArrayData(Array(matches,
      java.lang.Long.bitCount(seen).toLong))
  }
}
