package graft.llm

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AHO–CORASICK multi-pattern matching as a native expression: all
  * occurrences of every dictionary term in ONE pass over the text
  * (goto/fail automaton, Aho & Corasick 1975) — the phrase-grain
  * complement to the word-grain [[TextAnalysis.blocklistGate]], and
  * the right shape for big dictionaries: per-row cost is
  * O(chars + matches) regardless of term count, where the naive form
  * (one regexp/contains per term) scans the text |terms| times.
  *
  * Match semantics — pinned because the oracle mirrors them exactly:
  * every (position, term) pair counts, so occurrences may overlap
  * each other and each other's terms ('tab', 'table', 'able' all
  * fire inside one 'table'); counting is by match END position via
  * the dictionary-suffix chain, the standard AC definition.
  *
  * The automaton is built once from a BOUNDED term list (the
  * UnigramVocab / Retrieval fit-collect discipline) and baked into
  * the expression; matching runs inside whole-stage codegen.
  * Codepoint-indexed so counts agree with SQL substring() on both
  * engines for any BMP/supplementary input.
  */
final class AcAutomaton(termsIn: Seq[String]) extends Serializable {
  require(termsIn.nonEmpty && termsIn.size <= 100000,
    "AC dictionary must be non-empty and bounded (<= 100000 terms)")
  require(termsIn.forall(_.nonEmpty), "AC terms must be non-empty")
  /** sorted, distinct — the counts array is indexed in THIS order */
  val terms: Array[String] = termsIn.distinct.sorted.toArray

  private def cps(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0; var k = 0
    while (i < s.length) {
      val c = s.codePointAt(i); out(k) = c; k += 1
      i += Character.charCount(c)
    }
    out
  }

  // trie with goto maps, fail links, and per-node term outputs
  // (dictionary-suffix outputs folded in during the BFS, so match
  // emission is a flat array walk, no link chasing per char)
  private val gotoMaps =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Integer, Integer]())
  private val outBuf =
    scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
  terms.zipWithIndex.foreach { case (t, ti) =>
    var node = 0
    cps(t).foreach { c =>
      val m = gotoMaps(node)
      val nxt = m.get(c)
      node = if (nxt != null) nxt.intValue()
      else {
        gotoMaps += new java.util.HashMap[Integer, Integer]()
        outBuf += Nil
        val id = gotoMaps.size - 1
        m.put(c, id)
        id
      }
    }
    outBuf(node) = ti :: outBuf(node)
  }
  private def buildFail(): Array[Int] = {
    val fl = new Array[Int](gotoMaps.size)
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach { (_, v) => fl(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      // fold the fail node's outputs: match-by-end-position needs
      // every dictionary suffix, and fl(u) is already folded (BFS)
      outBuf(u) = outBuf(u) ::: outBuf(fl(u))
      gotoMaps(u).forEach { (c, v) =>
        var f = fl(u)
        while (f != 0 && gotoMaps(f).get(c) == null) f = fl(f)
        val t = gotoMaps(f).get(c)
        fl(v) = if (t != null && t.intValue() != v.intValue())
          t.intValue() else 0
        queue.add(v)
      }
    }
    fl
  }
  private val fail: Array[Int] = buildFail()
  private val gotos: Array[java.util.HashMap[Integer, Integer]] =
    gotoMaps.toArray
  private val outs: Array[Array[Int]] = outBuf.map(_.toArray).toArray

  /** per-term occurrence counts of every dictionary term in `text` */
  def countMatches(text: UTF8String): Array[Long] = {
    val counts = new Array[Long](terms.length)
    val s = text.toString
    var node = 0
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      var n = node
      while (n != 0 && gotos(n).get(c) == null) n = fail(n)
      val nxt = gotos(n).get(c)
      node = if (nxt != null) nxt.intValue() else 0
      val o = outs(node)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += Character.charCount(c)
    }
    counts
  }

  override def toString: String = s"AcAutomaton(${terms.length} terms)"
}

object MultiMatch {
  def compute(text: UTF8String, ac: AcAutomaton): InternalRow = {
    val counts = ac.countMatches(text)
    var total = 0L
    var distinct = 0L
    var i = 0
    while (i < counts.length) {
      total += counts(i)
      if (counts(i) > 0) distinct += 1
      i += 1
    }
    InternalRow(total, distinct, new GenericArrayData(counts))
  }
}

/** string → struct(total_hits, distinct_terms, counts array<long>
  * indexed by the automaton's sorted term order).
  */
case class MultiMatchExpr(child: Expression, ac: AcAutomaton)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("total_hits", LongType, nullable = false),
    StructField("distinct_terms", LongType, nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    MultiMatch.compute(input.asInstanceOf[UTF8String], ac)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.llm.MultiMatch.compute($c, $acRef)")
  }
  override protected def withNewChildInternal(newChild: Expression)
      : MultiMatchExpr = copy(child = newChild)
}
