package graft.llm

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UNIGRAM-style lattice tokenization: per word, the globally OPTIMAL
  * segmentation over a scored piece vocabulary via Viterbi dynamic
  * programming — the third tokenizer rung next to merge-list BPE
  * ([[TextAnalysis.bpeApply]]) and greedy maximal-munch WordPiece
  * ([[TextAnalysis.wordpieceApply]]). SentencePiece's unigram model
  * segments on exactly this lattice; its log-probability piece scores
  * are a libm boundary the cross-engine oracle cannot hash, so the
  * committed objective is the integer-exact compression form:
  *
  *   minimize piece count; tie-break maximize total piece frequency;
  *   tie-break prefer the longer last piece (a purely cell-local,
  *   total order — candidate k at one cell determines a distinct
  *   last-piece length, so the argmax is unique).
  *
  * Single-character pieces are always available (frequency 0 and an
  * unk tick when absent from the vocabulary), so the DP is total.
  * Words longer than `maxWordLen` collapse to one `<long>` piece
  * (real tokenizers bound candidate length the same way; the bound
  * also keeps the chained-CTE oracle finite).
  *
  * The same pass computes the GREEDY maximal-munch piece count over
  * the identical vocabulary, so a corpus query can report the exact
  * token savings of optimal-vs-greedy segmentation — the measurable
  * argument for paying the DP.
  *
  * Scale shape: callers tokenize at DISTINCT-word grain (the
  * wordpiece memoization discipline) and the vocabulary is a BOUNDED
  * driver collect (vocabN + single chars, the Retrieval vocab-fit
  * bound) converted once per expression instance — per row the DP is
  * O(len · maxPiece) hash lookups inside whole-stage codegen.
  */
object UnigramViterbi {
  val LongPiece = "<long>"

  /** result: (best_score, n_pieces, n_unk, seg, n_pieces_greedy,
    * greedy_score). Invariants: n_pieces <= n_pieces_greedy (Viterbi
    * is piece-count optimal), and at EQUAL piece count best_score >=
    * greedy_score (Viterbi is score-maximal among minimal
    * segmentations — the measurable quality greedy leaves behind).
    */
  def compute(word: UTF8String, vocab: UnigramVocab, maxPiece: Int,
      maxWordLen: Int): InternalRow = {
    val w = word.toString
    val cps = w.codePointCount(0, w.length)
    if (cps > maxWordLen)
      return InternalRow(0L, 1L, 1L,
        UTF8String.fromString(LongPiece), 1L, 0L)
    // offsets(i) = java-char index of codepoint i, so substring keys
    // match the SQL codepoint-based substring() on both engines
    val off = new Array[Int](cps + 1)
    var ci = 0
    var oi = 0
    while (ci < cps) {
      off(ci) = oi
      oi += Character.charCount(w.codePointAt(oi))
      ci += 1
    }
    off(cps) = w.length

    val score = new Array[Long](cps + 1)
    val np = new Array[Long](cps + 1)
    val unk = new Array[Long](cps + 1)
    val bestK = new Array[Int](cps + 1)
    var p = 1
    while (p <= cps) {
      var chosenK = 0
      var cs = 0L
      var cn = 0L
      var cu = 0L
      var k = 1
      val kMax = math.min(maxPiece, p)
      while (k <= kMax) {
        val piece = w.substring(off(p - k), off(p))
        val f = vocab.map.get(piece)
        val known = f ne null
        if (k == 1 || known) {
          val s = score(p - k) + (if (known) f.longValue() else 0L)
          val n = np(p - k) + 1L
          val u = unk(p - k) + (if (k == 1 && !known) 1L else 0L)
          // order: np asc, score desc, k desc (k asc in loop → strict >)
          val better = chosenK == 0 || n < cn || (n == cn &&
            (s > cs || (s == cs && k > chosenK)))
          if (better) { chosenK = k; cs = s; cn = n; cu = u }
        }
        k += 1
      }
      score(p) = cs; np(p) = cn; unk(p) = cu; bestK(p) = chosenK
      p += 1
    }
    // path reconstruction, left-to-right pieces joined by ' '
    val pieces = new Array[String](np(cps).toInt)
    var q = cps
    var pi = pieces.length - 1
    while (q > 0) {
      val k = bestK(q)
      pieces(pi) = w.substring(off(q - k), off(q))
      pi -= 1
      q -= k
    }
    // greedy maximal munch over the same vocab (longest known piece,
    // else a single unk char)
    var gp = 0
    var gn = 0L
    var gs = 0L
    while (gp < cps) {
      var k = math.min(maxPiece, cps - gp)
      while (k > 1 &&
          (vocab.map.get(w.substring(off(gp), off(gp + k))) eq null)) {
        k -= 1
      }
      val f = vocab.map.get(w.substring(off(gp), off(gp + k)))
      if (f ne null) gs += f.longValue()
      gp += k
      gn += 1L
    }
    InternalRow(score(cps), np(cps), unk(cps),
      UTF8String.fromString(pieces.mkString(" ")), gn, gs)
  }
}

/** Bounded piece-frequency table baked into the tokenize expression
  * (vocabN + single-char floor rows — the documented fit-collect
  * bound). Reference equality only; the short toString keeps plan
  * strings readable.
  */
final class UnigramVocab(entries: Array[(String, Long)])
    extends Serializable {
  val map = new java.util.HashMap[String, java.lang.Long](
    entries.length * 2)
  entries.foreach { case (p, c) => map.put(p, c) }
  override def toString: String = s"UnigramVocab(${map.size} pieces)"
}

/** string word → struct(best_score, n_pieces, n_unk, seg,
  * n_pieces_greedy, greedy_score) optimal-segmentation record.
  */
case class UnigramViterbiExpr(child: Expression, vocab: UnigramVocab,
    maxPiece: Int, maxWordLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxPiece >= 1 && maxWordLen >= 1, "need maxPiece/maxWordLen >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("best_score", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("seg", StringType, nullable = false),
    StructField("n_pieces_greedy", LongType, nullable = false),
    StructField("greedy_score", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    UnigramViterbi.compute(input.asInstanceOf[UTF8String], vocab,
      maxPiece, maxWordLen)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab,
      classOf[UnigramVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.llm.UnigramViterbi.compute($c, $vocabRef, $maxPiece, " +
        s"$maxWordLen)")
  }
  override protected def withNewChildInternal(newChild: Expression)
      : UnigramViterbiExpr = copy(child = newChild)
}

/** Forward-backward lattice expectations for the SentencePiece-style
  * unigram-LM EM fit ([[TextAnalysis.unigramEmFit]]): per word, the
  * EXPECTED number of times each vocabulary piece is used across all
  * segmentations, weighted by the word's corpus count, in exact
  * truncated micro units.
  *
  * Cross-engine determinism contract (the DuckDB oracle replays the
  * identical chain): piece probabilities are the single correctly-
  * rounded division score/total from exact integers; the forward
  * values alpha_i and backward values gamma_j are built with the
  * PINNED add tree ((c1 + c2) + c3) + c4 over the length-1..4
  * contributions (absent piece / out-of-range term = literal +0.0,
  * an exact identity on the non-negative operands here); each
  * occurrence expectation is the fixed five-op sequence
  * floor(((((alpha·p)·beta)/alphaL)·cnt)·10^6) — every op IEEE
  * correctly rounded, so bit-identical on any engine fed the same
  * integers. Zero-expectation occurrences are still emitted (the
  * aggregate's piece set must match relational replay).
  *
  * Words longer than `maxWordLen` yield an EMPTY array — the EM fit
  * excludes them (real tokenizer fits bound word length the same
  * way; it also keeps the oracle's chained-CTE lattice finite).
  */
object UnigramEm {
  def compute(word: UTF8String, cnt: Long, vocab: UnigramEmVocab,
      maxPiece: Int, maxWordLen: Int): ArrayData = {
    val w = word.toString
    val cps = w.codePointCount(0, w.length)
    if (cps > maxWordLen || cps == 0)
      return ArrayData.toArrayData(Array.empty[InternalRow])
    val off = new Array[Int](cps + 1)
    var ci = 0
    var oi = 0
    while (ci < cps) {
      off(ci) = oi
      oi += Character.charCount(w.codePointAt(oi))
      ci += 1
    }
    off(cps) = w.length
    def p(startCp: Int, l: Int): Double = {
      val v = vocab.p.get(w.substring(off(startCp), off(startCp + l)))
      if (v eq null) 0.0 else v.doubleValue()
    }
    // forward: alpha(i) over prefix length i, pinned add tree
    val alpha = new Array[Double](cps + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= cps) {
      val c1 = alpha(i - 1) * p(i - 1, 1)
      val c2 = if (i >= 2) alpha(i - 2) * p(i - 2, 2) else 0.0
      val c3 = if (i >= 3) alpha(i - 3) * p(i - 3, 3) else 0.0
      val c4 = if (i >= 4) alpha(i - 4) * p(i - 4, 4) else 0.0
      alpha(i) = ((c1 + c2) + c3) + c4
      i += 1
    }
    // backward: gamma(j) over suffix length j — the mirrored
    // recursion, contributions gamma(j-l) * p(piece at cps - j)
    val gamma = new Array[Double](cps + 1)
    gamma(0) = 1.0
    var j = 1
    while (j <= cps) {
      val c1 = gamma(j - 1) * p(cps - j, 1)
      val c2 = if (j >= 2) gamma(j - 2) * p(cps - j, 2) else 0.0
      val c3 = if (j >= 3) gamma(j - 3) * p(cps - j, 3) else 0.0
      val c4 = if (j >= 4) gamma(j - 4) * p(cps - j, 4) else 0.0
      gamma(j) = ((c1 + c2) + c3) + c4
      j += 1
    }
    val alphaL = alpha(cps)
    if (!(alphaL > 0.0))
      return ArrayData.toArrayData(Array.empty[InternalRow])
    val cntD = cnt.toDouble
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var s = 0
    while (s < cps) {
      var l = 1
      val lMax = math.min(maxPiece, cps - s)
      while (l <= lMax) {
        val piece = w.substring(off(s), off(s + l))
        val pv = vocab.p.get(piece)
        if (pv ne null) {
          val e = math.floor(((((alpha(s) * pv.doubleValue()) *
            gamma(cps - s - l)) / alphaL) * cntD) * 1000000.0)
          out += InternalRow(UTF8String.fromString(piece), e.toLong)
        }
        l += 1
      }
      s += 1
    }
    ArrayData.toArrayData(out.toArray)
  }
}

/** Bounded piece-probability table for [[UnigramEmExpr]]: p(piece) =
  * score/total as the one correctly-rounded double division from the
  * exact integer scores (vocabN + single-char floor rows — the
  * documented fit-collect bound).
  */
final class UnigramEmVocab(entries: Array[(String, Long)],
    val total: Long) extends Serializable {
  require(total > 0, "unigram EM vocab total must be positive")
  val p = new java.util.HashMap[String, java.lang.Double](
    entries.length * 2)
  entries.foreach { case (piece, score) =>
    p.put(piece, score.toDouble / total.toDouble)
  }
  override def toString: String = s"UnigramEmVocab(${p.size} pieces)"
}

/** (word string, corpus count long) → array<struct(piece, e_micro)>
  * lattice-expectation record for one EM iteration's E-step.
  */
case class UnigramEmExpr(left: Expression, right: Expression,
    vocab: UnigramEmVocab, maxPiece: Int, maxWordLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  require(maxPiece >= 1 && maxPiece <= 4,
    "the pinned add tree covers maxPiece 1..4")
  require(maxWordLen >= 1, "need maxWordLen >= 1")
  override def inputTypes: Seq[DataType] =
    Seq(StringType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("e_micro", LongType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(word: Any, cnt: Any): Any =
    UnigramEm.compute(word.asInstanceOf[UTF8String],
      cnt.asInstanceOf[Long], vocab, maxPiece, maxWordLen)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramEmVocab", vocab,
      classOf[UnigramEmVocab].getName)
    defineCodeGen(ctx, ev, (wrd, c) =>
      s"graft.llm.UnigramEm.compute($wrd, $c, $vocabRef, $maxPiece, " +
        s"$maxWordLen)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UnigramEmExpr =
    copy(left = newLeft, right = newRight)
}
