package graft.llm

import org.apache.spark.sql.catalyst.InternalRow
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
