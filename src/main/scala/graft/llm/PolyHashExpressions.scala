package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd replacements for the hot-path polynomial hashing.
  *
  * The portable hash h(s) = fold((acc * 31 + codepoint) mod P) is also
  * expressible with higher-order SQL functions (and the DuckDB oracles
  * use that formulation), but HOF lambdas are interpreted — no
  * whole-stage codegen, no subexpression elimination — which made
  * shingle hashing the dominant cost of the MinHash/LSH pipeline. A
  * custom `Expression` with `doGenCode` runs the same integer loop as
  * compiled Java inside the stage: identical values, codegen speed.
  *
  * Codepoints are iterated with `String.codePointAt`, matching the SQL
  * `ascii(substring(s, i, 1))` formulation for all BMP and
  * supplementary characters.
  */
object PolyHash {
  val P: Long = HashConstants.P

  /** Shared inner loop: hash of codePoints[from, from+len). */
  def hashRange(cps: Array[Int], from: Int, len: Int): Long = {
    var h = 0L
    var j = 0
    while (j < len) { h = (h * 31 + cps(from + j)) % P; j += 1 }
    h
  }

  def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** All n-gram shingle hashes of a string (whole-string hash when
    * shorter than n) — the native form of
    * `transform(shingles, s -> polyhash(s))`.
    */
  def shingleHashes(s: UTF8String, n: Int): GenericArrayData = {
    val cps = codePoints(s)
    if (cps.length < n)
      return new GenericArrayData(Array(hashRange(cps, 0, cps.length)))
    val m = cps.length - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = hashRange(cps, i, n); i += 1 }
    new GenericArrayData(out)
  }

  /** Hash of each whitespace(' ')-separated token — the native form of
    * `transform(split(text, ' '), t -> polyhash(t))`.
    */
  def tokenHashes(s: UTF8String): GenericArrayData = {
    val cps = codePoints(s)
    val out = Array.newBuilder[Long]
    var start = 0
    var i = 0
    while (i <= cps.length) {
      if (i == cps.length || cps(i) == ' ') {
        out += hashRange(cps, start, i - start)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** Whole-string hash (document fingerprint). */
  def whole(s: UTF8String): Long = {
    val cps = codePoints(s)
    hashRange(cps, 0, cps.length)
  }
}

/** array<bigint> of n-gram shingle hashes of a string column. */
case class PolyHashShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    PolyHash.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.llm.PolyHash.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression)
      : PolyHashShingles = copy(child = newChild)
}

/** array<bigint> of per-token hashes (split on ' '). */
case class PolyHashTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    PolyHash.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.PolyHash.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : PolyHashTokens = copy(child = newChild)
}

/** bigint whole-string polynomial hash (fingerprint). */
case class PolyHashString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    PolyHash.whole(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.PolyHash.whole($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : PolyHashString = copy(child = newChild)
}

object PolyHashColumns {
  import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
  def shingleHashes(c: Column, n: Int = HashConstants.shingleSize): Column =
    column(PolyHashShingles(expression(c), n))
  def tokenHashes(c: Column): Column =
    column(PolyHashTokens(expression(c)))
  def fingerprint(c: Column): Column =
    column(PolyHashString(expression(c)))
}
