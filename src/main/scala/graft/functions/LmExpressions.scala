package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** LM scoring tables, built once on the driver and shipped inside the
  * expression (codegen references them as constants — the
  * [[VocabTable]] pattern). Lookups are hash probes; the HOF twins'
  * `element_at` on a map LITERAL is a per-token linear scan in
  * interpreted lambda eval, which is why the kernels exist.
  */
final class UnigramTable(words: Array[String], lnPs: Array[Double],
                         val lnOov: Double) extends Serializable {
  require(words.length == lnPs.length, "words/lnPs length mismatch")
  @transient lazy val map: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      words.length * 2)
    var i = 0
    while (i < words.length) {
      m.put(UTF8String.fromString(words(i)), lnPs(i)); i += 1
    }
    m
  }
  def lnP(w: UTF8String): Double = {
    val v = map.get(w)
    if (v == null) lnOov else v.doubleValue()
  }
}

final class BigramTable(val uni: UnigramTable,
                        pairKeys: Array[String], pairLnPs: Array[Double],
                        val lnAlpha: Double) extends Serializable {
  require(pairKeys.length == pairLnPs.length, "pair arrays length mismatch")
  @transient lazy val map: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      pairKeys.length * 2)
    var i = 0
    while (i < pairKeys.length) {
      m.put(UTF8String.fromString(pairKeys(i)), pairLnPs(i)); i += 1
    }
    m
  }
}

/** Native LM scoring kernels. Both walk whitespace token boundaries
  * on raw UTF-8 bytes (the same `\s+` runs as `split(trim(text),
  * "\\s+")`) and fold ln-probs LEFT TO RIGHT — bit-identical to the
  * HOF `aggregate` twins (0.0 + x₁ is exact, every subsequent add is
  * the same operation in the same order), so swapping them in under
  * an existing DuckDB oracle changes nothing.
  */
object LmKernel {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  /** Tokenization parity with `split(trim(text), "\\s+")`, quirks
    * included: `trim` strips SPACES (0x20) only, and Spark's split
    * (Java regex split with limit −1) keeps BOTH a leading and a
    * TRAILING empty token when the space-trimmed string starts/ends
    * with other whitespace (tab/newline — note limit −1: unlike bare
    * `String.split`, trailing empties are NOT dropped). The twins
    * score those empty tokens as OOV, so the kernels must too.
    */
  private def spaceTrimBounds(bytes: Array[Byte]): (Int, Int) = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    (lo, hi)
  }

  /** −(Σ ln P(wᵢ))/n, 0.0 for token-less text (UNROUNDED — callers
    * apply the house 6-dp `round` as a column, exactly like the twin).
    */
  def unigramCe(s: UTF8String, t: UnigramTable): Double = {
    val bytes = s.getBytes
    val (lo, hi) = spaceTrimBounds(bytes)
    if (lo >= hi) return 0.0 // length(trim) == 0 guard of the twin
    var sum = 0.0
    var n = 0
    var i = lo
    if (isWs(bytes(lo))) { sum += t.lnP(Empty); n += 1 } // leading ""
    while (i < hi) {
      while (i < hi && isWs(bytes(i))) i += 1
      if (i < hi) {
        val start = i
        while (i < hi && !isWs(bytes(i))) i += 1
        sum += t.lnP(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
        n += 1
      }
    }
    if (isWs(bytes(hi - 1))) { sum += t.lnP(Empty); n += 1 } // trailing ""
    if (n == 0) 0.0 else -sum / n
  }

  /** Stupid-backoff bigram cross-entropy, same contract: first token
    * scores P_uni, a seen vocab-pair scores S(w|v), otherwise
    * lnα + lnP_uni(w) — branch decisions and fold order mirror
    * [[graft.operators.LanguageModel.crossEntropyBigram]] exactly,
    * including the twin's `prev == ""` first-position marker: a
    * leading empty token leaves the NEXT token scoring P_uni too.
    */
  def bigramCe(s: UTF8String, t: BigramTable): Double = {
    val bytes = s.getBytes
    val (lo, hi) = spaceTrimBounds(bytes)
    if (lo >= hi) return 0.0
    var sum = 0.0
    var n = 0
    var prev: UTF8String = null
    var i = lo
    if (isWs(bytes(lo))) {
      sum += t.uni.lnP(Empty); n += 1
      prev = null // the "" marker: next token is "first" again
    }
    while (i < hi) {
      while (i < hi && isWs(bytes(i))) i += 1
      if (i < hi) {
        val start = i
        while (i < hi && !isWs(bytes(i))) i += 1
        val w = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i))
        val lnS =
          if (prev == null) t.uni.lnP(w)
          else {
            val p = t.map.get(UTF8String.concat(prev, Space, w))
            if (p == null) t.lnAlpha + t.uni.lnP(w)
            else p.doubleValue()
          }
        sum += lnS
        n += 1
        prev = w
      }
    }
    if (isWs(bytes(hi - 1))) { // trailing "" token, scored like any w
      val lnS =
        if (prev == null) t.uni.lnP(Empty)
        else {
          val p = t.map.get(UTF8String.concat(prev, Space, Empty))
          if (p == null) t.lnAlpha + t.uni.lnP(Empty)
          else p.doubleValue()
        }
      sum += lnS
      n += 1
    }
    if (n == 0) 0.0 else -sum / n
  }

  /** Interpolated Kneser–Ney cross-entropy, same tokenization/fold
    * contract as [[bigramCe]] (the skeleton is a copy — leading and
    * trailing empty tokens, the prev==null first-position marker):
    * first token or OOV context scores the smoothed continuation
    * base(w); a seen vocab pair scores its precomputed interpolated
    * ln P; an unseen pair under a known context scores
    * lnλ(v) + ln base(w) — both lns precomputed, added, mirroring
    * the oracle's two-term branch.
    */
  def knCe(s: UTF8String, t: KnTable): Double = {
    val bytes = s.getBytes
    val (lo, hi) = spaceTrimBounds(bytes)
    if (lo >= hi) return 0.0
    var sum = 0.0
    var n = 0
    var prev: UTF8String = null
    var i = lo
    if (isWs(bytes(lo))) {
      sum += t.base.lnP(Empty); n += 1
      prev = null
    }
    def score(prevTok: UTF8String, w: UTF8String): Double =
      if (prevTok == null) t.base.lnP(w)
      else {
        val p = t.map.get(UTF8String.concat(prevTok, Space, w))
        if (p != null) p.doubleValue()
        else {
          val lam = t.lambda.get(prevTok)
          if (lam == null) t.base.lnP(w)
          else lam.doubleValue() + t.base.lnP(w)
        }
      }
    while (i < hi) {
      while (i < hi && isWs(bytes(i))) i += 1
      if (i < hi) {
        val start = i
        while (i < hi && !isWs(bytes(i))) i += 1
        val w = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i))
        sum += score(prev, w)
        n += 1
        prev = w
      }
    }
    if (isWs(bytes(hi - 1))) {
      sum += score(prev, Empty)
      n += 1
    }
    if (n == 0) 0.0 else -sum / n
  }
}

/** Interpolated Kneser–Ney tables: `base` maps vocab words to their
  * ln smoothed continuation probability (lnOov = the add-one floor),
  * `map` holds the FULL interpolated ln P for seen vocab pairs, and
  * `lambda` the per-context ln backoff mass ln(d·N1+(v·)/c(v)).
  */
final class KnTable(val base: UnigramTable,
                    pairKeys: Array[String], pairLnPs: Array[Double],
                    lambdaKeys: Array[String], lnLambdas: Array[Double])
  extends Serializable {
  require(pairKeys.length == pairLnPs.length, "pair arrays length mismatch")
  require(lambdaKeys.length == lnLambdas.length, "lambda arrays length mismatch")
  @transient lazy val map: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      pairKeys.length * 2)
    var i = 0
    while (i < pairKeys.length) {
      m.put(UTF8String.fromString(pairKeys(i)), pairLnPs(i)); i += 1
    }
    m
  }
  @transient lazy val lambda: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      lambdaKeys.length * 2)
    var i = 0
    while (i < lambdaKeys.length) {
      m.put(UTF8String.fromString(lambdaKeys(i)), lnLambdas(i)); i += 1
    }
    m
  }
}

sealed trait LmCeBase extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got $t")
  }
}

/** unigram_ce(text) → mean negative ln-prob per token (unrounded). */
case class UnigramCrossEntropy(child: Expression, words: Seq[String],
                               lnPs: Seq[Double], lnOov: Double)
    extends LmCeBase {
  @transient private lazy val table =
    new UnigramTable(words.toArray, lnPs.toArray, lnOov)
  override def nullSafeEval(v: Any): Any =
    LmKernel.unigramCe(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LmKernel.unigramCe($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramCrossEntropy =
    copy(child = newChild)
  override def prettyName: String = "unigram_ce"
}

/** bigram_ce(text) → stupid-backoff mean negative ln-prob (unrounded). */
case class BigramCrossEntropy(child: Expression, words: Seq[String],
                              lnPs: Seq[Double], lnOov: Double,
                              pairKeys: Seq[String], pairLnPs: Seq[Double],
                              lnAlpha: Double)
    extends LmCeBase {
  @transient private lazy val table = new BigramTable(
    new UnigramTable(words.toArray, lnPs.toArray, lnOov),
    pairKeys.toArray, pairLnPs.toArray, lnAlpha)
  override def nullSafeEval(v: Any): Any =
    LmKernel.bigramCe(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramTable", table,
      classOf[BigramTable].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LmKernel.bigramCe($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BigramCrossEntropy =
    copy(child = newChild)
  override def prettyName: String = "bigram_ce"
}

/** kn_ce(text) → interpolated Kneser–Ney mean neg ln-prob (unrounded). */
case class KnCrossEntropy(child: Expression, baseWords: Seq[String],
                          lnBases: Seq[Double], lnBaseOov: Double,
                          pairKeys: Seq[String], pairLnPs: Seq[Double],
                          lambdaKeys: Seq[String], lnLambdas: Seq[Double])
    extends LmCeBase {
  @transient private lazy val table = new KnTable(
    new UnigramTable(baseWords.toArray, lnBases.toArray, lnBaseOov),
    pairKeys.toArray, pairLnPs.toArray, lambdaKeys.toArray,
    lnLambdas.toArray)
  override def nullSafeEval(v: Any): Any =
    LmKernel.knCe(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("knTable", table, classOf[KnTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.LmKernel.knCe($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): KnCrossEntropy =
    copy(child = newChild)
  override def prettyName: String = "kn_ce"
}

object LmFunctions {
  def unigram_ce(text: Column, words: Seq[String], lnPs: Seq[Double],
                 lnOov: Double): Column =
    ColumnBridge.column(
      UnigramCrossEntropy(ColumnBridge.expression(text), words, lnPs, lnOov))
  def bigram_ce(text: Column, words: Seq[String], lnPs: Seq[Double],
                lnOov: Double, pairKeys: Seq[String], pairLnPs: Seq[Double],
                lnAlpha: Double): Column =
    ColumnBridge.column(
      BigramCrossEntropy(ColumnBridge.expression(text), words, lnPs, lnOov,
        pairKeys, pairLnPs, lnAlpha))
  def kn_ce(text: Column, baseWords: Seq[String], lnBases: Seq[Double],
            lnBaseOov: Double, pairKeys: Seq[String], pairLnPs: Seq[Double],
            lambdaKeys: Seq[String], lnLambdas: Seq[Double]): Column =
    ColumnBridge.column(
      KnCrossEntropy(ColumnBridge.expression(text), baseWords, lnBases,
        lnBaseOov, pairKeys, pairLnPs, lambdaKeys, lnLambdas))
}
