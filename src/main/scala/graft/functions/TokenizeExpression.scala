package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary lookup for greedy subword tokenization, bucketed by
  * codepoint length. Built once on the driver, shipped to executors
  * inside the expression (codegen references it as a constant).
  *
  * Entries of length 1 are redundant by design: every single
  * codepoint is an implicit base-alphabet token (the fallback), so
  * the tokenizer is TOTAL — any input string tokenizes, vocabulary
  * coverage only changes granularity. That is the property BPE-style
  * vocabularies rely on.
  */
final class VocabTable(val vocab: Array[String], requestedMaxLen: Int)
    extends Serializable {
  /** Effective scan bound: probing lengths beyond the longest entry
    * is pure waste, and sizing the bucket array by the raw request
    * would let `greedy_tokenize(s, array('ab'), 100000000)` allocate
    * 100M hash sets (or overflow on Int.MaxValue + 1).
    */
  val maxLen: Int = math.max(1, math.min(requestedMaxLen,
    vocab.map(v => v.codePointCount(0, v.length)).foldLeft(1)(math.max)))
  @transient lazy val byLen: Array[java.util.HashSet[UTF8String]] = {
    val arr = Array.fill(maxLen + 1)(new java.util.HashSet[UTF8String]())
    vocab.foreach { v =>
      val u = UTF8String.fromString(v)
      val n = u.numChars()
      if (n >= 2 && n <= maxLen) arr(n).add(u)
    }
    arr
  }
}

/** Greedy longest-match subword tokenization (SURVEY §2.D34).
  *
  * At each position the longest vocabulary entry (maxLen down to 2
  * codepoints) wins; no entry → the single codepoint itself. One pass
  * over the string, hash-set probes per position — the WordPiece-style
  * scan, as a native kernel. The composable twin
  * ([[TokenizeKernel.greedySubwordsHof]]) is the same recurrence as a
  * HOF fold, kept as the oracle mirror and property-test witness
  * (interpreted lambda eval makes it the slow path — same story as
  * the other kernels).
  */
object TokenizeKernel {

  def tokenize(w: UTF8String, t: VocabTable): GenericArrayData = {
    val out = new java.util.ArrayList[Any]()
    tokenizeWordInto(w, t, out)
    new GenericArrayData(out.toArray)
  }

  private def tokenizeWordInto(w: UTF8String, t: VocabTable,
                               out: java.util.ArrayList[Any]): Unit = {
    val n = w.numChars()
    var i = 0
    while (i < n) {
      var tok: UTF8String = null
      var m = math.min(t.maxLen, n - i)
      while (m >= 2 && tok == null) {
        val cand = w.substring(i, i + m)
        if (t.byLen(m).contains(cand)) tok = cand
        m -= 1
      }
      if (tok == null) tok = w.substring(i, i + 1)
      out.add(tok)
      i += tok.numChars()
    }
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Whole-document tokenization: split on \s+ runs (ASCII bytes, same
    * boundaries as `split(trim(text), "\\s+")`), greedy-tokenize each
    * word, emit the flat subword stream. ONE kernel call per document
    * — the per-word face wrapped in `transform`/`aggregate` HOFs would
    * drag the entire projection into interpreted lambda eval (HOFs
    * don't codegen), which is exactly what this entry point avoids.
    */
  def tokenizeText(s: UTF8String, t: VocabTable): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        val word = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i))
        tokenizeWordInto(word, t, out)
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** The same greedy recurrence as a pure-column fold over positions:
    * acc = (tokens, skip); a position inside the previous match only
    * decrements skip, otherwise the longest vocab prefix (checked
    * maxLen→2 via a coalesce chain, single codepoint fallback) is
    * emitted. Deterministic string/integer ops only — mirrorable in
    * ANSI-ish SQL, which is how the DuckDB oracle checks the kernel.
    */
  def greedySubwordsHof(word: Column, vocab: Seq[String], maxLen: Int): Column = {
    // codepoint count, not UTF-16 length: VocabTable buckets entries by
    // codepoints, so a single supplementary-plane-codepoint entry (two
    // UTF-16 units) must be dropped here too or the twin would keep a
    // vocab word the kernel ignores
    val vocabLit = array(
      vocab.filter(v => v.codePointCount(0, v.length) >= 2).map(lit): _*)
    val matchAt = (i: Column) => coalesce(
      ((maxLen to 2 by -1).map { l =>
        val cand = word.substr(i, lit(l))
        when(array_contains(vocabLit, cand), cand)
      } :+ word.substr(i, lit(1))): _*)
    val folded = aggregate(
      sequence(lit(1), length(word)),
      struct(array().cast("array<string>").as("toks"), lit(0).as("skip")),
      (acc, i) => {
        val m = matchAt(i)
        struct(
          when(acc.getField("skip") > 0, acc.getField("toks"))
            .otherwise(concat(acc.getField("toks"), array(m))).as("toks"),
          when(acc.getField("skip") > 0, acc.getField("skip") - 1)
            .otherwise(length(m) - 1).as("skip"))
      },
      acc => acc.getField("toks"))
    // sequence(1, 0) counts DOWN ([1, 0]) — an empty word must yield
    // [] like the kernel, not two folds over empty substrings (the
    // same pitfall TextFunctions.shingles guards)
    when(length(word) > 0, folded).otherwise(array().cast("array<string>"))
  }

  /** Column face over the native kernel (single word). */
  def greedySubwords(word: Column, vocab: Seq[String], maxLen: Int = 3): Column =
    ColumnBridge.column(
      GreedyTokenize(ColumnBridge.expression(word), vocab, maxLen))

  /** Column face over the whole-document kernel (flat subword stream,
    * one codegen call per row).
    */
  def greedySubwordsText(text: Column, vocab: Seq[String],
                         maxLen: Int = 3): Column =
    ColumnBridge.column(
      GreedyTokenizeText(ColumnBridge.expression(text), vocab, maxLen))
}

/** Shared checks/codegen for the two tokenizer expressions: they
  * differ only in the kernel entry point. Keeping the type-check in
  * one place means a future guard can't silently miss one of them.
  */
sealed trait GreedyTokenizeBase extends UnaryExpression {
  def vocab: Seq[String]
  def maxLen: Int
  /** static kernel method invoked from both eval and generated code */
  protected def kernelMethod: String
  @transient protected lazy val table = new VocabTable(vocab.toArray, maxLen)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if maxLen >= 2 && vocab.nonEmpty =>
      if (vocab.contains(null)) TypeCheckResult.TypeCheckFailure(
        s"$prettyName: vocab entries must be non-null")
      else {
        // an entry longer than maxLen could never match — refuse
        // loudly instead of silently tokenizing without it
        val tooLong = vocab.filter(v => v.codePointCount(0, v.length) > maxLen)
        if (tooLong.isEmpty) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName: vocab entries longer than maxLen=$maxLen: " +
            tooLong.mkString(", "))
      }
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, non-empty vocab, maxLen>=2; got $t")
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabTable", table,
      classOf[VocabTable].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenizeKernel.$kernelMethod($c, $ref)")
  }
}

/** greedy_tokenize(string) → array<string> of subword tokens. */
case class GreedyTokenize(child: Expression, vocab: Seq[String], maxLen: Int)
    extends GreedyTokenizeBase {
  override protected def kernelMethod: String = "tokenize"
  override def nullSafeEval(v: Any): Any =
    TokenizeKernel.tokenize(v.asInstanceOf[UTF8String], table)
  override protected def withNewChildInternal(newChild: Expression): GreedyTokenize =
    copy(child = newChild)
  override def prettyName: String = "greedy_tokenize"
}

/** greedy_tokenize_text(string) → flat array<string> of subword tokens
  * across all \s+-separated words of the document.
  */
case class GreedyTokenizeText(child: Expression, vocab: Seq[String], maxLen: Int)
    extends GreedyTokenizeBase {
  override protected def kernelMethod: String = "tokenizeText"
  override def nullSafeEval(v: Any): Any =
    TokenizeKernel.tokenizeText(v.asInstanceOf[UTF8String], table)
  override protected def withNewChildInternal(newChild: Expression): GreedyTokenizeText =
    copy(child = newChild)
  override def prettyName: String = "greedy_tokenize_text"
}
