package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as a single native pass (SURVEY §2.D2-D4).
  *
  * Semantics identical to `split(trim(text), "\\s+")` + sliding
  * concat_ws(" ") — but the HOF formulation re-evaluates the split
  * subtree per element access in interpreted lambda eval (measured 8s
  * for 5k docs at sf0.1, ~160 regex splits per doc). This expression
  * tokenizes the UTF-8 bytes once and emits shingles directly.
  *
  * Whitespace = Java regex \s = [ \t\n\x0B\f\r] — ASCII-only byte
  * comparison, valid on UTF-8 (continuation bytes are ≥ 0x80).
  */
object ShingleKernel {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def shingles(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    // token boundaries
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isWs(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    var t = 0
    while (t <= nTok - n) {
      var size = n - 1 // separator spaces
      var j = 0
      while (j < n) { size += ends.get(t + j) - starts.get(t + j); j += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val l = ends.get(t + j) - starts.get(t + j)
        System.arraycopy(bytes, starts.get(t + j), buf, pos, l)
        pos += l
        j += 1
      }
      out(t) = UTF8String.fromBytes(buf)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** WordShingles(string, n) → array<string> of word n-grams. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs string and n>0, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    ShingleKernel.shingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object ShingleFunctions {
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
