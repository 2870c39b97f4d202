package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon byte entropy (SURVEY §2.D95) as a native Catalyst
  * expression — the compressibility proxy curation pipelines cut on:
  * boilerplate/repetition sits low (few distinct bytes dominate),
  * random or binary-ish junk sits high (flat byte histogram), natural
  * prose lands in a stable mid band (~4–5 bits for English).
  *
  * Contract: H = Σ −(c_b/n)·(ln(c_b/n)/ln 2) over the UTF-8 BYTE
  * histogram, terms folded in ASCENDING byte value — a pinned
  * left-fold, so the double sum is partition-free and replayable by
  * any engine that can order the histogram (the DuckDB oracle
  * mirrors term order and the ln/ln2 composition; the single libm
  * `ln` ulp is absorbed by the query face's 6-dp rounding, the
  * BM25/LM oracle argument). Bytes (not code points) make the
  * contract total for ANY input without surrogate/normalization
  * caveats; empty strings return 0.
  *
  * Why a custom Expression: [[doGenCode]] emits one tight Java loop
  * over a stack int[256] — whole-stage codegen inlines it into the
  * scan (no boxing, no HOF fence, no row amplification: the naive
  * explode-chars formulation shuffles corpus×len rows to count what
  * a per-row histogram reads off the scan for free).
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_entropy needs a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    java.lang.Double.valueOf(ByteEntropy.entropyOf(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.ByteEntropy.entropyOf($c.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)
  override def prettyName: String = "byte_entropy"
}

object ByteEntropy {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  // division by the ln(2) CONSTANT (not multiply-by-reciprocal): both
  // engines hold the same nearest-double of ln 2, so the composed
  // ln(p)/ln(2) differs only by the ln(p) ulp
  private val Ln2 = math.log(2.0)

  /** The shared interpreted/codegen kernel: histogram + pinned
    * ascending-byte left-fold. Public static so generated code can
    * call it (one JIT-hot method beats inlined source here — the
    * histogram loop is branch-free either way).
    */
  def entropyOf(bytes: Array[Byte]): Double = {
    val hist = new Array[Int](256)
    var i = 0
    while (i < bytes.length) {
      hist(bytes(i) & 0xff) += 1
      i += 1
    }
    val n = bytes.length.toDouble
    var h = 0.0
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        val p = c / n
        h += -(p * (math.log(p) / Ln2))
      }
      b += 1
    }
    h
  }

  /** Column API for [[ByteEntropy]]. */
  def byte_entropy(c: Column): Column =
    ColumnBridge.column(ByteEntropy(ColumnBridge.expression(c)))

  /** Register `byte_entropy` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "byte_entropy",
      exprs => ByteEntropy(exprs.head))
}
