package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint (SURVEY §2.D11) as a native Catalyst expression.
  *
  * Rolling polynomial hash over the UTF-8 bytes:
  * h₀=0, hᵢ = (hᵢ₋₁·31 + bᵢ) mod 1e9+7.
  *
  * Why a custom Expression and not a UDF: [[doGenCode]] emits a tight
  * Java loop that whole-stage codegen inlines into the scan stage — no
  * boxing, no SerDe, no codegen fence. The modulus keeps the value
  * reproducible in any engine with 64-bit ints (the DuckDB oracle
  * recomputes it with list_reduce).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint needs a string column, got ${child.dataType}")

  private val MOD = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xffL)) % MOD
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xffL)) % ${MOD}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
  override def prettyName: String = "rolling_fingerprint"
}

object Fingerprint {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API for [[RollingFingerprint]]. */
  def rolling_fingerprint(c: Column): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(c)))

  /** Register `rolling_fingerprint` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "rolling_fingerprint",
      exprs => RollingFingerprint(exprs.head))
}
