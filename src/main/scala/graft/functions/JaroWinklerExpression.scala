package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990) as a native Catalyst
  * expression — the record-linkage string metric D32's
  * deletion-neighborhood can't express (it measures edit COUNT;
  * Jaro-Winkler measures positional agreement with a common-prefix
  * bonus, the convention for person/entity names since the Census
  * deduplication work it was built for).
  *
  * Standard semantics, pinned to the same convention DuckDB ships
  * (which is how the oracle can be its BUILT-IN
  * `jaro_winkler_similarity`): match window ⌊max(|a|,|b|)/2⌋−1,
  * transpositions halved, prefix bonus up to 4 chars at scale 0.1
  * applied only when jaro > 0.7 (the boost threshold), empty strings
  * score 0. Operates on Unicode code points.
  *
  * Why a custom Expression: the similarity runs inside blocked
  * self-joins (entity resolution) — a codegen kernel keeps the pair
  * loop inside whole-stage codegen with zero boxing; the O(|a|·|b|)
  * window scan is the algorithm's intrinsic cost and pairs are
  * block-bounded by the caller.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two strings, got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.JaroWinkler.similarity(" +
        s"$a.toString(), $b.toString());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** The shared interpreted/codegen kernel (code points). */
  def similarity(sa: String, sb: String): Double = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    if (a.length == 0 || b.length == 0) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val aMatch = new Array[Boolean](a.length)
    val bMatch = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mD = m.toDouble
    val jaro = (mD / a.length + mD / b.length + (mD - t / 2) / mD) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(a.length, b.length)) &&
      a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Column API for [[JaroWinkler]]. */
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `jaro_winkler` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1)))
}
