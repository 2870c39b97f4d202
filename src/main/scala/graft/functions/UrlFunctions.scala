package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 URL canonicalization (SURVEY §2 D128) — the crawl-stage
  * normalizer the corpus family runs BEFORE URL-level dedup: two
  * syntactic spellings of the same resource must map to one canonical
  * string so keep-best-per-URL sees them as one group.
  *
  * Normalization steps (RFC 3986 §6.2.2 syntax-based normalization +
  * the standard tracker-parameter strip):
  *   1. fragment dropped (everything from the first `#` — §3.5: the
  *      fragment is client-side only, never sent to the origin);
  *   2. scheme and host lowercased (§6.2.2.1 case normalization;
  *      userinfo, path and query stay case-sensitive);
  *   3. default port stripped — `:80` for http, `:443` for https, and
  *      a bare trailing `:` always (§6.2.3 scheme-based);
  *   4. percent-encoding normalized in path and query (§6.2.2.2): a
  *      `%XX` whose octet is UNRESERVED (ALPHA / DIGIT / `-` `.` `_`
  *      `~`, §2.3) is decoded; any other valid `%XX` keeps its
  *      encoding with the hex digits UPPERCASED; a `%` not followed
  *      by two hex digits is left verbatim;
  *   5. `utm_*` query parameters dropped (name match is
  *      case-insensitive, after percent-normalization); surviving
  *      parameters keep their original ORDER (RFC 3986 assigns no
  *      semantics to query ordering, so reordering could merge URLs a
  *      strict origin distinguishes — we only delete);
  *   6. empty path with a non-empty authority → `/` (§6.2.3).
  *
  * OUT OF SCOPE (documented, deliberate): dot-segment removal
  * (needs the §5.2.4 loop and appears in crawl frontiers, not in
  * canonical link graphs), IDN/punycode, and scheme whitelisting.
  * A string without a `scheme://` prefix is returned fragment-stripped
  * but otherwise untouched (it is not a hierarchical URL).
  *
  * Why a custom Expression: one tight pass over the string inside
  * whole-stage codegen (no regex backtracking, no UDF SerDe); at
  * 100 TB the canonicalizer is a narrow projection fused into the
  * scan. The DuckDB oracle replays the same semantics INDEPENDENTLY
  * via regexp splitting + per-token list transforms (see
  * OracleSqlD `url_dedup`).
  */
object UrlKernels {

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  /** §6.2.2.2: decode unreserved `%XX`, uppercase the rest. */
  private[graft] def percentNorm(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** ASCII-only lowercase (scheme/host are ASCII in valid URLs; a
    * locale-sensitive toLowerCase would be a correctness bug — the
    * Turkish-I problem).
    */
  private def asciiLower(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    sb.toString
  }

  private def dropUtm(query: String): String = {
    val parts = query.split("&", -1)
    val sb = new java.lang.StringBuilder(query.length)
    var k = 0
    while (k < parts.length) {
      val p = parts(k)
      val name = {
        val eq = p.indexOf('=')
        asciiLower(if (eq >= 0) p.substring(0, eq) else p)
      }
      if (p.nonEmpty && !name.startsWith("utm_")) {
        if (sb.length > 0) sb.append('&')
        sb.append(p)
      }
      k += 1
    }
    sb.toString
  }

  def canonicalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    var s = u.toString
    // 1. fragment
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    // hierarchical split: scheme://authority[/path][?query]
    val ss = s.indexOf("://")
    if (ss <= 0) return UTF8String.fromString(s)
    val scheme = s.substring(0, ss)
    var ok = scheme.nonEmpty && {
      val c0 = scheme.charAt(0)
      (c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z')
    }
    var i = 1
    while (ok && i < scheme.length) {
      val c = scheme.charAt(i)
      ok = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      i += 1
    }
    if (!ok) return UTF8String.fromString(s)
    val rest = s.substring(ss + 3)
    val slash = rest.indexOf('/')
    val qm0 = rest.indexOf('?')
    val authEnd =
      if (slash < 0 && qm0 < 0) rest.length
      else if (slash < 0) qm0
      else if (qm0 < 0) slash
      else math.min(slash, qm0)
    var auth = rest.substring(0, authEnd)
    var tail = rest.substring(authEnd) // starts with '/' or '?' or empty
    // 2-3. lowercase host, strip default/empty port (userinfo verbatim)
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    val hostPort = if (at >= 0) auth.substring(at + 1) else auth
    val lscheme = asciiLower(scheme)
    val colon = hostPort.lastIndexOf(':')
    auth = userinfo + {
      if (colon >= 0 &&
          hostPort.substring(colon + 1).forall(c => c >= '0' && c <= '9')) {
        val port = hostPort.substring(colon + 1)
        val host = asciiLower(hostPort.substring(0, colon))
        if (port.isEmpty || (lscheme == "http" && port == "80") ||
            (lscheme == "https" && port == "443")) host
        else host + ":" + port
      } else asciiLower(hostPort) // no port (or IPv6-ish tail: verbatim case-lowered)
    }
    // 4-6. path + query normalization
    val qm = tail.indexOf('?')
    var path = if (qm >= 0) tail.substring(0, qm) else tail
    var query = if (qm >= 0) tail.substring(qm + 1) else null
    path = percentNorm(path)
    if (path.isEmpty) path = "/"
    if (query != null) {
      query = dropUtm(percentNorm(query))
      if (query.isEmpty) query = null
    }
    UTF8String.fromString(
      lscheme + "://" + auth + path +
        (if (query == null) "" else "?" + query))
  }
}

/** canonical_url(string) → string (see [[UrlKernels.canonicalize]]). */
case class CanonicalUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"canonical_url needs string, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    UrlKernels.canonicalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlKernels.canonicalize($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
  override def prettyName: String = "canonical_url"
}

object UrlFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API for [[CanonicalUrl]]. */
  def canonical_url(c: Column): Column =
    ColumnBridge.column(CanonicalUrl(ColumnBridge.expression(c)))

  /** Register `canonical_url` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "canonical_url",
      exprs => CanonicalUrl(exprs(0)))
}
