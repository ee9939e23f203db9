package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for corpus-level dedup (SURVEY.md §2.11 — no
  * reference analog): a web-crawl corpus carries the same page under many
  * spellings (case-shifted hosts, `www.`, default ports, fragments,
  * tracking params, `index.html`, trailing slashes), and canonical-URL
  * dedup is the cheap first pass that runs before any content hashing.
  *
  * The rules, in order (deliberately conservative — nothing here can merge
  * two genuinely different resources):
  *   1. scheme and host lowercased; path/query case PRESERVED
  *      (paths are case-sensitive per RFC 3986 §6.2.2.1)
  *   2. leading `www.` stripped from the host (only when a dotted domain
  *      remains — `www.com` stays intact)
  *   3. default port stripped (`:80` for http, `:443` for https);
  *      ports above 65535 are malformed → NULL
  *   4. fragment dropped (never sent to the server)
  *   5. trailing `/index.html` / `/index.htm` and trailing slashes dropped
  *   6. tracking params dropped (`utm_*`, `gclid`, `fbclid`, `mc_cid`,
  *      `mc_eid`); survivors byte-sorted and rejoined
  *
  * Non-http(s) or unparseable input → NULL (the poisoning contract shared
  * with the other scalar functions; count nulls upstream if the malformed
  * rate matters). Scheme is preserved — http and https canonicals stay
  * distinct on purpose: whether a site serves identical content on both
  * is a content-hash question, not a URL question.
  */
object UrlFunctions {

  // deliberately excludes `ref` — on many sites it is a SEMANTIC,
  // content-selecting parameter (a branch, a record id), and dropping it
  // would merge genuinely different resources, violating the
  // conservative-rules contract above
  private val TrackingParams = Set("gclid", "fbclid", "mc_cid", "mc_eid")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val k = (if (eq >= 0) param.substring(0, eq) else param).toLowerCase(Locale.ROOT)
    k.startsWith("utm_") || TrackingParams.contains(k)
  }

  /** Static entry for both `eval` and generated code. Null in/out. */
  def canonicalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    val s = u.toString.trim
    val si = s.indexOf("://")
    if (si <= 0) return null
    val scheme = s.substring(0, si).toLowerCase(Locale.ROOT)
    if (scheme != "http" && scheme != "https") return null
    var rest = s.substring(si + 3)
    val hi = rest.indexOf('#')
    if (hi >= 0) rest = rest.substring(0, hi)
    val qi = rest.indexOf('?')
    val query = if (qi >= 0) rest.substring(qi + 1) else ""
    val hostPath = if (qi >= 0) rest.substring(0, qi) else rest
    val pi = hostPath.indexOf('/')
    val hostPort =
      (if (pi >= 0) hostPath.substring(0, pi) else hostPath).toLowerCase(Locale.ROOT)
    var path = if (pi >= 0) hostPath.substring(pi) else ""
    var host = hostPort
    var port = -1
    val ci = hostPort.lastIndexOf(':')
    if (ci >= 0) {
      val p = hostPort.substring(ci + 1)
      if (p.isEmpty || p.length > 5 || !p.forall(c => c >= '0' && c <= '9')) return null
      port = p.toInt
      if (port > 65535) return null
      host = hostPort.substring(0, ci)
    }
    if (host.isEmpty || host.startsWith(".") || host.endsWith(".") ||
        host.contains("..") ||
        !host.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
          c == '.' || c == '-')) return null
    // strip `www.` only when what remains is itself a dotted domain —
    // `www.com` is a registrable domain whose `com` must not collide
    // with other hosts
    if (host.startsWith("www.") && host.indexOf('.', 4) > 0) host = host.substring(4)
    val defPort = if (scheme == "http") 80 else 443
    val portPart = if (port < 0 || port == defPort) "" else ":" + port
    // fixed point: stacked `/index.html/` layers must all strip, or
    // canonicalize(canonicalize(u)) != canonicalize(u) (property-tested)
    var shrinking = true
    while (shrinking) {
      shrinking = false
      if (path.endsWith("/index.html")) { path = path.substring(0, path.length - 10); shrinking = true }
      else if (path.endsWith("/index.htm")) { path = path.substring(0, path.length - 9); shrinking = true }
      while (path.endsWith("/")) { path = path.substring(0, path.length - 1); shrinking = true }
    }
    val keep = query.split('&').filter(p => p.nonEmpty && !isTracking(p)).sorted
    val qPart = if (keep.isEmpty) "" else "?" + keep.mkString("&")
    UTF8String.fromString(scheme + "://" + host + portPart + path + qPart)
  }
}

/** Codegen'd canonical-URL expression. Nullable even over non-null input
  * (malformed → NULL).
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"url_canonicalize requires STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_canonicalize"

  override def nullSafeEval(input: Any): Any =
    UrlFunctions.canonicalize(input.asInstanceOf[UTF8String])

  // one static call per row, inside WholeStageCodegen; the result itself
  // can be null, so isNull is re-derived from the call result
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.functions.UrlFunctions.canonicalize($c);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
