package graft.operators

import java.util.Locale

import org.apache.spark.unsafe.types.UTF8String

/** URL parsing / canonicalization — the crawl-pipeline precursor to
  * URL-level dedup and per-domain accounting (frontier dedup happens on
  * the CANONICAL url; per-domain quotas/robots decisions key on the
  * registrable domain). Pure integer/string arithmetic, deterministic,
  * oracle-replayable; exposed as codegen'd Catalyst expressions in
  * [[graft.plans.UrlExprs]].
  *
  * Canonical form (RFC 3986 §6 normalizations):
  *   - scheme and host lowercased;
  *   - default ports stripped (http:80, https:443, ftp:21);
  *   - fragment dropped, empty query dropped;
  *   - dot-segments resolved (§5.2.4), empty path → "/";
  *   - percent-encodings of UNRESERVED characters decoded, all other
  *     percent triplets uppercased (%3a → %3A).
  *
  * Unparsable inputs (no scheme://, empty host, malformed port) yield
  * None — the expressions surface that as SQL NULL, the engine's
  * null-on-fail conversion discipline.
  */
object Url {

  final case class Parts(scheme: String, userinfo: String, host: String,
                         port: Int, path: String, query: String,
                         fragment: String)

  /** Minimal RFC 3986 split for absolute hierarchical URLs. */
  def parse(url: String): Option[Parts] = {
    val si = url.indexOf("://")
    if (si <= 0) return None
    val scheme = url.substring(0, si)
    if (!scheme.charAt(0).isLetter ||
        !scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' ||
          c == '.')) return None
    val rest0 = url.substring(si + 3)
    var end = 0
    while (end < rest0.length && rest0.charAt(end) != '/' &&
           rest0.charAt(end) != '?' && rest0.charAt(end) != '#') end += 1
    val auth = rest0.substring(0, end)
    val rest = rest0.substring(end)
    if (auth.isEmpty) return None
    val at = auth.lastIndexOf('@')
    val userinfo = if (at < 0) "" else auth.substring(0, at)
    val hostport = if (at < 0) auth else auth.substring(at + 1)
    if (hostport.isEmpty) return None
    var host = ""
    var port = -1
    if (hostport.charAt(0) == '[') {
      // IPv6 literal keeps its brackets
      val cb = hostport.indexOf(']')
      if (cb < 0) return None
      host = hostport.substring(0, cb + 1)
      val p = hostport.substring(cb + 1)
      if (p.nonEmpty) {
        if (!p.startsWith(":")) return None
        if (p.length > 1) parsePort(p.substring(1)) match {
          case Some(v) => port = v
          case None => return None
        }
      }
    } else {
      val ci = hostport.lastIndexOf(':')
      if (ci < 0) host = hostport
      else {
        host = hostport.substring(0, ci)
        val p = hostport.substring(ci + 1)
        if (p.nonEmpty) parsePort(p) match {
          case Some(v) => port = v
          case None => return None
        }
      }
    }
    if (host.isEmpty) return None
    val hi = rest.indexOf('#')
    val pq = if (hi < 0) rest else rest.substring(0, hi)
    val fragment = if (hi < 0) "" else rest.substring(hi + 1)
    val qi = pq.indexOf('?')
    val path = if (qi < 0) pq else pq.substring(0, qi)
    val query = if (qi < 0) "" else pq.substring(qi + 1)
    Some(Parts(scheme, userinfo, host, port, path, query, fragment))
  }

  private def parsePort(s: String): Option[Int] =
    if (s.nonEmpty && s.length <= 5 && s.forall(_.isDigit)) {
      val v = s.toInt
      if (v <= 65535) Some(v) else None
    } else None

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(p: String): String = {
    var in = p
    val out = new StringBuilder
    def trimLastSeg(): Unit = {
      val i = out.lastIndexOf("/")
      out.setLength(if (i < 0) 0 else i)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { trimLastSeg(); in = "/" + in.substring(4) }
      else if (in == "/..") { trimLastSeg(); in = "/" }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, next)); in = in.substring(next) }
      }
    }
    out.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** Decode %XX for unreserved characters; uppercase surviving
    * triplets; malformed '%' sequences pass through verbatim.
    */
  def pctNormalize(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) &&
          isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (isUnreserved(v)) b.append(v.toChar)
        else b.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  def canonicalize(url: String): Option[String] = parse(url.trim).map { p =>
    val scheme = p.scheme.toLowerCase(Locale.ROOT)
    val host = p.host.toLowerCase(Locale.ROOT)
    val defPort = scheme match {
      case "http" => 80; case "https" => 443; case "ftp" => 21; case _ => -1
    }
    val port = if (p.port == defPort) -1 else p.port
    val path0 = pctNormalize(removeDotSegments(p.path))
    val path = if (path0.isEmpty) "/" else path0
    val sb = new StringBuilder(scheme).append("://")
    if (p.userinfo.nonEmpty) sb.append(p.userinfo).append('@')
    sb.append(host)
    if (port >= 0) sb.append(':').append(port)
    sb.append(path)
    if (p.query.nonEmpty) sb.append('?').append(pctNormalize(p.query))
    sb.toString
  }

  def hostOf(url: String): Option[String] =
    parse(url.trim).map(_.host.toLowerCase(Locale.ROOT))

  /** Multi-label public suffixes this heuristic recognizes — a small
    * DOCUMENTED subset of the public-suffix list (the full list is a
    * data file, not an algorithm; pipelines that need it exactly load
    * it as a broadcast lookup table and join).
    */
  private val multiSuffix = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "co.za", "com.ar", "com.tr", "com.sg")

  /** Registrable domain: last two host labels, or last three when the
    * final two are a recognized multi-label suffix; IP literals and
    * single-label hosts return whole.
    */
  def registrableDomain(url: String): Option[String] = hostOf(url).map { h =>
    if (h.startsWith("[")) h
    else {
      val labels = h.split('.')
      val isIpv4 = labels.length == 4 &&
        labels.forall(l => l.nonEmpty && l.forall(_.isDigit))
      if (labels.length <= 2 || isIpv4) h
      else {
        val last2 = labels(labels.length - 2) + "." + labels(labels.length - 1)
        if (multiSuffix.contains(last2))
          labels(labels.length - 3) + "." + last2
        else last2
      }
    }
  }

  /** True when the reference starts with a scheme (RFC 3986 §4.1: a
    * ':' inside the first segment, preceded by a valid scheme name).
    */
  private def hasScheme(ref: String): Boolean = {
    val ci = ref.indexOf(':')
    if (ci <= 0) false
    else {
      val stop = ref.indexWhere(c => c == '/' || c == '?' || c == '#')
      if (stop >= 0 && stop < ci) false
      else {
        val s = ref.substring(0, ci)
        s.charAt(0).isLetter && s.forall(c =>
          c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
      }
    }
  }

  /** RFC 3986 §5.2 reference resolution against an absolute base, then
    * canonicalization — the href→frontier step of a crawl pipeline.
    * Absolute references resolve on their own; protocol-relative
    * (`//host/p`) take the base scheme; rooted, relative, query-only
    * and fragment-only references merge per §5.2.2/§5.2.3. Yields None
    * when the base is unparsable or the reference is a non-hierarchical
    * URI (`mailto:`, `javascript:`, `tel:` — no `://`), which the
    * expression surfaces as NULL so crawl filters drop them.
    */
  def resolve(base: String, ref0: String): Option[String] = {
    val ref = ref0.trim
    if (hasScheme(ref)) return canonicalize(ref)
    parse(base.trim).flatMap { b =>
      if (ref.startsWith("//")) canonicalize(b.scheme + ":" + ref)
      else {
        val hi = ref.indexOf('#')
        val pq = if (hi < 0) ref else ref.substring(0, hi)
        val qi = pq.indexOf('?')
        val refPath = if (qi < 0) pq else pq.substring(0, qi)
        val refQuery = if (qi < 0) "" else pq.substring(qi + 1)
        val (path, query) =
          if (refPath.isEmpty && qi < 0) (b.path, b.query)
          else if (refPath.isEmpty) (b.path, refQuery)
          else if (refPath.charAt(0) == '/') (refPath, refQuery)
          else {
            val merged =
              if (b.path.isEmpty) "/" + refPath
              else b.path.substring(0, b.path.lastIndexOf('/') + 1) + refPath
            (merged, refQuery)
          }
        val sb = new StringBuilder(b.scheme).append("://")
        if (b.userinfo.nonEmpty) sb.append(b.userinfo).append('@')
        sb.append(b.host)
        if (b.port >= 0) sb.append(':').append(b.port)
        sb.append(path)
        if (query.nonEmpty) sb.append('?').append(query)
        canonicalize(sb.toString)
      }
    }
  }

  // ---- UTF8String entry points for the codegen'd expressions ----

  def canonicalUtf8(u: UTF8String): UTF8String =
    canonicalize(u.toString).map(UTF8String.fromString).orNull

  def hostUtf8(u: UTF8String): UTF8String =
    hostOf(u.toString).map(UTF8String.fromString).orNull

  def domainUtf8(u: UTF8String): UTF8String =
    registrableDomain(u.toString).map(UTF8String.fromString).orNull

  def resolveUtf8(base: UTF8String, ref: UTF8String): UTF8String =
    resolve(base.toString, ref.toString).map(UTF8String.fromString).orNull
}
