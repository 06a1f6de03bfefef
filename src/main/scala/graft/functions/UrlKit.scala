package graft.functions

/** Pure, deterministic URL canonicalization (SURVEY.md §2.2 P1).
  *
  * Re-expresses the reference's per-source URL normalization (g0v/news-diff
  * canonicalizes article URLs before keying its versions table; reference
  * tree empty this sandbox — see SURVEY.md §0, semantics per BASELINE.json
  * north_rule "URL canonicalization + 64-bit hashing") as a single pure
  * function usable from a Catalyst Expression with codegen.
  *
  * Guarantees (property-tested): idempotent — canonicalize(canonicalize(u))
  * == canonicalize(u); total — never throws, any garbage in → best-effort
  * string out; JVM-stable — no locale, no default-charset dependence.
  *
  * Steps (RFC 3986 §6 normalization + crawler conventions):
  *   1. trim; strip fragment
  *   2. default scheme http:// when missing; lowercase scheme
  *   3. lowercase host; strip userinfo; strip default port (80/443)
  *   4. path: resolve dot-segments (RFC 3986 §5.2.4), collapse duplicate
  *      slashes, empty path -> "/"
  *   5. uppercase %XX hex in path and query
  *   6. query: drop tracking params (utm_*, gclid, fbclid, ...), drop empty
  *      pairs, sort by (key, value); drop "?" when empty
  */
object UrlKit {

  private val TrackingParams: Set[String] = Set(
    "gclid", "fbclid", "igshid", "mc_cid", "mc_eid", "yclid", "msclkid",
    "ref", "ref_src", "spm", "_ga")

  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || TrackingParams.contains(key)

  def canonicalize(raw: String): String = {
    if (raw == null) return null
    var s = raw.trim
    if (s.isEmpty) return s
    // 1. fragment
    val hashIdx = s.indexOf('#')
    if (hashIdx >= 0) s = s.substring(0, hashIdx)
    // 2. scheme
    val schemeIdx = s.indexOf("://")
    var (scheme, rest) =
      if (schemeIdx > 0) (s.substring(0, schemeIdx).toLowerCase, s.substring(schemeIdx + 3))
      else ("http", s)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      scheme = "http"
    // 3. authority / path / query split
    var pathStart = rest.indexWhere(c => c == '/' || c == '?')
    if (pathStart < 0) pathStart = rest.length
    var authority = rest.substring(0, pathStart)
    val pathAndQuery = rest.substring(pathStart)
    // userinfo
    val atIdx = authority.lastIndexOf('@')
    if (atIdx >= 0) authority = authority.substring(atIdx + 1)
    authority = authority.toLowerCase
    // default port
    val colonIdx = authority.lastIndexOf(':')
    if (colonIdx >= 0) {
      val port = authority.substring(colonIdx + 1)
      if (port.isEmpty ||
          (scheme == "http" && port == "80") ||
          (scheme == "https" && port == "443"))
        authority = authority.substring(0, colonIdx)
    }
    // 4-6. path + query
    val qIdx = pathAndQuery.indexOf('?')
    val rawPath = if (qIdx >= 0) pathAndQuery.substring(0, qIdx) else pathAndQuery
    val rawQuery = if (qIdx >= 0) pathAndQuery.substring(qIdx + 1) else ""
    val path = upperPercent(normalizePath(rawPath))
    val query = normalizeQuery(rawQuery)
    val sb = new StringBuilder(scheme.length + authority.length + path.length + query.length + 4)
    sb.append(scheme).append("://").append(authority).append(path)
    if (query.nonEmpty) sb.append('?').append(query)
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments + duplicate-slash collapse. */
  private def normalizePath(p: String): String = {
    if (p.isEmpty) return "/"
    val segs = p.split("/", -1)
    val out = new scala.collection.mutable.ArrayBuffer[String](segs.length)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "" | "."  => // collapse // and /./
        case ".."      => if (out.nonEmpty) out.remove(out.length - 1)
        case seg       => out += seg
      }
      i += 1
    }
    val trailingSlash = p.endsWith("/") || p.endsWith("/.") || p.endsWith("/..")
    val body = out.mkString("/")
    if (body.isEmpty) "/"
    else if (trailingSlash) "/" + body + "/"
    else "/" + body
  }

  /** Uppercase hex digits of %XX escapes; leave everything else untouched. */
  private def upperPercent(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s
    val chars = s.toCharArray
    while (i >= 0 && i + 2 < chars.length) {
      val a = chars(i + 1); val b = chars(i + 2)
      if (isHex(a) && isHex(b)) {
        chars(i + 1) = Character.toUpperCase(a)
        chars(i + 2) = Character.toUpperCase(b)
      }
      i = s.indexOf('%', i + 1)
    }
    new String(chars)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def normalizeQuery(q: String): String = {
    if (q.isEmpty) return ""
    val kept = q.split("&", -1).iterator
      .filter(_.nonEmpty)
      .map(upperPercent)
      .filter { pair =>
        val eq = pair.indexOf('=')
        val key = if (eq >= 0) pair.substring(0, eq) else pair
        !isTracking(key.toLowerCase)
      }
      .toArray
    java.util.Arrays.sort(kept, java.util.Comparator.naturalOrder[String]())
    kept.mkString("&")
  }

  /** Host of an ALREADY-canonical URL (cheap split; no re-parse). */
  def hostOf(canon: String): String = {
    if (canon == null) return null
    val i = canon.indexOf("://")
    if (i < 0) return ""
    val rest = canon.substring(i + 3)
    var j = rest.indexWhere(c => c == '/' || c == '?')
    if (j < 0) j = rest.length
    rest.substring(0, j)
  }

  /** Path (incl. leading '/') of an ALREADY-canonical URL, sans query. */
  def pathOf(canon: String): String = {
    if (canon == null) return null
    val i = canon.indexOf("://")
    if (i < 0) return "/"
    val rest = canon.substring(i + 3)
    val slash = rest.indexOf('/')
    if (slash < 0) return "/"
    val q = rest.indexOf('?', slash)
    if (q < 0) rest.substring(slash) else rest.substring(slash, q)
  }
}
