package graft.functions

import org.apache.spark.unsafe.types.UTF8String

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

  /** Zero-allocation hot-path entry for the Catalyst expression: if the URL
    * is ALREADY canonical (the common case for re-crawled frontiers), return
    * the input UTF8String reference untouched — no toString, no new String,
    * no new UTF8String. Otherwise fall back to the reference implementation.
    *
    * Allocation is the measured scaling bottleneck in this sandbox (see
    * BENCH/BASELINE.md): the JVM's anon-page commit path serializes under
    * concurrency, so rows that allocate nothing scale best.
    *
    * Correctness contract (property-tested in UrlKitSpec):
    *   isCanonical(u)  =>  canonicalize(u.toString) == u.toString
    * i.e. the fast path accepts ONLY inputs the slow path maps to
    * themselves; any doubt (non-ASCII authority, percent-escapes, odd
    * ports...) bails to the slow path.
    */
  def canonicalizeU8(u: UTF8String): UTF8String = {
    if (u == null) return null
    if (isCanonical(u)) u else UTF8String.fromString(canonicalize(u.toString))
  }

  /** Single byte-wise pass deciding "slow path would return this unchanged".
    * Conservative: returns false on anything it is not POSITIVE about.
    */
  def isCanonical(u: UTF8String): Boolean = {
    val n = u.numBytes
    if (n == 0) return true // canonicalize("") == ""
    @inline def b(j: Int): Int = u.getByte(j) & 0xff
    // trim would strip leading/trailing chars <= ' '
    if (b(0) <= ' ' || b(n - 1) <= ' ') return false
    // scheme must be exactly http:// or https:// (lowercase)
    if (n < 8 || b(0) != 'h' || b(1) != 't' || b(2) != 't' || b(3) != 'p') return false
    var https = false
    var i =
      if (b(4) == ':' && b(5) == '/' && b(6) == '/') 7
      else if (b(4) == 's' && n >= 9 && b(5) == ':' && b(6) == '/' && b(7) == '/') {
        https = true; 8
      } else return false
    // authority: lowercase ascii letters/digits/.-_ plus at most one ':'
    // with a valid non-default port; anything else (uppercase, '@',
    // non-ASCII, IPv6 brackets) -> slow path
    val authStart = i
    var colonIdx = -1
    var cont = true
    while (i < n && cont) {
      val c = b(i)
      if (c == '/' || c == '?') cont = false
      else {
        if (c == ':') { if (colonIdx >= 0) return false; colonIdx = i }
        else if (!((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
          c == '.' || c == '-' || c == '_')) return false
        i += 1
      }
    }
    if (i == authStart || b(authStart) == ':') return false
    if (colonIdx >= 0) {
      val pStart = colonIdx + 1
      if (i <= pStart) return false // empty port is stripped by the slow path
      var j = pStart
      while (j < i) { val c = b(j); if (c < '0' || c > '9') return false; j += 1 }
      val plen = i - pStart
      if (!https && plen == 2 && b(pStart) == '8' && b(pStart + 1) == '0') return false
      if (https && plen == 3 && b(pStart) == '4' && b(pStart + 1) == '4' && b(pStart + 2) == '3')
        return false
    }
    // path: must exist ("/..."), no '//', no '.'/'..' segments, no '%',
    // no '#'; bytes >= 0x80 are fine (slow path passes them through)
    if (i >= n || b(i) != '/') return false // empty path -> slow appends "/"
    var qStart = -1
    var prevSlash = true
    i += 1
    while (i < n && qStart < 0) {
      val c = b(i)
      if (c == '#' || c == '%') return false
      else if (c == '?') qStart = i
      else if (c == '/') {
        if (prevSlash) return false
        prevSlash = true
      } else {
        if (prevSlash && c == '.') {
          val n1 = if (i + 1 < n) b(i + 1) else -1
          if (n1 == '/' || n1 == '?' || n1 == -1) return false // "." segment
          if (n1 == '.') {
            val n2 = if (i + 2 < n) b(i + 2) else -1
            if (n2 == '/' || n2 == '?' || n2 == -1) return false // ".." segment
          }
        }
        prevSlash = false
      }
      i += 1
    }
    if (qStart < 0) return true
    // query: ASCII only, no '%'/'#', non-empty '&'-separated pairs, no
    // tracking keys, pairs in natural sorted order (what the slow path emits)
    if (qStart == n - 1) return false // bare '?' is dropped by the slow path
    var pairStart = qStart + 1
    var prevPair: String = null
    var j = qStart + 1
    while (j <= n) {
      if (j == n || b(j) == '&') {
        if (j == pairStart) return false // empty pair
        val sb = new java.lang.StringBuilder(j - pairStart)
        var t = pairStart
        while (t < j) { sb.append(b(t).toChar); t += 1 }
        val pair = sb.toString
        if (prevPair != null && prevPair.compareTo(pair) > 0) return false // unsorted
        val eq = pair.indexOf('=')
        val key = if (eq >= 0) pair.substring(0, eq) else pair
        if (isTracking(key.toLowerCase)) return false
        prevPair = pair
        pairStart = j + 1
      } else {
        val c = b(j)
        if (c == '%' || c == '#' || c >= 0x80) return false
      }
      j += 1
    }
    true
  }

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
    // default port — strip to FIXPOINT: a single strip of a trailing
    // empty/default port can expose another one ("h:80:80", "h:::"), which
    // would break idempotence (fuzz-caught)
    var portDone = false
    while (!portDone) {
      val colonIdx = authority.lastIndexOf(':')
      if (colonIdx >= 0) {
        val port = authority.substring(colonIdx + 1)
        if (port.isEmpty ||
            (scheme == "http" && port == "80") ||
            (scheme == "https" && port == "443"))
          authority = authority.substring(0, colonIdx)
        else portDone = true
      } else portDone = true
    }
    authority = toAsciiHost(authority)
    // 4-6. path + query
    val qIdx = pathAndQuery.indexOf('?')
    val rawPath = if (qIdx >= 0) pathAndQuery.substring(0, qIdx) else pathAndQuery
    val rawQuery = if (qIdx >= 0) pathAndQuery.substring(qIdx + 1) else ""
    val path = upperPercent(normalizePath(rawPath))
    val query = normalizeQuery(rawQuery)
    val sb = new StringBuilder(scheme.length + authority.length + path.length + query.length + 4)
    sb.append(scheme).append("://").append(authority).append(path)
    if (query.nonEmpty) sb.append('?').append(query)
    val out = sb.toString
    // fragment strip / query reorder can surface trailing whitespace that
    // the next pass would trim — recurse to the (strictly shrinking)
    // fixpoint so canonicalize is idempotent on garbage too (fuzz-caught)
    if (out != out.trim) canonicalize(out.trim) else out
  }

  /** IDN host -> punycode ACE (RFC 3490 ToASCII via java.net.IDN), so
    * `http://例え.jp/` and `http://xn--r8jz45g.jp/` canonicalize to the SAME
    * seen-set key — without this, every internationalized domain is crawled
    * twice (once per spelling). ASCII authorities (the overwhelmingly common
    * case, and every fast-path survivor) return the input reference
    * untouched; a host java.net.IDN rejects (stray bidi marks, overlong
    * labels) falls back to the lowercased original rather than failing the
    * whole canonicalization. Port suffix (already non-default here) is
    * preserved verbatim. Idempotent: the output is pure ASCII, so a second
    * pass takes the fast return.
    */
  private def toAsciiHost(auth: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < auth.length) { if (auth.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return auth
    val colonIdx = auth.lastIndexOf(':')
    val hasPort = colonIdx >= 0 && colonIdx < auth.length - 1 &&
      auth.substring(colonIdx + 1).forall(_.isDigit)
    val host = if (hasPort) auth.substring(0, colonIdx) else auth
    val port = if (hasPort) auth.substring(colonIdx) else ""
    val ace =
      try java.net.IDN.toASCII(host, java.net.IDN.ALLOW_UNASSIGNED).toLowerCase
      catch { case _: IllegalArgumentException => host }
    ace + port
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

  /** Embedded public-suffix snapshot (a deterministic SUBSET of the public
    * PSL — publicsuffix.org; multi-label entries that matter for politeness
    * grouping plus the generic single-label TLDs the synthetic hosts use).
    * Longest-match-first order is established by the lookup, not the list.
    */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.mx",
    "com", "org", "net", "io", "dev", "info", "uk", "au", "jp", "br", "mx")

  /** Registrable domain (eTLD+1) of a host: the longest matching public
    * suffix from the snapshot plus one label. Unknown TLDs fall back to
    * "last label is the suffix" (PSL's prevailing-star rule collapsed to
    * its default); a host that IS a public suffix has no registrable
    * domain and returns itself. Politeness and budget policy at crawl
    * scale group on THIS, not raw host — every subdomain of a news CDN
    * shares one budget.
    */
  def registrableDomain(host: String): String = {
    if (host == null || host.isEmpty) return host
    val best = PublicSuffixes.foldLeft("") { (acc, s) =>
      val hit = host == s || host.endsWith("." + s)
      if (hit && s.length > acc.length) s else acc
    }
    val sufLabels =
      if (best.isEmpty) 1 else best.count(_ == '.') + 1
    val labels = host.split('.')
    val take = math.min(labels.length, sufLabels + 1)
    labels.takeRight(take).mkString(".")
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
