package graft.functions

import java.util.Locale

/** URL canonicalization — north-rule semantics (BASELINE.json): lowercase
  * scheme + host, strip fragment, drop `utm_*` tracking params, sort the
  * remaining query params. Plus the RFC 3986 §6.2.2 syntax-based
  * normalizations a frontier needs so equivalent spellings dedup (r4
  * verdict #7): percent-encoding hex case (`%2f` → `%2F`, §6.2.2.1),
  * default-port stripping (`:443`/`:80`), and IDN hosts mapped to their
  * punycode ACE form (RFC 3490 ToASCII via `java.net.IDN` — `münchen.de`
  * and `xn--mnchen-3ya.de` are the same host on the wire). The reference
  * never canonicalizes (SURVEY.md §2.4 P2 — it dedups on the raw link
  * string); our engine must, so the exact-match oracle applies the same
  * canonicalization on both sides.
  *
  * Hand-rolled single-pass parser: `java.net.URI` throws on the dirty URLs
  * real crawls see, and this sits on the 10^10-row hot path, so it must be
  * allocation-lean and total (never throws; non-URLs pass through trimmed,
  * an unmappable IDN label keeps its lowercased unicode form rather than
  * dropping the row). The IDN pass only runs when the authority actually
  * holds a non-ASCII char — the ASCII fast path pays one scan.
  */
object UrlCanonicalizer {

  def canonicalize(url: String): String = {
    if (url == null) return null
    val s0 = url.trim
    if (s0.isEmpty) return s0

    // 1. strip fragment
    val hashIdx = s0.indexOf('#')
    val s = if (hashIdx >= 0) s0.substring(0, hashIdx) else s0

    // 2. locate scheme
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return s // not an absolute URL; pass through
    val scheme = s.substring(0, schemeEnd).toLowerCase(Locale.ROOT)

    // 3. authority = up to first '/' or '?' after scheme
    val authStart = schemeEnd + 3
    var i = authStart
    while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '?') i += 1
    val authority = idnToAscii(
      s.substring(authStart, i).toLowerCase(Locale.ROOT))
    // drop default ports
    val auth =
      if (scheme == "https" && authority.endsWith(":443"))
        authority.substring(0, authority.length - 4)
      else if (scheme == "http" && authority.endsWith(":80"))
        authority.substring(0, authority.length - 3)
      else authority

    // 4. path + query
    val qIdx = s.indexOf('?', i)
    val path =
      if (qIdx >= 0) s.substring(i, qIdx)
      else s.substring(i)
    val normPath = percentUpper(if (path.isEmpty) "/" else path)

    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(auth).append(normPath)

    // 5. query: drop utm_*, percent-normalize, sort remaining (key,value)
    //    pairs lexicographically (normalize BEFORE sorting so equivalent
    //    spellings land in the same order)
    if (qIdx >= 0 && qIdx + 1 < s.length) {
      val rawQ = s.substring(qIdx + 1)
      val parts = rawQ.split("&")
      val kept = new scala.collection.mutable.ArrayBuffer[String](parts.length)
      var j = 0
      while (j < parts.length) {
        val p = parts(j)
        if (p.nonEmpty && !isTracking(p)) kept += percentUpper(p)
        j += 1
      }
      if (kept.nonEmpty) {
        val sorted = kept.sorted
        sb.append('?')
        var k = 0
        while (k < sorted.length) {
          if (k > 0) sb.append('&')
          sb.append(sorted(k))
          k += 1
        }
      }
    }
    sb.toString
  }

  /** RFC 3986 §6.2.2.1: the hex digits of a percent escape are
    * case-insensitive on the wire — normalize to uppercase so `%2f` and
    * `%2F` dedup. Only WELL-FORMED escapes (% + two hex digits) are
    * touched; a stray '%' passes through untouched (total function).
    * Allocation-free when the string holds no escapes.
    */
  private[functions] def percentUpper(s: String): String = {
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

  /** Map a non-ASCII (IDN) host to its punycode ACE form; ASCII
    * authorities pass through after one scan. The port (and any userinfo)
    * is split off first — `java.net.IDN` sees only the host labels. An
    * unmappable label (IDN.toASCII throws on rule violations) keeps its
    * lowercased unicode form: totality beats strictness on a crawl
    * frontier (the fetch layer will surface the real error).
    */
  private[functions] def idnToAscii(authLower: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < authLower.length) {
      if (authLower.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return authLower
    val at = authLower.lastIndexOf('@')
    val userinfo = if (at >= 0) authLower.substring(0, at + 1) else ""
    val hostPort = authLower.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    val bracket = hostPort.indexOf(']') // IPv6 literal: never IDN-mapped
    val (host, port) =
      if (colon >= 0 && bracket < colon)
        (hostPort.substring(0, colon), hostPort.substring(colon))
      else (hostPort, "")
    val mapped =
      try { if (host.isEmpty) host else java.net.IDN.toASCII(host) }
      catch { case _: Exception => host }
    userinfo + mapped + port
  }

  private def isTracking(param: String): Boolean = {
    // utm_* (case-insensitive) and the common click ids
    val eq = param.indexOf('=')
    val key = if (eq >= 0) param.substring(0, eq) else param
    val kl = key.toLowerCase(Locale.ROOT)
    kl.startsWith("utm_") || kl == "fbclid" || kl == "gclid"
  }

  /** Host component of a canonical URL (empty string if relative). */
  def hostOf(canonicalUrl: String): String = {
    if (canonicalUrl == null) return null
    val schemeEnd = canonicalUrl.indexOf("://")
    if (schemeEnd <= 0) return ""
    var i = schemeEnd + 3
    val start = i
    while (i < canonicalUrl.length && canonicalUrl.charAt(i) != '/' &&
      canonicalUrl.charAt(i) != '?') i += 1
    val auth = canonicalUrl.substring(start, i)
    val colon = auth.lastIndexOf(':')
    if (colon >= 0 && auth.indexOf(']') < colon) auth.substring(0, colon)
    else auth
  }

  /** Path component of a canonical URL ("/" if none). */
  def pathOf(canonicalUrl: String): String = {
    if (canonicalUrl == null) return null
    val schemeEnd = canonicalUrl.indexOf("://")
    if (schemeEnd <= 0) return canonicalUrl
    var i = schemeEnd + 3
    while (i < canonicalUrl.length && canonicalUrl.charAt(i) != '/' &&
      canonicalUrl.charAt(i) != '?') i += 1
    if (i >= canonicalUrl.length || canonicalUrl.charAt(i) == '?') "/"
    else {
      val q = canonicalUrl.indexOf('?', i)
      if (q >= 0) canonicalUrl.substring(i, q) else canonicalUrl.substring(i)
    }
  }
}
