package graft.functions

import java.util.Locale

/** URL canonicalization — north-rule semantics (BASELINE.json): lowercase
  * scheme + host, strip fragment, drop `utm_*` tracking params, sort the
  * remaining query params. The reference never canonicalizes (SURVEY.md
  * §2.4 P2 — it dedups on the raw link string); our engine must, so the
  * exact-match oracle applies the same canonicalization on both sides.
  *
  * Hand-rolled single-pass parser: `java.net.URI` throws on the dirty URLs
  * real crawls see, and this sits on the 10^10-row hot path, so it must be
  * allocation-lean and total (never throws; non-URLs pass through trimmed).
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
    val authority = s.substring(authStart, i).toLowerCase(Locale.ROOT)
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
    val normPath = if (path.isEmpty) "/" else path

    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(auth).append(normPath)

    // 5. query: drop utm_*, sort remaining (key,value) pairs lexicographically
    if (qIdx >= 0 && qIdx + 1 < s.length) {
      val rawQ = s.substring(qIdx + 1)
      val parts = rawQ.split("&")
      val kept = new scala.collection.mutable.ArrayBuffer[String](parts.length)
      var j = 0
      while (j < parts.length) {
        val p = parts(j)
        if (p.nonEmpty && !isTracking(p)) kept += p
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
