package graft.core

import java.net.{URI, URISyntaxException}
import java.nio.charset.StandardCharsets

/** BUbiNG URL ("BURL") normalization and decomposition.
  *
  * Reimplements the *semantics* of the reference's URL canonicalizer
  * (`bubing/util/BURL.java:132-260`) as pure string functions. The canonical
  * form IS the identity of a crawl unit, so this must match the reference
  * case-for-case (golden suite ported from `test/.../util/BURLTest.java`).
  *
  * Normalization pipeline (reference order, `BURL.java:134-201`):
  *  1. trim; reject if containing `\n` or `\r` (FORBIDDEN_CHARS);
  *  2. replace BAD_CHARs: `\` -> `/`, and ` \t[]"|{}^<>` `` ` `` -> `%XX`
  *     (uppercase hex);
  *  3. fix `%` not followed by two hex digits -> `%25`; upcase hex escapes;
  *  4. `new URI(spec).normalize()`; reject opaque; absolute URIs must parse
  *     a server authority and have one; reject decoded NULs anywhere;
  *  5. downcase scheme and host; strip one trailing dot from host;
  *     empty path -> "/" when a host is present;
  *  6. repack dropping the fragment, %XX-UTF-8-encoding non-ASCII chars,
  *     dropping default ports (http:80 / https:443); re-normalize.
  *
  * Returns `null` for malformed specs (error-oriented, like the reference).
  */
object Burl {

  private final val HexDigits = "0123456789ABCDEF".toCharArray

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** BAD_CHAR -> substitute (reference `BURL.java:79-88`). */
  private def badCharSubstitute(c: Char): String = c match {
    case '\\' => "/"
    case other =>
      val i = other.toInt
      if (i < 16) "%0" + Integer.toHexString(i).toUpperCase
      else "%" + Integer.toHexString(i).toUpperCase
  }

  private final val BadChars = Set('\\', ' ', '\t', '[', ']', '"', '|', '{', '}', '^', '<', '>', '`')

  /** Steps 1-3: pre-clean the spec string; null if forbidden chars present. */
  private def preClean(spec0: String): String = {
    val spec = spec0.trim
    if (spec.indexOf('\n') >= 0 || spec.indexOf('\r') >= 0) return null
    val afterBad = {
      var needs = false
      var i = 0
      while (i < spec.length && !needs) { if (BadChars(spec.charAt(i))) needs = true; i += 1 }
      if (!needs) spec
      else {
        val sb = new StringBuilder(spec.length + 8)
        var j = 0
        while (j < spec.length) {
          val c = spec.charAt(j)
          if (BadChars(c)) sb.append(badCharSubstitute(c)) else sb.append(c)
          j += 1
        }
        sb.toString
      }
    }
    // Percent fixing: a '%' not followed by two hex digits becomes "%25";
    // valid escapes get their hex digits upcased (BURL.java:142-153).
    val l = afterBad.length
    val sb = new StringBuilder(l + 8)
    var i = 0
    while (i < l) {
      val c = afterBad.charAt(i)
      if (c == '%') {
        if (i >= l - 2 || !isHex(afterBad.charAt(i + 1)) || !isHex(afterBad.charAt(i + 2))) {
          sb.append("%25")
        } else {
          sb.append('%')
          sb.append(Character.toUpperCase(afterBad.charAt(i + 1)))
          sb.append(Character.toUpperCase(afterBad.charAt(i + 2)))
          i += 2
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** %XX-UTF-8-encode non-ASCII characters (reference `sanitize`, BURL.java:214-233). */
  private def sanitize(s: String): String = {
    var hasNonAscii = false
    var i = 0
    while (i < s.length && !hasNonAscii) { if (s.charAt(i) >= 128) hasNonAscii = true; i += 1 }
    if (!hasNonAscii) return s
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length * 2)
    var j = 0
    while (j < bytes.length) {
      val b = bytes(j) & 0xff
      if (b >= 0x80) sb.append('%').append(HexDigits(b >> 4 & 0xf)).append(HexDigits(b & 0xf))
      else sb.append(b.toChar)
      j += 1
    }
    sb.toString
  }

  /** Reference `sanitizeAndRepack` (BURL.java:244-269). */
  private def repack(scheme: String, userInfo: String, host: String, port0: Int,
                     path: String, query: String): String = {
    val sb = new StringBuilder
    var port = port0
    if (scheme != null) {
      sb.append(sanitize(scheme)).append(':')
      if ((scheme.equalsIgnoreCase("http") && port == 80) ||
          (scheme.equalsIgnoreCase("https") && port == 443)) port = -1
    }
    if (host != null) {
      sb.append("//")
      if (userInfo != null) sb.append(sanitize(userInfo)).append('@')
      val needBrackets = host.indexOf(':') >= 0 && !host.startsWith("[") && !host.endsWith("]")
      if (needBrackets) sb.append('[')
      sb.append(sanitize(host))
      if (needBrackets) sb.append(']')
      if (port != -1) sb.append(':').append(port)
    }
    if (path != null) sb.append(sanitize(path))
    if (query != null) sb.append('?').append(sanitize(query))
    sb.toString
  }

  /** Fast-path detector: true only for specs that are PROVABLY fixed
    * points of [[parse]] — lowercase http(s) scheme, lowercase
    * [a-z0-9.]-host with no empty labels / trailing dot / port /
    * userinfo, a '/'-rooted path of unreserved+sub-delim ASCII with no
    * dot segments, optional query, no '%', no '#', no whitespace. The
    * overwhelming majority of crawl outlinks hit this (java.net.URI
    * construction otherwise dominates the link-normalization stage);
    * anything else falls through to the full reference-semantics path.
    * Equivalence is property-tested against the slow path in BurlSpec. */
  private[core] def isFastCanonical(s: String): Boolean = {
    val n = s.length
    if (n < 9 || n > 4096) return false
    var i =
      if (s.startsWith("http://")) 7
      else if (s.startsWith("https://")) 8
      else return false
    // host: [a-z0-9.]+, no leading/trailing/double dots
    val hostStart = i
    var prev = '.'
    var c = ' '
    while (i < n && { c = s.charAt(i); c != '/' }) {
      if (!((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '.')) return false
      if (c == '.' && prev == '.') return false
      prev = c
      i += 1
    }
    if (i == hostStart || prev == '.') return false // empty host / trailing dot
    if (!fastHostOk(s.substring(hostStart, i))) return false
    if (i >= n) return false // no path: parse() appends '/', not a fixed point
    // path (until '?'): pchar-ish ASCII, no '%', track dot segments
    val pathStart = i
    var qIdx = -1
    while (i < n && qIdx < 0) {
      c = s.charAt(i)
      if (c == '?') qIdx = i
      else if (!isFastPathChar(c)) return false
      else i += 1
    }
    val pathEnd = if (qIdx < 0) n else qIdx
    // reject ".", ".." segments (URI.normalize would rewrite them)
    var j = pathStart
    while (j < pathEnd) {
      if (s.charAt(j) == '/') {
        var k = j + 1
        while (k < pathEnd && s.charAt(k) != '/') k += 1
        val len = k - (j + 1)
        if (len == 0 && k < pathEnd) return false // "//" — URI.normalize collapses empty segments
        if (len == 1 && s.charAt(j + 1) == '.') return false
        if (len == 2 && s.charAt(j + 1) == '.' && s.charAt(j + 2) == '.') return false
        j = k
      } else j += 1
    }
    if (qIdx >= 0) {
      i = qIdx + 1
      while (i < n) {
        c = s.charAt(i)
        if (!(isFastPathChar(c) || c == '?')) return false
        i += 1
      }
    }
    true
  }

  /** URI's server-authority rules: a digit-leading top label is only
    * valid as a full IPv4 address (RFC 2396 toplabel starts with ALPHA;
    * java.net.URI.parseServerAuthority rejects e.g. 300.1.2.3). */
  private def fastHostOk(host: String): Boolean = {
    val labels = host.split('.')
    if (labels.isEmpty) return false
    val last = labels(labels.length - 1)
    if (last.isEmpty) return false
    if (last.charAt(0) >= '0' && last.charAt(0) <= '9') {
      labels.length == 4 && labels.forall { l =>
        l.nonEmpty && l.length <= 3 && l.forall(ch => ch >= '0' && ch <= '9') && l.toInt <= 255
      }
    } else true
  }

  @inline private def isFastPathChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '/' || c == '-' || c == '.' || c == '_' || c == '~' || c == ':' || c == '@' ||
      c == '!' || c == '$' || c == '&' || c == '\'' || c == '(' || c == ')' ||
      c == '*' || c == '+' || c == ',' || c == ';' || c == '='

  /** Parse and normalize a URL spec; null if malformed (BURL.parse semantics). */
  def parse(spec0: String): String = {
    if (spec0 == null) return null
    if (isFastCanonical(spec0)) return spec0
    parseSlow(spec0)
  }

  /** The full normalization path (pre-clean + java.net.URI + repack). */
  private[core] def parseSlow(spec0: String): String = {
    if (spec0 == null) return null
    val spec = preClean(spec0)
    if (spec == null) return null
    try {
      val uri = new URI(spec).normalize()
      if (uri.isOpaque) return null
      if (uri.isAbsolute) uri.parseServerAuthority() // may throw -> null

      var scheme = uri.getScheme
      if (scheme != null) {
        if (scheme.indexOf(0.toChar) >= 0) return null
        scheme = scheme.toLowerCase
      }
      if (uri.isAbsolute && uri.getAuthority == null) return null
      if (uri.getPath != null && uri.getPath.indexOf(0.toChar) >= 0) return null
      if (uri.getUserInfo != null && uri.getUserInfo.indexOf(0.toChar) >= 0) return null
      if (uri.getQuery != null && uri.getQuery.indexOf(0.toChar) >= 0) return null

      var host = uri.getHost
      if (host != null) {
        if (host.indexOf(0.toChar) >= 0) return null
        if (host.endsWith(".")) host = host.substring(0, host.length - 1)
        host = host.toLowerCase
      }

      var rawPath = uri.getRawPath
      if (host != null && (rawPath == null || rawPath.isEmpty)) rawPath = "/"

      new URI(repack(scheme, uri.getRawUserInfo, host, uri.getPort, rawPath, uri.getRawQuery))
        .normalize().toString
    } catch {
      case _: URISyntaxException => null
      case _: Exception => null
    }
  }

  // ---- Decomposition of already-normalized BURLs (BURL.java:377-477) ----

  /** Index of the third '/' — start of path+query (BURL.startOfpathAndQuery). */
  private def startOfPathQuery(url: String): Int = {
    var i = 0
    var slashes = 0
    while (i < url.length) {
      if (url.charAt(i) == '/') { slashes += 1; if (slashes == 3) return i }
      i += 1
    }
    url.length
  }

  /** "scheme://authority" prefix of an absolute normalized BURL. */
  def schemeAndAuthority(url: String): String = url.substring(0, startOfPathQuery(url))

  /** "/path?query" suffix of an absolute normalized BURL (at least "/"). */
  def pathAndQuery(url: String): String = {
    val i = startOfPathQuery(url)
    if (i >= url.length) "/" else url.substring(i)
  }

  /** Host of a normalized BURL or scheme+authority: strips scheme, userinfo
    * and port (BURL.hostFromSchemeAndAuthority / startOfHost semantics). */
  def host(url: String): String = {
    val colon = url.indexOf(':')
    if (colon < 0) return null
    val startOfAuthority = colon + 3
    if (startOfAuthority > url.length) return null
    var endOfAuthority = url.indexOf('/', startOfAuthority)
    if (endOfAuthority < 0) endOfAuthority = url.length
    var at = -1
    var i = startOfAuthority
    while (i < endOfAuthority && at < 0) { if (url.charAt(i) == '@') at = i; i += 1 }
    val startOfHost = if (at >= 0) at + 1 else startOfAuthority
    var endOfHost = startOfHost
    while (endOfHost < endOfAuthority && url.charAt(endOfHost) != ':') endOfHost += 1
    url.substring(startOfHost, endOfHost)
  }

  /** Scheme ("http", "https", ...) of a normalized BURL; null if relative. */
  def scheme(url: String): String = {
    val colon = url.indexOf(':')
    if (colon <= 0) null else url.substring(0, colon)
  }

  /** Path only (query stripped) of a normalized absolute BURL. */
  def path(url: String): String = {
    val pq = pathAndQuery(url)
    val q = pq.indexOf('?')
    if (q < 0) pq else pq.substring(0, q)
  }

  /** Deterministic synthetic DNS: hash-derived "IP" for a host, standing in
    * for the reference's `FakeResolver` (`frontier/dns/FakeResolver.java`);
    * pure, so DNS caching (Frontier.java:504-507) becomes free. */
  def ipOfHost(host: String, ipsPerHostSpace: Long = 1L << 20): Long = {
    val h = MurmurHash3Bubing.hashString(host, 0x4453_5f49_505f_4f46L) // "DNS" seed
    java.lang.Math.floorMod(h, ipsPerHostSpace)
  }
}
