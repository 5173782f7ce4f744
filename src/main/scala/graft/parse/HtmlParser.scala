package graft.parse

import scala.collection.mutable

import graft.core.{Burl, MurmurHash3Bubing}
import graft.model.Span

/** From-scratch HTML parse surface with the reference parser's semantics
  * (`parser/HTMLParser.java:466-646`), re-expressed as a pure function
  * suitable for a typed Dataset map: one pass over the markup produces
  *
  *   - the ordered, deduplicated link set (the `SetLinkReceiver` analog,
  *     HTMLParser.java:112-150) with the reference's link rules
  *     (HTMLParser.java:550-605): `a/area/link[href]` (rel=nofollow
  *     suppressed unless `returnNoFollow`), `img/script/iframe/frame/
  *     embed[src]`, `object[data]`, `base[href]` rebasing, META
  *     refresh/location, header Location;
  *   - the interleaved span sequence (input_hint schema): text runs
  *     outside `script`/`style` (entity-decoded, whitespace-only runs
  *     dropped) and media spans for `img/iframe/frame/embed[src]` /
  *     `object[data]`, in document order;
  *   - the page digest with the `DigestAppendable` semantics
  *     (HTMLParser.java:173-299): case-normalized known-element tags
  *     (`<unknown>` otherwise), tag attributes stripped except quoted
  *     frame/iframe src, digits+whitespace coalesced to a single space,
  *     script/style text suppressed, host seeding, and 3xx location
  *     mixing (HTMLParser.java:636-643).
  *
  * Charset guessing (HTMLParser.java:467,666-736): the reference defaults
  * to ISO-8859-1 and overrides it from the first `META HTTP-EQUIV=
  * content-type` tag's `content` attribute's `charset=` parameter —
  * [[guessCharset]] reproduces that scan (same patterns, same
  * first-meta/greedy-last-charset behavior) over the markup string; the
  * transport half (Content-Type header, WARC header) is covered by
  * [[charsetFromContentType]]. Since pages enter this engine as decoded
  * strings, the guess is metadata (the `guessed_charset` docs column, the
  * WARC-header analog), not a decode step.
  *
  * Differences from the reference, by design: the digest hash is the
  * engine-wide murmur64 over the canonical byte stream (equality classes,
  * not byte-identical MD5 output).
  */
object HtmlParser {

  /** Everything the crawler needs from one parsed page.
    * `guessedCharset` follows HTMLParser.java:467: "ISO-8859-1" unless a
    * META http-equiv content-type declares otherwise. */
  final case class Result(
      links: Vector[String],
      spans: Vector[Span],
      digest: String,
      location: Option[String],
      metaLocation: Option[String],
      guessedCharset: String = DefaultCharset)

  /** The reference's fallback charset (HTMLParser.java:467). */
  val DefaultCharset = "ISO-8859-1"

  // Reference patterns (HTMLParser.java:668-674): matched with matches(),
  // so the greedy `.*` prefix makes the LAST in-tag `content=` / in-value
  // `charset=` win, while the FIRST matching meta tag wins overall.
  private val HttpEquivPattern = java.util.regex.Pattern.compile(
    ".*http-equiv\\s*=\\s*('|\")?content-type('|\")?.*",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val ContentPattern = java.util.regex.Pattern.compile(
    ".*content\\s*=\\s*('|\")([^'\"]*)('|\").*",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val CharsetPattern = java.util.regex.Pattern.compile(
    ".*charset\\s*=\\s*(([\\041-\\0176&&[^<>\\{\\}\\\\/:,;@?=]])+|\"[^\"]*\").*",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  /** Charset name from a content-type value (HTMLParser.java:719-736):
    * the `charset=` parameter, delimiting quotes stripped; None when the
    * value declares no charset. */
  def charsetFromContentType(headerValue: String): Option[String] = {
    val m = CharsetPattern.matcher(headerValue)
    if (!m.matches()) return None
    val s = m.group(1)
    var start = 0
    var end = s.length
    if (end > 0 && (s.charAt(0) == '"' || s.charAt(0) == '\'')) start = 1
    if (end > 0 && (s.charAt(end - 1) == '"' || s.charAt(end - 1) == '\'')) end -= 1
    if (start < end) Some(s.substring(start, end)) else None
  }

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length - target.length
    var i = math.max(0, from)
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** The META http-equiv charset scan (HTMLParser.java:681-717): find each
    * `<meta` (case-insensitive), take the tag content up to the closing
    * `>`; on the FIRST tag whose content matches `http-equiv=content-type`
    * and has a quoted `content=` value, return that value's `charset=`
    * parameter (None when it declares none — the reference stops there,
    * even if a later meta tag would match). None when no `<meta` matches
    * or a tag is unterminated. Note: the modern `<meta charset=...>` form
    * is NOT honored — faithfully to the reference. */
  def guessCharset(html: String): Option[String] = {
    var start = indexOfIgnoreCase(html, "<meta", 0)
    while (start >= 0) {
      val end = html.indexOf('>', start)
      if (end < 0) return None // no closing '>' (HTMLParser.java:695)
      val tagContent = html.substring(start + 5, end)
      if (HttpEquivPattern.matcher(tagContent).matches()) {
        val m = ContentPattern.matcher(tagContent)
        if (m.matches()) return charsetFromContentType(m.group(2))
      }
      start = indexOfIgnoreCase(html, "<meta", end + 1)
    }
    None
  }

  /** [[guessCharset]] with the reference's ISO-8859-1 fallback. */
  def guessedCharset(html: String): String =
    guessCharset(html).getOrElse(DefaultCharset)

  /** Jericho-style known HTML element set (HTMLElements.getElementNames);
    * unknown names hash as `<unknown>` (HTMLParser.java:190-197). */
  private val KnownElements: Set[String] = Set(
    "a", "abbr", "acronym", "address", "applet", "area", "article", "aside",
    "audio", "b", "base", "basefont", "bdi", "bdo", "big", "blockquote",
    "body", "br", "button", "canvas", "caption", "center", "cite", "code",
    "col", "colgroup", "data", "datalist", "dd", "del", "details", "dfn",
    "dialog", "dir", "div", "dl", "dt", "em", "embed", "fieldset",
    "figcaption", "figure", "font", "footer", "form", "frame", "frameset",
    "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hgroup", "hr",
    "html", "i", "iframe", "img", "input", "ins", "isindex", "kbd", "label",
    "legend", "li", "link", "main", "map", "mark", "menu", "meta", "meter",
    "nav", "noframes", "noscript", "object", "ol", "optgroup", "option",
    "output", "p", "param", "picture", "pre", "progress", "q", "rp", "rt",
    "ruby", "s", "samp", "script", "section", "select", "small", "source",
    "span", "strike", "strong", "style", "sub", "summary", "sup", "table",
    "tbody", "td", "template", "textarea", "tfoot", "th", "thead", "time",
    "title", "tr", "track", "tt", "u", "ul", "var", "video", "wbr")

  // cached tag byte markers (DigestAppendable.startTags/endTags,
  // HTMLParser.java:184-198): one array per known element, no per-tag
  // string concatenation on the digest path
  private val StartTagBytes: Map[String, Array[Byte]] =
    KnownElements.iterator.map(n => n -> s"<$n>".getBytes("ISO-8859-1")).toMap
  private val EndTagBytes: Map[String, Array[Byte]] =
    KnownElements.iterator.map(n => n -> s"</$n>".getBytes("ISO-8859-1")).toMap
  private val UnknownStart = "<unknown>".getBytes("ISO-8859-1")
  private val UnknownEnd = "</unknown>".getBytes("ISO-8859-1")

  /** canonical lowercase instances for known element names (avoids a
    * fresh lowercase string per tag on the hot path) */
  private val CanonicalNames: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    KnownElements.foreach(n => m.put(n, n))
    m
  }

  private val BasicEntities = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"', "apos" -> '\'',
    "nbsp" -> ' ')

  /** DigestAppendable analog: accumulates the canonical byte stream
    * (putChar = 2 bytes LE like guava's Hasher) and murmur64-hashes it. */
  private final class Digester(host: String) {
    private val bytes = new mutable.ArrayBuilder.ofByte
    private var lastWasSpace = false
    if (host != null) { putUnencodedChars(host); bytes += 0.toByte }

    private def putUnencodedChars(s: String): Unit = {
      var i = 0
      while (i < s.length) { putChar(s.charAt(i)); i += 1 }
    }
    private def putChar(c: Char): Unit = {
      bytes += (c & 0xff).toByte
      bytes += ((c >> 8) & 0xff).toByte
    }
    /** Filtered text append: digits and whitespace coalesce to one ' '
      * (HTMLParser.java:249-262). */
    def append(c: Char): Unit = {
      if (Character.isWhitespace(c) || Character.isDigit(c)) {
        if (!lastWasSpace) { putChar(' '); lastWasSpace = true }
      } else { putChar(c); lastWasSpace = false }
    }
    def append(s: CharSequence): Unit = {
      var i = 0
      while (i < s.length) { append(s.charAt(i)); i += 1 }
    }
    /** Raw byte append (tag markers, location bytes). */
    def appendRaw(s: String): Unit = {
      var i = 0
      while (i < s.length) { bytes += (s.charAt(i) & 0xff).toByte; i += 1 }
    }
    def appendRawBytes(a: Array[Byte]): Unit = { bytes ++= a }
    def startTag(name: String): Unit = {
      appendRawBytes(StartTagBytes.getOrElse(name, UnknownStart))
      lastWasSpace = false
    }
    def endTag(name: String): Unit = {
      appendRawBytes(EndTagBytes.getOrElse(name, UnknownEnd))
      lastWasSpace = false
    }
    def digest(): String = {
      val a = bytes.result()
      // two dependent murmur64 passes = 128 bits of collision margin
      // (the reference's MD5/Murmur3-128 digests are also opaque ids)
      val h1 = MurmurHash3Bubing.hash(a, 0, a.length, 0L)
      val h2 = MurmurHash3Bubing.hash(a, 0, a.length, h1)
      f"$h1%016x$h2%016x"
    }
  }

  /** Ordered link dedup (SetLinkReceiver, HTMLParser.java:112-150). */
  private final class LinkSet {
    private val seen = mutable.HashSet.empty[String]
    private val out = Vector.newBuilder[String]
    def add(url: String): Unit = if (url != null && seen.add(url)) out += url
    def result(): Vector[String] = out.result()
  }

  /** Resolve `spec` against `base` like the reference's
    * `base.resolve(BURL.parse(s))` (HTMLParser.java:458-463); returns
    * null when the spec does not parse. */
  def resolve(base: String, spec: String): String = {
    if (spec == null) return null
    val trimmed = spec.trim
    if (trimmed.isEmpty) return null
    try {
      val u = new java.net.URI(base).resolve(
        new java.net.URI(trimmed.replace(" ", "%20")))
      if (u.getScheme == null) null else u.toString
    } catch {
      case _: Exception =>
        // fall back to BURL-style parse of the raw spec (absolute only)
        val p = Burl.parse(trimmed)
        if (p != null && p.contains("://")) p else null
    }
  }

  private def decodeEntity(s: String, start: Int, sb: StringBuilder): Int = {
    // s(start) == '&'; returns index after the reference, appending the
    // decoded char (or the literal '&' when it is not a valid reference)
    val semi = s.indexOf(';', start + 1)
    if (semi > start && semi - start <= 10) {
      val body = s.substring(start + 1, semi)
      if (body.startsWith("#x") || body.startsWith("#X")) {
        try { sb.append(Integer.parseInt(body.substring(2), 16).toChar); return semi + 1 }
        catch { case _: NumberFormatException => }
      } else if (body.startsWith("#")) {
        try { sb.append(Integer.parseInt(body.substring(1)).toChar); return semi + 1 }
        catch { case _: NumberFormatException => }
      } else BasicEntities.get(body.toLowerCase) match {
        case Some(c) => sb.append(c); return semi + 1
        case None =>
      }
    }
    sb.append('&')
    start + 1
  }

  /** Reusable per-parse tag holder: only the attributes a tag kind can
    * act on are extracted (href/src/data + rel / http-equiv + content) —
    * no per-tag attribute map on the hot path. */
  private final class TagScratch {
    var name: String = _
    var end = false
    var selfClosing = false
    var next = 0
    var urlAttr: String = _ // href / src / data (by tag kind)
    var relOrEquiv: String = _ // rel (a) or http-equiv (meta)
    var content: String = _ // content (meta)
  }

  @inline private def attrNameIs(s: String, from: Int, to: Int, expect: String): Boolean =
    to - from == expect.length && s.regionMatches(true, from, expect, 0, expect.length)

  /** HTML-entity-decode an attribute value (Jericho's getAttributeValue
    * decodes character references, so `href="a?x=1&amp;y=2"` must yield
    * the literal `&` before resolve()); fast no-op when no '&' present. */
  private def decodeAttr(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') i = decodeEntity(s, i, sb)
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse one tag starting at `i` (s(i) == '<') into `t`. Returns false
    * if this is not a tag (the '<' is literal text). */
  private def parseTag(s: String, i: Int, t: TagScratch): Boolean = {
    val n = s.length
    var j = i + 1
    if (j >= n) return false
    val isEnd = s.charAt(j) == '/'
    if (isEnd) j += 1
    val nameStart = j
    var anyUpper = false
    while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '-' || s.charAt(j) == ':')) {
      if (s.charAt(j) >= 'A' && s.charAt(j) <= 'Z') anyUpper = true
      j += 1
    }
    if (j == nameStart) return false // "<" followed by non-name: literal text
    val rawName = s.substring(nameStart, j)
    val lowered = if (anyUpper) rawName.toLowerCase else rawName
    val canonical = CanonicalNames.get(lowered)
    val name = if (canonical != null) canonical else lowered
    // which attributes this tag kind can act on
    val (wantUrl, wantRel, wantContent) = name match {
      case "a" => ("href", "rel", null)
      case "area" | "link" | "base" => ("href", null, null)
      case "img" | "script" | "iframe" | "frame" | "embed" => ("src", null, null)
      case "object" => ("data", null, null)
      case "meta" => (null, "http-equiv", "content")
      case _ => (null, null, null)
    }
    t.name = name; t.end = isEnd; t.selfClosing = false
    t.urlAttr = null; t.relOrEquiv = null; t.content = null
    // scan attributes up to '>'
    while (j < n && s.charAt(j) != '>') {
      val c = s.charAt(j)
      if (c == '/' && j + 1 < n && s.charAt(j + 1) == '>') { t.selfClosing = true; j += 1 }
      else if (c.isWhitespace) j += 1
      else {
        // attribute name
        val as = j
        while (j < n && s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/' &&
          !s.charAt(j).isWhitespace) j += 1
        val ae = j
        // skip ws
        while (j < n && s.charAt(j).isWhitespace) j += 1
        var value: String = null
        var hasValue = false
        if (j < n && s.charAt(j) == '=') {
          j += 1
          while (j < n && s.charAt(j).isWhitespace) j += 1
          if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j); j += 1
            val vs = j
            while (j < n && s.charAt(j) != q) j += 1
            hasValue = true
            // extract lazily below only if the name matches a wanted attr
            if ((wantUrl != null && attrNameIs(s, as, ae, wantUrl)) ||
                (wantRel != null && attrNameIs(s, as, ae, wantRel)) ||
                (wantContent != null && attrNameIs(s, as, ae, wantContent)))
              value = s.substring(vs, math.min(j, n))
            if (j < n) j += 1
          } else {
            val vs = j
            while (j < n && s.charAt(j) != '>' && !s.charAt(j).isWhitespace) j += 1
            // bare value; a trailing '/' of "/>" belongs to the value per
            // HTML quirks unless immediately before '>'
            var ve = j
            if (ve > vs && ve < n && s.charAt(ve - 1) == '/' && s.charAt(ve) == '>') {
              ve -= 1; t.selfClosing = true
            }
            hasValue = true
            if ((wantUrl != null && attrNameIs(s, as, ae, wantUrl)) ||
                (wantRel != null && attrNameIs(s, as, ae, wantRel)) ||
                (wantContent != null && attrNameIs(s, as, ae, wantContent)))
              value = s.substring(vs, ve)
          }
        }
        if (ae > as && value != null) {
          if (wantUrl != null && attrNameIs(s, as, ae, wantUrl)) t.urlAttr = decodeAttr(value)
          else if (wantRel != null && attrNameIs(s, as, ae, wantRel)) t.relOrEquiv = decodeAttr(value)
          else if (wantContent != null && attrNameIs(s, as, ae, wantContent)) t.content = decodeAttr(value)
        } else if (ae > as && !hasValue) {
          // valueless attribute: rel=nofollow needs a non-null marker only
          // when the attr had a value; bare flags stay null (the reference
          // reads getAttributeValue which is null for valueless attrs)
          ()
        } else if (ae == as) j += 1 // lone junk char
      }
    }
    if (j >= n) return false // unterminated tag: treat as text
    t.next = j + 1
    true
  }

  private val UrlEqualsPattern = "(?i)URL=".r

  /** Parse an HTML page.
    *
    * @param uri the page URL (absolute, normalized)
    * @param html the markup
    * @param status the HTTP status (3xx mixes locations into the digest)
    * @param locationHeader the Location header value, if any
    * @param crossAuthorityDuplicates if true, the digest is NOT seeded
    *        with the host (HTMLParser.java:533)
    * @param returnNoFollow if true, rel=nofollow links are returned too
    */
  def parse(uri: String, html: String, status: Int = 200,
      locationHeader: String = null,
      crossAuthorityDuplicates: Boolean = false,
      returnNoFollow: Boolean = false): Result = {
    val digester = new Digester(if (crossAuthorityDuplicates) null else Burl.host(uri))
    val links = new LinkSet
    val spans = Vector.newBuilder[Span]
    var spanIdx = 0
    var base = uri
    var location: String = null
    var metaLocation: String = null

    // header Location first (ParsingThread.java:348-356)
    if (locationHeader != null) {
      val l = resolve(uri, locationHeader)
      if (l != null) { location = l; links.add(l) }
    }

    def addMediaSpan(ref: String): Unit = {
      if (ref != null) {
        spans += Span("media", "", ref, spanIdx)
        spanIdx += 1
      }
    }

    val n = html.length
    var i = 0
    var inSpecialText = 0
    val text = new StringBuilder
    val tag = new TagScratch

    def flushText(): Unit = {
      if (text.nonEmpty) {
        val t = text.toString
        text.clear()
        if (inSpecialText == 0) {
          digester.append(t)
          if (t.exists(!_.isWhitespace)) {
            spans += Span("text", t, "", spanIdx)
            spanIdx += 1
          }
        }
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          flushText()
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          flushText()
          val close = html.indexOf('>', i + 1)
          i = if (close < 0) n else close + 1
        } else {
          if (!parseTag(html, i, tag)) { text.append(c); i += 1 }
          else {
            flushText()
            i = tag.next
            val name = tag.name
            if (tag.end) {
              if (name == "style" || name == "script")
                inSpecialText = math.max(0, inSpecialText - 1)
              digester.endTag(name)
            } else {
              if ((name == "style" || name == "script") && !tag.selfClosing)
                inSpecialText += 1
              digester.startTag(name)
              if ((name == "iframe" || name == "frame") && tag.urlAttr != null) {
                digester.append('"'); digester.append(tag.urlAttr); digester.append('"')
              }
              name match {
                case "iframe" | "frame" | "embed" | "img" | "object" =>
                  val r = resolve(base, tag.urlAttr)
                  links.add(r); addMediaSpan(r)
                case "script" =>
                  links.add(resolve(base, tag.urlAttr))
                case "a" =>
                  val rel = tag.relOrEquiv
                  if (returnNoFollow || rel == null || !rel.equalsIgnoreCase("nofollow"))
                    links.add(resolve(base, tag.urlAttr))
                case "area" | "link" =>
                  links.add(resolve(base, tag.urlAttr))
                case "base" =>
                  val b = tag.urlAttr
                  if (b != null) {
                    val parsed = resolve(base, b)
                    // only absolute BASE rebases (HTMLParser.java:559-568)
                    if (parsed != null && b.contains("://")) base = parsed
                  }
                case "meta" =>
                  val equiv = tag.relOrEquiv
                  val content = tag.content
                  if (equiv != null && content != null) {
                    if (equiv.equalsIgnoreCase("refresh")) {
                      UrlEqualsPattern.findFirstMatchIn(content).foreach { m =>
                        val r = resolve(base, content.substring(m.end))
                        links.add(r)
                      }
                    } else if (equiv.equalsIgnoreCase("location")) {
                      val r = resolve(base, content)
                      if (r != null) { metaLocation = r; links.add(r) }
                    }
                  }
                case _ =>
              }
            }
          }
        }
      } else if (c == '&') {
        i = decodeEntity(html, i, text)
      } else {
        text.append(c)
        i += 1
      }
    }
    flushText()

    // 3xx location mixing (HTMLParser.java:636-643)
    if (status / 100 == 3) {
      digester.append('\u0000')
      if (location != null) digester.appendRaw(location)
      digester.append('\u0000')
      if (metaLocation != null) digester.appendRaw(metaLocation)
      digester.append('\u0000')
    }

    Result(links.result(), spans.result(), digester.digest(),
      Option(location), Option(metaLocation), guessedCharset(html))
  }
}
