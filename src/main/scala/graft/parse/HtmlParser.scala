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
  * Differences from the reference, by design: the digest hash is the
  * engine-wide murmur64 over the canonical byte stream (equality classes,
  * not byte-identical MD5 output), and charset guessing is out of scope
  * (we parse decoded strings; transport is a non-goal per SURVEY.md §5).
  */
object HtmlParser {

  /** Everything the crawler needs from one parsed page. */
  final case class Result(
      links: Vector[String],
      spans: Vector[Span],
      digest: String,
      location: Option[String],
      metaLocation: Option[String])

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
    def startTag(name: String): Unit = {
      appendRaw(if (KnownElements(name)) "<" + name + ">" else "<unknown>")
      lastWasSpace = false
    }
    def endTag(name: String): Unit = {
      appendRaw(if (KnownElements(name)) "</" + name + ">" else "</unknown>")
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

  private final case class Tag(name: String, end: Boolean, selfClosing: Boolean,
      attrs: Map[String, String], next: Int)

  /** Parse one tag starting at `i` (s(i) == '<'). Returns null if this is
    * not a tag (the '<' is text). */
  private def parseTag(s: String, i: Int): Tag = {
    val n = s.length
    var j = i + 1
    if (j >= n) return null
    val isEnd = s.charAt(j) == '/'
    if (isEnd) j += 1
    val nameStart = j
    while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '-' || s.charAt(j) == ':')) j += 1
    if (j == nameStart) return null // "<" followed by non-name: literal text
    val name = s.substring(nameStart, j).toLowerCase
    // scan attributes up to '>'
    val attrs = mutable.Map.empty[String, String]
    var selfClosing = false
    while (j < n && s.charAt(j) != '>') {
      val c = s.charAt(j)
      if (c == '/' && j + 1 < n && s.charAt(j + 1) == '>') { selfClosing = true; j += 1 }
      else if (c.isWhitespace) j += 1
      else {
        // attribute name
        val as = j
        while (j < n && s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/' &&
          !s.charAt(j).isWhitespace) j += 1
        val aname = s.substring(as, j).toLowerCase
        // skip ws
        while (j < n && s.charAt(j).isWhitespace) j += 1
        if (j < n && s.charAt(j) == '=') {
          j += 1
          while (j < n && s.charAt(j).isWhitespace) j += 1
          if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j); j += 1
            val vs = j
            while (j < n && s.charAt(j) != q) j += 1
            if (aname.nonEmpty) attrs(aname) = s.substring(vs, math.min(j, n))
            if (j < n) j += 1
          } else {
            val vs = j
            while (j < n && s.charAt(j) != '>' && !s.charAt(j).isWhitespace) j += 1
            // bare value; a trailing '/' of "/>" belongs to the value per
            // HTML quirks unless immediately before '>'
            var ve = j
            if (ve > vs && ve < n && s.charAt(ve - 1) == '/' && s.charAt(ve) == '>') {
              ve -= 1; selfClosing = true
            }
            if (aname.nonEmpty) attrs(aname) = s.substring(vs, ve)
          }
        } else if (aname.nonEmpty) attrs(aname) = null
        else j += 1 // lone junk char
      }
    }
    if (j >= n) return null // unterminated tag: treat as text
    Tag(name, isEnd, selfClosing, attrs.toMap, j + 1)
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
          val tag = parseTag(html, i)
          if (tag == null) { text.append(c); i += 1 }
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
              if (name == "iframe" || name == "frame") tag.attrs.get("src").foreach { s =>
                if (s != null) { digester.append('"'); digester.append(s); digester.append('"') }
              }
              name match {
                case "iframe" | "frame" | "embed" =>
                  val r = resolve(base, tag.attrs.getOrElse("src", null))
                  links.add(r); addMediaSpan(r)
                case "img" =>
                  val r = resolve(base, tag.attrs.getOrElse("src", null))
                  links.add(r); addMediaSpan(r)
                case "script" =>
                  links.add(resolve(base, tag.attrs.getOrElse("src", null)))
                case "object" =>
                  val r = resolve(base, tag.attrs.getOrElse("data", null))
                  links.add(r); addMediaSpan(r)
                case "a" =>
                  val rel = tag.attrs.getOrElse("rel", null)
                  if (returnNoFollow || rel == null || !rel.equalsIgnoreCase("nofollow"))
                    links.add(resolve(base, tag.attrs.getOrElse("href", null)))
                case "area" | "link" =>
                  links.add(resolve(base, tag.attrs.getOrElse("href", null)))
                case "base" =>
                  val b = tag.attrs.getOrElse("href", null)
                  if (b != null) {
                    val parsed = resolve(base, b)
                    // only absolute BASE rebases (HTMLParser.java:559-568)
                    if (parsed != null && b.contains("://")) base = parsed
                  }
                case "meta" =>
                  val equiv = tag.attrs.getOrElse("http-equiv", "")
                  val content = tag.attrs.getOrElse("content", null)
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
      Option(location), Option(metaLocation))
  }
}
