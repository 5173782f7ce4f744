package graft.parse

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Span

/** Port of the reference's `HtmlParserTest.java` (digest equality classes,
  * whitespace/digit coalescing :323-331, script suppression :346-354, 3xx
  * location mixing :272-281, nofollow counts :357-365) plus span/link
  * extraction checks for the graft-specific surface. */
class HtmlParserSpec extends AnyFunSuite {

  private def dig(url: String, html: String, status: Int = 200,
      locationHeader: String = null): String =
    HtmlParser.parse(url, html, status, locationHeader).digest

  private def assertSameDigest(a: String, b: String) =
    assert(dig("http://a", a) == dig("http://a", b), s"expected same digest:\n$a\n$b")
  private def assertDifferentDigest(a: String, b: String) =
    assert(dig("http://a", a) != dig("http://a", b), s"expected different digest:\n$a\n$b")

  // --- fixtures from HtmlParserTest.java:44-249 ---

  val document1: String =
    "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01 Strict//EN\" \"http://www.w3.org/TR/REC-html40/strict.dtd\">\n" +
    "\n<html>\n<head>\n<style type=\"text/css\">\n" +
    "@import \"/css/content.php\";\n@import \"/css/layout.php\";\n</style>" +
    "<title id=\"mamma\" special-type=\"li turchi\">Sebastiano Vigna</title>\n" +
    "</HEAD>\n<boDY>\n<div id=header>:::Sebastiano Vigna</div>" +
    "<div id=left>\n<ul id=\"left-nav\">" +
    "<br>Bye bye baby\n" +
    "<img SRc=\"but I'm ignoring this one\"> and not this one\n" +
    "\n\n even whitespace counts \n\n" +
    "<frame SRC=\"http://www.GOOGLE.com/\">The frame source counts</frame>\n" +
    "<iframe SRC=\"http://www.GOOGLE.com/\">And so does the iframe source</iframe>\n" +
    "</body>\n</html>"

  val document2Like1: String = document1
    .replace("/css/content.php", "/css/kxxx.php")
    .replace("<title id=\"mamma\" special-type=\"li turchi\">",
      "<tiTLE id=\"mummu\" special-type=\"liturchi\">")
    .replace("but I'm ignoring this one", "but I'm ignoring xxxxediqne")

  val document3Unlike1: String = document1
    .replace("Bye bye baby", "Bye THIS IS A DIFFERENCE IN THE TEXT bye baby")

  val document4Unlike1: String = document1
    .replace("Bye bye baby\n<img", "Bye bye baby\na<img")

  val document4bisLike1: String = document1
    .replace("Bye bye baby\n<img", "Bye bye baby\n <img")

  val document5Unlike1: String = document1
    .replace("<frame SRC=\"http://www.GOOGLE.com/\">", "<frame SRC=\"a/aFrameSource\">")

  val nofollowDoc: String =
    "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01 Strict//EN\" \"http://www.w3.org/TR/REC-html40/strict.dtd\">\n" +
    "\n<html>\n<head>\n" +
    "<title id=\"mamma\" special-type=\"li turchi\">Sebastiano Vigna</title>\n" +
    "</HEAD>\n<boDY>\n<div id=header>:::Sebastiano Vigna</div>" +
    "<div id=left>\n" +
    "<a href=\"http://nofollow.com/\" rel=nofollow hre>\n" +
    "<a href=\"http://nothing.com/\">\n" +
    "<a href=\"http://follow.com/\" rel=follow hre>\n" +
    "<ul id=\"left-nav\">" +
    "</body>\n</html>"

  // --- testDocument1 (HtmlParserTest.java:251-269) ---
  test("digest equality classes across document variants") {
    val urls = Seq(
      "http://vigna.dsi.unimi.it/xxx/yyy/a.html", "http://vigna.dsi.unimi.it/",
      "http://vigna.dsi.unimi.it/bbb", "http://vigna.dsi.unimi.it/bbb.php",
      "http://vigna.dsi.unimi.it/a")
    val docs = Seq(document1, document2Like1, document3Unlike1, document4Unlike1,
      document5Unlike1)
    val digests = urls.zip(docs).map { case (u, d) => dig(u, d) }
    assert(digests(0) == digests(1)) // attr/img-src/style changes are irrelevant
    assert(digests(0) != digests(2)) // text change counts
    assert(digests(0) != digests(3)) // single non-ws char counts
    assert(digests(0) != digests(4)) // frame src counts
  }

  // --- test3xx (HtmlParserTest.java:271-282) ---
  test("3xx location mixed into digest") {
    val d0 = dig("http://example.com/", "Foo", 301, "http://example.com/0")
    val d1 = dig("http://example.com/", "Foo", 301, "http://example.com/1")
    assert(d0 != d1)
    // same location, same digest
    assert(d0 == dig("http://example.com/", "Foo", 301, "http://example.com/0"))
  }

  // --- testDifferent / testSame (HtmlParserTest.java:301-320) ---
  test("digest difference classes") {
    assertDifferentDigest("a", "b")
    assertDifferentDigest("<a>", "<i>")
    assertDifferentDigest("<foo>", "</foo>")
    assertDifferentDigest("<frame src=a>", "<frame src=b>")
    assertDifferentDigest("<iframe src=a>", "<iframe src=b>")
    assert(dig("http://a", "x") != dig("http://b", "x")) // host seed
  }

  test("digest sameness classes") {
    assertSameDigest("<a b>", "<a c>")
    assertSameDigest("<foo>", "<bar>") // both unknown elements
    assertSameDigest("<foo >", "<foo  >")
    assertSameDigest("<img src=a>", "<img src=b>")
    assertSameDigest("<i>ciao mamma</i>", "<I>ciao mamma</I>")
    assertSameDigest(document1, document4bisLike1)
    assert(dig("http://a", "x") == dig("http://a", "x"))
  }

  // --- testWhitespaceAndDigits (HtmlParserTest.java:322-331) ---
  test("whitespace and digit coalescing") {
    assertDifferentDigest("dog cat", "dogcat")
    assertSameDigest("dog cat", "dog      cat")
    assertDifferentDigest("dog cat", " dog cat")
    assertSameDigest("dog cat", "dog434123cat")
    assertSameDigest("dog cat", "dog434123 314324cat")
    assertDifferentDigest("dog cat", "dog4341d23cat")
    assertDifferentDigest("3dog cat", "dog cat")
  }

  // --- testOutOfScript / testEmptyScript (HtmlParserTest.java:345-354) ---
  test("script/style text suppression") {
    assertSameDigest("<script>ma</script> jong", "<script>quit</script> jong")
    assertDifferentDigest("<script>ma</script></script> jang",
      "<script>quit</script></script> jong")
    assertDifferentDigest("<script src=fadfadsfas/>go", "<script src=fadfadsfas/>ga")
    assertSameDigest("<style>.a{}</style>x", "<style>.b{}</style>x")
  }

  // --- testNoFollow (HtmlParserTest.java:356-366) ---
  test("nofollow link suppression") {
    val r = HtmlParser.parse("http://example.com/", nofollowDoc)
    assert(r.links.size == 2)
    assert(r.links.toSet == Set("http://nothing.com/", "http://follow.com/"))
    val rAll = HtmlParser.parse("http://example.com/", nofollowDoc, returnNoFollow = true)
    assert(rAll.links.size == 3)
    assert(rAll.links.contains("http://nofollow.com/"))
  }

  // --- graft surface: links, spans, base, meta ---

  test("link extraction rules and document order dedup") {
    val html =
      """<html><head><base href="http://base.example/dir/">
        |<link href="style.css"><meta http-equiv="refresh" content="0;URL=go.html">
        |<meta http-equiv="location" content="http://meta.example/loc">
        |</head><body>
        |<a href="a.html">x</a><a href="a.html">dup</a>
        |<area href="/area"><img src="i.png"><script src="s.js"></script>
        |<iframe src="f.html"></iframe><embed src="e.swf"><object data="o.dat"></object>
        |</body></html>""".stripMargin
    val r = HtmlParser.parse("http://page.example/p/q.html", html)
    assert(r.links == Vector(
      "http://base.example/dir/style.css",
      "http://base.example/dir/go.html",
      "http://meta.example/loc",
      "http://base.example/dir/a.html",
      "http://base.example/area",
      "http://base.example/dir/i.png",
      "http://base.example/dir/s.js",
      "http://base.example/dir/f.html",
      "http://base.example/dir/e.swf",
      "http://base.example/dir/o.dat"))
    assert(r.metaLocation.contains("http://meta.example/loc"))
  }

  test("relative resolution without base tag uses page url") {
    val r = HtmlParser.parse("http://h.example/a/b/page.html",
      """<a href="../up.html">u</a><a href="/root.html">r</a><a href="sib.html">s</a>""")
    assert(r.links == Vector(
      "http://h.example/a/up.html", "http://h.example/root.html",
      "http://h.example/a/b/sib.html"))
  }

  test("interleaved span extraction in document order") {
    val html = "<html><body><p>hello world 42</p><img src=\"http://m/i.jpg\">" +
      "<p>second run</p><iframe src=\"http://m/f.html\"></iframe></body></html>"
    val r = HtmlParser.parse("http://h/", html)
    assert(r.spans == Vector(
      Span("text", "hello world 42", "", 0),
      Span("media", "", "http://m/i.jpg", 1),
      Span("text", "second run", "", 2),
      Span("media", "", "http://m/f.html", 3)))
  }

  test("script text yields no spans; entities decode") {
    val r = HtmlParser.parse("http://h/",
      "<script>var x = 1;</script><p>a &amp; b &lt;3 &#65;</p>")
    assert(r.spans == Vector(Span("text", "a & b <3 A", "", 0)))
  }

  test("whitespace-only runs produce no spans but count in digest") {
    val r = HtmlParser.parse("http://h/", "<p>a</p>\n  <p>b</p>")
    assert(r.spans.map(_.text) == Vector("a", "b"))
    assertDifferentDigest("<p>a</p><p>b</p>", "<p>a</p> <p>b</p>")
  }

  test("comments and doctype contribute nothing") {
    assertSameDigest("<!-- hidden -->x", "x")
    assertSameDigest("<!DOCTYPE html>x", "x")
    assert(HtmlParser.parse("http://h/", "<!-- <a href='http://x/'>y</a> -->").links.isEmpty)
  }

  // --- charset guessing (HTMLParser.java:467,666-736 semantics) ---

  test("charset: META http-equiv content-type declares the charset") {
    assert(HtmlParser.guessCharset(
      """<html><head><meta http-equiv="content-type" content="text/html; charset=UTF-8"></head></html>""")
      == Some("UTF-8"))
    // case-insensitive tag/attr names and single-quoted values
    assert(HtmlParser.guessCharset(
      """<META HTTP-EQUIV='Content-Type' CONTENT='text/html; charset=windows-1252'>""")
      == Some("windows-1252"))
    // quoted charset value (header path): delimiting quotes stripped
    assert(HtmlParser.charsetFromContentType("text/html; charset=\"x\"") == Some("x"))
    assert(HtmlParser.charsetFromContentType("text/html") == None)
  }

  test("charset: default is ISO-8859-1; modern <meta charset> form is NOT honored (reference behavior)") {
    assert(HtmlParser.guessedCharset("<html><body>x</body></html>") == "ISO-8859-1")
    // the reference scans only the http-equiv form (HTMLParser.java:701-709)
    assert(HtmlParser.guessCharset("""<meta charset="utf-8">""") == None)
    assert(HtmlParser.guessedCharset("""<meta charset="utf-8">""") == "ISO-8859-1")
  }

  test("charset: first matching meta wins; charset-less content stops the scan") {
    assert(HtmlParser.guessCharset(
      """<meta http-equiv="content-type" content="text/html; charset=KOI8-R">""" +
        """<meta http-equiv="content-type" content="text/html; charset=UTF-8">""")
      == Some("KOI8-R"))
    // first matching meta has no charset parameter: the reference returns
    // null WITHOUT considering later tags (HTMLParser.java:706-708)
    assert(HtmlParser.guessCharset(
      """<meta http-equiv="content-type" content="text/html">""" +
        """<meta http-equiv="content-type" content="text/html; charset=UTF-8">""")
      == None)
  }

  test("charset: greedy regex takes the LAST charset= inside the value; unterminated tag aborts") {
    // matches() with a greedy .* prefix — reference CHARSET_PATTERN behavior
    assert(HtmlParser.charsetFromContentType("a charset=first b charset=second")
      == Some("second"))
    assert(HtmlParser.guessCharset("<meta http-equiv=\"content-type\" content=\"x\"")
      == None) // no closing '>' (HTMLParser.java:695)
  }

  test("charset: parse() surfaces guessedCharset on the Result") {
    val r = HtmlParser.parse("http://h/",
      """<html><head><meta http-equiv="content-type" content="text/html; charset=UTF-8"></head><body>x</body></html>""")
    assert(r.guessedCharset == "UTF-8")
    assert(HtmlParser.parse("http://h/", "<p>x</p>").guessedCharset == "ISO-8859-1")
  }

  test("entity references in attribute values decode before resolve (Jericho semantics)") {
    val r = HtmlParser.parse("http://h.example/base/",
      """<a href="a?x=1&amp;y=2">l</a><img src="i.jpg?a=1&amp;b=2">""" +
        """<meta http-equiv="refresh" content="0; URL=r?p=1&amp;q=2">""")
    assert(r.links.contains("http://h.example/base/a?x=1&y=2"),
      s"href &amp; not decoded: ${r.links}")
    assert(r.links.contains("http://h.example/base/i.jpg?a=1&b=2"))
    assert(r.links.contains("http://h.example/base/r?p=1&q=2"))
    assert(!r.links.exists(_.contains("&amp;")))
  }
}
