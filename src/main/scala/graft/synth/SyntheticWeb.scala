package graft.synth

import graft.core.MurmurHash3Bubing
import graft.model.Span

/** Deterministic synthetic web of interleaved text+media documents.
  *
  * Same *shape* as the reference's load harness
  * (`bubing/test/RandomNamedGraphServer.java:62-142`, documented as THE way
  * to load-test without network, `src/overview.html:~94-101`):
  *   - hosts are synthetic IPv4 strings with lognormal-ish popularity;
  *   - per-host depth/degree are lognormal, seeded by the host;
  *   - per-page link structure is seeded by the page name;
  *   - ~1/10 of links are external, half of the rest go to the parent,
  *     the rest one level deeper; pages past the host's max depth are 404,
  *     pages at max depth have no outlinks; robots.txt has no outlinks.
  *
  * Everything is a pure function of (url, Config) — no state, no I/O — so
  * fetch simulation distributes as a typed Dataset map and two runs at any
  * parallelism produce identical crawls. RNG is SplitMix64 (public-domain
  * algorithm, Steele et al. 2014), NOT the reference's xoroshiro port:
  * only the distributional shape is reproduced, per SURVEY.md §5.
  */
object SyntheticWeb {

  case class Config(
      sites: Int = 1000,
      degree: Int = 8,
      maxDepth: Int = 3,
      seed: Long = 42L,
      /** every k-th span of a page is a media span (input_hint interleaving) */
      mediaEvery: Int = 3,
      /** 1/robotsFraction of hosts get a non-empty robots disallow list */
      robotsFraction: Int = 8,
      /** ~1/failEvery pages fail transiently (503) twice before succeeding;
        * 0 disables failures */
      failEvery: Int = 0)

  /** Minimal deterministic SplitMix64 stream. */
  final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(bound: Int): Int =
      if (bound <= 0) 0 else ((nextLong() >>> 1) % bound).toInt
    /** Box-Muller; one value per call (second deviate discarded — fine for
      * a generator that only needs the distribution's shape). */
    def nextGaussian(): Double = {
      var u = nextDouble()
      if (u < 1e-300) u = 1e-300
      math.sqrt(-2.0 * math.log(u)) * math.cos(2.0 * math.Pi * nextDouble())
    }
  }

  private val Vocab: Array[String] = Array(
    "spark", "frontier", "sieve", "crawl", "politeness", "robots", "host",
    "queue", "fetch", "parse", "digest", "link", "graph", "page", "media",
    "anchor", "token", "shard", "batch", "round", "hash", "scheme", "path")

  /** Lognormal-popularity synthetic host drawn from `rng`
    * (shape of RandomNamedGraphServer.host, :79-82). */
  def randomHost(rng: Rng, sites: Int): String = {
    val factor = 3 * math.log(sites.toDouble)
    val correction = sites.toLong * sites.toLong
    val site = math.min(Int.MaxValue - 1L, math.floor(math.exp(rng.nextDouble() * factor) / correction).toLong) + 1L
    s"${site >>> 24 & 0xff}.${site >>> 16 & 0xff}.${site >>> 8 & 0xff}.${site & 0xff}"
  }

  /** The i-th root URL: the i-th most-popular host's root (the popularity
    * draw concentrates on low site numbers), fixed order — FIXTURES.md §2
    * "the N most-popular synthetic hosts' roots". */
  def seedUrl(i: Int, cfg: Config): String = {
    val site = (i % cfg.sites) + 1L
    s"http://${site >>> 24 & 0xff}.${site >>> 16 & 0xff}.${site >>> 8 & 0xff}.${site & 0xff}/"
  }

  def hostOf(url: String): String = graft.core.Burl.host(url)

  /** Normalize a page name like the reference server: directory URLs get
    * "index.html" appended (RandomNamedGraphServer.java:100). */
  def canonicalPage(url: String): String =
    if (url.endsWith("/")) url + "index.html" else url

  private def hostParams(host: String, cfg: Config): (Int, Int) = {
    val rng = new Rng(cfg.seed ^ MurmurHash3Bubing.hashString(host))
    val maxDepth = math.min(cfg.maxDepth * 3,
      math.floor(math.exp(rng.nextGaussian() / 2 + (math.log(cfg.maxDepth.toDouble) - 1.0 / 8))).toInt)
    val meanDegree = math.min(cfg.degree * 3,
      math.floor(math.exp(rng.nextGaussian() / 2 + (math.log(cfg.degree.toDouble) - 1.0 / 8))).toInt)
    (math.max(1, maxDepth), math.max(1, meanDegree))
  }

  /** Path depth: number of '/' beyond "http://host" (RandomNamedGraphServer.java:105-106). */
  private def depthOf(page: String): Int = {
    var slashes = 0
    var i = 0
    while (i < page.length) { if (page.charAt(i) == '/') slashes += 1; i += 1 }
    slashes - 3
  }

  /** HTTP status of a page: 404 past the host's max depth, else 200. */
  def status(url: String, cfg: Config): Int = {
    val page = canonicalPage(url)
    val host = hostOf(page)
    if (host == null) return 404
    val (maxDepth, _) = hostParams(host, cfg)
    if (depthOf(page) > maxDepth) 404 else 200
  }

  /** Synthetic fetch-exception classes, shaped after the reference's
    * per-class tables (`ParsingThread.java:75-116`): a timeout-like class,
    * a connection-closed-like class, and two host-killer classes. */
  val ExceptionClasses: Vector[String] =
    Vector("socket_timeout", "connection_closed", "unknown_host", "ssl_unverified")

  /** Deterministic fetch exceptions: ~1/failEvery pages throw a fixed
    * exception class on their first `failCount` attempts (both drawn from
    * the page hash), then fetch normally — exercising the per-class
    * retry/backoff/host-killer state machine. `attempt` = how many times
    * this URL has already failed. Pure in (url, attempt, cfg); returns
    * null when the fetch succeeds. */
  def fetchExceptionAt(url: String, attempt: Int, cfg: Config): String = {
    if (cfg.failEvery <= 0) return null
    val page = canonicalPage(url)
    val h = MurmurHash3Bubing.hashString(page, cfg.seed ^ 0xFA11L)
    if (java.lang.Math.floorMod(h, cfg.failEvery.toLong) != 0L) return null
    val cls = ExceptionClasses(java.lang.Math.floorMod(h >> 8, ExceptionClasses.length.toLong).toInt)
    val failCount = 1 + java.lang.Math.floorMod(h >> 16, 3L).toInt // 1..3 failures
    if (attempt < failCount) cls else null
  }

  /** Outlinks of a page, in document order (empty for robots.txt, pages at
    * max depth, and 404s). Pure and deterministic in (url, cfg). */
  def successors(url: String, cfg: Config): Seq[String] = {
    val page = canonicalPage(url)
    val host = hostOf(page)
    if (host == null) return Nil
    if (page.substring(page.lastIndexOf('/') + 1) == "robots.txt") return Nil
    val (maxDepth, meanDegree) = hostParams(host, cfg)
    val d = depthOf(page)
    if (d >= maxDepth) return Nil // at/past max depth: no outlinks
    val rng = new Rng(cfg.seed ^ MurmurHash3Bubing.hashString(page))
    val degree = math.max(0, (meanDegree + rng.nextGaussian()).toInt)
    val dir = page.substring(0, page.lastIndexOf('/') + 1)
    (0 until degree).map { _ =>
      if (rng.nextDouble() < 0.1) {
        // external link to a random host at a random depth
        var depth = (maxDepth * math.min(1.0, math.abs(rng.nextGaussian()))).toInt
        val sb = new StringBuilder("http://").append(randomHost(rng, cfg.sites)).append('/')
        while (depth > 0) { sb.append(rng.nextInt(math.max(1, degree))).append('/'); depth -= 1 }
        sb.append("index.html").toString
      } else if (d > 0 && rng.nextDouble() < 0.5) {
        // shallower: parent directory
        val cut = dir.lastIndexOf('/', dir.length - 2)
        dir.substring(0, cut + 1) + "index.html"
      } else {
        // deeper
        dir + rng.nextInt(math.max(1, degree)) + "/index.html"
      }
    }
  }

  /** Interleaved span sequence of a page (input_hint schema): text spans
    * with deterministic token content, every `mediaEvery`-th span a media
    * ref. Digits are embedded in text to exercise the digest's
    * digit-coalescing. Pure and deterministic in (url, cfg). */
  def pageSpans(url: String, cfg: Config): Seq[Span] = {
    val page = canonicalPage(url)
    val host = hostOf(page)
    if (host == null) return Nil
    if (status(page, cfg) != 200) return Nil
    val rng = new Rng(cfg.seed ^ MurmurHash3Bubing.hashString("spans:" + page))
    val nSpans = 2 + rng.nextInt(5)
    (0 until nSpans).map { i =>
      if (cfg.mediaEvery > 0 && i % cfg.mediaEvery == cfg.mediaEvery - 1) {
        val ref = s"http://$host/media/img${rng.nextInt(1 << 16)}.jpg"
        Span("media", "", ref, i)
      } else {
        val nTokens = 4 + rng.nextInt(12)
        val words = (0 until nTokens).map { _ =>
          if (rng.nextDouble() < 0.15) String.valueOf(rng.nextInt(10000))
          else Vocab(rng.nextInt(Vocab.length))
        }
        Span("text", words.mkString(" "), "", i)
      }
    }
  }

  /** Render a page as HTML markup: the span sequence becomes `<p>` text
    * runs interleaved with `<img src>` media elements, outlinks become
    * `<a href>` anchors — so the crawl's fetch+parse path runs the REAL
    * `HtmlParser` surface (links + spans + digest from markup) instead of
    * consuming the generator's outputs directly. `HtmlParser.parse`
    * round-trips this rendering back to exactly `pageSpans` and the
    * media-refs ++ deduplicated `successors` link sequence. */
  /** Charset a host's pages declare via META http-equiv (null = none →
    * the parser's ISO-8859-1 default); deterministic in the host. */
  def declaredCharset(host: String, cfg: Config): String = {
    val h = MurmurHash3Bubing.hashString(host, cfg.seed ^ 0x43686172736574L) // "Charset"
    java.lang.Math.floorMod(h, 3L) match {
      case 0L => "UTF-8"
      case 1L => "windows-1252"
      case _  => null
    }
  }

  def pageHtml(url: String, cfg: Config): String = {
    val spans = pageSpans(url, cfg)
    val links = successors(url, cfg)
    val sb = new StringBuilder(512)
    sb.append("<html><head>")
    val h0 = hostOf(canonicalPage(url))
    val cs = if (h0 == null) null else declaredCharset(h0, cfg)
    if (cs != null)
      sb.append("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=")
        .append(cs).append("\">")
    sb.append("<title></title></head><body>")
    spans.foreach { sp =>
      if (sp.kind == "media") sb.append("<img src=\"").append(sp.media_ref).append("\">")
      else sb.append("<p>").append(sp.text).append("</p>")
    }
    links.foreach(l => sb.append("<a href=\"").append(l).append("\"></a>"))
    sb.append("</body></html>")
    sb.toString
  }

  /** Deterministic robots policy: 1/robotsFraction of hosts disallow the
    * "/0/" subtree (exercises the broadcast robots state table). */
  def robotsPrefixes(host: String, cfg: Config): Seq[String] = {
    val h = MurmurHash3Bubing.hashString(host, cfg.seed ^ 0x526f626f7473L) // "Robots"
    if (java.lang.Math.floorMod(h, cfg.robotsFraction.toLong) == 0L) Seq("/0/") else Nil
  }

  /** robots.txt content for a host — round-trips through Robots.parse so
    * the whole robots path (fetch -> parse -> broadcast table) is real. */
  def robotsContent(host: String, cfg: Config): String = {
    val prefixes = robotsPrefixes(host, cfg)
    if (prefixes.isEmpty) "User-agent: *\nDisallow:\n"
    else "User-agent: *\n" + prefixes.map(p => s"Disallow: $p").mkString("\n") + "\n"
  }
}
