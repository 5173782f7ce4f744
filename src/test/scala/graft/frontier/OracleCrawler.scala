package graft.frontier

import scala.collection.mutable

import graft.core.{Burl, DuplicateSegments, MurmurHash3Bubing, Robots}
import graft.synth.SyntheticWeb

/** Reference-faithful single-threaded interpreter of the crawl semantics —
  * the oracle of SURVEY.md §5: "a scala port of the same oracle loop run
  * single-threaded" (the reference's own determinism config: 1 fetch
  * thread, keepAliveTime=0, fake DNS). The Spark `Crawler` at ANY
  * parallelism must reproduce this trace and seen-set exactly. */
object OracleCrawler {

  case class TraceRow(round: Int, seq: Long, url: String, isRobots: Boolean, status: Int)

  private class HostSt(val sa: String, val ipHash: Long) {
    var nextFetch = 0L
    var stored = 0L
    var robotsDone = false
    var purged = false
    var retries = 0
    var robotsPrefixes: Array[String] = Array.empty
    /** pending urls by seq (FIFO per host) */
    val pending = mutable.TreeMap[Long, String]()
  }

  /** Matches the default CrawlConfig.scheduleFilter DSL. */
  private def passesScheduleFilter(url: String): Boolean = {
    val scheme = Burl.scheme(url)
    (scheme == "http" || scheme == "https") &&
      url.length < 2048 &&
      DuplicateSegments.lessThan(Burl.path(url), 3)
  }

  def run(cfg: CrawlConfig): (Vector[TraceRow], Set[Long]) = {
    val web = cfg.web
    val hosts = mutable.LinkedHashMap[String, HostSt]()
    val ipNextFetch = mutable.Map[Long, Long]()
    val seen = mutable.Set[Long]()
    val trace = mutable.ArrayBuffer[TraceRow]()
    var maxSeq = 0L

    /** Sieve + budget + frontier insert. `candidates` are (parentSeq,
      * linkIdx, normalizedUrl) already schedule-filtered; `storedSnapshot`
      * is the per-host stored count at ROUND START (the Spark round joins
      * the previous state's hosts table for the budget check). */
    def enqueue(candidates: Seq[(Long, Long, String)],
        storedSnapshot: Map[String, Long], applyBudget: Boolean = true): Unit = {
      val ordered = candidates.sortBy(c => (c._1, c._2))
      val batchSeen = mutable.Set[Long]()
      val perHostRank = mutable.Map[String, Long]()
      for ((_, _, url) <- ordered) {
        val h = MurmurHash3Bubing.hashString(url)
        if (!batchSeen.contains(h) && !seen.contains(h)) {
          batchSeen += h
          seen += h // seen even if budget-dropped (Frontier.java:810-814)
          val sa = Burl.schemeAndAuthority(url)
          val rank = perHostRank.getOrElse(sa, 0L) + 1L
          perHostRank(sa) = rank
          val priorStored = storedSnapshot.getOrElse(sa, 0L)
          val seq = maxSeq
          maxSeq += 1
          if (!applyBudget || priorStored + rank <= cfg.maxUrlsPerHost) {
            val ipHash = Burl.ipOfHost(Burl.host(url), cfg.ipSpace)
            val host = hosts.getOrElseUpdate(sa, new HostSt(sa, ipHash))
            host.pending(seq) = url
            ipNextFetch.getOrElseUpdate(host.ipHash, 0L)
          }
        }
      }
    }

    // ---- init: seeds through the sieve (no schedule filter on seeds) ----
    val seedCandidates = (0 until cfg.nSeeds)
      .map(i => (-1L, i.toLong, Burl.parse(SyntheticWeb.seedUrl(i, web))))
      .filter(_._3 != null)
    enqueue(seedCandidates, Map.empty, applyBudget = false) // seeds skip budget (like Crawler.init)

    // ---- rounds ----
    var round = 0
    var done = false
    while (round < cfg.maxRounds && !done) {
      round += 1
      val now = round.toLong
      val storedSnapshot = hosts.map { case (sa, h) => sa -> h.stored }.toMap

      // eligible hosts with pending work, grouped by IP, best per IP
      val byIp = mutable.Map[Long, HostSt]()
      for (h <- hosts.values) {
        if (!h.purged && h.nextFetch <= now && h.pending.nonEmpty &&
            ipNextFetch.getOrElse(h.ipHash, 0L) <= now) {
          val p = h.pending.firstKey
          byIp.get(h.ipHash) match {
            case Some(best) =>
              val bp = best.pending.firstKey
              if (p < bp || (p == bp && h.sa < best.sa)) byIp(h.ipHash) = h
            case None => byIp(h.ipHash) = h
          }
        }
      }

      val newLinks = mutable.ArrayBuffer[(Long, Long, String)]()
      var fetchedAny = false
      // deterministic host iteration (order does not affect semantics)
      for (h <- byIp.values.toSeq.sortBy(_.sa)) {
        if (!h.robotsDone) {
          trace += TraceRow(round, -1L, h.sa + "/robots.txt", isRobots = true, 200)
          h.robotsPrefixes = Robots.parse(SyntheticWeb.robotsContent(Burl.host(h.sa), web), "graft")
          h.robotsDone = true
          h.nextFetch = now + cfg.hostDelay
          ipNextFetch(h.ipHash) = now + cfg.ipDelay
          fetchedAny = true
        } else {
          // drop robots-disallowed pending urls (fetch-time gate)
          val disallowedSeqs = h.pending.filter { case (_, url) =>
            !Robots.allowed(h.robotsPrefixes, Burl.pathAndQuery(url))
          }.keys.toSeq
          disallowedSeqs.foreach(h.pending.remove)
          val burst = h.pending.take(cfg.burst).toSeq
          if (burst.nonEmpty) {
            var anyFailed = false
            for ((seq, url) <- burst) {
              // attempt = host retries at round start (matches the Spark
              // side, where FetchUnit.attempt joins the prev-round hosts)
              val st = SyntheticWeb.statusAt(url, h.retries, web)
              trace += TraceRow(round, seq, url, isRobots = false, st)
              if (st >= 500) anyFailed = true // transient: URL stays pending
              else h.pending.remove(seq)
              if (st == 200) {
                h.stored += 1
                val links = SyntheticWeb.successors(url, web)
                links.zipWithIndex.foreach { case (l, i) => newLinks += ((seq, i.toLong, l)) }
              }
            }
            if (anyFailed) {
              h.nextFetch = now + cfg.retryDelay * (1L << h.retries)
              h.retries += 1
            } else {
              h.nextFetch = now + cfg.hostDelay
              h.retries = 0
            }
            ipNextFetch(h.ipHash) = now + cfg.ipDelay
            fetchedAny = true
          }
        }
        if (h.stored >= cfg.maxUrlsPerHost || h.retries > cfg.maxRetries) h.purged = true
      }

      val blacklist = cfg.blacklistHosts.toSet
      val parsedLinks = newLinks.toSeq
        .map { case (ps, li, spec) => (ps, li, Burl.parse(spec)) }
        .filter(_._3 != null)
        .filter(c => passesScheduleFilter(c._3))
        .filter(c => blacklist.isEmpty || !blacklist.contains(Burl.host(c._3)))
      enqueue(parsedLinks, storedSnapshot)

      if (!fetchedAny && hosts.values.forall(h => h.pending.isEmpty || h.purged))
        done = true
    }

    (trace.toVector, seen.toSet)
  }
}
