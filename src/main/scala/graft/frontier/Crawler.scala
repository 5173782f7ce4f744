package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Burl, FilterDsl, Robots}
import graft.functions._
import graft.model._
import graft.synth.SyntheticWeb

/** Crawl configuration. Politeness delays are in *virtual rounds*: the
  * reference's wall-clock `schemeAuthorityDelay`/`ipDelay`
  * (`StartupConfiguration`, `ParsingThread.java:271-274,317`) become
  * round-stamped virtual time (`now = round`), which preserves the
  * scheduling ORDER — the quantity BASELINE requires — independent of
  * wall-clock jitter and parallelism (SURVEY.md §7.4). */
case class CrawlConfig(
    web: SyntheticWeb.Config = SyntheticWeb.Config(),
    nSeeds: Int = 8,
    hostDelay: Long = 2,
    ipDelay: Long = 1,
    /** keep-alive burst: URLs fetched per host per round (FetchingThread.java:298,390) */
    burst: Int = 1,
    /** per-host URL budget (maxUrlsPerSchemeAuthority, Frontier.java:615-618) */
    maxUrlsPerHost: Long = Long.MaxValue,
    maxRounds: Int = 8,
    /** schedule filter DSL applied to outlinks (StartupConfiguration.java:182-184) */
    scheduleFilter: String =
      "( SchemeEquals(http) or SchemeEquals(https) ) and URLShorterThan(2048) and DuplicateSegmentsLessThan(3)",
    /** fetch filter DSL applied to URLs about to be fetched
      * (FetchingThread.java:300-303); failing URLs are discarded */
    fetchFilter: String = "true",
    /** blacklisted hosts, dropped at enqueue time before the sieve
      * (FrontierEnqueuer / blacklist gates, ParsingThread.java:186-195) */
    blacklistHosts: Seq[String] = Nil,
    /** transient-error backoff: next_fetch = now + retryDelay * 2^retries;
      * past maxRetries the host is purged (ParsingThread.java:75-116,276-312) */
    retryDelay: Long = 1,
    maxRetries: Int = 4,
    /** body truncation (responseBodyMaxByteSize, FetchData.java:313,331-332):
      * text spans are cut at this many cumulative chars, truncated flag set */
    maxBodyChars: Int = Int.MaxValue,
    /** false = hosts start with robotsDone (benchmark mode) */
    robotsEnabled: Boolean = true,
    /** false = skip the docs/digests store writes (frontier-only benchmark:
      * the north metric is URLs scheduled+deduped/sec; the store is the
      * WARC-sink side) */
    storeDocs: Boolean = true,
    useBloom: Boolean = true,
    bloomFpp: Double = 0.01,
    /** fixed bloom capacity so per-round blooms are mergeable (the
      * "broadcast-refreshed" filter is extended, not rebuilt, each round) */
    bloomExpected: Long = 4L << 20,
    /** below this seen-size the bloom prefilter is skipped (anti-join alone
      * is cheaper than building + broadcasting the filter) */
    bloomMinSeen: Long = 50000L,
    /** candidate batches at or below this size probe the seen table via a
      * broadcast hash set (scan, no shuffle); above it, sort-merge anti-join */
    probeThreshold: Long = 2L << 20,
    ipSpace: Long = 1L << 20,
    /** state-snapshot cadence in rounds (1 = commit every round, the
      * Iceberg per-round-commit analog; larger values trade recovery
      * granularity for fewer write barriers — rounds between snapshots
      * re-execute deterministically on resume) */
    checkpointEvery: Int = 1,
    /** shuffle/write parallelism for the state tables */
    statePartitions: Int = 32,
    /** compact the frontier (drop tombstoned rows) once this many
      * tombstones accumulate — the BUbiNG virtualizer-GC / Iceberg
      * merge-on-read analog (WorkbenchVirtualizer.java:132-143) */
    tombstoneCompactRows: Long = 2L << 20,
    /** print per-round wall times (bench diagnostics) */
    logRounds: Boolean = false,
    /** storage level for in-memory state blocks between snapshots;
      * DISK_ONLY + spark.local.dir on tmpfs keeps the (large) frontier/seen
      * blocks out of the JVM heap — GC pressure, not CPU, is the local-mode
      * scaling limiter otherwise */
    stateStorage: String = "MEMORY_AND_DISK")

/** One URL selected for fetching this round. `attempt` = the host's current
  * retry count (drives the deterministic transient-failure model). */
case class FetchUnit(
    url: String,
    schemeAuthority: String,
    host: String,
    pathQuery: String,
    urlHash: Long,
    hostHash: Long,
    ipHash: Long,
    seq: Long,
    isRobots: Boolean,
    attempt: Int)

/** The frontier + fetch scheduler: BUbiNG's Agent/Frontier/Workbench loop
  * re-expressed as an iterative batch DAG over snapshot-checkpointed state
  * tables (SURVEY.md §3.2 "Spark reading").
  *
  * One round =
  * {{{
  *   eligible = frontier ⋈ hosts ⋈ ips  (politeness windows, rank-1 per IP)
  *   fetched  = eligible.map(syntheticFetch)            // typed Dataset map
  *   parsed   = fetched -> spans, links, digest
  *   newUrls  = links |> scheduleFilter |> burl_parse |> sieve (anti-join,
  *              first-enqueue order) |> budget check
  *   state'   = append/update snapshot tables
  * }}}
  *
  * State layout under `workDir` (the Iceberg-snapshot analog; with Iceberg
  * on the cluster the snapshot dirs become table snapshots and the
  * append dirs become append commits):
  * {{{
  *   state/round=N/{frontier,hosts,ips,robots,scalars}   (every checkpointEvery rounds)
  *   seen/round=N, docs/round=N, digests/round=N,
  *   trace/round=N, metrics/round=N                      (append-only, every round)
  * }}}
  * Between snapshots the state tables are threaded in memory
  * (`localCheckpoint` truncates lineage without a parquet round-trip);
  * `run()` resumes from the last complete snapshot and deterministically
  * re-executes any rounds after it.
  */
class Crawler(spark: SparkSession, workDir: String, cfg: CrawlConfig) {
  import spark.implicits._

  private val stateLevel = org.apache.spark.storage.StorageLevel.fromString(cfg.stateStorage)
  /** localCheckpoint at the configured storage level: materialize + truncate
    * lineage for state threaded between rounds. */
  private def lc(df: DataFrame): DataFrame = df.localCheckpoint(true, stateLevel)

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(workDir), spark.sparkContext.hadoopConfiguration)

  private def stateDir(round: Int, table: String) = f"$workDir/state/round=$round%05d/$table"
  private def appendDir(table: String, round: Int) = f"$workDir/$table/round=$round%05d"

  private def exists(path: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(path))

  /** In-memory state threaded between rounds (lineage truncated via
    * localCheckpoint); rebuilt from the last parquet snapshot on resume. */
  private case class LiveState(round: Int, maxSeq: Long, frontier: DataFrame,
      hosts: DataFrame, ips: DataFrame, robots: DataFrame,
      seen: DataFrame, digests: DataFrame,
      /** append-only frontier: fetched/dropped rows are tombstoned by hash
        * and physically removed only at compaction/snapshot (the
        * virtualizer-log + GC-by-compaction-ratio analog, SURVEY.md §4 P5) */
      tombstones: DataFrame, pendingRows: Long, tombRows: Long)
  private var live: Option[LiveState] = None

  // ---------------- initialization (round 0) ----------------

  /** Seed the crawl: normalize seeds, sieve them (dedup), write round-0 state. */
  def init(): Unit = {
    val seeds = (0 until cfg.nSeeds)
      .map(i => (SyntheticWeb.seedUrl(i, cfg.web), i)) // explicit seed-list order
      .toDF("spec", "linkIdx")
    // Seeds come as an ordered list; normalize exactly like enqueue does.
    val candidates = seeds
      .withColumn("url", burl_parse(col("spec")))
      .where(col("url").isNotNull)
      .withColumn("parentSeq", lit(-1L))
      .withColumn("urlHash", murmur64(col("url")))
      .select("url", "urlHash", "parentSeq", "linkIdx")

    val emptySeen = spark.emptyDataset[Long].toDF("urlHash")
    val newUrls = Sieve.assignSeq(
      Sieve.newUrls(candidates, emptySeen, Seq("parentSeq", "linkIdx")),
      Seq("parentSeq", "linkIdx"), startSeq = -1L) // seqs from 0

    val frontier = toFrontier(newUrls, round = 0).transform(lc)
    frontier.select("urlHash").write.mode(SaveMode.Overwrite).parquet(appendDir("seen", 0))
    val hosts = newHostsFrom(frontier, emptyHosts).transform(lc)
    val ips = newIpsFrom(frontier, emptyIps).transform(lc)
    val robots = emptyRobots
    val maxSeq = frontier.count()
    writeState(0, frontier, hosts, ips, robots, maxSeq)
    live = Some(LiveState(0, maxSeq, frontier, hosts, ips, robots,
      frontier.select("urlHash").transform(lc), emptyDigests,
      emptyTombstones, pendingRows = maxSeq, tombRows = 0L))
  }

  private def emptyHosts = spark.emptyDataset[HostState].toDF
  private def emptyIps = spark.emptyDataset[IpState].toDF
  private def emptyRobots = spark.emptyDataset[RobotsEntry].toDF
  private def emptyDigests = Seq.empty[String].toDF("digest")
  private def emptyTombstones = Seq.empty[Long].toDF("urlHash")

  private def toFrontier(newUrls: DataFrame, round: Int): DataFrame =
    newUrls
      .withColumn("schemeAuthority", burl_scheme_authority(col("url")))
      .withColumn("pathQuery", burl_path_query(col("url")))
      .withColumn("host", burl_host(col("url")))
      .withColumn("hostHash", murmur64(col("host")))
      .withColumn("ipHash", ip_of_host(col("host"), cfg.ipSpace))
      .withColumn("round", lit(round))
      .select("url", "schemeAuthority", "pathQuery", "host", "urlHash",
        "hostHash", "ipHash", "seq", "round")

  private def newHostsFrom(frontier: DataFrame, hosts: DataFrame): DataFrame =
    frontier.groupBy("schemeAuthority")
      .agg(first("hostHash").as("hostHash"), first("ipHash").as("ipHash"))
      .join(hosts.select("schemeAuthority"), Seq("schemeAuthority"), "left_anti")
      .withColumn("nextFetch", lit(0L))
      .withColumn("stored", lit(0L))
      .withColumn("robotsDone", lit(!cfg.robotsEnabled))
      .withColumn("purged", lit(false))
      .withColumn("retries", lit(0))
      .withColumn("lastError", lit(null).cast("string"))
      .select("schemeAuthority", "hostHash", "ipHash", "nextFetch", "stored",
        "robotsDone", "purged", "retries", "lastError")

  private def newIpsFrom(frontier: DataFrame, ips: DataFrame): DataFrame =
    frontier.select("ipHash").distinct()
      .join(ips.select("ipHash"), Seq("ipHash"), "left_anti")
      .withColumn("nextFetch", lit(0L))
      .select("ipHash", "nextFetch")

  private def writeState(round: Int, frontier: DataFrame, hosts: DataFrame,
      ips: DataFrame, robots: DataFrame, maxSeq: Long): Unit = {
    // Frontier and hosts are laid out by hostHash — the reference's
    // agent-assignment function (BubingJob.java:47-52); at cluster scale
    // this becomes Iceberg bucket partitioning so the per-round
    // frontier⋈hosts join is co-partitioned (SURVEY.md §4).
    frontier.repartition(cfg.statePartitions, col("hostHash"))
      .write.mode(SaveMode.Overwrite).parquet(stateDir(round, "frontier"))
    hosts.repartition(math.max(1, cfg.statePartitions / 4), col("hostHash"))
      .write.mode(SaveMode.Overwrite).parquet(stateDir(round, "hosts"))
    ips.repartition(math.max(1, cfg.statePartitions / 4), col("ipHash"))
      .write.mode(SaveMode.Overwrite).parquet(stateDir(round, "ips"))
    robots.repartition(math.max(1, cfg.statePartitions / 4))
      .write.mode(SaveMode.Overwrite).parquet(stateDir(round, "robots"))
    Seq((maxSeq, round)).toDF("maxSeq", "round")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(stateDir(round, "scalars"))
  }

  /** Append-only tables are laid out as round=N partition dirs: one
    * partition-discovering scan + pruning filter, not a union of reads
    * (the Iceberg-append analog). */
  private def readSeen(uptoRound: Int): DataFrame =
    spark.read.parquet(s"$workDir/seen")
      .where(col("round") <= uptoRound).select("urlHash")

  private def readDigests(uptoRound: Int): DataFrame = {
    if (!exists(s"$workDir/digests")) emptyDigests
    else spark.read.parquet(s"$workDir/digests")
      .where(col("round") <= uptoRound).select("digest")
  }

  private def loadState(round: Int): LiveState = {
    val maxSeq = spark.read.parquet(stateDir(round, "scalars"))
      .collect()(0).getAs[Long]("maxSeq")
    val frontier = spark.read.parquet(stateDir(round, "frontier"))
    LiveState(round, maxSeq, frontier,
      spark.read.parquet(stateDir(round, "hosts")),
      spark.read.parquet(stateDir(round, "ips")),
      spark.read.parquet(stateDir(round, "robots")),
      readSeen(round), readDigests(round),
      emptyTombstones, pendingRows = frontier.count(), tombRows = 0L)
  }

  /** Incrementally-maintained broadcast bloom over the seen set: merged
    * with each round's (small) new-hash bloom instead of rebuilt from the
    * full table (north_rule "broadcast-refreshed bloom URL-seen set").
    * Fixed capacity keeps the filters mergeable. */
  private var bloomCache: Option[(Int, org.apache.spark.util.sketch.BloomFilter)] = None

  private def seenBloom(state: LiveState): Option[org.apache.spark.util.sketch.BloomFilter] = {
    if (!cfg.useBloom) return None
    bloomCache match {
      case Some((r, bf)) if r == state.round => Some(bf)
      case Some((r, bf)) if r < state.round =>
        // extend with the per-round hash deltas directly on the driver: a
        // delta is |new urls| longs (MBs), vs a full-capacity distributed
        // bloom build whose bitset merges would dwarf the data. (At cluster
        // scale with 10^8-row deltas this flips back to a distributed
        // delta-bloom + mergeInPlace.)
        for (rr <- r + 1 to state.round; if exists(appendDir("seen", rr))) {
          import spark.implicits._
          spark.read.parquet(appendDir("seen", rr))
            .select("urlHash").as[Long].collect().foreach(bf.putLong)
        }
        bloomCache = Some((state.round, bf))
        Some(bf)
      case _ =>
        if (state.maxSeq < cfg.bloomMinSeen) None // anti-join alone is cheaper
        else {
          val bf = state.seen.stat.bloomFilter("urlHash", cfg.bloomExpected, cfg.bloomFpp)
          bloomCache = Some((state.round, bf))
          Some(bf)
        }
    }
  }

  /** Max round=N child of a dir (snapshots can be sparse under
    * checkpointEvery > 1; wait rounds have no appends). */
  private def maxRoundIn(dir: String, complete: String => Boolean): Int = {
    if (!exists(dir)) return -1
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("round=") => s.stripPrefix("round=").toInt }
      .filter(r => complete(f"$dir/round=$r%05d"))
      .foldLeft(-1)(math.max)
  }

  /** Last round with a complete state snapshot, or -1. */
  def lastCompleteRound(): Int =
    maxRoundIn(s"$workDir/state", d => exists(s"$d/scalars/_SUCCESS"))

  /** Last round with trace appends or a snapshot (>= lastCompleteRound). */
  private def lastAppendRound(): Int =
    math.max(maxRoundIn(s"$workDir/trace", _ => true), lastCompleteRound())

  // ---------------- one round ----------------

  /** Execute round `round` (state `round-1` from memory or snapshot).
    * Returns the number of URLs fetched. */
  def runRound(round: Int): Long = {
    val prev = round - 1
    val st = live.filter(_.round == prev).getOrElse(loadState(prev))
    // pending view: append-only frontier minus tombstoned (fetched/dropped)
    // rows; the broadcast anti-join is a scan-side filter, no frontier
    // shuffle (compaction keeps the tombstone set small)
    val frontier =
      if (st.tombRows == 0) st.frontier
      else st.frontier.join(broadcast(st.tombstones), Seq("urlHash"), "left_anti")
    val hosts = st.hosts
    val ips = st.ips
    val robots = st.robots
    val seen = st.seen
    val maxSeq = st.maxSeq
    val now = round.toLong

    // --- politeness selection (SURVEY.md §2.5 window-ranked workbench) ---
    // host priority = earliest pending seq (FIFO per host,
    // VisitState.java:284-304); the ONE full frontier aggregation per round
    // (map-side partial agg shrinks the shuffle to #hosts), which also
    // serves as the has-pending-work filter via the inner join below.
    val hostPriority = frontier.groupBy("schemeAuthority").agg(min("seq").as("priority"))

    // one host per IP per round (WorkbenchEntry: one VisitState per entry in
    // flight; ParsingThread.java:271-274): rank-1 per ipHash window
    val ipReady = ips.where(col("nextFetch") <= now).select("ipHash")
    val wIp = Window.partitionBy("ipHash").orderBy(col("priority"), col("schemeAuthority"))
    val selectedHosts = hosts
      .where(!col("purged") && col("nextFetch") <= now)
      .join(hostPriority, Seq("schemeAuthority")) // inner: only hosts with pending work
      .join(ipReady, Seq("ipHash"), "left_semi")
      .withColumn("__r", row_number().over(wIp))
      .where(col("__r") === 1)
      .drop("__r", "priority")

    // robots.txt jumps the host queue (VisitState.java:193-216): hosts with
    // robots not yet fetched spend their slot on robots.txt.
    val robotsHosts = selectedHosts.where(!col("robotsDone"))
    val pageHosts = selectedHosts.where(col("robotsDone"))

    val robotsUnits = robotsHosts
      .select(
        concat(col("schemeAuthority"), lit("/robots.txt")).as("url"),
        col("schemeAuthority"),
        burl_host(col("schemeAuthority")).as("host"),
        lit("/robots.txt").as("pathQuery"),
        murmur64(concat(col("schemeAuthority"), lit("/robots.txt"))).as("urlHash"),
        col("hostHash"), col("ipHash"),
        lit(-1L).as("seq"),
        lit(true).as("isRobots"),
        col("retries").as("attempt"))

    // pending URLs of selected page-hosts, robots- and fetch-filtered,
    // top-`burst` by seq (salted two-phase rank: a heavy host's queue never
    // lands in a single window partition, P13)
    val fetchable = FilterDsl.compile(cfg.fetchFilter, FilterDsl.urlContext(col("url")))
    val pendingOfSelected = frontier
      .join(pageHosts.select("schemeAuthority", "retries"), Seq("schemeAuthority"))
      .join(robots, Seq("schemeAuthority"), "left")
      .withColumn("__keep",
        (when(col("prefixes").isNull, lit(true))
          .otherwise(respects_robots(col("pathQuery"), col("prefixes")))) && fetchable)
    val disallowed = pendingOfSelected.where(!col("__keep"))
      .select("urlHash").cache()
    val pageUnits = Ranking
      .topKPerKey(pendingOfSelected.where(col("__keep")), "hostHash",
        Seq("seq"), cfg.burst, rankCol = "__r")
      .select(col("url"), col("schemeAuthority"), col("host"), col("pathQuery"),
        col("urlHash"), col("hostHash"), col("ipHash"), col("seq"),
        lit(false).as("isRobots"), col("retries").as("attempt"))

    // cached: the politeness-selection pipeline feeds fetch, trace, and
    // parent-seq joins — without the cache it re-executes per consumer
    val units = robotsUnits.unionByName(pageUnits).as[FetchUnit].cache()

    // --- synthetic fetch + parse (typed Dataset map; pure functions) ---
    val webCfg = cfg.web
    val maxBody = cfg.maxBodyChars
    val fetched: Dataset[FetchResult] = units.map { u =>
      if (u.isRobots) {
        FetchResult(u.url, u.urlHash, u.schemeAuthority, u.host, u.ipHash, u.seq, 200,
          isRobots = true, truncated = false, spans = Nil, links = Nil, round = round)
      } else {
        val s = SyntheticWeb.statusAt(u.url, u.attempt, webCfg)
        val rawSpans = if (s == 200) SyntheticWeb.pageSpans(u.url, webCfg) else Nil
        // body truncation (FetchData.java:313,331-332): cut text spans at
        // the cumulative char budget
        var budget = maxBody
        var truncated = false
        val spans = rawSpans.takeWhile { sp =>
          if (truncated) false
          else {
            val cost = sp.text.length
            if (cost <= budget) { budget -= cost; true }
            else { truncated = true; false }
          }
        }
        val links = if (s == 200) SyntheticWeb.successors(u.url, webCfg) else Nil
        FetchResult(u.url, u.urlHash, u.schemeAuthority, u.host, u.ipHash, u.seq, s,
          isRobots = false, truncated = truncated, spans = spans, links = links,
          round = round)
      }
    }.cache()

    val fetchedCount = fetched.count()
    if (fetchedCount == 0) {
      // politeness wait: carry state forward, snapshot on cadence
      val snapped = maybeSnapshot(round, frontier, hosts, ips, robots, maxSeq, force = false)
      live = Some(
        if (snapped)
          st.copy(round = round,
            frontier = spark.read.parquet(stateDir(round, "frontier")),
            tombstones = emptyTombstones, pendingRows = st.pendingRows, tombRows = 0L)
        else st.copy(round = round))
      fetched.unpersist(); units.unpersist(); disallowed.unpersist()
      return 0
    }

    // trace: the crawl ordering artifact (round, seq, url). `round` lives
    // in the round=N directory name (a real partition column), so readers
    // do ONE partition-discovering scan with pruning — not a union of reads.
    fetched.toDF
      .select(col("seq"), col("url"), col("isRobots"), col("status"))
      .write.mode(SaveMode.Overwrite).parquet(appendDir("trace", round))

    // --- store: docs with digest + exact cross-crawl duplicate detection ---
    val digestsSeen = st.digests
    val pages = fetched.toDF.where(!col("isRobots") && col("status") === 200)
    val (docs, newDigests) = if (cfg.storeDocs) {
      val docsRaw = pages
        .withColumn("digest", digest_of_spans(col("host"), col("spans"), col("status"), lit(null).cast("string")))
      // within-round duplicate = not the digest's first seq; aggregation-
      // based (partial agg), so a viral duplicate page is skew-immune
      val firstDigest = docsRaw.groupBy("digest").agg(min("seq").as("__minSeq"))
      val d = docsRaw
        .join(firstDigest, Seq("digest"))
        .withColumn("__dupInBatch", col("seq") > col("__minSeq"))
        .join(digestsSeen.select(col("digest"), lit(true).as("__dupAcross")), Seq("digest"), "left")
        .withColumn("is_duplicate", col("__dupInBatch") || coalesce(col("__dupAcross"), lit(false)))
        .select(col("url").as("doc_id"), col("schemeAuthority"), col("spans"),
          col("digest"), col("status"), col("is_duplicate"), col("truncated"),
          size(col("links")).as("n_links")) // round = partition dir
        .cache()
      d.write.mode(SaveMode.Overwrite).parquet(appendDir("docs", round))
      val nd = d.where(!col("is_duplicate")).select("digest").distinct()
      nd.write.mode(SaveMode.Overwrite).parquet(appendDir("digests", round))
      (d, nd)
    } else (pages.limit(0).select(col("url").as("doc_id")).cache(), emptyDigests)

    // --- robots parse -> broadcast state table update ---
    val newRobots = fetched.where(col("isRobots")).map { r =>
      RobotsEntry(r.schemeAuthority,
        Robots.parse(SyntheticWeb.robotsContent(r.host, webCfg), "graft").toSeq)
    }.toDF

    // --- outlink extraction -> schedule filter -> sieve (SURVEY.md §3.2) ---
    val rawLinks = pages
      .select(col("seq").as("parentSeq"), posexplode(col("links")).as(Seq("linkIdx", "spec")))
    val blacklistGate =
      if (cfg.blacklistHosts.isEmpty) lit(true)
      else !burl_host(col("url")).isin(cfg.blacklistHosts: _*)
    val parsedLinks = rawLinks
      .withColumn("url", burl_parse(col("spec")))
      .where(col("url").isNotNull)
      .where(FilterDsl.compile(cfg.scheduleFilter, FilterDsl.urlContext(col("url"))))
      .where(blacklistGate)
      .withColumn("urlHash", murmur64(col("url")))
      .select("url", "urlHash", "parentSeq", "linkIdx")
      .cache()
    val dedupIn = parsedLinks.count()

    val bloom = seenBloom(st)
    // Small batches probe the seen table with a broadcast hash set (one
    // sequential scan, no shuffle of seen); big batches fall back to SMJ.
    val broadcastProbe = dedupIn <= cfg.probeThreshold
    // first new seq is exactly maxSeq (dense continuation of enqueue order)
    val sieved = Sieve.assignSeq(
      Sieve.newUrls(parsedLinks, seen, Seq("parentSeq", "linkIdx"), bloom, broadcastProbe),
      Seq("parentSeq", "linkIdx"), startSeq = maxSeq - 1L)

    // budget: enforced at sieve exit like Frontier.append (Frontier.java:810-814);
    // unbounded budget skips the ranking entirely
    val newFrontierAll = toFrontier(sieved.select("url", "urlHash", "seq"), round)
    val newFrontier = (if (cfg.maxUrlsPerHost == Long.MaxValue) newFrontierAll
      else {
        val withStored = newFrontierAll
          .join(hosts.select("schemeAuthority", "stored"), Seq("schemeAuthority"), "left")
          .na.fill(0L, Seq("stored"))
        val k = math.min(cfg.maxUrlsPerHost, Int.MaxValue.toLong).toInt
        Ranking.topKPerKey(withStored, "schemeAuthority", Seq("seq"), k, rankCol = "__r")
          .where(col("stored") + col("__r") <= cfg.maxUrlsPerHost)
          .drop("__r", "stored")
      }).cache()

    val dedupOut = newFrontier.count()

    // seen append: ALL sieved urls (even budget-dropped ones are "seen" —
    // the reference sieve recorded them before append()'s budget re-check)
    val seenDelta = sieved.select("urlHash")
    seenDelta.write.mode(SaveMode.Overwrite).parquet(appendDir("seen", round))

    // --- state updates ---
    // fetched page URLs leave the frontier; transient 5xx failures stay and
    // are retried after the host's backoff (exception state machine)
    val fetchedUrls = fetched.toDF
      .where(!col("isRobots") && col("status") < 500).select("urlHash")
    val fetchedPages = fetchedUrls.count()
    val disallowedCount = disallowed.count()
    // append-only: the new-URL delta is materialized (lc) and appended;
    // consumed rows are only tombstoned
    val newDelta = newFrontier.select(st.frontier.columns.map(col): _*).transform(lc)
    val frontierNext = st.frontier.unionByName(newDelta)
    val tombstonesNext = st.tombstones
      .unionByName(fetchedUrls).unionByName(disallowed)
      .transform(lc)
    val pendingRowsNext = st.pendingRows + dedupOut - fetchedPages - disallowedCount
    val tombRowsNext = st.tombRows + fetchedPages + disallowedCount

    // hosts: politeness + stored-count + robotsDone + retry/backoff updates
    val hostFetchAgg = fetched.toDF.groupBy("schemeAuthority").agg(
      sum(when(!col("isRobots") && col("status") === 200, 1L).otherwise(0L)).as("__stored"),
      max(col("isRobots")).as("__robotsFetched"),
      max(when(col("status") >= 500, 1).otherwise(0)).as("__failed"))
    val backoff = lit(now) + lit(cfg.retryDelay) * pow(lit(2.0), col("retries")).cast("long")
    val hostsUpdated = hosts
      .join(hostFetchAgg, Seq("schemeAuthority"), "left")
      .withColumn("nextFetch",
        when(col("__stored").isNotNull && col("__failed") === 1, backoff)
          .when(col("__stored").isNotNull, lit(now + cfg.hostDelay))
          .otherwise(col("nextFetch")))
      .withColumn("lastError",
        when(col("__stored").isNotNull && col("__failed") === 1, lit("http_5xx"))
          .when(col("__stored").isNotNull, lit(null).cast("string"))
          .otherwise(col("lastError")))
      .withColumn("retries",
        when(col("__stored").isNotNull && col("__failed") === 1, col("retries") + 1)
          .when(col("__stored").isNotNull, lit(0))
          .otherwise(col("retries")))
      .withColumn("stored", col("stored") + coalesce(col("__stored"), lit(0L)))
      .withColumn("robotsDone", col("robotsDone") || coalesce(col("__robotsFetched"), lit(false)))
      .withColumn("purged",
        col("purged") || col("stored") >= cfg.maxUrlsPerHost || col("retries") > cfg.maxRetries)
      .drop("__stored", "__robotsFetched", "__failed")
    val hostsNext = hostsUpdated.unionByName(newHostsFrom(newFrontier, hosts))

    val ipFetchAgg = fetched.toDF.select("ipHash").distinct()
    val ipsUpdated = ips
      .join(ipFetchAgg.withColumn("__hit", lit(true)), Seq("ipHash"), "left")
      .withColumn("nextFetch", when(col("__hit"), lit(now + cfg.ipDelay)).otherwise(col("nextFetch")))
      .drop("__hit")
    val ipsNext = ipsUpdated.unionByName(newIpsFrom(newFrontier, ips))

    val robotsNext = robots.unionByName(newRobots)

    // --- per-partition lineage + metrics (north_rule) ---
    // Per-partition rows carry only per-partition quantities; round-global
    // quantities (sieve in/out, duplicates) live on ONE partition_id=-1 row,
    // so any aggregation over the table stays correct.
    val duplicates = if (cfg.storeDocs) docs.where(col("is_duplicate")).count() else 0L
    val perPartition = fetched.toDF
      .withColumn("partition_id", spark_partition_id())
      .groupBy("partition_id")
      .agg(count(lit(1)).as("fetched"),
        sum(when(col("isRobots"), 1L).otherwise(0L)).as("robots_fetched"),
        sum(when(col("status") === 200 && !col("isRobots"), 1L).otherwise(0L)).as("parsed"),
        sum(when(col("status") >= 500, 1L).otherwise(0L)).as("failed"),
        sum(size(col("links"))).cast("long").as("links_out"))
      .withColumn("dedup_in", lit(0L))
      .withColumn("dedup_out", lit(0L))
      .withColumn("duplicates", lit(0L))
    val globalRow = Seq((-1, 0L, 0L, 0L, 0L, 0L, dedupIn, dedupOut, duplicates))
      .toDF("partition_id", "fetched", "robots_fetched", "parsed", "failed",
        "links_out", "dedup_in", "dedup_out", "duplicates")
    perPartition
      .select("partition_id", "fetched", "robots_fetched", "parsed", "failed",
        "links_out", "dedup_in", "dedup_out", "duplicates")
      .unionByName(globalRow) // round = partition dir
      .write.mode(SaveMode.Overwrite).parquet(appendDir("metrics", round))

    // --- commit: snapshot on cadence, thread state in memory otherwise ---
    val compactedNext = frontierNext
      .join(broadcast(tombstonesNext), Seq("urlHash"), "left_anti")
    val snapped = maybeSnapshot(round, compactedNext, hostsNext, ipsNext, robotsNext,
      maxSeq + dedupOut, force = false)
    val (fNext, tombNext, tombRowsFinal) =
      if (snapped)
        (spark.read.parquet(stateDir(round, "frontier")), emptyTombstones, 0L)
      else if (tombRowsNext >= cfg.tombstoneCompactRows)
        (compactedNext.transform(lc), emptyTombstones, 0L) // amortized GC
      else (frontierNext, tombstonesNext, tombRowsNext)
    val (hNext, iNext, rNext) =
      if (snapped)
        (spark.read.parquet(stateDir(round, "hosts")),
          spark.read.parquet(stateDir(round, "ips")),
          spark.read.parquet(stateDir(round, "robots")))
      else
        (hostsNext.transform(lc), ipsNext.transform(lc), robotsNext.transform(lc))
    val seenNext = seen.unionByName(seenDelta.transform(lc))
    val digestsNext =
      if (cfg.storeDocs) st.digests.unionByName(newDigests.transform(lc))
      else st.digests
    live = Some(LiveState(round, maxSeq + dedupOut, fNext, hNext, iNext, rNext,
      seenNext, digestsNext, tombNext, pendingRowsNext, tombRowsFinal))

    fetched.unpersist(); units.unpersist(); docs.unpersist(); newFrontier.unpersist()
    disallowed.unpersist(); parsedLinks.unpersist()
    fetchedCount
  }

  /** Snapshot the state tables when the cadence (or `force`) says so. */
  private def maybeSnapshot(round: Int, frontier: DataFrame, hosts: DataFrame,
      ips: DataFrame, robots: DataFrame, maxSeq: Long, force: Boolean): Boolean = {
    val due = force || cfg.checkpointEvery <= 1 || round % cfg.checkpointEvery == 0
    if (due) writeState(round, frontier, hosts, ips, robots, maxSeq)
    due
  }

  /** Force a snapshot of the current live state (used at end of run). */
  private def snapshotLive(): Unit = live.foreach { st =>
    if (!exists(stateDir(st.round, "scalars") + "/_SUCCESS")) {
      val compacted =
        if (st.tombRows == 0) st.frontier
        else st.frontier.join(broadcast(st.tombstones), Seq("urlHash"), "left_anti")
      writeState(st.round, compacted, st.hosts, st.ips, st.robots, st.maxSeq)
    }
  }

  /** Run (or resume) the crawl up to cfg.maxRounds; returns rounds executed.
    * A round with zero fetches is a politeness wait, not necessarily the
    * end: the crawl is drained only when the frontier itself is empty. */
  def run(): Int = {
    var round = lastCompleteRound()
    if (round < 0) { init(); round = 0 }
    var executed = 0
    var drained = false
    while (round < cfg.maxRounds && !drained) {
      round += 1
      val t0 = System.nanoTime()
      val n = runRound(round)
      if (cfg.logRounds)
        println(f"[crawler] round=$round fetched=$n wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      executed += 1
      if (n == 0)
        drained = live.forall(_.pendingRows <= 0)
    }
    snapshotLive()
    executed
  }

  /** The crawl-order trace: (round, seq, url, isRobots, status), ordered.
    * One partition-discovering scan (round = partition column). */
  def trace(): DataFrame = {
    if (!exists(s"$workDir/trace")) Seq.empty[(Int, Long, String, Boolean, Int)]
      .toDF("round", "seq", "url", "isRobots", "status")
    else spark.read.parquet(s"$workDir/trace")
      .where(col("round") <= lastAppendRound())
      .select("round", "seq", "url", "isRobots", "status")
      .orderBy("round", "seq")
  }

  /** All stored docs so far (single pruned scan; round = partition col). */
  def docs(): DataFrame =
    spark.read.parquet(s"$workDir/docs")
      .where(col("round") <= lastAppendRound())

  /** Final URL-seen membership (hashes). */
  def seenHashes(): DataFrame = readSeen(lastAppendRound())

  /** Frontier state table at the last snapshot. */
  def frontierState(): DataFrame =
    spark.read.parquet(stateDir(lastCompleteRound(), "frontier"))

  /** Hosts state table at the last snapshot. */
  def hostsState(): DataFrame =
    spark.read.parquet(stateDir(lastCompleteRound(), "hosts"))

  /** All per-round metrics (single pruned scan; round = partition col). */
  def metrics(): DataFrame = {
    if (!exists(s"$workDir/metrics")) spark.emptyDataset[RoundMetrics].toDF
    else spark.read.parquet(s"$workDir/metrics")
      .where(col("round") <= lastAppendRound())
      .select("round", "partition_id", "fetched", "robots_fetched", "parsed",
        "failed", "links_out", "dedup_in", "dedup_out", "duplicates")
  }
}
