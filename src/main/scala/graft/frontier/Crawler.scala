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
    useBloom: Boolean = true,
    bloomFpp: Double = 0.01,
    /** fixed bloom capacity so per-round blooms are mergeable (the
      * "broadcast-refreshed" filter is extended, not rebuilt, each round) */
    bloomExpected: Long = 4L << 20,
    /** below this seen-size the bloom prefilter is skipped (anti-join alone
      * is cheaper than building + broadcasting the filter) */
    bloomMinSeen: Long = 50000L,
    ipSpace: Long = 1L << 20,
    /** shuffle/write parallelism for the state tables */
    statePartitions: Int = 32)

/** One URL selected for fetching this round. */
case class FetchUnit(
    url: String,
    schemeAuthority: String,
    host: String,
    pathQuery: String,
    urlHash: Long,
    hostHash: Long,
    ipHash: Long,
    seq: Long,
    isRobots: Boolean)

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
  * State layout under `workDir` (the Iceberg-snapshot analog — each round
  * commits an atomic set of parquet snapshot dirs; `resume()` restarts
  * from the last complete round, per north_rule "resumable from snapshot
  * checkpoints"; with Iceberg on the cluster these become table snapshots
  * and the seen/docs appends become append commits):
  * {{{
  *   state/round=N/{frontier,hosts,ips,robots,scalars}   (rewritten)
  *   seen/round=N, docs/round=N, digests/round=N,
  *   trace/round=N, metrics/round=N                      (append-only)
  * }}}
  */
class Crawler(spark: SparkSession, workDir: String, cfg: CrawlConfig) {
  import spark.implicits._

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(workDir), spark.sparkContext.hadoopConfiguration)

  private def stateDir(round: Int, table: String) = f"$workDir/state/round=$round%05d/$table"
  private def appendDir(table: String, round: Int) = f"$workDir/$table/round=$round%05d"

  private def exists(path: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(path))

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

    val frontier = toFrontier(newUrls, round = 0).cache()
    frontier.select("urlHash").write.mode(SaveMode.Overwrite).parquet(appendDir("seen", 0))
    writeState(0, frontier,
      hosts = newHostsFrom(frontier, spark.emptyDataset[HostState].toDF),
      ips = newIpsFrom(frontier, spark.emptyDataset[IpState].toDF),
      robots = spark.emptyDataset[RobotsEntry].toDF,
      scalars = Seq((0L + frontier.count(), 0)).toDF("maxSeq", "round"))
    frontier.unpersist()
  }

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
      .withColumn("robotsDone", lit(false))
      .withColumn("purged", lit(false))
      .select("schemeAuthority", "hostHash", "ipHash", "nextFetch", "stored", "robotsDone", "purged")

  private def newIpsFrom(frontier: DataFrame, ips: DataFrame): DataFrame =
    frontier.select("ipHash").distinct()
      .join(ips.select("ipHash"), Seq("ipHash"), "left_anti")
      .withColumn("nextFetch", lit(0L))
      .select("ipHash", "nextFetch")

  private def writeState(round: Int, frontier: DataFrame, hosts: DataFrame,
      ips: DataFrame, robots: DataFrame, scalars: DataFrame): Unit = {
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
    scalars.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stateDir(round, "scalars"))
  }

  /** Append-only tables are laid out as round=N partition dirs: one
    * partition-discovering scan + pruning filter, not a union of reads
    * (the Iceberg-append analog). */
  private def readSeen(uptoRound: Int): DataFrame =
    spark.read.parquet(s"$workDir/seen")
      .where(col("round") <= uptoRound).select("urlHash")

  private def readDigests(uptoRound: Int): DataFrame = {
    if (!exists(s"$workDir/digests")) Seq.empty[String].toDF("digest")
    else spark.read.parquet(s"$workDir/digests")
      .where(col("round") <= uptoRound).select("digest")
  }

  /** Incrementally-maintained broadcast bloom over the seen set: merged
    * with each round's (small) new-hash bloom instead of rebuilt from the
    * full table (north_rule "broadcast-refreshed bloom URL-seen set").
    * Fixed capacity keeps the filters mergeable. */
  private var bloomCache: Option[(Int, org.apache.spark.util.sketch.BloomFilter)] = None

  private def seenBloomUpTo(round: Int, seenCount: => Long): Option[org.apache.spark.util.sketch.BloomFilter] = {
    if (!cfg.useBloom) return None
    bloomCache match {
      case Some((r, bf)) if r == round => Some(bf)
      case Some((r, bf)) if r < round =>
        val merged = bf
        for (rr <- r + 1 to round; if exists(appendDir("seen", rr))) {
          val delta = spark.read.parquet(appendDir("seen", rr))
            .stat.bloomFilter("urlHash", cfg.bloomExpected, cfg.bloomFpp)
          merged.mergeInPlace(delta)
        }
        bloomCache = Some((round, merged))
        Some(merged)
      case _ =>
        if (seenCount < cfg.bloomMinSeen) None // anti-join alone is cheaper
        else {
          val bf = readSeen(round).stat.bloomFilter("urlHash", cfg.bloomExpected, cfg.bloomFpp)
          bloomCache = Some((round, bf))
          Some(bf)
        }
    }
  }

  /** Last round with a complete state snapshot, or -1. */
  def lastCompleteRound(): Int = {
    var r = -1
    while (exists(stateDir(r + 1, "scalars") + "/_SUCCESS")) r += 1
    r
  }

  // ---------------- one round ----------------

  /** Execute round `round` (reading state `round-1`). Returns the number of
    * URLs fetched (0 means the crawl has drained). */
  def runRound(round: Int): Long = {
    val prev = round - 1
    val frontier = spark.read.parquet(stateDir(prev, "frontier"))
    val hosts = spark.read.parquet(stateDir(prev, "hosts"))
    val ips = spark.read.parquet(stateDir(prev, "ips"))
    val robots = spark.read.parquet(stateDir(prev, "robots"))
    val scalars = spark.read.parquet(stateDir(prev, "scalars")).collect()(0)
    val maxSeq = scalars.getAs[Long]("maxSeq")
    val now = round.toLong

    val seen = readSeen(prev)

    // --- politeness selection (SURVEY.md §2.5 window-ranked workbench) ---
    val eligibleHosts = hosts
      .where(!col("purged") && col("nextFetch") <= now)
      // only hosts that actually have pending work
      .join(frontier.select("schemeAuthority").distinct(), Seq("schemeAuthority"), "left_semi")

    // host priority = earliest pending seq (FIFO per host, VisitState.java:284-304)
    val hostPriority = frontier.groupBy("schemeAuthority").agg(min("seq").as("priority"))

    // one host per IP per round (WorkbenchEntry: one VisitState per entry in
    // flight; ParsingThread.java:271-274): rank-1 per ipHash window
    val ipReady = ips.where(col("nextFetch") <= now).select("ipHash")
    val wIp = Window.partitionBy("ipHash").orderBy(col("priority"), col("schemeAuthority"))
    val selectedHosts = eligibleHosts
      .join(ipReady, Seq("ipHash"), "left_semi")
      .join(hostPriority, Seq("schemeAuthority"))
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
        lit(true).as("isRobots"))

    // pending URLs of selected page-hosts, robots-filtered, top-`burst` by seq
    val pendingOfSelected = frontier
      .join(pageHosts.select("schemeAuthority"), Seq("schemeAuthority"), "left_semi")
      .join(robots, Seq("schemeAuthority"), "left")
      .withColumn("__allowed",
        when(col("prefixes").isNull, lit(true))
          .otherwise(respects_robots(col("pathQuery"), col("prefixes"))))
    val disallowed = pendingOfSelected.where(!col("__allowed"))
      .select("urlHash").cache()
    val wHost = Window.partitionBy("hostHash").orderBy("seq")
    val pageUnits = pendingOfSelected
      .where(col("__allowed"))
      .withColumn("__r", row_number().over(wHost))
      .where(col("__r") <= cfg.burst)
      .select(col("url"), col("schemeAuthority"), col("host"), col("pathQuery"),
        col("urlHash"), col("hostHash"), col("ipHash"), col("seq"),
        lit(false).as("isRobots"))

    val units = robotsUnits.unionByName(pageUnits).as[FetchUnit]

    // --- synthetic fetch + parse (typed Dataset map; pure functions) ---
    val webCfg = cfg.web
    val fetched: Dataset[FetchResult] = units.map { u =>
      if (u.isRobots) {
        FetchResult(u.url, u.urlHash, u.schemeAuthority, u.host, u.ipHash, 200,
          isRobots = true, spans = Nil, links = Nil, round = round)
      } else {
        val st = SyntheticWeb.status(u.url, webCfg)
        val spans = if (st == 200) SyntheticWeb.pageSpans(u.url, webCfg) else Nil
        val links = if (st == 200) SyntheticWeb.successors(u.url, webCfg) else Nil
        FetchResult(u.url, u.urlHash, u.schemeAuthority, u.host, u.ipHash, st,
          isRobots = false, spans = spans, links = links, round = round)
      }
    }.cache()

    val fetchedCount = fetched.count()
    if (fetchedCount == 0) {
      // drained: still commit a (copied) state so lastCompleteRound advances
      writeState(round, frontier, hosts, ips, robots,
        Seq((maxSeq, round)).toDF("maxSeq", "round"))
      fetched.unpersist()
      return 0
    }

    // trace: the crawl ordering artifact (round, seq, url)
    val unitSeqs = units.select(col("urlHash"), col("seq"), col("isRobots"))
    fetched.toDF
      .join(unitSeqs.select("urlHash", "seq"), Seq("urlHash") /* robots seq=-1 */, "left")
      .select(lit(round).as("round"), col("seq"), col("url"), col("isRobots"), col("status"))
      .write.mode(SaveMode.Overwrite).parquet(appendDir("trace", round))

    // --- store: docs with digest + exact cross-crawl duplicate detection ---
    val digestsSeen = readDigests(prev)
    val pages = fetched.toDF.where(!col("isRobots") && col("status") === 200)
    val unitSeqMap = unitSeqs.where(!col("isRobots")).select("urlHash", "seq")
    val docsRaw = pages
      .join(unitSeqMap, Seq("urlHash"), "left")
      .withColumn("digest", digest_of_spans(col("host"), col("spans"), col("status"), lit(null).cast("string")))
    val wDigest = Window.partitionBy("digest").orderBy("seq")
    val docs = docsRaw
      .withColumn("__dupInBatch", row_number().over(wDigest) > 1)
      .join(digestsSeen.select(col("digest"), lit(true).as("__dupAcross")), Seq("digest"), "left")
      .withColumn("is_duplicate", col("__dupInBatch") || coalesce(col("__dupAcross"), lit(false)))
      .select(col("url").as("doc_id"), col("schemeAuthority"), col("spans"),
        col("digest"), col("status"), col("is_duplicate"), lit(round).as("round"))
      .cache()
    docs.write.mode(SaveMode.Overwrite).parquet(appendDir("docs", round))
    docs.where(!col("is_duplicate")).select("digest").distinct()
      .write.mode(SaveMode.Overwrite).parquet(appendDir("digests", round))

    // --- robots parse -> broadcast state table update ---
    val newRobots = fetched.where(col("isRobots")).map { r =>
      RobotsEntry(r.schemeAuthority,
        Robots.parse(SyntheticWeb.robotsContent(r.host, webCfg), "graft").toSeq)
    }.toDF

    // --- outlink extraction -> schedule filter -> sieve (SURVEY.md §3.2) ---
    val parentSeqs = unitSeqMap
    val rawLinks = pages
      .join(parentSeqs, Seq("urlHash"))
      .select(col("seq").as("parentSeq"), posexplode(col("links")).as(Seq("linkIdx", "spec")))
    val parsedLinks = rawLinks
      .withColumn("url", burl_parse(col("spec")))
      .where(col("url").isNotNull)
      .where(FilterDsl.compile(cfg.scheduleFilter, FilterDsl.urlContext(col("url"))))
      .withColumn("urlHash", murmur64(col("url")))
      .select("url", "urlHash", "parentSeq", "linkIdx")

    val bloom = seenBloomUpTo(prev, maxSeq + 1)
    // first new seq is exactly maxSeq (dense continuation of enqueue order)
    val sieved = Sieve.assignSeq(
      Sieve.newUrls(parsedLinks, seen, Seq("parentSeq", "linkIdx"), bloom),
      Seq("parentSeq", "linkIdx"), startSeq = maxSeq - 1L)

    // budget: enforced at sieve exit like Frontier.append (Frontier.java:810-814)
    val newFrontierAll = toFrontier(sieved.select("url", "urlHash", "seq"), round)
    val wBudget = Window.partitionBy("schemeAuthority").orderBy("seq")
    val withStored = newFrontierAll
      .join(hosts.select("schemeAuthority", "stored"), Seq("schemeAuthority"), "left")
      .na.fill(0L, Seq("stored"))
    val newFrontier = withStored
      .withColumn("__r", row_number().over(wBudget))
      .where(col("stored") + col("__r") <= cfg.maxUrlsPerHost)
      .drop("__r", "stored")
      .cache()

    val dedupIn = parsedLinks.count()
    val dedupOut = newFrontier.count()

    // seen append: ALL sieved urls (even budget-dropped ones are "seen" —
    // the reference sieve recorded them before append()'s budget re-check)
    sieved.select("urlHash").write.mode(SaveMode.Overwrite).parquet(appendDir("seen", round))

    // --- state updates ---
    val fetchedUrls = fetched.toDF.where(!col("isRobots")).select("urlHash")
    val frontierNext = frontier
      .join(fetchedUrls, Seq("urlHash"), "left_anti")
      .join(disallowed, Seq("urlHash"), "left_anti")
      .unionByName(newFrontier)

    // hosts: politeness + stored-count + robotsDone updates
    val hostFetchAgg = fetched.toDF.groupBy("schemeAuthority").agg(
      sum(when(!col("isRobots") && col("status") === 200, 1L).otherwise(0L)).as("__stored"),
      max(col("isRobots")).as("__robotsFetched"))
    val hostsUpdated = hosts
      .join(hostFetchAgg, Seq("schemeAuthority"), "left")
      .withColumn("nextFetch",
        when(col("__stored").isNotNull, lit(now + cfg.hostDelay)).otherwise(col("nextFetch")))
      .withColumn("stored", col("stored") + coalesce(col("__stored"), lit(0L)))
      .withColumn("robotsDone", col("robotsDone") || coalesce(col("__robotsFetched"), lit(false)))
      .withColumn("purged", col("purged") || col("stored") >= cfg.maxUrlsPerHost)
      .drop("__stored", "__robotsFetched")
    val hostsNext = hostsUpdated.unionByName(newHostsFrom(newFrontier, hosts))

    val ipFetchAgg = fetched.toDF.select("ipHash").distinct()
    val ipsUpdated = ips
      .join(ipFetchAgg.withColumn("__hit", lit(true)), Seq("ipHash"), "left")
      .withColumn("nextFetch", when(col("__hit"), lit(now + cfg.ipDelay)).otherwise(col("nextFetch")))
      .drop("__hit")
    val ipsNext = ipsUpdated.unionByName(newIpsFrom(newFrontier, ips))

    val robotsNext = robots.unionByName(newRobots)

    // --- per-partition lineage + metrics (north_rule) ---
    val duplicates = docs.where(col("is_duplicate")).count()
    val robotsFetched = fetched.where(col("isRobots")).count()
    fetched.toDF
      .withColumn("partition_id", spark_partition_id())
      .groupBy("partition_id")
      .agg(count(lit(1)).as("fetched"),
        sum(when(col("isRobots"), 1L).otherwise(0L)).as("robots_fetched"),
        sum(when(col("status") === 200 && !col("isRobots"), 1L).otherwise(0L)).as("parsed"),
        sum(size(col("links"))).as("links_out"))
      .withColumn("round", lit(round))
      .withColumn("dedup_in", lit(dedupIn))
      .withColumn("dedup_out", lit(dedupOut))
      .withColumn("duplicates", lit(duplicates))
      .select("round", "partition_id", "fetched", "robots_fetched", "parsed",
        "links_out", "dedup_in", "dedup_out", "duplicates")
      .write.mode(SaveMode.Overwrite).parquet(appendDir("metrics", round))

    writeState(round, frontierNext, hostsNext, ipsNext, robotsNext,
      Seq((maxSeq + dedupOut, round)).toDF("maxSeq", "round"))

    fetched.unpersist(); docs.unpersist(); newFrontier.unpersist(); disallowed.unpersist()
    fetchedCount
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
      val n = runRound(round)
      executed += 1
      if (n == 0)
        drained = spark.read.parquet(stateDir(round, "frontier")).isEmpty
    }
    executed
  }

  /** The crawl-order trace: (round, seq, url, isRobots, status), ordered. */
  def trace(): DataFrame = {
    val dirs = (0 to lastCompleteRound()).map(appendDir("trace", _)).filter(exists)
    if (dirs.isEmpty) Seq.empty[(Int, Long, String, Boolean, Int)]
      .toDF("round", "seq", "url", "isRobots", "status")
    else dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .orderBy("round", "seq")
  }

  /** All stored docs so far. */
  def docs(): DataFrame = {
    val dirs = (0 to lastCompleteRound()).map(appendDir("docs", _)).filter(exists)
    dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Final URL-seen membership (hashes). */
  def seenHashes(): DataFrame = readSeen(lastCompleteRound())

  /** All per-round metrics. */
  def metrics(): DataFrame = {
    val dirs = (1 to lastCompleteRound()).map(appendDir("metrics", _)).filter(exists)
    if (dirs.isEmpty) spark.emptyDataset[RoundMetrics].toDF
    else dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }
}
