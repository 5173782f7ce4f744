package graft.model

/** Typed data model of the crawl engine (SURVEY.md §1, FIXTURES.md §1/§3).
  * All pipeline stages are `Dataset[T]` over these case classes
  * (north_rule: typed Dataset pipeline, Catalyst-only). */

/** One interleaved document span (BASELINE.json input_hint):
  * `kind` is "text" or "media"; text spans carry `text` (media_ref = ""),
  * media spans carry the normalized `media_ref` URL (text = "").
  * `offset` is the 0-based position in document order — the per-row
  * span-sequence invariant (kind, text, media_ref, order) keys off it. */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** A row of the interleaved-documents input/output table. */
case class Doc(doc_id: String, spans: Seq[Span])

/** A frontier entry: a normalized URL waiting to be fetched.
  * `seq` is the global first-enqueue order (the sieve's output order,
  * reference `MercatorSieve.java:349-363`); `round` is the round that
  * enqueued it. Split columns mirror the reference's prefix-omission
  * byte-array layout (`Frontier.java:118-124`). */
case class FrontierUrl(
    url: String,
    schemeAuthority: String,
    pathQuery: String,
    host: String,
    urlHash: Long,
    hostHash: Long,
    ipHash: Long,
    seq: Long,
    round: Int)

/** Per-host scheduler state (reference `VisitState.java:79-138`).
  * `nextFetch` is in virtual rounds (wall-clock politeness delays become
  * round-stamped virtual time, SURVEY.md §7.4). */
case class HostState(
    schemeAuthority: String,
    hostHash: Long,
    ipHash: Long,
    nextFetch: Long,
    stored: Long,
    robotsDone: Boolean,
    purged: Boolean,
    /** consecutive failed rounds; backoff doubles per retry and the host is
      * purged past maxRetries (reference exception state machine,
      * ParsingThread.java:276-312) */
    retries: Int,
    lastError: String)

/** Per-IP politeness state (reference `WorkbenchEntry.java:52-80`). */
case class IpState(ipHash: Long, nextFetch: Long)

/** Robots filter per host (broadcast state table, north_rule). */
case class RobotsEntry(schemeAuthority: String, prefixes: Seq[String])

/** Result of one (synthetic) fetch+parse (reference `FetchData.java:60-74`
  * + `ParsingThread` outputs). `links` are raw outlink specs in document
  * order; spans follow the input_hint schema. */
case class FetchResult(
    url: String,
    urlHash: Long,
    schemeAuthority: String,
    host: String,
    ipHash: Long,
    seq: Long,
    status: Int,
    isRobots: Boolean,
    truncated: Boolean,
    spans: Seq[Span],
    links: Seq[String],
    round: Int)

/** One stored document (the WARC-store analog, `store/WarcStore.java:41`). */
case class StoredDoc(
    doc_id: String,
    schemeAuthority: String,
    spans: Seq[Span],
    digest: String,
    status: Int,
    is_duplicate: Boolean,
    truncated: Boolean,
    n_links: Int,
    round: Int)

/** Per-round, per-partition lineage + fetch/parse metrics (north_rule). */
case class RoundMetrics(
    round: Int,
    partition_id: Int,
    fetched: Long,
    robots_fetched: Long,
    parsed: Long,
    failed: Long,
    links_out: Long,
    dedup_in: Long,
    dedup_out: Long,
    duplicates: Long)
