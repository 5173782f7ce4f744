package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-telemetry aggregations (reference StatsThread / Frontier counters,
  * SURVEY.md §2.4): log2-binned histograms and summary statistics — all
  * plain hash aggregations (partial+final, no windows, no skew exposure). */
object CrawlStats {

  /** log2-binned histogram of per-host pending-queue length
    * (StatsThread.java:192-225). Input: a frontier table. */
  def queueSizeHistogram(frontier: DataFrame): DataFrame =
    frontier.groupBy("hostHash").agg(count(lit(1)).as("queue_len"))
      .groupBy(floor(log2(col("queue_len"))).cast("int").as("log2_bin"))
      .agg(count(lit(1)).as("n_hosts"))

  /** log2-binned histogram of per-host transfer speed — bytes per virtual
    * round, the StatsThread.java:192-225 B/s-distribution analog over the
    * span model (bytes = stored text length). Input: a docs table. */
  def speedHistogram(docs: DataFrame): DataFrame =
    docs
      .select(col("schemeAuthority"), col("round"),
        aggregate(transform(col("spans"), s => length(s.getField("text"))),
          lit(0), (acc, x) => acc + x).as("bytes"))
      .groupBy("schemeAuthority", "round").agg(sum("bytes").as("bytes_per_round"))
      .groupBy(floor(log2(greatest(col("bytes_per_round"), lit(1)))).cast("int").as("log2_bps"))
      .agg(count(lit(1)).as("n_host_rounds"), sum("bytes_per_round").as("total_bytes"))

  /** Summary stats (count/mean/min/max/variance) of per-page outdegree,
    * total and external (links to OTHER hosts — Frontier.java:349-353,
    * ParsingThread.java:386-389). Input: a docs table with
    * n_links / n_links_ext. */
  def outdegreeStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_pages"),
      avg("n_links").as("mean_outdegree"),
      min("n_links").as("min_outdegree"),
      max("n_links").as("max_outdegree"),
      var_samp("n_links").as("var_outdegree"),
      avg("n_links_ext").as("mean_external_outdegree"),
      max("n_links_ext").as("max_external_outdegree"))

  /** Fetches by HTTP status class 1xx..5xx (Frontier.java:343-392 archetype
    * counters). Input: a trace table. */
  def statusClassBreakdown(trace: DataFrame): DataFrame =
    trace.groupBy(floor(col("status") / 100).cast("int").as("status_class"))
      .agg(count(lit(1)).as("n"))

  /** Span-kind mix per round — the contentType{Text,Image,...} counter
    * analog over the interleaved span model. Input: a docs table. */
  def spanKindMix(docs: DataFrame): DataFrame =
    docs.select(col("round"), explode(col("spans")).as("s"))
      .groupBy("round", "s.kind")
      .agg(count(lit(1)).as("n_spans"))
      .withColumnRenamed("kind", "kind")

  /** Workbench-entry stats: hosts per IP summary (StatsThread.java:231-242). */
  def hostsPerIpStats(hosts: DataFrame): DataFrame =
    hosts.groupBy("ipHash").agg(count(lit(1)).as("n_hosts"))
      .agg(count(lit(1)).as("n_ips"),
        avg("n_hosts").as("mean_hosts_per_ip"),
        max("n_hosts").as("max_hosts_per_ip"),
        var_samp("n_hosts").as("var_hosts_per_ip"))

  /** Exact vs approximate distinct-URL census of a hash table (seen or
    * frontier): the approximate side is one HLL++ pass (SURVEY.md §2.4
    * "approx distinct" — the StatsThread distinct-URL telemetry at scales
    * where exact counting is a full shuffle). `rsd` is the HLL relative
    * standard deviation. */
  def distinctUrlStats(hashes: DataFrame, rsd: Double = 0.02): DataFrame =
    hashes.agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct("urlHash", rsd).as("approx_distinct"))

  /** Per-round crawl progress from the metrics table (global rows). */
  def progress(metrics: DataFrame): DataFrame = {
    val perRound = metrics.groupBy("round").agg(
      sum("fetched").as("fetched"),
      sum("robots_fetched").as("robots_fetched"),
      sum("parsed").as("parsed"),
      sum("failed").as("failed"),
      sum("links_out").as("links_out"),
      sum("bytes_fetched").as("bytes_fetched"),
      sum("media_spans").as("media_spans"),
      sum("dedup_in").as("dedup_in"),
      sum("dedup_out").as("dedup_out"),
      sum("duplicates").as("duplicates"))
    perRound.orderBy("round")
  }
}
