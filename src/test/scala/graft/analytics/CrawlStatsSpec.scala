package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Assertions for the crawl-telemetry aggregations (SURVEY.md §2.4) over
  * hand-built state tables with known answers. */
class CrawlStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("queueSizeHistogram bins per-host queue lengths at log2") {
    import spark.implicits._
    // host 1: 1 pending url (bin 0), host 2: 3 (bin 1), host 3: 8 (bin 3)
    val frontier = (Seq.fill(1)(1L) ++ Seq.fill(3)(2L) ++ Seq.fill(8)(3L)).toDF("hostHash")
    val out = CrawlStats.queueSizeHistogram(frontier).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(0 -> 1L, 1 -> 1L, 3 -> 1L))
  }

  test("hostsPerIpStats summarizes workbench entries (hosts per IP)") {
    import spark.implicits._
    val hosts = Seq(("http://h1", 10L), ("http://h2", 10L), ("http://h3", 11L))
      .toDF("schemeAuthority", "ipHash")
    val r = CrawlStats.hostsPerIpStats(hosts).collect()(0)
    assert(r.getAs[Long]("n_ips") == 2L)
    assert(r.getAs[Double]("mean_hosts_per_ip") == 1.5)
    assert(r.getAs[Long]("max_hosts_per_ip") == 2L)
    assert(math.abs(r.getAs[Double]("var_hosts_per_ip") - 0.5) < 1e-12)
  }

  test("distinctUrlStats: HLL approx distinct tracks the exact count") {
    import spark.implicits._
    // 10k distinct hashes, each duplicated: n_rows 20k, distinct 10k
    val hashes = (1L to 10000L).flatMap(h => Seq(h, h)).toDF("urlHash")
    val r = CrawlStats.distinctUrlStats(hashes).collect()(0)
    assert(r.getAs[Long]("n_rows") == 20000L)
    val approx = r.getAs[Long]("approx_distinct")
    assert(math.abs(approx - 10000L) <= 600, s"approx=$approx off by >6%")
  }

  test("outdegreeStats reports total and external outdegree") {
    import spark.implicits._
    val docs = Seq((4, 1), (2, 2)).toDF("n_links", "n_links_ext")
    val r = CrawlStats.outdegreeStats(docs).collect()(0)
    assert(r.getAs[Long]("n_pages") == 2L)
    assert(r.getAs[Double]("mean_outdegree") == 3.0)
    assert(r.getAs[Int]("max_outdegree") == 4)
    assert(r.getAs[Double]("mean_external_outdegree") == 1.5)
    assert(r.getAs[Int]("max_external_outdegree") == 2)
  }
}
