package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.{CrawlConfig, Crawler}
import graft.synth.SyntheticWeb

/** Store analytics (ParallelFilteredProcessorRunner replacements) + crawl
  * telemetry over a real mini-crawl's docs/trace/metrics. */
class StoreQuerySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val crawler: Crawler = {
    val dir = Files.createTempDirectory("graft-storequery").toString
    val c = new Crawler(spark, dir, CrawlConfig(
      web = SyntheticWeb.Config(sites = 40, degree = 4, maxDepth = 2),
      nSeeds = 6, hostDelay = 1, ipDelay = 1, burst = 4, maxRounds = 6,
      statePartitions = 4))
    c.run()
    c
  }

  test("DSL scan over the docs store, ordered") {
    val docs = crawler.docs()
    val out = StoreQuery.scan(docs, "StatusCategory(2) and SchemeEquals(http)",
      Seq("doc_id", "status", "round"))
    assert(out.count() > 0)
    assert(out.where(col("status") =!= 200).count() == 0)
    // excluded by filter:
    val none = StoreQuery.scan(docs, "StatusCategory(5)", Seq("doc_id"))
    assert(none.count() == 0)
  }

  test("url-digest-status-length projection") {
    val p = StoreQuery.urlDigestStatusLength(crawler.docs())
    assert(p.count() == crawler.docs().count())
    assert(p.where(col("text_length") < 0).count() == 0)
    assert(p.columns.toSet == Set("doc_id", "digest", "status", "text_length"))
  }

  test("archetype resolution: duplicates point at the first doc of a digest") {
    val a = StoreQuery.archetypes(crawler.docs())
    // every digest group has exactly one non-duplicate archetype
    val groups = a.groupBy("digest").agg(
      sum(when(!col("is_duplicate_of_archetype"), 1).otherwise(0)).as("n_arch"))
    assert(groups.where(col("n_arch") =!= 1).count() == 0)
    // archetype of a non-duplicate is itself
    assert(a.where(!col("is_duplicate_of_archetype") && col("doc_id") =!= col("archetype"))
      .count() == 0)
  }

  test("graph map: dense archetype node ids; duplicates share their archetype's node") {
    val gm = StoreQuery.graphMap(crawler.docs()).cache()
    assert(gm.count() == crawler.docs().count(), "every stored URL must be mapped")
    val nNodes = gm.select("node").distinct().count()
    val nDigests = crawler.docs().select("digest").distinct().count()
    assert(nNodes == nDigests, "one node per distinct digest")
    // dense 0..n-1
    val mm = gm.agg(min("node"), max("node")).collect()(0)
    assert(mm.getLong(0) == 0L && mm.getLong(1) == nNodes - 1)
    // duplicates point at their archetype's node
    val dup = crawler.docs().where(col("is_duplicate")).select(col("doc_id"))
    if (dup.count() > 0) {
      val dupMap = gm.select(col("url").as("d_url"), col("node").as("d_node"),
        col("archetype_url").as("d_arch"))
      val archMap = gm.select(col("url").as("a_url"), col("node").as("a_node"))
      val joined = dup.join(dupMap, dup("doc_id") === col("d_url"))
        .join(archMap, col("d_arch") === col("a_url"))
      assert(joined.where(col("d_node") =!= col("a_node")).count() == 0)
    }
    gm.unpersist()
  }

  test("robots store sink records every robots.txt response") {
    val rf = crawler.robotsFetches()
    val nRobotsTrace = crawler.trace().where(col("isRobots")).count()
    assert(rf.count() == nRobotsTrace, "one robots_fetches row per robots fetch")
    assert(rf.where(col("status") === 200 && col("robotsPrefixes").isNull).count() == 0,
      "successful robots fetches carry their parsed prefixes")
  }

  test("docs carry guessed_charset matching the host's META declaration") {
    val webCfg = SyntheticWeb.Config(sites = 40, degree = 4, maxDepth = 2)
    import spark.implicits._
    val rows = crawler.docs()
      .select(col("doc_id"), col("guessed_charset")).as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (url, got) =>
      val declared = SyntheticWeb.declaredCharset(graft.core.Burl.host(url), webCfg)
      val expect = if (declared == null) "ISO-8859-1" else declared
      assert(got == expect, s"$url: guessed $got, declared $declared")
    }
    // both branches exercised
    assert(rows.exists(_._2 == "ISO-8859-1") && rows.exists(_._2 != "ISO-8859-1"))
  }

  test("metrics carry byte and media-span counters") {
    val m = crawler.metrics()
    assert(m.agg(sum("bytes_fetched")).collect()(0).getLong(0) > 0)
    assert(m.agg(sum("media_spans")).collect()(0).getLong(0) > 0)
  }

  test("speed histogram bins per-host bytes/round") {
    val h = CrawlStats.speedHistogram(crawler.docs()).collect()
    assert(h.nonEmpty)
    assert(h.map(_.getLong(1)).sum > 0)
  }

  test("repetition set is empty for a sieve-deduped crawl") {
    // the sieve guarantees each URL is stored at most once
    assert(StoreQuery.repetitionSet(crawler.docs()).count() == 0)
  }

  test("media edge graph extracts host-level edges") {
    val e = StoreQuery.mediaEdges(crawler.docs())
    assert(e.count() > 0)
    assert(e.where(col("count") <= 0).count() == 0)
  }

  test("crawl stats: histograms and summaries") {
    val trace = crawler.trace()
    val status = CrawlStats.statusClassBreakdown(trace).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(status.getOrElse(2, 0L) > 0)
    val deg = CrawlStats.outdegreeStats(crawler.docs()).collect()(0)
    assert(deg.getAs[Long]("n_pages") > 0)
    assert(deg.getAs[Double]("mean_outdegree") >= 0)
    val mix = CrawlStats.spanKindMix(crawler.docs()).collect()
    assert(mix.map(_.getString(1)).toSet.subsetOf(Set("text", "media")))
    val prog = CrawlStats.progress(crawler.metrics()).collect()
    assert(prog.nonEmpty && prog.forall(_.getAs[Long]("fetched") > 0))
  }

  test("digest_of_spans groups markup variants by span content, host-seeded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("h1.example", "hello world 123"), // digits coalesce: same as 999
      ("h1.example", "hello world 999"),
      ("h2.example", "hello world 123"), // different host -> different digest
      ("h1.example", "hello  world 123")) // ws runs coalesce: same as single space
      .toDF("host", "text")
      .select(col("host"), array(
        struct(lit("text").as("kind"), col("text").as("text"),
          lit("").as("media_ref"), lit(0).as("offset")),
        struct(lit("media").as("kind"), lit("").as("text"),
          lit("http://m/x.jpg").as("media_ref"), lit(1).as("offset"))).as("spans"))
      .select(graft.functions.digest_of_spans(
        col("host"), col("spans"), lit(200), lit(null).cast("string")).as("d"))
    val d = rows.collect().map(_.getString(0))
    assert(d(0) == d(1), "digit runs must coalesce into the same span digest")
    assert(d(0) == d(3), "whitespace runs must coalesce into the same span digest")
    assert(d(0) != d(2), "digests must be host-seeded")
    assert(d(0).length == 32) // hex MD5
  }
}
