package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.frontier.{CrawlConfig, Crawler}
import graft.synth.SyntheticWeb

/** Temporary debug main: run the same crawl at two thread counts and print
  * per-round fetched/dedup counts to locate the divergence. */
object DebugDeterminism {
  def run(threads: Int, rounds: Int): Seq[(Int, Long, Long, Long)] = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"debug-$threads")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val work = Files.createTempDirectory(s"graft-dbg-$threads").toString
      val cfg = CrawlConfig(
        web = SyntheticWeb.Config(sites = 20000, degree = 20, maxDepth = 3),
        nSeeds = 128, hostDelay = 1, ipDelay = 1, burst = 8,
        maxUrlsPerHost = 2000, maxRounds = rounds, statePartitions = threads)
      val c = new Crawler(spark, work, cfg)
      c.run()
      c.metrics().groupBy("round")
        .agg(sum("fetched").as("f"), sum("dedup_in").as("di"), sum("dedup_out").as("dout"))
        .orderBy("round").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 4
    val a = run(8, rounds)
    val b = run(32, rounds)
    println(f"${"round"}%6s ${"f8"}%10s ${"f32"}%10s ${"di8"}%10s ${"di32"}%10s ${"do8"}%10s ${"do32"}%10s")
    val bm = b.map(t => t._1 -> t).toMap
    for ((r, f, di, dout) <- a) {
      val (_, f2, di2, dout2) = bm.getOrElse(r, (r, -1L, -1L, -1L))
      val mark = if (f != f2 || di != di2 || dout != dout2) "  <-- DIVERGE" else ""
      println(f"$r%6d $f%10d $f2%10d $di%10d $di2%10d $dout%10d $dout2%10d$mark")
    }
  }
}
