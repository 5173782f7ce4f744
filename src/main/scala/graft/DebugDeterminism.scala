package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.frontier.{CrawlConfig, Crawler}
import graft.synth.SyntheticWeb

/** Debug main: run the same bench-shaped crawl at two thread counts and
  * print per-round fetched/dedup counts + trace checksums to locate any
  * divergence. */
object DebugDeterminism {
  def run(threads: Int, rounds: Int, seeds: Int): (Seq[(Int, Long, Long, Long)], String) = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"debug-$threads")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.local.dir", s"/dev/shm/graft-dbg-spark-$threads")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val work = Files.createTempDirectory(s"graft-dbg-$threads").toString
      val cfg = CrawlConfig(
        web = SyntheticWeb.Config(sites = 2000000, degree = 20, maxDepth = 3),
        nSeeds = seeds, hostDelay = 1, ipDelay = 1, burst = 8,
        robotsEnabled = false, storeDocs = false,
        maxRounds = rounds, checkpointEvery = 99, statePartitions = threads)
      val c = new Crawler(spark, work, cfg)
      c.run()
      val perRound = c.metrics().groupBy("round")
        .agg(sum("fetched").as("f"), sum("dedup_in").as("di"), sum("dedup_out").as("dout"))
        .orderBy("round").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val chk = c.trace()
        .select(xxhash64(col("round"), col("seq"), col("url"), col("status"))
          .cast("decimal(38,0)").as("h"))
        .agg(sum("h")).collect()(0).getDecimal(0).toString
      (perRound, chk)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val seeds = if (args.length > 1) args(1).toInt else 20000
    val (a, chkA) = run(8, rounds, seeds)
    val (b, chkB) = run(32, rounds, seeds)
    println(f"${"round"}%6s ${"f8"}%10s ${"f32"}%10s ${"di8"}%10s ${"di32"}%10s ${"do8"}%10s ${"do32"}%10s")
    val bm = b.map(t => t._1 -> t).toMap
    for ((r, f, di, dout) <- a) {
      val (_, f2, di2, dout2) = bm.getOrElse(r, (r, -1L, -1L, -1L))
      val mark = if (f != f2 || di != di2 || dout != dout2) "  <-- DIVERGE" else ""
      println(f"$r%6d $f%10d $f2%10d $di%10d $di2%10d $dout%10d $dout2%10d$mark")
    }
    println(s"checksum8=$chkA checksum32=$chkB equal=${chkA == chkB}")
  }
}
