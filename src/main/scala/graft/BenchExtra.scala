package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Diagnostic bench (guide §1): times each query in isolation with the
  * noop sink (so the computation is measured, not the sink), captures
  * `.explain("formatted")` per query, and labels jobs for the UI. The
  * driver-facing protocol lives in [[Bench]] (frozen); this main exists so
  * optimization evidence (plans, isolated walls) can be produced without
  * touching the measurement harness.
  *
  * Usage: runMain graft.BenchExtra [outDir] [query...]
  *   env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  *   With no query args, all non-crawl queries run.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outDir = if (args.nonEmpty) args(0) else "plans/r06/tmp"
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCHX_REPS", "2").toInt
    new java.io.File(outDir).mkdirs()

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir",
        s"/dev/shm/graft-benchx-spark-${java.lang.ProcessHandle.current().pid()}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warmup (same rationale as Bench)
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().count()
    catch { case _: Exception => () }

    val skip = Set("q_crawl_e2e", "q_store_archetypes", "q_crawl_progress",
      "q_queue_histogram", "q_media_edges", "q_graph_map", "q_speed_histogram")
    val wanted: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.filterNot(skip).sorted

    val out = new StringBuilder
    wanted.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      var failed = false
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[benchx] $name: $e")
        }
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      } catch { case e: Throwable => System.err.println(s"[benchx] explain $name: $e") }
      // a failed rep's wall is time-to-exception, not a measurement —
      // mark it so _walls.txt can never pass failure off as a speedup
      val line = f"$name%-32s ${walls.map(w => f"$w%7.3f").mkString(" ")}" +
        (if (failed) "  ERROR" else "")
      println("BENCHX " + line)
      out.append(line).append('\n')
      spark.sparkContext.setJobDescription(null)
    }
    Files.writeString(Paths.get(s"$outDir/_walls.txt"), out.toString)
    SparkEntry.cleanupTempDirs()
    spark.stop()
  }
}
