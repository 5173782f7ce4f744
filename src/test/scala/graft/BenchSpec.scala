package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's own correctness: query failures must surface as
  * error markers (never as plausible wall times), and the throttle
  * detector must flag the recorded BENCH_r04 failure shape while passing
  * healthy round-wall profiles. */
class BenchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("timeQueries records a thrown query as an error marker, not a wall time") {
    val qs = Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "q_ok" -> ((s, _) => s.range(10).toDF("n")),
      "q_boom" -> ((_, _) => throw new IllegalStateException("forced failure")),
      // lazy failure: the plan only explodes at evaluation time (ANSI
      // divide-by-zero inside a filter, so count() cannot prune it) — the
      // action inside timeQueries must still catch it
      "q_lazy_boom" -> ((s, _) => {
        import org.apache.spark.sql.functions._
        s.range(3).toDF("n").where(col("n") / (col("n") - col("n")) > 0)
      }))
    val r = Bench.timeQueries(spark, "/nonexistent", qs).map(t => t._1 -> t._3).toMap
    assert(r("q_ok").isEmpty)
    assert(r("q_boom").exists(_.contains("IllegalStateException")))
    assert(r("q_lazy_boom").isDefined)
  }

  test("isThrottled flags the BENCH_r04 window and passes healthy profiles") {
    // the recorded throttle window: rounds 3-4 at ~8x round-2 pace
    val r04hi = Seq((1, 181943L, 14.3), (2, 1223077L, 30.9),
      (3, 1356671L, 263.6), (4, 1496552L, 260.0))
    assert(Bench.isThrottled(r04hi))
    // a healthy run: later rounds within ~1.4x of round-2 per-URL pace
    val healthy = Seq((1, 181943L, 6.1), (2, 1223077L, 28.4),
      (3, 1356671L, 41.2), (4, 1496552L, 43.9))
    assert(!Bench.isThrottled(healthy))
    // degenerate telemetry never flags
    assert(!Bench.isThrottled(Nil))
    assert(!Bench.isThrottled(Seq((1, 100L, 5.0))))
    assert(!Bench.isThrottled(Seq((1, 0L, 5.0), (2, 0L, 5.0))))
  }
}
