package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the plans we ship are the plans we want —
  * filters reach the parquet scan, small dims broadcast, scans prune
  * columns, hot paths stay in whole-stage codegen. Guards against silent
  * plan regressions (a correct-but-10x-slower operator is not done). */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** AQE finalizes the plan only on execution; materialize then inspect. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("filter pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_quantity") > 40 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val plan = physicalPlan(df)
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThan(l_quantity") || plan.contains("IsNotNull(l_quantity")),
      s"filters not pushed:\n$plan")
  }

  test("politeness heads: one object-hash aggregation, no frontier window/sort") {
    import spark.implicits._
    val frontier = (1L to 1000L)
      .map(i => (s"http://h${i % 37}.example/p$i", i, i % 37, i % 11, i))
      .toDF("url", "urlHash", "hostHash", "ipHash", "seq")
    val heads = frontier.groupBy("hostHash")
      .agg(graft.functions.topk_heads(col("seq"), col("url"), col("urlHash"), 4).as("heads"))
    val plan = finalPlan(heads)
    assert(plan.contains("ObjectHashAggregate") && plan.contains("topk_heads"),
      s"heads must be an object hash aggregation:\n$plan")
    assert(!plan.contains("Window"), s"no window on the frontier path:\n$plan")
    // correctness of the aggregate itself
    val h0 = heads.where(col("hostHash") === 0).select(explode(col("heads")).as("h"))
      .select(col("h.seq")).as[Long].collect().toSeq
    assert(h0 == (1L to 1000L).filter(_ % 37 == 0).sorted.take(4))
  }

  test("sieve seq assignment: no RangePartitioner sampling, bucketed rank") {
    import spark.implicits._
    val batch = (1L to 500L).map(i => (s"u$i", i, i / 50, i % 50)).toDF("url", "urlHash", "parentSeq", "linkIdx")
    val (ranked, n) = graft.frontier.Sieve.assignSeq(
      batch, Seq("parentSeq", "linkIdx"), startSeq = -1L,
      graft.frontier.Sieve.linearBuckets(col("parentSeq"), 0, 10, 4))
    val plan = finalPlan(ranked)
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"rank must not range-partition (sampling pass):\n$plan")
    assert(n == 500)
  }

  test("column pruning: 2-column projection reads a 2-column schema") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val plan = physicalPlan(df)
    assert(plan.contains("ReadSchema"), plan)
    val readSchema = plan.split("ReadSchema:")(1).takeWhile(_ != '\n')
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads more columns than projected: $readSchema")
  }

  test("q_join_topn uses a broadcast hash join") {
    val plan = physicalPlan(SparkEntry.queries("q_join_topn")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q1_agg is a two-phase hash aggregate inside whole-stage codegen") {
    val plan = finalPlan(SparkEntry.queries("q1_agg")(spark, sf))
    assert(plan.contains("HashAggregate"), plan)
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string
    assert(plan.contains("*(1)"), s"no codegen stage:\n$plan")
    // partial aggregation before the exchange (map-side combine)
    assert(plan.indexOf("HashAggregate") < plan.lastIndexOf("HashAggregate"), plan)
  }

  test("murmur64 expression participates in whole-stage codegen") {
    import graft.functions._
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(murmur64(col("text")).as("h"))
      .where(col("h") =!= 0)
    val plan = finalPlan(df)
    assert(plan.contains("*(1)"), s"murmur64 fell out of codegen:\n$plan")
    // the custom expression itself sits INSIDE the codegen stage
    assert(plan.contains("*(1) Project [murmur64_bubing") ||
      plan.contains("*(1) Filter NOT (murmur64_bubing"), plan)
  }

  test("sieve anti-join on hashes plans as a hash/SMJ anti join") {
    import spark.implicits._
    val batch = (1L to 1000L).map(i => (s"u$i", i, 0L, i)).toDF("url", "urlHash", "parentSeq", "linkIdx")
    val seen = (1L to 500L).toDF("urlHash")
    val out = graft.frontier.Sieve.newUrls(batch, seen, Seq("parentSeq", "linkIdx"))
    val plan = physicalPlan(out)
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
  }

  test("exact dedup groups aggregate without a window (no sort-based skew)") {
    val plan = physicalPlan(SparkEntry.queries("q_exact_dedup")(spark, sf))
    assert(plan.contains("HashAggregate") && !plan.contains("Window"), plan)
  }
}
