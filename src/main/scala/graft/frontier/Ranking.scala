package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-aware ranking utilities (north_rule: "salted-key skew splitting for
  * heavy hosts"; SURVEY.md §4 P13).
  *
  * A single window over `partitionBy(host)` serializes each host's rows into
  * one task — a host with a 10^7-URL queue (the lognormal head) becomes the
  * straggler. `topKPerKey` splits every key into `salts` sub-groups, takes
  * the top-k of each (bounded work per task), then ranks the k·salts
  * survivors per key — exact same result, no giant partitions. Salting never
  * touches the politeness *ordering* semantics, only the physical grouping
  * (the reference's analog is the per-host pathQueryLimit + ipDelayFactor,
  * `VisitState.java:396-419`). */
object Ranking {

  /** Exact top-k rows per key by `orderCols` (ascending, must be a total
    * order within a key), computed skew-safely via salted two-phase ranking.
    * Adds/returns the rank column `rankCol` (1-based). */
  def topKPerKey(df: DataFrame, keyCol: String, orderCols: Seq[String], k: Int,
      rankCol: String = "__rank", salts: Int = 16): DataFrame = {
    require(k >= 1 && salts >= 1)
    val order = orderCols.map(col)
    // deterministic salt from the order columns (NOT the key), so rows of a
    // heavy key spread across salts
    val salted = df.withColumn("__salt", pmod(xxhash64(order: _*), lit(salts)))
    val w1 = Window.partitionBy(col(keyCol), col("__salt")).orderBy(order: _*)
    val survivors = salted
      .withColumn("__r1", row_number().over(w1))
      .where(col("__r1") <= k)
      .drop("__r1", "__salt")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    survivors
      .withColumn(rankCol, row_number().over(w2))
      .where(col(rankCol) <= k)
  }

  /** First row per key in `orderCols` order, via ONE aggregation: the
    * winning row rides inside a `min(struct(orderCols ++ rest))` (the
    * order columns lead the struct, so lexicographic struct ordering is
    * decided by them; they must be non-null and unique per row within a
    * key). Partial (map-side) aggregation makes it skew-immune AND it is
    * a single shuffle of one-row-per-key-per-partition — no join back
    * (the previous implementation joined the winners against the input,
    * re-shuffling the full batch a second time). */
  def firstPerKey(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(c => c == keyCol || orderCols.contains(c)).toSeq
    val ordered = orderCols ++ rest
    val packed = struct(ordered.map(col): _*)
    df.groupBy(col(keyCol))
      .agg(min(packed).as("__w"))
      .select(col(keyCol) +: ordered.map(c => col(s"__w.$c").as(c)): _*)
  }
}
