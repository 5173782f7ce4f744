package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The URL-seen sieve: exact, order-preserving batch deduplication — the
  * Spark reading of the Mercator sieve (`sieve/MercatorSieve.java:274-391`,
  * SURVEY.md §2.3/§2.6).
  *
  * Semantics (verified against `MercatorSieveTest.java:297-337` fixtures):
  *   - duplicates *within* a batch: first enqueue wins
  *     (MercatorSieve.java:311-318 — stabilized sort by hash, first kept);
  *   - URLs already in the seen store are dropped (sorted-merge, :311-344);
  *   - survivors exit in FIRST-ENQUEUE ORDER (:349-363 re-sorts surviving
  *     positions back to input order).
  *
  * The reference's batched sort-merge against a sorted hash file is exactly
  * what a sort-merge **left-anti join** on `urlHash` does; at 10^10-URL
  * scale Catalyst/AQE picks SMJ for large-large, reproducing Mercator's
  * sequential-merge I/O pattern natively (SURVEY.md §4 P1).
  *
  * The optional broadcast Bloom filter is the north_rule's "broadcast-
  * refreshed bloom/cuckoo URL-seen set": it culls the (vast) never-seen
  * majority *before* the anti-join; the anti-join of the maybe-seen
  * remainder keeps membership exact. The filter is refreshed (rebuilt)
  * once per round from the appended seen table.
  */
object Sieve {

  /** Within-batch first-wins dedup + anti-join against `seen`, preserving
    * first-enqueue order via the explicit order columns.
    *
    * @param candidates must have `urlHash` plus the order columns
    * @param seen       table with column `urlHash` (may be empty)
    * @param orderCols  lexicographic first-enqueue order of the batch
    * @param bloom      optional broadcast-ready bloom over seen hashes
    * @return candidate rows that are genuinely new, one per urlHash
    */
  def newUrls(
      candidates: DataFrame,
      seen: DataFrame,
      orderCols: Seq[String],
      bloom: Option[BloomFilter] = None,
      broadcastProbe: Boolean = false): DataFrame = {
    val spark = candidates.sparkSession

    // First-wins within the batch (MercatorSieve.java:311-318), via partial
    // aggregation rather than a window: map-side combine makes a heavily
    // duplicated URL (skewed key) cost one row per partition, not a sort.
    val deduped = Ranking.firstPerKey(candidates, "urlHash", orderCols)

    bloom match {
      case None =>
        deduped.join(seen, Seq("urlHash"), "left_anti")
      case Some(bf) =>
        val bcast = spark.sparkContext.broadcast(bf)
        val mightContain = udf((h: Long) => bcast.value.mightContainLong(h))
        // Definitely-new rows skip the join entirely; only bloom-positive
        // rows (true hits + false positives) pay the exact membership check.
        val flagged = deduped.withColumn("__maybe", mightContain(col("urlHash")))
        val sure = flagged.where(!col("__maybe")).drop("__maybe")
        val maybe = flagged.where(col("__maybe")).drop("__maybe")
        val maybeNew =
          if (broadcastProbe) {
            // Small batch: probe the seen table with a broadcast hash set —
            // ONE sequential scan of `seen`, no shuffle/sort of it (the
            // Spark analog of Mercator's sequential store merge,
            // MercatorSieve.java:311-344). `present` <= batch size, so the
            // second join broadcasts too.
            val present = seen
              .join(broadcast(maybe.select("urlHash")), Seq("urlHash"), "left_semi")
            maybe.join(broadcast(present), Seq("urlHash"), "left_anti")
          } else {
            // Large batch: sort-merge anti-join (shuffles both sides).
            maybe.join(seen, Seq("urlHash"), "left_anti")
          }
        sure.unionByName(maybeNew)
    }
  }

  /** Build a bloom filter over the seen table's hashes (one pass; driver
    * holds only the bitset, sized for `expected` items at `fpp`). */
  def seenBloom(seen: DataFrame, expected: Long, fpp: Double = 0.01): BloomFilter =
    seen.stat.bloomFilter("urlHash", math.max(expected, 1L), fpp)

  /** Assign dense, deterministic `seq` numbers to the per-round batch of
    * new URLs: `startSeq + rank` in the batch's first-enqueue order (the
    * reference re-sorts each sieve flush globally, `MercatorSieve.java:349`).
    *
    * Distributed two-phase rank — no single-partition global window:
    *  1. range-partition by the order columns (global order across
    *     partitions; Spark's RangePartitioner samples deterministically);
    *  2. count rows per range partition -> per-partition rank offsets;
    *  3. rank within each frozen partition id and add its offset.
    * The partition-id column is a pure function of the deterministic range
    * bounds, so both passes see identical ids at any parallelism. */
  def assignSeq(newUrls: DataFrame, orderCols: Seq[String], startSeq: Long): DataFrame = {
    val spark = newUrls.sparkSession
    val order = orderCols.map(col)
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // lazy localCheckpoint: the count pass materializes the ranged batch in
    // block storage; the rank pass reuses it instead of recomputing the
    // whole upstream dedup pipeline
    val ranged = newUrls
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, startSeq)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
    val offsetOf = counts.map(_._1).zip(offsets.map(_._2)).toMap // pid -> startSeq + rows before
    val offsetDf = spark.createDataFrame(
      offsetOf.toSeq.map { case (pid, off) => (pid, off) }).toDF("__pid", "__offset")
    val wLocal = Window.partitionBy("__pid").orderBy(order: _*)
    ranged
      .withColumn("__local", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("seq", col("__offset") + col("__local"))
      .drop("__pid", "__local", "__offset")
  }
}
