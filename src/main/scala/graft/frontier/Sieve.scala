package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Two implementations of the membership check:
  *  - [[newUrls]] — the direct shape: anti-join against the seen store
  *    (optionally bloom-bank-prefiltered), the Spark reading of the
  *    reference's batched sort-merge against its sorted hash file;
  *  - [[newUrlsScanProbe]] — THE round/scale path: the seen store is only
  *    ever SCANNED, never shuffled/sorted/broadcast — a bloom built over
  *    the batch reverses the probe, and the (small) `present` set carries
  *    the exact anti-join. Mercator's sequential store merge
  *    (`MercatorSieve.java:311-344`) reads its whole store once per
  *    flush; the scan-probe reproduces exactly that I/O pattern, where a
  *    plain SMJ anti-join would re-SHUFFLE the full accumulated store
  *    every round.
  *
  * The bloom bank (consolidated base + per-round deltas, each broadcast
  * once at build) is the north_rule's "broadcast-refreshed bloom/cuckoo
  * URL-seen set": it culls the definitely-new majority before any join,
  * and gates the oversized-present fallback; membership stays EXACT via
  * the anti-join of the remainder.
  */
object Sieve {

  /** fpp of the batch bloom that reverses the seen probe. Shared constant:
    * the presentUpper broadcast bound in [[newUrlsScanProbe]] is computed
    * from this SAME value, so a caller pre-building the filter (bloom_agg
    * fusion) must size it with [[BatchBloomFpp]] or the bound is invalid. */
  val BatchBloomFpp = 0.001

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
      blooms: Seq[BloomFilter] = Nil,
      broadcastProbe: Boolean = false): DataFrame = {
    val spark = candidates.sparkSession

    // First-wins within the batch (MercatorSieve.java:311-318), via partial
    // aggregation rather than a window: map-side combine makes a heavily
    // duplicated URL (skewed key) cost one row per partition, not a sort.
    val deduped = Ranking.firstPerKey(candidates, "urlHash", orderCols)

    blooms match {
      case Nil =>
        deduped.join(seen, Seq("urlHash"), "left_anti")
      case bank =>
        // bank of filters: the consolidated base + per-round deltas (the
        // broadcast-REFRESHED filter is extended, not rebuilt, each round)
        val bcast = bank.map(spark.sparkContext.broadcast(_))
        // Definitely-new rows skip the join entirely; only bloom-positive
        // rows (true hits + false positives) pay the exact membership check.
        // might_contain_bank is a codegen'd expression: the prefilter stays
        // inside whole-stage codegen (a Scala UDF here crossed the
        // codegen->Scala boundary once per candidate URL).
        val flagged = deduped.withColumn("__maybe",
          graft.functions.might_contain_bank(col("urlHash"), bcast))
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

  /** Round-path sieve that never shuffles the seen store (the 10^10-seen
    * scale path). Shape:
    *
    *  1. within-batch first-wins dedup (one batch-sized shuffle — the only
    *     large exchange);
    *  2. bank-bloom prefilter splits sure-new from maybe-seen (codegen'd);
    *  3. a SECOND bloom, built distributed over the maybe-batch, REVERSES
    *     the probe: `present = seen WHERE batchBloom.mightContain(hash)` is
    *     a pure SCAN of the seen store — seen is never shuffled, sorted, or
    *     broadcast, at any batch size;
    *  4. exact anti-join of maybe against the (small) present set —
    *     broadcast when it fits, shuffle of two SMALL sides otherwise.
    *
    * This is the Spark reading of Mercator's sequential store merge
    * (`MercatorSieve.java:311-344`): one sequential pass over the store per
    * flush, work ∝ batch. Returns the new-URL batch as a union of two
    * frames MATERIALIZED via `mat` (callers pass localCheckpoint), so the
    * output is safe for the order-sensitive rank pass and is scanned — not
    * recomputed — by its several consumers.
    */
  def newUrlsScanProbe(
      candidates: DataFrame,
      seen: DataFrame,
      orderCols: Seq[String],
      bank: Seq[org.apache.spark.broadcast.Broadcast[BloomFilter]],
      mat: DataFrame => DataFrame,
      broadcastLimit: Long,
      candidateCount: Long,
      seenCount: Long = -1L,
      batchFpp: Double = BatchBloomFpp,
      prebuiltBatchBloom: BloomFilter = null): DataFrame = {
    val spark = candidates.sparkSession
    // batch bloom over ALL candidate hashes: one column-pruned scan of the
    // (columnar-cached) candidate batch — the batch itself is NOT
    // materialized for this. Bank-negative (sure-new) candidates cannot be
    // in seen, so `present` computed from the all-candidates bloom equals
    // seen ∩ batch exactly (plus ~seen*fpp false positives). Callers that
    // already aggregated the batch (e.g. fusing the filter build with the
    // candidate count via bloom_agg) pass the filter in and skip the pass.
    // empty batch: nothing can be present in seen, and building a bloom
    // over zero rows is ill-defined (Spark's stat.bloomFilter NPEs on it)
    if (candidateCount == 0 && prebuiltBatchBloom == null)
      return mat(Ranking.firstPerKey(candidates, "urlHash", orderCols))
    val batchBloom =
      if (prebuiltBatchBloom != null) prebuiltBatchBloom
      else candidates.stat.bloomFilter("urlHash",
        math.max(candidateCount, 1024L), batchFpp)
    val bb = Seq(spark.sparkContext.broadcast(batchBloom))
    val presentPlan = seen.where(graft.functions.might_contain_bank(col("urlHash"), bb))
    val deduped = Ranking.firstPerKey(candidates, "urlHash", orderCols)
    // |present| <= |batch| + |seen|*fpp: when that bound already fits the
    // broadcast limit, skip the materialize-and-count barriers entirely —
    // the broadcast exchange inside the anti-join evaluates the seen scan
    // exactly once, and the whole sieve tail is ONE job instead of three
    // (materialize present, count present, anti-join).
    // the |present| bound below assumes the batch bloom was sized for (at
    // least) this batch at `batchFpp`. An undersized caller-prebuilt
    // filter (e.g. one whose bloom_agg build was clamped by the session's
    // runtime-filter numBits cap) has a HIGHER real fpp, so the bound is
    // invalid — but the sieve itself stays correct (the bloom is only a
    // prefilter; the anti-join below is exact), so the right response is
    // to SKIP the bound-based shortcut and fall through to the
    // materialize-and-count path that measures |present| exactly, not to
    // abort a crawl hours in over a degraded prefilter.
    val boundValid = prebuiltBatchBloom == null ||
      prebuiltBatchBloom.bitSize() >=
        BloomFilter.optimalNumOfBits(math.max(candidateCount, 1024L), batchFpp)
    val presentUpper =
      if (seenCount < 0 || !boundValid) Long.MaxValue
      else candidateCount + math.ceil(seenCount * batchFpp).toLong
    if (presentUpper <= broadcastLimit)
      return mat(deduped.join(broadcast(presentPlan), Seq("urlHash"), "left_anti"))
    val present = mat(presentPlan)
    val presentCount = present.count()
    if (presentCount == 0) return mat(deduped)
    if (presentCount <= broadcastLimit)
      // ONE materialization of the batch: dedup feeds the broadcast
      // anti-join directly (a hash-set probe per row costs what the bloom
      // probe did, and replaces it)
      mat(deduped.join(broadcast(present), Seq("urlHash"), "left_anti"))
    else {
      // oversized present set (a mostly-already-seen batch): split the
      // batch with the URL-seen bloom bank so only the maybe-seen leg
      // pays the shuffle join — and both legs are still joined against
      // `present`, never against the full seen store
      require(bank.nonEmpty, "newUrlsScanProbe fallback needs the bloom bank")
      val flagged = mat(deduped.withColumn("__maybe",
        graft.functions.might_contain_bank(col("urlHash"), bank)))
      val sure = flagged.where(!col("__maybe")).drop("__maybe")
      val maybe = flagged.where(col("__maybe")).drop("__maybe")
      sure.unionByName(mat(maybe.join(present, Seq("urlHash"), "left_anti")))
    }
  }

  /** Build a bloom filter over the seen table's hashes (one pass; driver
    * holds only the bitset, sized for `expected` items at `fpp`). */
  def seenBloom(seen: DataFrame, expected: Long, fpp: Double = 0.01): BloomFilter =
    seen.stat.bloomFilter("urlHash", math.max(expected, 1L), fpp)

  /** Row count + bloom filter over `hashCol` in ONE pass, with a PARALLEL
    * final merge. A plain global `agg(bloom_agg)` funnels every map task's
    * partial filter into a single final task, whose wall is
    * deserialize+OR over (numPartials × filterBytes) — measured 3-4 s of
    * SERIAL time per round on the bench crawl (the filters are ~10 MB and
    * the map side runs 64 tasks), squarely on the sieve gate's critical
    * path, and growing with cluster partition counts. Grouping by
    * partition id first merges in `groups` parallel tasks; the driver ORs
    * the few group filters (identically-sized, so `mergeInPlace` is
    * valid). Returns (rowCount, mergedFilter or null for an empty input).
    *
    * Driver-transfer bound: each group ships a FULL-SIZE filter to the
    * driver, so the collect is groups × filterBytes — at large `expected`
    * (e.g. a 10^8-tombstone compaction filter ≈ 114 MB at 1% fpp) a
    * 16-way group split would be ~1.8 GB, past the default
    * spark.driver.maxResultSize cliff the delta-bloom redesign documented
    * (Crawler's bloom_agg comment). `groups` is therefore clamped so the
    * transfer stays ≤ 256 MB: big filters degrade gracefully toward the
    * single-final-task shape (whose serial merge cost they amortize far
    * better than small filters anyway). */
  def bloomAggParallel(df: DataFrame, hashCol: String, expected: Long,
      fpp: Double, groups: Int): (Long, BloomFilter) = {
    import graft.functions.bloom_agg
    val filterBytes = math.max(8L,
      BloomFilter.optimalNumOfBits(math.max(expected, 1024L), fpp) / 8)
    val maxGroups = math.max(1L, (256L << 20) / filterBytes)
    val g = math.max(1, math.min(groups.toLong, maxGroups).toInt)
    val rows = df
      .groupBy((spark_partition_id() % g).as("__g"))
      .agg(count(lit(1)).as("c"), bloom_agg(col(hashCol), expected, fpp).as("bf"))
      .collect()
    var n = 0L
    var merged: BloomFilter = null
    rows.foreach { r =>
      n += r.getLong(1)
      if (!r.isNullAt(2)) {
        val b = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
        if (merged == null) merged = b else merged.mergeInPlace(b)
      }
    }
    (n, merged)
  }

  /** Assign dense, deterministic `seq` numbers to the per-round batch of
    * new URLs: `startSeq + rank` in the batch's first-enqueue order (the
    * reference re-sorts each sieve flush globally, `MercatorSieve.java:349`).
    *
    * Distributed two-phase rank with CALLER-SUPPLIED buckets — no
    * RangePartitioner (whose sampling pass re-executes the upstream
    * pipeline and is order-sensitive), no single-partition global window:
    *  1. `bucket` is a pure, monotone function of the leading order
    *     column(s) (e.g. a linear split of the known parentSeq range), so
    *     bucket ids agree with the global order and are identical at any
    *     parallelism;
    *  2. one tiny aggregation counts rows per bucket -> rank offsets;
    *  3. a per-bucket window ranks within buckets and adds the offset.
    * The input should be materialized (cached/localCheckpoint) by the
    * caller — the count and rank passes both read it.
    *
    * Returns the ranked frame and the batch row count (so callers do not
    * need a separate count() job).
    *
    * @param bucket monotone bucket id expression (any integral type)
    * @param startSeq last already-used seq; assigned seqs start at
    *                 `startSeq + 1`
    */
  def assignSeq(newUrls: DataFrame, orderCols: Seq[String], startSeq: Long,
      bucket: Column): (DataFrame, Long) = {
    val spark = newUrls.sparkSession
    val order = orderCols.map(col)
    val withPid = newUrls.withColumn("__pid", bucket.cast("long"))
    val counts = withPid.groupBy("__pid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = startSeq
    val offsets = counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }
    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__offset")
    val wLocal = Window.partitionBy("__pid").orderBy(order: _*)
    val ranked = withPid
      .withColumn("__local", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("seq", col("__offset") + col("__local"))
      .drop("__pid", "__local", "__offset")
    (ranked, acc - startSeq)
  }

  /** Monotone bucket id for [[assignSeq]]: a linear split of `[lo, hi]`
    * into `parts` buckets by the leading order column. */
  def linearBuckets(c: Column, lo: Long, hi: Long, parts: Int): Column = {
    import graft.functions.ref_long
    // lo/hi vary per round: reference-backed values keep the rank stage's
    // generated code identical across rounds (codegen cache hits)
    if (hi <= lo) lit(0L)
    else least(lit(parts - 1L), greatest(lit(0L),
      ((c - ref_long(lo, "bklo")) * lit(parts.toLong)) /
        ref_long(hi - lo + 1L, "bkspan"))).cast("long")
  }
}
