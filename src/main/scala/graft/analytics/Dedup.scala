package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Scale notes (100 TB design):
  *  - exact dedup is one hash-groupBy (map-side partial agg native);
  *  - MinHash-LSH: candidate generation never compares all pairs — docs
  *    explode to (band, bandHash) keys and only same-bucket pairs join
  *    (a self-equi-join on the band key, shuffle ∝ docs × bands, not
  *    docs²);
  *  - SimHash: 64-bit signature per doc + band-exploded bucketing, same
  *    join shape;
  *  - verification (exact n-gram Jaccard) runs only on LSH candidates.
  *
  * Materialization note: the candidate-pair builders materialize the
  * per-doc signature table with `localCheckpoint` (unreplicated
  * block-manager blocks, lineage truncated) so the self-join + skew-cap
  * + verification joins read it instead of re-deriving the signatures
  * 4-6x. On a long-lived production cluster the same boundary should be
  * a write-out/read-back (or a replicated storage level) so executor
  * loss stays recoverable — the signature table is ~10^4x smaller than
  * the corpus either way (guide §8: decide on small rows).
  */
object Dedup {

  /** Exact duplicate groups by content hash. Input needs (idCol, textCol).
    * Output: (content_hash, n_docs, keeper) — keeper = min id. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper"))

  /** Exact-dedup'd view: one row per distinct content, first id wins. */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature + banded LSH keys.
    * Returns (id, band, bandHash) — one row per band per doc.
    * `mod > 0` is oracle-twin mode: the signature uses the SQL-expressible
    * rolling-polynomial hash and the band key becomes the joined slice
    * values (a string) instead of xxhash64 — DuckDB groups by the same
    * key, so the whole banding pipeline is driver-checkable. */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 32, bands: Int = 8,
      mod: Long = 0L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = docs.select(col(idCol).as("id"),
      minhashes(col(textCol), shingleK, numHashes, mod).as("sig"))
    // band b = hash of signature slice [b*rows, (b+1)*rows)
    def bandKey(s: Column): Column =
      if (mod > 0) concat_ws("_", s.cast("array<string>"))
      else xxhash64(s.cast("array<string>"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        bandKey(slice(col("sig"), b * rows + 1, rows)).as("bandHash"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bandHash"))
  }

  /** Skew guard for LSH band self-joins: drop buckets larger than
    * `maxBucketSize`. A single degenerate bucket (empty/boilerplate docs
    * sharing a signature — guaranteed in web corpora) otherwise goes
    * quadratic: at 10^9 docs one hot bucket of 10^6 members is 10^12
    * pairs in one task. Oversized buckets are near-uniform content whose
    * members are already collapsed by EXACT dedup upstream; dropping them
    * costs recall only for >maxBucketSize-member near-dup clusters, and
    * bounds per-bucket work at maxBucketSize². */
  def capBuckets(banded: DataFrame, keyCols: Seq[String], maxBucketSize: Int): DataFrame = {
    val counts = banded.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucketSize)
      .drop("__n")
    banded.join(counts, keyCols, "left_semi")
  }

  /** MinHash-LSH near-duplicate candidate pairs (id1 < id2), deduped
    * across bands, with the estimated Jaccard from full signatures.
    * Buckets over `maxBucketSize` are skipped (skew guard). */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 32, bands: Int = 8,
      minEstJaccard: Double = 0.5, maxBucketSize: Int = 1000,
      mod: Long = 0L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    // Materialize the signature table ONCE per invocation (guide §8:
    // decide on small rows — a signature is a few hundred bytes standing
    // in for the document). Without the boundary, the self-join, the
    // skew-cap semi-join and the two est-jaccard joins re-evaluate the
    // minhash expression over EVERY doc six times (r06 plan audit: six
    // parquet scans of `documents` in one query).
    val sig = docs.select(col(idCol).as("id"),
      minhashes(col(textCol), shingleK, numHashes, mod).as("sig")).localCheckpoint()
    def bandKey(s: Column): Column =
      if (mod > 0) concat_ws("_", s.cast("array<string>"))
      else xxhash64(s.cast("array<string>"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        bandKey(slice(col("sig"), b * rows + 1, rows)).as("bandHash"))
    }
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bandHash"))
    val b = capBuckets(banded, Seq("band", "bandHash"), maxBucketSize)
    val pairs = b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") && col("l.bandHash") === col("r.bandHash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()
    pairs
      .join(sig.select(col("id").as("id1"), col("sig").as("sig1")), Seq("id1"))
      .join(sig.select(col("id").as("id2"), col("sig").as("sig2")), Seq("id2"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig1"), col("sig2"), (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numHashes)
      .where(col("est_jaccard") >= minEstJaccard)
      .select("id1", "id2", "est_jaccard")
  }

  /** SimHash near-dup buckets: docs sharing any of 8 x 8-bit bands of
    * their 64-bit simhash (8 bands keep bucket populations bounded at
    * scale far better than 4 x 16-bit). Returns candidate pairs with
    * hamming distance; buckets over `maxBucketSize` are skipped.
    *
    * Recall bound: with 8 bands, pigeonhole guarantees every pair at
    * hamming <= 7 shares at least one full band — the default `maxHamming`
    * matches that bound. Asking for a larger `maxHamming` is allowed but
    * candidate recall above 7 is only partial (pairs whose differing bits
    * spread across all 8 bands are never bucketed together). */
  def simhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 7, maxBucketSize: Int = 1000, mod: Long = 0L): DataFrame = {
    // signature materialized once per invocation — the self-join + skew
    // cap otherwise evaluate the (interpreted) simhash expression over
    // every doc in four scan subtrees, twice per subtree (the join-key
    // isnotnull filter re-derives it); see minhashCandidatePairs
    val sig = docs.select(col(idCol).as("id"), simhash64(col(textCol), mod).as("sh"))
      .localCheckpoint()
    val banded0 = sig.select(col("id"), col("sh"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("sh"), b * 8).bitwiseAND(lit(0xffL)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.key"))
    val banded = capBuckets(banded0, Seq("band", "key"), maxBucketSize)
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact token-set n-gram Jaccard for a (small) candidate-pair set:
    * the verification stage after LSH. `pairs` has (id1, id2). */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
      array_distinct(ngrams(col(textCol), n)).as("grams"))
    pairs
      .join(grams.select(col("id").as("id1"), col("grams").as("g1")), Seq("id1"))
      .join(grams.select(col("id").as("id2"), col("grams").as("g2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("g1"), col("g2"))).cast("double"))
      .withColumn("uni", size(array_union(col("g1"), col("g2"))).cast("double"))
      .select(col("id1"), col("id2"),
        when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")).as("jaccard"))
  }

  /** Token n-grams of a text column as an array of strings. */
  def ngrams(text: Column, n: Int): Column = {
    val tokens = split(text, " ")
    // windows i..i+n-1 over the token array via transform on indices
    filter(
      transform(sequence(lit(0), greatest(size(tokens) - n, lit(0))),
        i => array_join(slice(tokens, i + 1, lit(n)), " ")),
      g => length(g) > 0)
  }

  /** Same-bucket pair join + exact-cosine verification, shared by the
    * bucketing variants. `maxBucketSize == Int.MaxValue` skips the skew
    * cap (and its extra counting pass). */
  private def cosinePairsInBuckets(v: DataFrame, bucket: Column,
      minCosine: Double, maxBucketSize: Int): DataFrame = {
    // (id, v, bucket, nrm) materialized once per invocation: the self-join
    // sides (and the skew-cap pass) read the materialized rows instead of
    // re-deriving bucket ids, and each row's norm is computed ONCE here
    // rather than once per PAIR inside the cosine — the per-pair work
    // drops to a single dot-product fold (bit-identical: same fold order,
    // same na*nb operand order as Similarity.cosine).
    val withB = v.withColumn("bucket", bucket)
      .withColumn("nrm", Similarity.normExpr(col("v")))
      .localCheckpoint()
    val sig =
      if (maxBucketSize == Int.MaxValue) withB
      else capBuckets(withB, Seq("bucket"), maxBucketSize)
    sig.as("l").join(sig.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        Similarity.cosineWithNorms(col("l.v"), col("r.v"),
          col("l.nrm"), col("r.nrm")).as("cosine"))
      .where(col("cosine") >= minCosine)
  }

  /** Embedding-cosine near-duplicate pairs over an LSH bucketing by
    * random-hyperplane signs (cheap, deterministic). */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int = 12, minCosine: Double = 0.95,
      maxBucketSize: Int = 1000): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    // deterministic pseudo-hyperplanes: sign of sum_i v[i]*w_p[i],
    // w_p[i] = hash-derived in {-1,1}. For a uniform-dimension corpus the
    // weights are a driver-computed literal table (the same xxhash64
    // derivation — Similarity.planeWeights), replacing planes×dim string
    // hashes per row; ragged corpora keep the per-row adaptive form.
    def sgnAdaptive(p: Int): Column = {
      val prods = aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => x * (pmod(xxhash64(concat_ws("_", lit(p), i)), lit(2)) * 2 - 1)),
        lit(0.0), (acc, x) => acc + x)
      when(prods >= 0, lit(1)).otherwise(lit(0))
    }
    def sgnW(p: Int, w: Array[Double]): Column = {
      val prods = aggregate(zip_with(col("v"), array(w.map(lit): _*), (x, ww) => x * ww),
        lit(0.0), (acc, x) => acc + x)
      when(prods >= 0, lit(1)).otherwise(lit(0))
    }
    val sigExpr = Similarity.uniformDim(v, "v") match {
      case Some(dim) =>
        val w = Similarity.planeWeights(planes, dim)
        (0 until planes).map(p => sgnW(p, w(p)) * (1 << p)).reduce(_ + _)
      case None =>
        (0 until planes).map(p => sgnAdaptive(p) * (1 << p)).reduce(_ + _)
    }
    cosinePairsInBuckets(v, sigExpr, minCosine, maxBucketSize)
  }

  /** Embedding near-dup pairs over COORDINATE-SIGN buckets: plane p is
    * the axis-aligned hyperplane v[p] = 0, so the bucket id is plain
    * column arithmetic (ANSI-SQL-expressible — this variant carries the
    * family's DuckDB oracle; the hashed-hyperplane variant above is the
    * production choice when coordinates are correlated). */
  def embeddingNearDupPairsCoordSign(emb: DataFrame, idCol: String,
      vecCol: String, planes: Int = 6, minCosine: Double = 0.95,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val bucket = (0 until planes).map(p =>
      when(element_at(col("v"), p + 1) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    cosinePairsInBuckets(v, bucket, minCosine, maxBucketSize)
  }
}
