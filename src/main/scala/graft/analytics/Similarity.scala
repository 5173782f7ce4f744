package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale notes: brute-force top-k is one scan + TakeOrdered (no shuffle of
  * the corpus); the IVF variant prunes the scan to the query's nearest
  * coarse cells, turning a full scan into a partition-pruned one — the
  * standard big-data ANN layout (cells = cluster centroids; here
  * deterministic hash-plane cells, since no training loop is available). */
object Similarity {

  /** Cosine similarity of two array<double> columns (codegen'd
    * higher-order functions; sequential left-fold accumulation). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Brute-force cosine top-k: one corpus scan, TakeOrdered(k) — the exact
    * baseline. `query` is a local vector (broadcast as literal array). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    emb.select(col(idCol).as("id"),
        cosine(col(vecCol).cast("array<double>"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cosine").desc, col("id"))).cast("long"))
      .select("rank", "id", "cosine")
  }

  /** Sign-bucket (random-hyperplane) LSH top-k: only scans vectors whose
    * bucket is within `probes` hamming bits of the query's bucket —
    * the scale path (bucket == IVF cell; at 100 TB the table is
    * partitioned by bucket so pruning skips files). Approximate. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, planes: Int = 8): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    def planeSign(vec: Column, p: Int): Column = {
      val prod = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * (pmod(xxhash64(concat_ws("_", lit(p), i)), lit(2)) * 2 - 1)),
        lit(0.0), (acc, x) => acc + x)
      when(prod >= 0, lit(1L)).otherwise(lit(0L))
    }
    val bucketOf: Column => Column = vec =>
      (0 until planes).map(p => planeSign(vec, p) * (1L << p)).reduce(_ + _)
    val q = array(query.map(lit): _*)
    val qBucket = bucketOf(q)
    val bucketed = v.withColumn("bucket", bucketOf(col("v")))
    bucketed
      .where(bit_count(col("bucket").bitwiseXOR(qBucket)) <= 1) // probe ball r=1
      .select(col("id"), cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  private def planeSignExpr(vec: Column, p: Int): Column = {
    val prod = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * (pmod(xxhash64(concat_ws("_", lit(p), i)), lit(2)) * 2 - 1)),
      lit(0.0), (acc, x) => acc + x)
    when(prod >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** Sign-bucket id of an embedding column. */
  def bucketExpr(vec: Column, planes: Int): Column =
    (0 until planes).map(p => planeSignExpr(vec, p) * (1L << p)).reduce(_ + _)

  /** Write the corpus PARTITIONED BY LSH bucket: the layout that makes
    * [[lshTopKBucketed]]'s probe a partition-PRUNED read (only the probe
    * ball's directories are listed/scanned) instead of a full-corpus scan
    * with a post-filter. At 100 TB this is the difference between reading
    * ~(probes/2^planes) of the table and reading all of it. */
  def writeBucketed(emb: DataFrame, idCol: String, vecCol: String,
      path: String, planes: Int = 8): Unit =
    emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", bucketExpr(col("v"), planes))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** LSH top-k over the bucket-partitioned layout: the probe-ball filter
    * lands on the `bucket` PARTITION column, so the scan reads only the
    * matching bucket directories (check `.explain`: PartitionFilters).
    * Same result set as [[lshTopK]] with the same planes/ball. */
  def lshTopKBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
      query: Array[Double], k: Int, planes: Int = 8, hammingBall: Int = 1): DataFrame = {
    val q = array(query.map(lit): _*)
    // the query's bucket is a literal: evaluate it once on the driver
    val qBucket = spark.range(1).select(bucketExpr(q, planes).as("b")).head().getLong(0)
    // enumerate the probe ball as explicit partition values -> pruning is
    // a static IN-list over the partition column
    val ball = (0L until (1L << planes))
      .filter(b => java.lang.Long.bitCount(b ^ qBucket) <= hammingBall)
    spark.read.parquet(path)
      .where(col("bucket").isin(ball: _*))
      .select(col("id"), cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Local cosine (driver-side probe planning). */
  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** IVF (inverted-file) coarse quantizer: k-means cells TRAINED on the
    * corpus instead of data-oblivious hash planes — cells adapt to the
    * embedding distribution, so populations stay balanced where hyperplane
    * buckets can skew badly on clustered data. Same layout contract as
    * [[writeBucketed]]: the corpus is written partitioned by cell id, so a
    * probe reads only its cells' directories (~nprobe/cells of the table).
    * Deterministic for a fixed seed and input — INCLUDING across
    * parallelism levels: the fit input is pinned to one id-sorted
    * partition, because k-means|| init sampling is partitioning-sensitive
    * and re-reads of the same parquet at different core counts would
    * otherwise shift the centroids (and near-tie top-k results) between
    * environments. The trained index is a BUILD step (run once, typically
    * on a corpus sample at 100 TB), so the single-partition fit is not on
    * any per-query path. Returns the centroids (driver-side, cells x dim —
    * a few KB) for probe planning. */
  def writeIvf(emb: DataFrame, idCol: String, vecCol: String, path: String,
      cells: Int = 64, seed: Long = 42L, maxIter: Int = 10): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val withFeat = v.withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(cells).setSeed(seed).setMaxIter(maxIter)
      .fit(withFeat.orderBy("id").coalesce(1))
    model.transform(withFeat)
      .select(col("id"), col("v"), col("prediction").as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)
    model.clusterCenters.map(_.toArray)
  }

  /** IVF top-k: rank the query against the driver-local centroids, read
    * ONLY the `nprobe` nearest cells (a static IN-list on the partition
    * column -> PartitionFilters pruning), exact cosine within them.
    * `nprobe == cells` degrades gracefully to the exact full scan. */
  def ivfTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Array[Array[Double]], query: Array[Double], k: Int,
      nprobe: Int = 4): DataFrame = {
    val probeCells = centroids.zipWithIndex
      .sortBy { case (c, i) => (-cosineLocal(c, query), i) }
      .take(math.max(1, nprobe)).map(_._2)
    val q = array(query.map(lit): _*)
    spark.read.parquet(path)
      .where(col("cell").isin(probeCells.toSeq: _*))
      .select(col("id"), cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** All-pairs exact top-k neighbors for a SMALL id set (verification /
    * golden stage): ids x corpus, rank per id. */
  def topKForIds(emb: DataFrame, idCol: String, vecCol: String,
      ids: Seq[Long], k: Int): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val queries = v.where(col("id").isin(ids: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    v.crossJoin(broadcast(queries))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
