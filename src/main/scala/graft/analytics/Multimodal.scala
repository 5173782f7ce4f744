package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batched feature extraction over partitions.
  *
  * The decode step is STUBBED (image/audio codecs are not in this
  * container): `fakeDecode` is a deterministic stand-in with the same
  * signature/batch shape a real decoder (per-partition, model/codec
  * loaded once per batch) would have. Everything around it — schema,
  * partitioning, batch iteration — is real and tested.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, media_ref: String, kind: String, payload: Array[Byte])

  /** Extracted features for one media payload. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, feature: Array[Float])

  /** Build a media table from the crawl docs' media spans: payloads are
    * deterministic synthetic bytes derived from the ref (a real crawler
    * would carry the fetched body here). With `mod > 0` (oracle-twin mode)
    * the ref hash is the SQL-expressible modular base-31 polynomial, so a
    * DuckDB oracle can recompute media_id and the payload byte formula —
    * the explode/distinct/Dataset plumbing is identical either way. */
  def mediaTable(docs: DataFrame, spark: SparkSession, mod: Long = 0L): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(explode(col("spans")).as("s"))
      .where(col("s.kind") === "media")
      .select(col("s.media_ref").as("media_ref"))
      .distinct()
      .as[String]
      .map { ref =>
        val h =
          if (mod > 0) graft.functions.PolyHash.hash(ref, 0, ref.length, mod)
          else graft.core.MurmurHash3Bubing.hashString(ref)
        val n = 64 + (math.abs(h) % 192).toInt
        val payload = Array.tabulate[Byte](n)(i => ((h >> (i % 8 * 8)) & 0xff).toByte)
        MediaRecord(h, ref, "image", payload)
      }
  }

  /** STUB decoder: deterministic pseudo-decode standing in for a real
    * image decode (???: libjpeg/PIL not available in this container).
    * Mirrors the real contract: called once per element inside a
    * per-partition batch loop, where a real impl would hold the decoder
    * open across the batch. With `mod > 0` the payload hash is the
    * modular polynomial over unsigned byte values and the feature vector
    * is integer-valued (no /255 normalization) so every output is exactly
    * recomputable by a DuckDB oracle. */
  private def fakeDecode(payload: Array[Byte], mod: Long): (Int, Int, Array[Float]) = {
    val h =
      if (mod > 0)
        graft.functions.PolyHash.hash(i => (payload(i) & 0xff).toLong, payload.length, mod)
      else graft.core.MurmurHash3Bubing.hash(payload)
    val width = 16 + (math.abs(h) % 64).toInt
    val height = 16 + (math.abs(h >> 7) % 64).toInt
    val feature =
      if (mod > 0) Array.tabulate(8)(i => ((h >> (i * 8)) & 0xff).toFloat)
      else Array.tabulate(8)(i => (((h >> (i * 8)) & 0xff).toInt / 255.0f))
    (width, height, feature)
  }

  /** Batched feature extraction: per-partition iteration (the Scala analog
    * of `mapInPandas` batch shape — decoder state amortized per batch). */
  def extractFeatures(media: Dataset[MediaRecord], mod: Long = 0L): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // a real decoder/model would be initialized HERE, once per batch
      batch.map { m =>
        val (w, hgt, feat) = fakeDecode(m.payload, mod)
        MediaFeatures(m.media_id, m.kind, m.payload.length, w, hgt, feat)
      }
    }
  }
}
