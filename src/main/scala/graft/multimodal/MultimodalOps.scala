package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: an opaque binary payload + typed metadata.
  * Images/audio/video all ride this shape — the engine never interprets
  * the bytes outside the decode stage. */
final case class MediaAsset(
    asset_id: Long,
    media_type: String,     // "image" | "audio" | "video" | "text"
    payload: Array[Byte],
    source: String)

/** Output of the (stubbed) decode/feature-extract stage. */
final case class MediaFeatures(
    asset_id: Long,
    n_bytes: Int,
    tag: String,            // content digest (stands in for a perceptual hash)
    feature: Array[Float])  // stands in for an embedding / decoded summary

/** Multimodal-column plumbing: schema, partitioning, and the
  * partition-wise decode stage are real; only the byte-level decoder is
  * a deterministic stub (image/audio libraries are not in this
  * container — swap [[decodeStub]] for a real decoder unchanged).
  *
  * The decode stage is `mapPartitions` so per-partition setup (model
  * load, codec init — typically seconds) amortizes over the whole
  * partition instead of per row; batch shape = one task per input
  * partition, rows streamed. At 100 TB: repartition upstream so each
  * task holds `bytes_per_partition ≈ executor_mem / 4`, and the stage
  * is embarrassingly parallel (no shuffle).
  */
object MultimodalOps {

  /** STUB decoder — deterministic fake of an image/audio feature
    * extractor: md5 digest as the content tag + 4 bytes of the digest
    * scaled to floats as the "embedding". A real decoder replaces only
    * the body of this function. */
  def decodeStub(payload: Array[Byte]): (String, Array[Float]) = {
    val md = MessageDigest.getInstance("MD5")
    val digest = md.digest(payload)
    val tag = digest.map("%02x".format(_)).mkString
    val feature = digest.take(4).map(b => (b & 0xFF) / 255.0f)
    (tag, feature)
  }

  /** Partition-wise decode/feature-extract over the opaque payloads.
    * One digest instance per partition (setup amortization pattern). */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup happens here (decoder/model init)
      it.map { a =>
        val (tag, feature) = decodeStub(a.payload)
        MediaFeatures(a.asset_id, a.payload.length, tag, feature)
      }
    }
  }

  /** Wrap the documents fixture as media assets (payload = utf-8 bytes)
    * so the pipeline is exercised end-to-end without real media. */
  def documentsAsAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.Tables.table(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        lit("text").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaAsset]
  }
}
