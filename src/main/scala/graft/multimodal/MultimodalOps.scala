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

  /** One sampled frame: flat (asset, frame index, bytes) rows — the
    * video-frame table shape downstream stages (dedup, embedding,
    * captioning) consume. */
  final case class MediaFrame(asset_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload.
    * The chunker is the stub standing in for a video codec's keyframe
    * iterator; the PLUMBING is the real thing — `mapPartitions` so codec
    * init amortizes per partition, one asset fanning out to many frame
    * rows via a lazy iterator (no per-asset frame list materialized),
    * embarrassingly parallel, no shuffle. */
  def sampleFrames(assets: Dataset[MediaAsset], frameBytes: Int,
      stride: Int): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0)
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition codec/decoder setup would go here
      it.flatMap { a =>
        Iterator.range(0, math.max(0, (a.payload.length + frameBytes - 1) / frameBytes))
          .filter(_ % stride == 0)
          .map { i =>
            val from = i * frameBytes
            val until = math.min(from + frameBytes, a.payload.length)
            MediaFrame(a.asset_id, i, java.util.Arrays.copyOfRange(a.payload, from, until))
          }
      }
    }
  }

  /** STUB resize — deterministic downsample: every `factor`-th byte.
    * A real image resize replaces only this body. */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Partition-wise resize of every asset's payload (metadata preserved,
    * media_type suffixed so lineage is visible downstream). */
  def resize(assets: Dataset[MediaAsset], factor: Int): Dataset[MediaAsset] = {
    require(factor > 0)
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a =>
      a.copy(payload = resizeStub(a.payload, factor),
        media_type = a.media_type + "_resized")))
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
