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

/** Multimodal-column plumbing WITH a real image decode path: the
  * IMAGE modality decodes through `javax.imageio` (BMP/PNG — codecs
  * the JVM ships), and the generic payload path keeps a deterministic
  * stub for modalities whose codecs are not in this container (audio,
  * video containers).
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

  /** Spread a SMALL asset scan across the cluster before a
    * compute-dense encode/decode stage (round-13, guide §2.5 "input
    * skew: repartition immediately after the read"): a fixture-sized
    * corpus is one parquet split, so multi-frame video encode+decode
    * serialized on a single task while 31 cores idled (measured sf0.1:
    * m02 2.1→0.9 s, m07 1.5→0.9 s, m18 2.2→1.0 s, m08 2.8→1.4 s).
    * Applied ONLY to the video builders — for the single-image/audio
    * paths the per-row work is too small to repay the extra exchange
    * (measured: +0.3-0.5 s on m01/m04/m05/m11). No-op when the scan
    * already carries >= defaultParallelism partitions (any real-scale
    * corpus): nothing extra shuffles at 100 TB. Round-robin
    * repartition is deterministic (sort-before-repartition) and every
    * consumer is per-row + ordered, so results are unchanged. */
  private def spreadAssets(assets: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    val par = assets.sparkSession.sparkContext.defaultParallelism
    if (assets.rdd.getNumPartitions < par) assets.repartition(par) else assets
  }

  // ---- REAL image decode (javax.imageio) -------------------------------

  /** Deterministic 24-bit uncompressed BMP (BI_RGB): bottom-up rows,
    * BGR channel order, rows padded to 4 bytes — the standard wire
    * layout, written by hand and INDEPENDENT of the JVM's codecs, so
    * decoding it with `javax.imageio` is a genuine two-implementation
    * round-trip. The logical pixel stream (top-down row-major RGB) is
    * `seed` repeated cyclically: pixel i has R=seed[3i], G=seed[3i+1],
    * B=seed[3i+2] (mod seed length), which an engine with no image
    * stack reproduces as bytes — the oracle hook. */
  def syntheticBmp(seed: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && seed.nonEmpty)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    def streamByte(i: Int): Byte = seed(i % seed.length)
    var y = h - 1 // bottom-up: last logical row first
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        b.put(streamByte(p + 2)) // B
        b.put(streamByte(p + 1)) // G
        b.put(streamByte(p))     // R
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** REAL decode: payload bytes → (width, height, top-down row-major
    * RGB bytes) via `javax.imageio` (BMP, PNG, GIF, JPEG — whatever
    * readers the JVM registers). Fails loudly on undecodable bytes. */
  def decodeRgb(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) throw new IllegalArgumentException(
      s"no registered image decoder accepts this ${payload.length}-byte payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        out(p) = ((argb >> 16) & 0xFF).toByte
        out(p + 1) = ((argb >> 8) & 0xFF).toByte
        out(p + 2) = (argb & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Image dims per asset — varied so BMP row padding (w=13,14,15 pad
    * 1–2 bytes; w=16 none) is exercised, not dodged. */
  def imageDims(assetId: Long): (Int, Int) =
    (13 + (assetId % 4).toInt, 6 + (assetId % 3).toInt)

  /** Documents rendered as real single-frame BMP images (pixel stream =
    * utf-8 text bytes, cyclic). The encode runs partition-wise in
    * Spark; payloads are genuine BMP files any image tool opens. */
  def imageAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    documentsAsAssets(spark, dir).mapPartitions(_.map { a =>
      val (w, h) = imageDims(a.asset_id)
      a.copy(media_type = "image", payload = syntheticBmp(a.payload, w, h))
    })
  }

  /** Decoded-image features: REAL `javax.imageio` decode inside the
    * mapPartitions stage — tag = md5 of the decoded RGB pixel stream,
    * sum_r = exact sum of the red channel (verifies VALUES, not just
    * ordering), feature = per-channel means. */
  final case class ImageFeatures(
      asset_id: Long, width: Int, height: Int, n_bytes: Int,
      tag: String, sum_r: Long, feature: Array[Float])

  def extractImageFeatures(assets: Dataset[MediaAsset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec setup
      val md = MessageDigest.getInstance("MD5")
      it.map { a =>
        val (w, h, rgb) = decodeRgb(a.payload)
        md.reset()
        val tag = md.digest(rgb).map("%02x".format(_)).mkString
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < rgb.length) {
          sr += rgb(i) & 0xFF; sg += rgb(i + 1) & 0xFF; sb += rgb(i + 2) & 0xFF
          i += 3
        }
        val n = (w * h).toFloat
        ImageFeatures(a.asset_id, w, h, a.payload.length, tag, sr,
          Array(sr / n / 255f, sg / n / 255f, sb / n / 255f))
      }
    }
  }

  /** Cross-modal pairing audit row: the image a caption CLAIMS vs what
    * its pixels actually encode. */
  final case class PairAudit(
      doc_id: Long, img_id: Long, width: Int, height: Int,
      expected_tag: String, actual_tag: String, matched: Boolean)

  /** Caption↔image pairing audit (m12) — the misaligned-shard check a
    * multimodal dataset build needs: every (caption, claimed-image)
    * pair REALLY decodes the image (`javax.imageio`), recomputes the
    * expected pixel stream from the CAPTION text at the decoded
    * dimensions, and compares digests. A shifted pairing (the classic
    * off-by-one WebDataset shard bug) surfaces as `matched = false`
    * without any metadata help — the evidence is the pixels. Per-row
    * decode inside mapPartitions after one broadcast-joinable pairing
    * join; no shuffle beyond the join itself.
    *
    * `captions` needs (doc_id, text, img_id) — img_id names the image
    * each caption claims. ASCII captions only (byte == char is what
    * lets a no-image-stack oracle reproduce the expected digest). */
  def pairingAudit(
      captions: org.apache.spark.sql.DataFrame,
      images: Dataset[MediaAsset]): Dataset[PairAudit] = {
    import images.sparkSession.implicits._
    val paired = captions
      .join(images.toDF().select(col("asset_id").as("img_id"),
        col("payload")), Seq("img_id"))
      .select(col("doc_id"), col("img_id"), col("text"), col("payload"))
    paired.as[(Long, Long, String, Array[Byte])].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      it.map { case (docId, imgId, text, payload) =>
        val (w, h, rgb) = decodeRgb(payload)
        md.reset()
        val actual = md.digest(rgb).map("%02x".format(_)).mkString
        val textBytes = text.getBytes("UTF-8")
        val expectedStream = new Array[Byte](w * h * 3)
        var i = 0
        while (i < expectedStream.length) {
          expectedStream(i) = textBytes(i % textBytes.length); i += 1
        }
        md.reset()
        val expected = md.digest(expectedStream).map("%02x".format(_)).mkString
        PairAudit(docId, imgId, w, h, expected, actual, expected == actual)
      }
    }
  }

  /** One decoded video frame (already-decoded RGB digest + dims). */
  final case class DecodedFrame(
      asset_id: Long, frame_idx: Int, width: Int, height: Int, frame_tag: String)

  /** "Video" assets: `nFrames` concatenated BMP frames per document;
    * frame f's pixel stream continues the cyclic text stream at offset
    * f·w·h·3 (so downstream verification needs only the text). */
  def videoAssets(spark: SparkSession, dir: String, nFrames: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spreadAssets(documentsAsAssets(spark, dir)).mapPartitions(_.map { a =>
      val (w, h) = imageDims(a.asset_id)
      val frameLen = w * h * 3
      val bos = new java.io.ByteArrayOutputStream()
      var f = 0
      while (f < nFrames) {
        // rotate the seed so frame f starts at stream offset f*frameLen
        val off = (f * frameLen) % a.payload.length
        val rotated = a.payload.drop(off) ++ a.payload.take(off)
        bos.write(syntheticBmp(rotated, w, h))
        f += 1
      }
      a.copy(media_type = "video", payload = bos.toByteArray)
    })
  }

  /** Frame sampling with REAL decode: fixed-size BMP frames located by
    * offset arithmetic (the codec-iterator stand-in), every `stride`-th
    * frame decoded via `javax.imageio` and digested. Lazy per-frame
    * iterator, no per-asset frame list materialized, no shuffle. */
  def sampleDecodedFrames(assets: Dataset[MediaAsset],
      stride: Int): Dataset[DecodedFrame] = {
    require(stride > 0)
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { a =>
        val (w, h) = imageDims(a.asset_id)
        val frameBytes = 54 + ((w * 3 + 3) / 4) * 4 * h
        Iterator.range(0, a.payload.length / frameBytes)
          .filter(_ % stride == 0)
          .map { f =>
            val one = java.util.Arrays.copyOfRange(
              a.payload, f * frameBytes, (f + 1) * frameBytes)
            val (dw, dh, rgb) = decodeRgb(one)
            md.reset()
            DecodedFrame(a.asset_id, f, dw, dh,
              md.digest(rgb).map("%02x".format(_)).mkString)
          }
      }
    }
  }

  /** 56-bit perceptual difference hash of a decoded image. */
  final case class ImageHash(asset_id: Long, dhash: Long)

  /** Perceptual dHash over REAL decoded pixels — the image-modality
    * bridge into the dedup operators: re-encoded, resized, or
    * re-compressed copies of an image keep a near-identical dHash
    * (small hamming distance) while any byte-level fingerprint
    * changes completely. Classic difference-hash construction on an
    * 8×8 grid: nearest-neighbor sample the decoded RGB at integer
    * grid positions (x·w/8, y·h/8), compare each cell's gray SUM
    * (r+g+b — avoids a division) to its right neighbor → 7 bits × 8
    * rows = 56 bits (fits a positive i64, so the SQL oracle's BIGINT
    * arithmetic never overflows). Per-row decode, no shuffle. */
  /** The 56-bit dHash of one decoded RGB frame (8×8 nearest-neighbor
    * grid, gray-sum right-neighbor comparisons) — shared by the image
    * and video perceptual hashes so both modalities band identically. */
  private def dHashOf(w: Int, h: Int, rgb: Array[Byte]): Long = {
    def graySum(gx: Int, gy: Int): Int = {
      val p = ((gy * h / 8) * w + (gx * w / 8)) * 3
      (rgb(p) & 0xFF) + (rgb(p + 1) & 0xFF) + (rgb(p + 2) & 0xFF)
    }
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 7) {
        if (graySum(gx, gy) > graySum(gx + 1, gy))
          bits |= 1L << (gy * 7 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  def imageDHash(assets: Dataset[MediaAsset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val (w, h, rgb) = decodeRgb(a.payload)
        ImageHash(a.asset_id, dHashOf(w, h, rgb))
      }
    }
  }

  /** Image near-duplicate candidate pairs by dHash hamming distance —
    * the same 4-chunk pigeonhole banding as the text simhash operators
    * (56 bits → 4 chunks of 14 bits; ≤ 3 differing bits leave one
    * chunk identical), so a billion-image dedup shuffles (id, chunk)
    * pairs, never pixels. Returns (id_a, id_b, hamming ≤ maxDist). */
  def imageNearDupPairs(hashes: org.apache.spark.sql.DataFrame,
      maxDist: Int = 3, maxBucket: Int = 10000,
      skewObs: Option[org.apache.spark.sql.Observation] = None)
      : org.apache.spark.sql.DataFrame =
    bandedHammingPairs(hashes, "dhash", maxDist, maxBucket, skewObs)

  /** CROSS-MODAL duplicate classification (the LAION/WebDataset dedup
    * decision): image near-dup candidate pairs joined with their
    * captions' n-gram Jaccard, split into `dup` (same image, same
    * caption — a true duplicate to drop) vs `recaption` (same image,
    * DIFFERENT caption — a valuable augmentation pair to KEEP).
    * Unimodal image dedup cannot tell these apart and silently throws
    * away the recaptioned training signal. Plan shape: the pair set is
    * the banded hamming join's output (payloads never shuffle); the
    * caption join touches only candidate-pair rows, so its cost is
    * output-proportional at any corpus size. `imagePairs`:
    * (id_a, id_b, hamming); `captions`: (asset_id, caption). */
  def crossModalDupClass(imagePairs: org.apache.spark.sql.DataFrame,
      captions: org.apache.spark.sql.DataFrame,
      tau: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val capA = captions.select(col("asset_id").as("id_a"),
      col("caption").as("cap_a"))
    val capB = captions.select(col("asset_id").as("id_b"),
      col("caption").as("cap_b"))
    imagePairs.join(capA, "id_a").join(capB, "id_b")
      .withColumn("caption_jaccard", graft.operators.DedupOps.jaccard(
        graft.operators.DedupOps.shingles(col("cap_a")),
        graft.operators.DedupOps.shingles(col("cap_b"))))
      .withColumn("dup_class",
        when(col("caption_jaccard") >= tau, lit("dup"))
          .otherwise(lit("recaption")))
      .select(col("id_a"), col("id_b"), col("hamming"),
        col("caption_jaccard"), col("dup_class"))
  }

  /** Audio near-duplicate candidate pairs over the 56-bit energy hash —
    * the same pigeonhole banding as [[imageNearDupPairs]] (both hashes
    * are 56-bit perceptual signatures; a re-encoded/re-crawled clip
    * lands within a few bits of the original). */
  def audioNearDupPairs(hashes: org.apache.spark.sql.DataFrame,
      maxDist: Int = 3, maxBucket: Int = 10000,
      skewObs: Option[org.apache.spark.sql.Observation] = None)
      : org.apache.spark.sql.DataFrame =
    bandedHammingPairs(hashes, "ahash", maxDist, maxBucket, skewObs)

  /** Shared 56-bit hamming candidate join: 4 chunks of 14 bits — ≤ 3
    * differing bits leave one chunk identical, so recall is guaranteed
    * at maxDist ≤ 3; (id, chunk) rows ride the shuffle, never payloads.
    *
    * Round-9 rework (VERDICT r8 item 1): hamming-0 groups are collapsed
    * BEFORE banding. Banding assets directly was quadratic on
    * low-entropy hashes — the audio energy hash concentrates many
    * assets on few 14-bit chunk values, so `groupBy(chunk, ck)` buckets
    * grew ∝ corpus and in-bucket pair expansion cost O(Σ bucket²)
    * (measured 51× for 10× data at sf1, every bucket under the absolute
    * cap). Identical-payload re-crawls — the common case — are exactly
    * what inflated those buckets, and their pairs are derivable without
    * banding at all. So:
    *   1. one shuffle on the hash → (hash, members) groups;
    *   2. hamming-0 pairs expand per group — OUTPUT-proportional
    *      (every emitted pair is a result row, not a candidate);
    *   3. only DISTINCT hashes are banded — bucket sizes now track hash
    *      ENTROPY, not corpus size — under a relative candidate budget
    *      ([[graft.operators.LshJoin.candidatesBudgeted]]);
    *   4. qualifying hash pairs (1 ≤ hamming ≤ maxDist) re-expand to
    *      member cross products — again output-proportional.
    * Each asset carries exactly one hash, so the three categories are
    * disjoint and no pair dedup across them is needed. */
  private def bandedHammingPairs(hashes: org.apache.spark.sql.DataFrame,
      hashCol: String, maxDist: Int, maxBucket: Int,
      skewObs: Option[org.apache.spark.sql.Observation])
      : org.apache.spark.sql.DataFrame = {
    require(maxDist <= 3, "4-chunk banding guarantees recall only for maxDist <= 3")
    import graft.functions.native.sorted_pairs
    // the hash groups feed four plan branches (zero-pairs, banding, two
    // member re-expansions); persist so decode + the hash shuffle run
    // once — at 100 TB this is the dedup state you'd materialize anyway.
    // The skew observation sits BETWEEN the aggregation and the persist:
    // metrics fire exactly once (at cache materialization) and can never
    // be AQE-pruned the way a downstream-branch observation can when the
    // 1..maxDist candidate branch turns out empty (the common
    // all-duplicates-are-exact fixture shape).
    val raw = hashes.groupBy(col(hashCol))
      .agg(collect_list(col("asset_id")).as("members"))
    val grouped = skewObs.fold(raw)(o => raw.observe(o,
        count(lit(1)).as("hash_groups"),
        max(size(col("members"))).as("max_group_size"),
        sum(size(col("members"))).as("n_assets"),
        sum(when(size(col("members")) >= 2, size(col("members")) - 1)
          .otherwise(0)).as("collapsed_dups")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val zero = grouped.filter(size(col("members")) >= 2)
      .select(explode(sorted_pairs(col("members"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), lit(0).as("hamming"))
    val banded = grouped.select(col(hashCol).as("id"))
      .select(col("id"), explode(org.apache.spark.sql.functions.expr(
        """transform(sequence(0, 3), c ->
          |  struct(c AS chunk, shiftright(id, c * 14) & 16383 AS ck))"""
          .stripMargin)).as("b"))
      .select(col("id"), col("b.chunk"), col("b.ck"))
    // no observation here: this branch is AQE-pruned outright when no
    // 1..maxDist pairs exist, and the gate's Observation is single-use
    val hashPairs = graft.operators.LshJoin.candidatesBudgeted(
        banded, Seq("chunk", "ck"), maxBucket,
        candidateBudget = 4L * 1000 * 1000, skewObs = None)
      .select(col("id_a").as("h_a"), col("id_b").as("h_b"),
        bit_count(col("id_a").bitwiseXOR(col("id_b"))).as("hamming"))
      .filter(col("hamming").between(1, maxDist))
    val cross = hashPairs
      .join(grouped.select(col(hashCol).as("h_a"), col("members").as("ms_a")),
        "h_a")
      .join(grouped.select(col(hashCol).as("h_b"), col("members").as("ms_b")),
        "h_b")
      .select(explode(col("ms_a")).as("ma"), col("ms_b"), col("hamming"))
      .select(col("ma"), explode(col("ms_b")).as("mb"), col("hamming"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("hamming"))
    zero.unionAll(cross)
  }

  /** "Video" assets at ONE resolution for every asset — perceptual
    * video fingerprinting normalizes resolution before hashing, so
    * frame hashes are comparable ACROSS videos (the per-asset
    * `imageDims` variation exists to exercise BMP padding, which would
    * make identical content hash differently per doc id). */
  def videoAssetsUniform(spark: SparkSession, dir: String,
      nFrames: Int, w: Int, h: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spreadAssets(documentsAsAssets(spark, dir)).mapPartitions(_.map { a =>
      val frameLen = w * h * 3
      val bos = new java.io.ByteArrayOutputStream()
      var f = 0
      while (f < nFrames) {
        val off = (f * frameLen) % a.payload.length
        val rotated = a.payload.drop(off) ++ a.payload.take(off)
        bos.write(syntheticBmp(rotated, w, h))
        f += 1
      }
      a.copy(media_type = "video", payload = bos.toByteArray)
    })
  }

  final case class FrameHash(asset_id: Long, frame_idx: Int, dhash: Long)

  /** Per-frame perceptual dHash over REAL decoded frames — the video
    * analogue of [[imageDHash]], computed in the same sequential
    * per-asset decode loop as [[sampleDecodedFrames]] (no shuffle, no
    * frame-list materialization). */
  def videoFrameHashes(assets: Dataset[MediaAsset],
      w: Int, h: Int): Dataset[FrameHash] = {
    import assets.sparkSession.implicits._
    val frameBytes = 54 + ((w * 3 + 3) / 4) * 4 * h
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        Iterator.range(0, a.payload.length / frameBytes).map { f =>
          val one = java.util.Arrays.copyOfRange(
            a.payload, f * frameBytes, (f + 1) * frameBytes)
          val (dw, dh, rgb) = decodeRgb(one)
          FrameHash(a.asset_id, f, dHashOf(dw, dh, rgb))
        }
      }
    }
  }

  /** Video near-duplicate pairs by SHARED FRAME HASHES: two videos are
    * near-dups when ≥ `minShared` distinct frame dHashes coincide —
    * re-encoded or re-containered copies keep their frame hashes while
    * any byte-level fingerprint changes. The frame hash IS the bucket
    * key (exact equality, no banding needed), so a billion-video dedup
    * shuffles (id, frame-hash) pairs, never frames: the same
    * bucket-join shape as every other dedup operator, with the same
    * `maxBucket` guard against a viral frame (intros, test patterns)
    * exploding one bucket quadratically. */
  def videoNearDupPairs(frameHashes: org.apache.spark.sql.DataFrame,
      minShared: Int, maxBucket: Int = 10000)
      : org.apache.spark.sql.DataFrame = {
    require(minShared >= 1)
    // a hash repeated WITHIN one video (static scenes) counts once
    val fh = frameHashes.select(col("asset_id").as("id"), col("dhash"))
      .distinct()
    val sized = fh.groupBy(col("dhash")).agg(collect_list(col("id")).as("ids"))
    sized.filter(size(col("ids")).between(2, maxBucket))
      .select(explode(graft.functions.native.sorted_pairs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  final case class SceneBoundary(
      asset_id: Long, boundary_idx: Int, sad: Long, is_cut: Boolean)

  /** Scene-change detection over REAL decoded adjacent frames — the
    * keyframe-selection signal of a video curation pipeline (sample
    * around cuts, drop static spans). Each consecutive frame pair's
    * SAD (sum of absolute per-channel differences over the decoded RGB
    * streams) is computed inside the same per-partition decode loop as
    * [[sampleDecodedFrames]]; a boundary is a cut when its MEAN
    * per-byte difference reaches `tau` (`sad >= tau·w·h·3` — integer
    * arithmetic, so the SQL oracle reproduces the flag exactly).
    *
    * Scale shape: per-asset sequential decode with one frame of
    * lookback held in memory — no shuffle, no frame-list
    * materialization; a 100 TB video corpus pays exactly its decode
    * bandwidth, the differencing rides along. */
  def sceneChanges(assets: Dataset[MediaAsset], tau: Int): Dataset[SceneBoundary] = {
    require(tau > 0)
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val (w, h) = imageDims(a.asset_id)
        val frameBytes = 54 + ((w * 3 + 3) / 4) * 4 * h
        val nFrames = a.payload.length / frameBytes
        var prev: Array[Byte] = null
        Iterator.range(0, nFrames).flatMap { f =>
          val one = java.util.Arrays.copyOfRange(
            a.payload, f * frameBytes, (f + 1) * frameBytes)
          val (_, _, rgb) = decodeRgb(one)
          val out =
            if (prev == null) None
            else {
              var s = 0L
              var i = 0
              while (i < rgb.length) {
                s += math.abs((rgb(i) & 0xFF) - (prev(i) & 0xFF)); i += 1
              }
              Some(SceneBoundary(a.asset_id, f - 1, s,
                s >= tau.toLong * rgb.length))
            }
          prev = rgb
          out
        }
      }
    }
  }

  // ---- REAL audio decode (javax.sound.sampled) -------------------------

  /** Deterministic 16-bit mono PCM WAV: the canonical 44-byte RIFF
    * little-endian header followed by the sample data — written by hand
    * and INDEPENDENT of the JVM's codecs, so parsing it back with
    * `javax.sound.sampled` is a genuine two-implementation round-trip
    * (the audio analogue of [[syntheticBmp]]). The PCM data section is
    * `seed` repeated cyclically for `nSamples * 2` bytes, which an
    * engine with no audio stack reproduces as bytes — the oracle hook. */
  def syntheticWav(seed: Array[Byte], nSamples: Int, sampleRate: Int): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0 && seed.nonEmpty)
    val dataSize = nSamples * 2 // mono, 2 bytes per sample
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                 // audio format: PCM
      .putShort(1)                 // channels: mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)      // byte rate
      .putShort(2)                 // block align
      .putShort(16)                // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < dataSize) { b.put(seed(i % seed.length)); i += 1 }
    b.array()
  }

  /** The JVM's registered audio parsers, resolved ONCE per JVM through
    * the public `javax.sound.sampled.spi` service interface.
    * `AudioSystem.getAudioInputStream` re-runs the synchronized
    * ServiceLoader provider lookup on EVERY call, which serializes all
    * executor threads through one lock (measured: m04 at sf1 scaled
    * 15× for 10× rows — ~1.2 ms/call, single-file). The parse itself
    * still goes through the JDK's WaveFileReader, so the
    * two-implementation round-trip is unchanged. */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader],
      classOf[javax.sound.sampled.spi.AudioFileReader].getClassLoader).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** The provider that accepts RIFF/WAVE, selected ONCE by probing a
    * minimal valid WAV. The per-row decode must consult exactly this
    * one provider: trying providers in registry order reaches the
    * JDK's MIDI reader, whose reject path re-enters the
    * class-synchronized `JDK13Services.getProviders` AND re-scans
    * `ClassLoader.getResources` through Spark's executor-classloader
    * chain per call — measured 4.6 s for 5000 rows (15× scale ratio at
    * sf1), thread-dump-confirmed serialization on the
    * `JSSecurityManager` class lock. */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    val probe = syntheticWav(Array[Byte](1, 2), nSamples = 1, sampleRate = 8000)
    audioReaders.find { r =>
      try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)); true }
      catch { case scala.util.control.NonFatal(_) => false }
    }.getOrElse(throw new IllegalStateException(
      "no registered javax.sound provider parses RIFF/WAVE"))
  }

  /** REAL decode: payload bytes → (sample rate, raw PCM frame bytes)
    * via the JDK's WAV parser. Fails loudly on anything that is not
    * 16-bit mono little-endian signed PCM. */
  def decodePcm16(payload: Array[Byte]): (Int, Array[Byte]) = {
    val ais =
      try wavReader.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"the WAV parser rejects this ${payload.length}-byte payload")
      }
    val f = ais.getFormat
    require(
      f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        && f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
      s"expected 16-bit mono LE signed PCM, got $f")
    (f.getSampleRate.toInt, ais.readAllBytes())
  }

  /** Audio shape per asset — sample count and rate varied so header
    * parsing is exercised across shapes, not one fixed format. */
  def audioDims(assetId: Long): (Int, Int) =
    (128 + (assetId % 5).toInt * 17, 8000 + (assetId % 3).toInt * 4000)

  /** Documents rendered as real mono PCM16 WAV clips (sample stream =
    * utf-8 text bytes, cyclic). The encode runs partition-wise; the
    * payloads are genuine WAV files any audio tool opens. */
  def audioAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    documentsAsAssets(spark, dir).mapPartitions(_.map { a =>
      val (n, sr) = audioDims(a.asset_id)
      a.copy(media_type = "audio", payload = syntheticWav(a.payload, n, sr))
    })
  }

  /** Decoded-audio features: REAL `javax.sound.sampled` decode inside
    * the mapPartitions stage — sample_rate/n_samples come from the
    * parsed header, tag = md5 of the decoded PCM byte stream, and
    * sum_abs/peak are exact integer stats over the reconstructed
    * signed samples (verifying the byte→i16 LE decode, not just byte
    * pass-through). */
  final case class AudioFeatures(
      asset_id: Long, sample_rate: Int, n_samples: Int, duration_ms: Long,
      tag: String, sum_abs: Long, peak: Int)

  def extractAudioFeatures(assets: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition codec setup
      it.map { a =>
        val (sr, pcm) = decodePcm16(a.payload)
        md.reset()
        val tag = md.digest(pcm).map("%02x".format(_)).mkString
        var sumAbs = 0L
        var peak = 0
        var i = 0
        while (i < pcm.length) {
          // i16 LE: high byte sign-extends via Byte→Int promotion
          val s = (pcm(i) & 0xFF) | (pcm(i + 1) << 8)
          val abs = math.abs(s)
          sumAbs += abs
          if (abs > peak) peak = abs
          i += 2
        }
        val n = pcm.length / 2
        AudioFeatures(a.asset_id, sr, n, n * 1000L / sr, tag, sumAbs, peak)
      }
    }
  }

  /** Per-asset decode integrity verdict. */
  final case class AssetIntegrity(
      asset_id: Long, media_type: String, n_bytes: Int, decode_ok: Boolean,
      error_class: String)

  /** Asset INTEGRITY screen — a web-crawled multimodal corpus always
    * contains truncated downloads, mislabeled content, and corrupt
    * containers, and at 10⁹ assets a single throwing row must
    * quarantine, not kill the stage. Attempts the REAL decode for the
    * asset's modality (image via javax.imageio, audio via
    * javax.sound); failures become a per-row verdict with the
    * exception class, so the pipeline splits clean/quarantine with one
    * filter. Per-row, shuffle-free, and the decode cost is the same
    * pass the feature extractors already pay. */
  def assetIntegrity(assets: Dataset[MediaAsset]): Dataset[AssetIntegrity] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val verdict =
          try {
            a.media_type match {
              case "image" | "video" => decodeRgb(a.payload)
              case "audio" => decodePcm16(a.payload)
              case other => throw new IllegalArgumentException(
                s"no decoder for media_type '$other'")
            }
            None
          } catch {
            case scala.util.control.NonFatal(e) =>
              Some(e.getClass.getSimpleName)
          }
        AssetIntegrity(a.asset_id, a.media_type, a.payload.length,
          verdict.isEmpty, verdict.getOrElse(""))
      }
    }
  }

  /** Image curation screen per image — exact integer stats over the
    * REAL decoded pixels. */
  final case class ImageQuality(
      asset_id: Long, n_pixels: Int, bright_cnt: Long, dark_cnt: Long,
      gray_sum: Long, min_gray: Int, max_gray: Int, low_quality: Boolean)

  /** Image QUALITY metrics — the image analogue of [[audioQualityMetrics]]:
    * per-pixel gray level (R+G+B, 0..765) counted against
    * bright/dark thresholds, exact gray sum, min/max gray, and a drop
    * flag for mostly-bright (>50%), mostly-dark (>50%), or
    * low-contrast (max−min below `contrastMin`) images — the standard
    * screens of image dataset curation (blank pages, black frames,
    * flat fills). Per-row decode + integer arithmetic in the same
    * mapPartitions stage as every multimodal operator: shuffle-free,
    * every decoded byte participates. Thresholds are parameters;
    * defaults are ~94%/6% of full scale and a 30-level contrast floor. */
  def imageQualityMetrics(assets: Dataset[MediaAsset],
      brightThreshold: Int = 720, darkThreshold: Int = 45,
      contrastMin: Int = 30): Dataset[ImageQuality] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val (w, h, rgb) = decodeRgb(a.payload)
        val n = w * h
        var bright = 0L
        var dark = 0L
        var sum = 0L
        var mn = 766
        var mx = -1
        var i = 0
        while (i < n) {
          val g = (rgb(3 * i) & 0xFF) + (rgb(3 * i + 1) & 0xFF) +
            (rgb(3 * i + 2) & 0xFF)
          if (g >= brightThreshold) bright += 1
          if (g <= darkThreshold) dark += 1
          sum += g
          if (g < mn) mn = g
          if (g > mx) mx = g
          i += 1
        }
        ImageQuality(a.asset_id, n, bright, dark, sum, mn, mx,
          2 * bright > n || 2 * dark > n || (mx - mn) < contrastMin)
      }
    }
  }

  /** Audio curation screen per clip — exact integer stats over the
    * REAL decoded samples. */
  final case class AudioQuality(
      asset_id: Long, n_samples: Int, clip_cnt: Long, silence_cnt: Long,
      sum_sq: Long, low_quality: Boolean)

  /** Audio QUALITY metrics — the audio analogue of text quality
    * scoring (p03): count samples at/above the clipping threshold and
    * at/below the silence threshold, plus the exact energy sum
    * (Σ s², signed-sample squares in long arithmetic), and flag clips
    * that are mostly clipped (>20%) or mostly silent (>50%) — the
    * standard drop rules of audio dataset curation (clipped =
    * distorted recording, silent = dead air). Per-row decode + integer
    * arithmetic inside the same mapPartitions stage as every
    * multimodal operator: shuffle-free, and every decoded byte
    * participates (a header/endianness/sign bug changes the counts).
    * Thresholds are parameters: 32000/327 (~98%/1% full scale) are the
    * production defaults; gates pick thresholds inside the fixture's
    * dynamic range so the counts actually vary per clip. */
  def audioQualityMetrics(assets: Dataset[MediaAsset],
      clipThreshold: Int = 32000, silenceThreshold: Int = 327)
      : Dataset[AudioQuality] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val (_, pcm) = decodePcm16(a.payload)
      val n = pcm.length / 2
      var clip = 0L
      var sil = 0L
      var ss = 0L
      var i = 0
      while (i < pcm.length) {
        val s = (pcm(i) & 0xFF) | (pcm(i + 1) << 8)
        val abs = math.abs(s)
        if (abs >= clipThreshold) clip += 1
        if (abs <= silenceThreshold) sil += 1
        ss += s.toLong * s
        i += 2
      }
      AudioQuality(a.asset_id, n, clip, sil, ss,
        5 * clip > n || 2 * sil > n)
    })
  }

  /** 56-bit perceptual energy-difference hash of a decoded clip. */
  final case class AudioHash(asset_id: Long, ahash: Long)

  /** Perceptual audio hash — the audio analogue of [[imageDHash]],
    * closing the perceptual-hash-per-modality set: re-encoded or
    * slightly-requantized copies of a clip keep a near-identical hash
    * while byte fingerprints change completely. Construction: the
    * decoded signed samples split into 57 integer-boundary segments
    * (k·n/57 — every clip maps to the same fixed-length descriptor
    * regardless of duration); each segment's energy (sum |sample|,
    * exact integer) compares to its successor → 56 bits, sign bit
    * clear. Pairs then band through [[graft.operators.LshJoin]]
    * exactly like [[imageNearDupPairs]]. Per-row decode, no shuffle. */
  def audioEnergyHash(assets: Dataset[MediaAsset]): Dataset[AudioHash] = {
    import assets.sparkSession.implicits._
    val segs = 57
    assets.mapPartitions(_.map { a =>
      val (_, pcm) = decodePcm16(a.payload)
      val n = pcm.length / 2
      require(n >= segs, s"clip of $n samples is shorter than $segs segments")
      val energy = new Array[Long](segs)
      var k = 0
      while (k < segs) {
        var i = k * n / segs
        val end = (k + 1) * n / segs
        var e = 0L
        while (i < end) {
          val s = (pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)
          e += math.abs(s)
          i += 1
        }
        energy(k) = e
        k += 1
      }
      var bits = 0L
      k = 0
      while (k < segs - 1) {
        if (energy(k) > energy(k + 1)) bits |= 1L << k
        k += 1
      }
      AudioHash(a.asset_id, bits)
    })
  }

  /** REAL resize: decode via `javax.imageio`, nearest-neighbor
    * downsample by `factor` (output pixel (x,y) = source pixel
    * (x·factor, y·factor) — deterministic, no interpolation rounding),
    * re-encode as BMP. Metadata preserved, media_type suffixed. */
  def resizeImages(assets: Dataset[MediaAsset], factor: Int): Dataset[MediaAsset] = {
    require(factor > 0)
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val (w, h, rgb) = decodeRgb(a.payload)
        val (ow, oh) = ((w + factor - 1) / factor, (h + factor - 1) / factor)
        val out = new Array[Byte](ow * oh * 3)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val src = ((y * factor) * w + x * factor) * 3
            val dst = (y * ow + x) * 3
            out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
            x += 1
          }
          y += 1
        }
        a.copy(payload = syntheticBmp(out, ow, oh),
          media_type = a.media_type + "_resized")
      }
    }
  }

  // ---- letterbox / pillarbox detection (m16) ---------------------------

  /** Documents rendered as real BMPs with PLANTED letterbox and
    * pillarbox bars: `nb = min(doc_id % 5, 3)` uniform rows (gray 16)
    * top AND bottom, `np = 1 + doc_id % 2` uniform columns left AND
    * right for every doc_id % 7 < 2. Content pixels keep the cyclic
    * text stream at their GLOBAL flat position (bars overlay, they do
    * not shift the stream), so an engine with no image stack rebuilds
    * the exact pixel string from the text alone. */
  def letterboxAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    documentsAsAssets(spark, dir).mapPartitions(_.map { a =>
      val w = 13 + (a.asset_id % 4).toInt
      val h = 8 + (a.asset_id % 3).toInt
      val nb = math.min(a.asset_id % 5, 3L).toInt
      val np = if (a.asset_id % 7 < 2) 1 + (a.asset_id % 2).toInt else 0
      val text = a.payload
      val seed = new Array[Byte](w * h * 3)
      var q = 0
      while (q < seed.length) {
        val pix = q / 3
        val r = pix / w
        val x = pix % w
        seed(q) =
          if (r < nb || r >= h - nb || x < np || x >= w - np) 16.toByte
          else text(q % text.length)
        q += 1
      }
      a.copy(media_type = "image", payload = syntheticBmp(seed, w, h))
    })
  }

  /** Letterbox audit row: bar widths on each edge + the crop rect's
    * area fraction. */
  final case class LetterboxAudit(
      asset_id: Long, width: Int, height: Int,
      top_bars: Int, bottom_bars: Int, left_bars: Int, right_bars: Int,
      content_frac: Double, boxed: Boolean)

  /** LETTERBOX / PILLARBOX detection over REAL decoded pixels — the
    * padded-image screen a LAION-style curation run applies before
    * captioning or embedding (bars dilute the visual signal and skew
    * aspect-ratio stats; the crop rect is what downstream stages should
    * consume). A bar edge is counted as consecutive UNIFORM rows
    * (columns) matching the outermost row's (column's) color; opposite
    * edges are capped so top+bottom ≤ h and left+right ≤ w. Detection
    * is content-only (no metadata trusted, the m12 standing) and
    * per-row inside `mapPartitions` — embarrassingly parallel, no
    * shuffle, O(pixels) per asset at any corpus size. */
  /** The uniform-edge walk shared by [[detectLetterbox]] (images) and
    * [[detectVideoLetterbox]] (per frame): (top, bottom, left, right)
    * bar widths, opposite edges capped. */
  private def edgeWalk(w: Int, h: Int, rgb: Array[Byte]): (Int, Int, Int, Int) = {
    def px(r: Int, x: Int, c: Int): Int = rgb((r * w + x) * 3 + c) & 0xFF
    def samePix(r1: Int, x1: Int, r2: Int, x2: Int): Boolean =
      px(r1, x1, 0) == px(r2, x2, 0) && px(r1, x1, 1) == px(r2, x2, 1) &&
        px(r1, x1, 2) == px(r2, x2, 2)
    def rowUniform(r: Int): Boolean =
      (1 until w).forall(x => samePix(r, x, r, 0))
    def colUniform(x: Int): Boolean =
      (1 until h).forall(r => samePix(r, x, 0, x))
    var top = 0
    while (top < h && rowUniform(top) && samePix(top, 0, 0, 0)) top += 1
    var bottom = 0
    while (bottom < h - top && rowUniform(h - 1 - bottom) &&
      samePix(h - 1 - bottom, 0, h - 1, 0)) bottom += 1
    var left = 0
    while (left < w && colUniform(left) && samePix(0, left, 0, 0)) left += 1
    var right = 0
    while (right < w - left && colUniform(w - 1 - right) &&
      samePix(0, w - 1 - right, 0, w - 1)) right += 1
    (top, bottom, left, right)
  }

  def detectLetterbox(assets: Dataset[MediaAsset]): Dataset[LetterboxAudit] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val (w, h, rgb) = decodeRgb(a.payload)
        val (top, bottom, left, right) = edgeWalk(w, h, rgb)
        val ch = h - top - bottom
        val cw = w - left - right
        LetterboxAudit(a.asset_id, w, h, top, bottom, left, right,
          (ch * cw).toDouble / (w * h),
          (top + bottom + left + right) > 0 && ch > 0 && cw > 0)
      }
    }
  }

  /** Documents rendered as real multi-frame BMP videos with PLANTED
    * letterbox/pillarbox bars CONSISTENT across frames (`doc_id % 3`
    * bar rows, a pillar column for doc_id % 4 == 0), except doc_id %
    * 5 == 0 whose FIRST frame carries no letterbox rows (the
    * title-card case a per-frame screen must not misclassify as a
    * letterboxed video). Frame f's content keeps the cyclic text byte
    * stream at offset `(f · frameLen) % L` (the videoAssetsUniform
    * rotation), so the oracle rebuilds every frame from text alone. */
  def letterboxVideoAssets(spark: SparkSession, dir: String,
      nFrames: Int = 8, w: Int = 16, h: Int = 8): Dataset[MediaAsset] = {
    import spark.implicits._
    documentsAsAssets(spark, dir).mapPartitions(_.map { a =>
      val L = a.payload.length
      val frameLen = w * h * 3
      val bos = new java.io.ByteArrayOutputStream()
      var f = 0
      while (f < nFrames) {
        val nb = if (a.asset_id % 5 == 0 && f == 0) 0
                 else (a.asset_id % 3).toInt
        val np = if (a.asset_id % 4 == 0) 1 else 0
        val off = (f * frameLen) % L
        val seed = new Array[Byte](frameLen)
        var q = 0
        while (q < frameLen) {
          val pix = q / 3
          val r = pix / w
          val x = pix % w
          seed(q) =
            if (r < nb || r >= h - nb || x < np || x >= w - np) 16
            else a.payload((off + q) % L)
          q += 1
        }
        bos.write(syntheticBmp(seed, w, h))
        f += 1
      }
      a.copy(media_type = "video", payload = bos.toByteArray)
    })
  }

  /** Per-video letterbox verdict: the edge walk runs on every frame,
    * bars aggregate as the per-edge MINIMUM across frames (a real
    * letterbox is consistent — one full-bleed title card zeroes the
    * minimum and the video is NOT croppable), `frames_boxed` counts
    * frames individually boxed, and `boxed` requires EVERY frame boxed
    * with a positive consistent-bar total. */
  final case class VideoLetterbox(
      asset_id: Long, n_frames: Int, top_bars: Int, bottom_bars: Int,
      left_bars: Int, right_bars: Int, frames_boxed: Int, boxed: Boolean)

  /** LETTERBOX screen for VIDEO (m18) over REAL per-frame decode — the
    * crop decision for a video must hold on every frame, so the
    * per-frame m16 walk aggregates by minimum inside the same
    * sequential per-asset decode loop as [[videoFrameHashes]]: no
    * shuffle, no frame-list materialization, O(pixels·frames) per
    * video at any corpus size.
    *
    * Frame boundaries come from each frame's OWN BMP file-size header
    * field (bytes 2–5, little-endian) rather than a caller-supplied
    * (w,h) stride: a payload whose frames differ in dimensions parses
    * correctly frame by frame, and trailing partial bytes (a truncated
    * upload) raise instead of being silently dropped. */
  def detectVideoLetterbox(assets: Dataset[MediaAsset]): Dataset[VideoLetterbox] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        var minT, minB, minL, minR = Int.MaxValue
        var fb = 0
        var nF = 0
        var off = 0
        val p = a.payload
        while (off < p.length) {
          require(off + 6 <= p.length && p(off) == 'B' && p(off + 1) == 'M',
            s"asset ${a.asset_id}: no BMP header at byte $off")
          val hdrSz = (p(off + 2) & 0xFF) | ((p(off + 3) & 0xFF) << 8) |
            ((p(off + 4) & 0xFF) << 16) | ((p(off + 5) & 0xFF) << 24)
          // bfSize (bytes 2-5) is unreliable per the BMP spec — some
          // encoders legally write 0. Fall back to the DIB header:
          // bfOffBits + 4-byte-padded row stride × |height| (exact for
          // the uncompressed BI_RGB frames this walk supports). A
          // NEGATIVE bfSize is still a hard parse error.
          val sz = if (hdrSz != 0) hdrSz else {
            require(off + 30 <= p.length,
              s"asset ${a.asset_id}: frame at byte $off: bfSize 0 and " +
                "payload too short for a DIB header fallback")
            def le32(i: Int): Int = (p(off + i) & 0xFF) |
              ((p(off + i + 1) & 0xFF) << 8) |
              ((p(off + i + 2) & 0xFF) << 16) |
              ((p(off + i + 3) & 0xFF) << 24)
            require(off + 34 <= p.length,
              s"asset ${a.asset_id}: frame at byte $off: bfSize 0 and " +
                "payload too short for a DIB header fallback")
            val offBits = le32(10)
            val w = le32(18)
            val h = math.abs(le32(22))
            val bpp = (p(off + 28) & 0xFF) | ((p(off + 29) & 0xFF) << 8)
            val compression = le32(30)
            require(offBits > 0 && w > 0 && h > 0 && bpp > 0,
              s"asset ${a.asset_id}: frame at byte $off: bfSize 0 and " +
                s"implausible DIB header (offBits=$offBits w=$w h=$h bpp=$bpp)")
            // stride×h is only the payload size for uncompressed BI_RGB;
            // an RLE frame with bfSize 0 would silently shift every
            // later frame boundary — refuse loudly instead
            require(compression == 0,
              s"asset ${a.asset_id}: frame at byte $off: bfSize 0 and " +
                s"biCompression=$compression — the DIB fallback supports " +
                "only BI_RGB (0)")
            offBits + ((w.toLong * bpp + 31) / 32).toInt * 4 * h
          }
          require(sz > 0 && off + sz <= p.length,
            s"asset ${a.asset_id}: frame at byte $off claims $sz bytes, " +
              s"payload has ${p.length - off} left (truncated upload?)")
          val one = java.util.Arrays.copyOfRange(p, off, off + sz)
          if (hdrSz == 0) {
            // the JDK BMP reader also derives BI_RGB image size from
            // bfSize when the DIB's biSizeImage is 0 — patch the
            // reconstructed size into the copied frame before decode
            one(2) = (sz & 0xFF).toByte
            one(3) = ((sz >> 8) & 0xFF).toByte
            one(4) = ((sz >> 16) & 0xFF).toByte
            one(5) = ((sz >> 24) & 0xFF).toByte
          }
          val (dw, dh, rgb) = decodeRgb(one)
          val (t, b, l, r) = edgeWalk(dw, dh, rgb)
          if (t < minT) minT = t
          if (b < minB) minB = b
          if (l < minL) minL = l
          if (r < minR) minR = r
          if ((t + b + l + r) > 0 && (dh - t - b) > 0 && (dw - l - r) > 0)
            fb += 1
          nF += 1
          off += sz
        }
        if (nF == 0) { minT = 0; minB = 0; minL = 0; minR = 0 }
        VideoLetterbox(a.asset_id, nF, minT, minB, minL, minR, fb,
          fb == nF && nF > 0 && (minT + minB + minL + minR) > 0)
      }
    }
  }

  // ---- leading/trailing silence trim (m17) ------------------------------

  /** Documents rendered as real WAV clips with PLANTED silent pads:
    * `(asset_id % 5) · 8` zero samples leading, `(asset_id % 3) · 10`
    * trailing; content samples keep the cyclic text byte stream at
    * their GLOBAL byte position (pads overlay, they do not shift the
    * stream), so a no-audio-stack engine rebuilds every sample value
    * from the text alone. */
  def silenceTrimAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    documentsAsAssets(spark, dir).mapPartitions(_.map { a =>
      val (n, sr) = audioDims(a.asset_id)
      val lead = (a.asset_id % 5).toInt * 8
      val tail = (a.asset_id % 3).toInt * 10
      val text = a.payload
      val seed = new Array[Byte](n * 2)
      var q = 0
      while (q < seed.length) {
        val i = q / 2
        seed(q) =
          if (i < lead || i >= n - tail) 0
          else text(q % text.length)
        q += 1
      }
      a.copy(media_type = "audio", payload = syntheticWav(seed, n, sr))
    })
  }

  /** Silence-trim audit row: pad lengths on each end + the kept span. */
  final case class SilenceTrim(
      asset_id: Long, sample_rate: Int, n_samples: Int,
      lead_silence: Int, tail_silence: Int, kept_samples: Int,
      kept_frac: Double, silent: Boolean)

  /** LEADING/TRAILING silence detection over REAL decoded PCM — the
    * audio analogue of [[detectLetterbox]]: recording pipelines pad
    * clips with silence (device warmup, fixed-length capture windows),
    * which dilutes every downstream duration/energy statistic and
    * wastes tokens in audio-LM training; the trim span is what
    * downstream stages should consume. A pad sample is `|s| <
    * threshold`; the trailing count is capped so lead+tail ≤ n.
    * Content-only (no metadata trusted), per-row inside
    * `mapPartitions`, no shuffle, O(samples) per clip. */
  def trimSilence(assets: Dataset[MediaAsset],
      threshold: Int = 1000): Dataset[SilenceTrim] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (sr, pcm) = decodePcm16(a.payload)
        val n = pcm.length / 2
        def quiet(i: Int): Boolean = {
          val s = (pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)
          math.abs(s) < threshold
        }
        var lead = 0
        while (lead < n && quiet(lead)) lead += 1
        var tail = 0
        while (tail < n - lead && quiet(n - 1 - tail)) tail += 1
        val kept = n - lead - tail
        SilenceTrim(a.asset_id, sr, n, lead, tail, kept,
          kept.toDouble / n, lead == n)
      }
    }
  }
}
