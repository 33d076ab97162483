package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * ALL THREE media types have REAL codec paths, JDK-only: image payloads
  * are genuine PNG bytes and [[decodeImages]] recovers width/height and a
  * luma histogram from the decoded raster via the JDK's built-in
  * javax.imageio reader; audio payloads are genuine RIFF/WAVE bytes and
  * [[decodeAudio]] recovers rate/samples/signal statistics through the
  * JDK's javax.sound.sampled WAV parser; video payloads are genuine
  * RIFF/AVI containers with uncompressed DIB frames and
  * [[decodeVideoFrames]] index-seeks the sampled frames and decodes them
  * through ImageIO's BMP reader. There is NO stub decoder left: every
  * media row the catalog processes is a real container through a real
  * codec ([[decodeAll]] is the unified three-modality surface).
  * Everything around the decode is the real Spark plumbing a production
  * decoder needs:
  *  - payloads travel as `BinaryType` columns (never stringified),
  *  - decoding runs in [[Dataset.mapPartitions]] so a real codec would
  *    amortize per-partition init (model load, decoder context) across
  *    the batch — same shape as a Pandas-UDF/mapInPandas stage,
  *  - output is a typed schema (media_type, width, height, n_frames,
  *    fingerprint), partition-preserving (no shuffle).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** The unified decoded-media schema (the q42 surface and
    * [[resizePlan]]'s input): real decoded dimensions, the container's
    * frame count, and the modality's perceptual fingerprint — 64-bit
    * image aHash / 32-bit audio energy envelope / 128-bit two-keyframe
    * video signature, all as bitstrings (the q34 convention). */
  case class MediaFeatures(doc_id: Long, media_type: String,
                           width: Int, height: Int, n_frames: Int, fingerprint: String)

  /** REAL unified decode — all three modalities as genuine containers
    * (PNG / WAV / AVI by the doc_id % 3 modality split) through their
    * real codec paths into ONE typed schema. Audio is 1×n media (width
    * = decoded sample count, one stream ⇒ n_frames = 1); video's frame
    * count comes from the container's idx1 index and its fingerprint
    * from the 2-keyframe index-seek decode. Narrow map end-to-end per
    * modality, zero shuffles; the oracle replays every fingerprint from
    * the pixel/sample formulas without seeing container bytes, so a
    * hash match certifies three real decode round-trips. */
  def decodeAll(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    imageAHashes(synthesizeImages(s, dir))
      .map(i => MediaFeatures(i.doc_id, "image", i.width, i.height, 1, i.ahash))
      .union(audioEnvelopeHashes(synthesizeAudio(s, dir))
        .map(a => MediaFeatures(a.doc_id, "audio", a.n_samples, 1, 1, a.ehash)))
      .union(videoSignatures(synthesizeVideos(s, dir))
        .map(v => MediaFeatures(v.doc_id, "video", v.width, v.height, v.n_frames, v.sig)))
  }

  case class FrameHash(doc_id: Long, n_frames: Int, frame_idx: Int, ahash: String)

  /** REAL per-keyframe hashing (the q43 surface): index-seek up to
    * `maxSamples` evenly spaced frames per AVI ([[sampledAviFrames]] —
    * at 100 TB you never decode frames you won't keep), decode ONLY
    * those frames' DIB bits, and emit each decoded frame's 8×8
    * block-mean aHash as its own row — the frame-level hash relation a
    * frame-matching index stores, where [[videoSignatures]] keeps only
    * the concatenated 2-frame per-video signature. */
  def frameAHashes(media: Dataset[MediaRow], maxSamples: Int = 4): Dataset[FrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val (n, frames) = sampledAviFrames(r.payload, r.doc_id, maxSamples)
        frames.map { case (f, img) =>
          FrameHash(r.doc_id, n, f, blockMeanBits(img, avgLuma = true))
        }
      }
    }
  }

  case class MediaHistogram(doc_id: Long, media_type: String, n_bytes: Long,
                            bins: Array[Long], entropy: Double)

  /** REAL feature extraction (no codec required, not a stub): 16-bin
    * byte histogram + byte entropy per payload, computed in the same
    * per-partition batch loop as the decode. This is the standard cheap
    * pre-filter a media pipeline runs before expensive decode — constant
    * or near-constant payloads (entropy ≈ 0) and truncated files show up
    * here without touching a codec — and the histogram doubles as a
    * coarse content embedding for the similarity operators. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaHistogram] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bins = new Array[Long](16)
        var i = 0
        while (i < r.payload.length) {
          bins((r.payload(i) & 0xff) >> 4) += 1
          i += 1
        }
        val n = r.payload.length
        var h = 0.0
        var b = 0
        while (b < 16) { // fixed bin order: deterministic FP accumulation
          if (bins(b) > 0) {
            val p = bins(b).toDouble / n
            h -= p * (math.log(p) / math.log(2.0))
          }
          b += 1
        }
        MediaHistogram(r.doc_id, r.media_type, n.toLong, bins, math.rint(h * 1e6) / 1e6)
      }
    }
  }

  case class ResizePlan(doc_id: Long, media_type: String, width: Int, height: Int,
                        out_w: Int, out_h: Int)

  /** Box-fit math shared by [[resizePlan]] and the real image pipeline:
    * fit (w, h) into maxW×maxH preserving aspect ratio, never upscaling.
    * INTEGER-exact (rational comparison + integer division) so the
    * oracle reproduces it bit-for-bit. */
  def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH >= h.toLong * maxW) // width-bound
      (maxW, math.max(1, (h.toLong * maxW / w).toInt))
    else
      (math.max(1, (w.toLong * maxH / h).toInt), maxH)

  /** Resize planning over decoded dimensions; [[resizeImages]] is the
    * stage that EXECUTES the resample on the image modality. */
  def resizePlan(features: Dataset[MediaFeatures], maxW: Int = 64, maxH: Int = 64): Dataset[ResizePlan] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val (ow, oh) = fitBox(f.width, f.height, maxW, maxH)
      ResizePlan(f.doc_id, f.media_type, f.width, f.height, ow, oh)
    }
  }

  case class ResizedImage(doc_id: Long, width: Int, height: Int,
                          out_w: Int, out_h: Int, mean_luma_milli: Long,
                          resized_hash: String)

  /** REAL resample execution (the q125 surface): decode the PNG, fit
    * its raster into maxW×maxH ([[fitBox]] — aspect-preserving, never
    * upscaling), and box-downscale by INTEGER area averaging: every
    * source pixel belongs to exactly one target cell
    * (tx = x·ow div w — the [[blockMeanBits]] tiling generalized to the
    * fitted geometry), each cell's value is the floor-mean of its
    * pixels. Integer-exact end to end, so the DuckDB oracle replays the
    * resized raster from the pixel formula and the md5 over the
    * cell-mean sequence certifies the decode + resample round-trip
    * bit-for-bit. One narrow mapPartitions stage, zero shuffle — the
    * pixel work never leaves the scan partition, only (id, dims, hash)
    * rows move. */
  def resizeImages(media: Dataset[MediaRow], maxW: Int = 32, maxH: Int = 32): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val (ow, oh) = fitBox(w, h, maxW, maxH)
        val sums = new Array[Long](ow * oh)
        val cnts = new Array[Long](ow * oh)
        var y = 0
        while (y < h) {
          val ty = y * oh / h
          var x = 0
          while (x < w) {
            val ci = ty * ow + x * ow / w
            sums(ci) += img.getRGB(x, y) & 0xff // gray channel (equal RGB)
            cnts(ci) += 1
            x += 1
          }
          y += 1
        }
        val sb = new java.lang.StringBuilder(ow * oh * 4)
        var tot = 0L
        var i = 0
        while (i < ow * oh) {
          val m = sums(i) / cnts(i)
          tot += m
          if (i > 0) sb.append('-')
          sb.append(m)
          i += 1
        }
        md.reset()
        val hash = md.digest(sb.toString.getBytes("US-ASCII"))
          .map(b => f"$b%02x").mkString
        ResizedImage(r.doc_id, w, h, ow, oh, 1000L * tot / (ow * oh), hash)
      }
    }
  }

  // -----------------------------------------------------------------
  // REAL image codec path (no stub): the JDK ships a complete PNG
  // encoder/decoder in javax.imageio, so the `image` media type gets an
  // actual pixel decode — bytes in, BufferedImage out, features computed
  // from real decoded pixels. Payloads are synthesized deterministically
  // (pixel value = an integer function of (doc_id, x, y)) so the DuckDB
  // oracle can replay the EXPECTED features from the formula while Spark
  // recovers them from the compressed PNG bytes: a hash match proves the
  // codec genuinely round-trips, not that two engines ran the same
  // arithmetic.

  /** Deterministic image geometry/pixels for doc_id (shared by the
    * synthesizer, the specs, and — as SQL — the oracle):
    * W = 8 + id%120, H = 8 + (7·id)%120, luma(x,y) = (31·id+7x+13y)%256. */
  def imageDims(id: Long): (Int, Int) =
    (8 + (id % 120).toInt, 8 + ((id * 7) % 120).toInt)
  def imageLuma(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Encode doc_id's deterministic grayscale image as real PNG bytes. */
  def encodePng(id: Long): Array[Byte] = {
    val (w, h) = imageDims(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = imageLuma(id, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(w * h / 2)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Range-partition + sort the bare id relation ahead of the codec
    * stages. Deliberately NOT a plain `orderBy`: the sorted-id shuffle
    * is tiny (a long per media row), so AQE coalesces it to one
    * partition and the expensive encode/decode map downstream runs on a
    * single task (measured: q81 1.0 → 6.7 s at sf1). An explicit
    * partition count is exempt from AQE coalescing, and
    * sortWithinPartitions on range partitions gives the same global
    * order a full orderBy would. */
  private def sortedIds(s: SparkSession)(ids: DataFrame): DataFrame = {
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    ids.repartitionByRange(n, col("doc_id")).sortWithinPartitions("doc_id")
  }

  /** Synthesize the image-typed media rows (doc_id % 3 == 0, the catalog's
    * modality split) with REAL PNG payloads.
    * Runs in mapPartitions: per-partition is where a production loader
    * would open its blob-store client; ImageIO's disk cache is disabled
    * once per executor JVM (executors have no guaranteed scratch dir). */
  def synthesizeImages(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") % 3 === 0)
      .transform(sortedIds(s)) // sort the BARE ids: a global sort
      // downstream of the codec would re-run encode+decode for the range
      // partitioner's sampling pass (measured 2× the decode cost at
      // sf1); sorting here costs one scan of a pruned id column, and
      // every per-row stage below is order-preserving, so the catalog
      // queries inherit doc_id order without a post-decode sort.
      .as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => MediaRow(id, "image", encodePng(id)))
      }
  }

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           n_px: Long, bins: Array[Long])

  /** REAL decode: ImageIO parses the PNG container and inflates the
    * pixel data; width/height and the 16-bin luma histogram come from
    * the decoded raster, not from any function of the input bytes. Same
    * mapPartitions batch shape as [[decode]] — a partition amortizes
    * reader init across its rows and never shuffles. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        val w = img.getWidth
        val h = img.getHeight
        val bins = new Array[Long](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            bins(luma >> 4) += 1
            x += 1
          }
          y += 1
        }
        ImageFeatures(r.doc_id, w, h, w.toLong * h, bins)
      }
    }
  }

  case class ImageHash(doc_id: Long, width: Int, height: Int, ahash: String)

  /** 8×8 block-mean threshold bits over a decoded raster — the aHash
    * core shared by [[imageAHashes]] / [[imageAHashesChecked]] (gray
    * channel: the synthesized PNGs carry equal RGB channels) and
    * [[videoSignatures]] / [[videoSignaturesChecked]] (RGB-average
    * luma). Integer-exact; bounds documented at [[imageAHashes]]. */
  private def blockMeanBits(img: java.awt.image.BufferedImage, avgLuma: Boolean): String = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val v =
          if (avgLuma) (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          else rgb & 0xff
        sums(by * 8 + bx) += v
        cnts(by * 8 + bx) += 1
        x += 1
      }
      y += 1
    }
    var tot = 0L
    var i = 0
    while (i < 64) { tot += sums(i); i += 1 }
    val n = w.toLong * h
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < 64) {
      sb.append(if (sums(i) * n >= tot * cnts(i)) '1' else '0')
      i += 1
    }
    sb.toString
  }

  /** Pixel bound for the CHECKED decode paths (~67 Mpx ≈ an 8192×8192
    * raster). ImageIO.read allocates the FULL raster from the
    * header-DECLARED dimensions before decoding a single pixel, so a
    * tiny adversarial payload declaring huge dims throws
    * OutOfMemoryError — which escapes a `catch Exception` and kills the
    * executor, exactly the failure the dead-letter contract exists to
    * absorb on untrusted crawl data. The checked readers peek the
    * header (metadata-only: ImageReader.getWidth/getHeight) and bounce
    * oversized declarations to the dead letter BEFORE any allocation. */
  private[graft] val MaxDecodePx: Long = 1L << 26

  /** Header-peek-then-decode: Left(reason) for unrecognized containers
    * and oversized declarations, Right(raster) for a genuine decode. */
  private def readImageBounded(payload: Array[Byte]): Either[String, java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) Left("unrecognized container")
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          if (w.toLong * h > MaxDecodePx) Left(s"oversized image: ${w}x$h")
          else {
            val img = r.read(0)
            if (img == null) Left("unrecognized container") else Right(img)
          }
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Average-hash (aHash) from the DECODED raster: the 8×8 block-mean
    * threshold fingerprint perceptual image dedup keys on. Blocks are
    * the integer tiling bx = x·8 div w (so any w, h ≥ 8 yields exactly
    * 64 non-empty blocks), and the threshold is the global mean made
    * integer-exact by cross-multiplying — bit = 1 iff
    * blockSum·(w·h) ≥ totalSum·blockCount — no division anywhere, so
    * the oracle's relational replay of the pixel formula lands on the
    * identical 64-bit string (emitted as a bitstring, the q34 simhash
    * convention). Bounds: blockSum ≤ 255·16², total ≤ 255·128²,
    * products ≤ ~1.1e9 — int64 headroom at any supported geometry. */
  def imageAHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        ImageHash(r.doc_id, img.getWidth, img.getHeight,
          blockMeanBits(img, avgLuma = false))
      }
    }
  }

  /** The common decoded-media row all three q49 branches emit: real
    * decoded dims, the box-fit plan on them, the decoded 8-bit sample
    * count, and a 16-bin histogram over decoded samples. */
  case class MediaPipelineRow(doc_id: Long, media_type: String, width: Int, height: Int,
                              out_w: Int, out_h: Int, n_bytes: Long, bins: Array[Long])

  /** The composed real-image pipeline (synthesize → PNG decode → box-fit
    * plan + luma histogram) as one narrow map chain — q49's image branch.
    * n_bytes for an image row is the decoded 8-bit luma sample count
    * (= w·h bytes of pixel data), the decoded-domain analog of the
    * payload-byte count the stub branch reports. */
  def imagePipeline(s: SparkSession, dir: String, maxW: Int = 64, maxH: Int = 64): Dataset[MediaPipelineRow] = {
    import s.implicits._
    decodeImages(synthesizeImages(s, dir)).map { f =>
      val (ow, oh) = fitBox(f.width, f.height, maxW, maxH)
      MediaPipelineRow(f.doc_id, "image", f.width, f.height, ow, oh, f.n_px, f.bins)
    }
  }

  // -----------------------------------------------------------------
  // REAL audio codec path (no stub): WAV/PCM is the one audio container
  // the JDK decodes natively (javax.sound.sampled reads RIFF/WAVE with
  // no external codecs), so the `audio` media type gets an actual sample
  // decode. The ENCODER is a hand-written RIFF container (so encode and
  // decode are independent implementations — a header bug on either side
  // breaks the round-trip instead of cancelling out); the DECODER is the
  // JDK's own WAV parser. Samples are a deterministic integer function
  // of (doc_id, i) and every reported feature is integer arithmetic, so
  // the DuckDB oracle replays the EXPECTED features from the formula
  // while Spark recovers them from the container bytes.

  /** Deterministic audio parameters/samples for doc_id (shared by the
    * synthesizer, the specs, and — as SQL — the oracle):
    * rate = 8000·(1+id%3) Hz, n = 256 + (13·id)%1024 samples,
    * s(i) = (31·id + 7919·i) % 65536 − 32768 (mono 16-bit PCM). */
  def audioRate(id: Long): Int = 8000 * (1 + (id % 3).toInt)
  def audioLen(id: Long): Int = 256 + ((id * 13) % 1024).toInt
  def audioSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt

  /** Encode doc_id's deterministic PCM signal as a genuine RIFF/WAVE
    * byte stream: 44-byte canonical header + little-endian 16-bit mono
    * samples. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = audioLen(id)
    val rate = audioRate(id)
    val dataBytes = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)             // PCM
      .putShort(1)             // mono
      .putInt(rate)
      .putInt(rate * 2)        // byte rate
      .putShort(2)             // block align
      .putShort(16)            // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) { buf.putShort(audioSample(id, i).toShort); i += 1 }
    buf.array()
  }

  /** Synthesize the audio-typed media rows (doc_id % 3 == 1, the catalog's
    * modality split) with REAL WAV payloads. */
  def synthesizeAudio(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") % 3 === 1)
      .transform(sortedIds(s)) // pre-codec sort; see synthesizeImages
      .as[Long]
      .mapPartitions(ids => ids.map(id => MediaRow(id, "audio", encodeWav(id))))
  }

  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
                           duration_us: Long, peak: Int, sum_sq: Long,
                           zero_crossings: Long)

  /** REAL decode: the JDK's WAV reader parses the RIFF container
    * (format chunk → rate/channels/bits, data chunk → frames) and every
    * feature is computed from the DECODED samples — all integer math
    * (sum of squares, peak magnitude, sign-change count, integer-division
    * microsecond duration) so the oracle's replay is bit-exact. Same
    * mapPartitions batch shape as [[decodeImages]]; no shuffle. */
  /** AudioFileReader providers resolved once per executor JVM through
    * the public ServiceLoader SPI. AudioSystem.getAudioInputStream
    * funnels EVERY call through a synchronized global provider lookup,
    * which serializes concurrent decode tasks — measured at sf1
    * (16.7k WAV rows, local[32]): 2.4 s through AudioSystem on 32
    * tasks vs 1.2 s on ONE task; the parallel run is slower than the
    * serial one purely from lock convoy. Provider instances are
    * stateless and shared across threads by AudioSystem itself, so
    * calling them directly is exactly as thread-safe, minus the lock. */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toList
  }

  private def openAudio(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    var rs = audioReaders
    while (rs.nonEmpty) {
      try return rs.head.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      rs = rs.tail
    }
    // no SPI provider recognized it: fall back to the JDK's own lookup
    javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
  }

  /** JDK WAV decode shared by [[decodeAudio]] and [[audioPipeline]]: the
    * RIFF container parsed by javax.sound.sampled (format chunk →
    * rate/channels/bits, data chunk → frames), samples materialized as
    * signed 16-bit ints. */
  private def wavSamples(payload: Array[Byte], docId: Long): (Int, Array[Int]) = {
    val ais = openAudio(payload)
    val fmt = ais.getFormat
    require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16,
      s"unexpected audio format for doc $docId: $fmt")
    val rate = math.round(fmt.getSampleRate)
    val data = ais.readAllBytes()
    ais.close()
    val n = data.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      // little-endian 16-bit signed, as declared by the format chunk
      out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    (rate, out)
  }

  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (rate, samples) = wavSamples(r.payload, r.doc_id)
        val n = samples.length
        var i = 0
        var peak = 0
        var sumSq = 0L
        var zc = 0L
        var prevNeg = false
        while (i < n) {
          val s = samples(i)
          val a = math.abs(s)
          if (a > peak) peak = a
          sumSq += s.toLong * s
          val neg = s < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          i += 1
        }
        AudioFeatures(r.doc_id, rate, n.toLong,
          n.toLong * 1000000L / rate, peak, sumSq, zc)
      }
    }
  }

  case class ResampledAudio(doc_id: Long, rate_in: Int, rate_out: Int,
                            n_in: Int, n_out: Int, peak: Int, sum_abs: Long,
                            resampled_hash: String)

  /** REAL audio resample execution (the q126 surface — [[resizeImages]]'
    * discipline on the audio modality): decode the WAV, decimate to
    * `targetRate` by integer block-mean anti-aliasing — each output
    * sample is the TRUNCATED mean (plain JVM `/`, toward zero — the
    * same semantics as DuckDB's `//` and Spark SQL's `div`, measured:
    * (-7)//2 = -3 on both; a floor division would diverge on negative
    * windows) of its k = rate/targetRate source samples; a trailing partial window is dropped (full windows
    * only, n_out = n div k). Integer-exact end to end: the oracle
    * replays the resampled signal from the sample formula, and the md5
    * over the output sequence certifies decode + resample bit-for-bit.
    * Narrow mapPartitions, zero shuffle. */
  def resampleAudio(media: Dataset[MediaRow], targetRate: Int = 4000): Dataset[ResampledAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (rate, samples) = wavSamples(r.payload, r.doc_id)
        require(rate % targetRate == 0,
          s"rate $rate not an integer multiple of $targetRate for doc ${r.doc_id}")
        val k = rate / targetRate
        val nOut = samples.length / k
        val sb = new java.lang.StringBuilder(nOut * 6)
        var peak = 0
        var sumAbs = 0L
        var o = 0
        while (o < nOut) {
          var sum = 0L
          var j = 0
          while (j < k) { sum += samples(o * k + j); j += 1 }
          val m = sum / k // truncate toward zero — DuckDB // semantics
          val a = math.abs(m)
          if (a > peak) peak = a.toInt
          sumAbs += a
          if (o > 0) sb.append('-')
          sb.append(m)
          o += 1
        }
        md.reset()
        val hash = md.digest(sb.toString.getBytes("US-ASCII"))
          .map(b => f"$b%02x").mkString
        ResampledAudio(r.doc_id, rate, targetRate, samples.length, nOut,
          peak, sumAbs, hash)
      }
    }
  }

  case class CheckedImageHash(doc_id: Long, width: Int, height: Int,
                              ahash: String, decode_ok: Boolean, err: String)

  /** [[imageAHashes]] with the K8 dead-letter contract instead of a
    * stage-killing `require`: at 100 TB one truncated blob must route to
    * the error sink (`incremental.Sinks.deadLetter`, the reference's
    * flag taxonomy), not fail the job. Undecodable payloads (ImageIO
    * returns null or throws) come back as `decode_ok = false` rows with
    * the failure reason and zeroed features; the caller splits on the
    * flag — one pass, no second decode, no cache. */
  def imageAHashesChecked(media: Dataset[MediaRow]): Dataset[CheckedImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        try readImageBounded(r.payload) match {
          case Left(reason) =>
            CheckedImageHash(r.doc_id, 0, 0, "", decode_ok = false, reason)
          case Right(img) =>
            CheckedImageHash(r.doc_id, img.getWidth, img.getHeight,
              blockMeanBits(img, avgLuma = false), decode_ok = true, "")
        } catch {
          case e: Exception =>
            CheckedImageHash(r.doc_id, 0, 0, "", decode_ok = false,
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
        }
      }
    }
  }

  case class CheckedAudioHash(doc_id: Long, n_samples: Int, ehash: String,
                              decode_ok: Boolean, err: String)

  /** [[audioEnvelopeHashes]] with the K8 dead-letter contract — the
    * audio twin of [[imageAHashesChecked]]: undecodable containers,
    * unexpected formats, and empty streams come back as
    * `decode_ok = false` rows with the reason, never a stage kill. The
    * JDK WAV path reads only as many bytes as the payload holds, so no
    * header-declared allocation bomb exists on this modality. */
  def audioEnvelopeHashesChecked(media: Dataset[MediaRow]): Dataset[CheckedAudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val (_, samples) = wavSamples(r.payload, r.doc_id)
          if (samples.length == 0)
            CheckedAudioHash(r.doc_id, 0, "", decode_ok = false, "empty audio stream")
          else
            CheckedAudioHash(r.doc_id, samples.length, envelopeBits(samples),
              decode_ok = true, "")
        } catch {
          case e: Exception =>
            CheckedAudioHash(r.doc_id, 0, "", decode_ok = false,
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
        }
      }
    }
  }

  /** Per-payload checked perceptual hash — the STREAMING serving kernel:
    * the same modality kernels as the checked Dataset decoders, one item
    * at a time, `Left(reason)` for dead-letter routing instead of a
    * stage kill. Used by `streaming.Streams.mediaVerdicts`, where the
    * feed mixes modalities row-by-row and the per-modality Dataset
    * split would fragment the micro-batch. */
  def checkedHashOf(mediaType: String, docId: Long, payload: Array[Byte]): Either[String, String] =
    try mediaType match {
      case "image" => readImageBounded(payload).map(img => blockMeanBits(img, avgLuma = false))
      case "audio" =>
        val (_, samples) = wavSamples(payload, docId)
        if (samples.length == 0) Left("empty audio stream")
        else Right(envelopeBits(samples))
      case "video" =>
        val (_, frames) = sampledAviFrames(payload, docId, 2)
        Right(signatureBits(frames, 2)._3)
      case other => Left(s"unknown media_type: $other")
    } catch {
      case e: Exception =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
    }

  case class AudioHash(doc_id: Long, n_samples: Int, ehash: String)

  /** Energy-envelope hash from DECODED PCM samples — the 1-D analog of
    * [[imageAHashes]]'s block-mean aHash, and the shape audio near-dup
    * keys on when no spectral transform is available: 32 integer-tiled
    * frames (f = i·32 div n), frame energy = Σ|s|, bit = 1 iff
    * frameEnergy·n ≥ totalEnergy·frameLen (cross-multiplied, no
    * division). Bounds: |s| ≤ 32768, n ≤ 1280 → every product well
    * under int64. Emitted as a 32-char bitstring (the q34/q94
    * convention) so the oracle's formula replay lands bit-identically. */
  /** 32-frame energy-envelope threshold bits — the hash core shared by
    * [[audioEnvelopeHashes]] and [[audioEnvelopeHashesChecked]]. */
  private def envelopeBits(samples: Array[Int]): String = {
    val n = samples.length
    val sums = new Array[Long](32)
    val cnts = new Array[Long](32)
    var i = 0
    while (i < n) {
      val f = i * 32 / n
      sums(f) += math.abs(samples(i).toLong)
      cnts(f) += 1
      i += 1
    }
    var tot = 0L
    var f = 0
    while (f < 32) { tot += sums(f); f += 1 }
    val sb = new java.lang.StringBuilder(32)
    f = 0
    while (f < 32) {
      sb.append(if (sums(f) * n >= tot * cnts(f)) '1' else '0')
      f += 1
    }
    sb.toString
  }

  def audioEnvelopeHashes(media: Dataset[MediaRow]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, samples) = wavSamples(r.payload, r.doc_id)
        AudioHash(r.doc_id, samples.length, envelopeBits(samples))
      }
    }
  }

  /** q49's audio branch — REAL WAV payloads through the JDK decoder,
    * shaped as decoded media: a mono signal is 1×n media, so width = the
    * decoded sample count, height = 1, the box-fit plan runs on those
    * dims, n_bytes = the decoded PCM data bytes (2·n), and the 16-bin
    * histogram buckets the decoded UNSIGNED 16-bit samples
    * (bin = (s + 32768) div 4096 — integer-exact, so the oracle replays
    * it from the sample formula while Spark recovers it from container
    * bytes). */
  def audioPipeline(s: SparkSession, dir: String, maxW: Int = 64, maxH: Int = 64): Dataset[MediaPipelineRow] = {
    import s.implicits._
    synthesizeAudio(s, dir).mapPartitions { rows =>
      rows.map { r =>
        val (_, samples) = wavSamples(r.payload, r.doc_id)
        val n = samples.length
        val bins = new Array[Long](16)
        var i = 0
        while (i < n) {
          bins((samples(i) + 32768) >> 12) += 1
          i += 1
        }
        val (ow, oh) = fitBox(n, 1, maxW, maxH)
        MediaPipelineRow(r.doc_id, "audio", n, 1, ow, oh, 2L * n, bins)
      }
    }
  }

  // -----------------------------------------------------------------
  // REAL video container path (no stub): a hand-written RIFF/AVI
  // container holding uncompressed DIB (24-bit BMP raster) frames — the
  // classic codec-less AVI — plus the standard `idx1` frame index. The
  // decoder walks the RIFF structure, reads the index, and decodes ONLY
  // the sampled frames' bytes through ImageIO's BMP reader (each frame's
  // DIB bits rewrapped with the 14-byte BMP file header + the stream's
  // own BITMAPINFOHEADER from `strf`). Sample-before-decode is
  // structural here: the index is what lets a production sampler seek
  // N frames out of a million without touching the rest. DIB is
  // lossless, so the oracle replays the pixel formula bit-exactly.

  /** Deterministic video geometry/pixels for doc_id:
    * W = 16 + id%16, H = 16 + (3·id)%16, frames = 4 + (7·id)%12,
    * luma(f,x,y) = (31·id + 17·f + 7·x + 13·y) % 256. */
  def videoDims(id: Long): (Int, Int) =
    (16 + (id % 16).toInt, 16 + ((id * 3) % 16).toInt)
  def videoFrames(id: Long): Int = 4 + ((id * 7) % 12).toInt
  def videoLuma(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode doc_id's deterministic frame sequence as a genuine AVI byte
    * stream: RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh('vids'/
    * 'DIB '), strf(BITMAPINFOHEADER)}} → LIST(movi){'00db' DIB frames,
    * bottom-up rows, 4-byte row padding} → idx1. */
  def encodeAvi(id: Long): Array[Byte] = {
    val (w, h) = videoDims(id)
    val n = videoFrames(id)
    val rowBytes = (w * 3 + 3) & ~3
    val frameBytes = rowBytes * h
    val b = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 64 + 8 + 4 + 64 + 48 +
      8 + 4 + n * (8 + frameBytes) + 8 + n * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(fourcc("RIFF")).putInt(0).put(fourcc("AVI ")) // size patched last
    // hdrl list: avih + one strl
    b.put(fourcc("LIST")).putInt(4 + 64 + 8 + 4 + 64 + 48).put(fourcc("hdrl"))
    b.put(fourcc("avih")).putInt(56)
      .putInt(100000)        // µs per frame (10 fps)
      .putInt(frameBytes * 10).putInt(0)
      .putInt(0x10)          // AVIF_HASINDEX
      .putInt(n).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    b.put(fourcc("LIST")).putInt(4 + 64 + 48).put(fourcc("strl"))
    b.put(fourcc("strh")).putInt(56)
      .put(fourcc("vids")).put(fourcc("DIB "))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(10)  // scale/rate = 10 fps
      .putInt(0).putInt(n).putInt(frameBytes).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    b.put(fourcc("strf")).putInt(40)
      .putInt(40).putInt(w).putInt(h)      // biSize, biWidth, biHeight (+: bottom-up)
      .putShort(1).putShort(24)            // planes, 24 bpp
      .putInt(0)                           // BI_RGB (uncompressed)
      .putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    // movi list: '00db' (stream 0, uncompressed DIB) per frame
    b.put(fourcc("LIST")).putInt(4 + n * (8 + frameBytes)).put(fourcc("movi"))
    val moviStart = b.position() - 4 // offset convention: from the 'movi' fourcc
    val offsets = new Array[Int](n)
    var f = 0
    while (f < n) {
      offsets(f) = b.position() - moviStart
      b.put(fourcc("00db")).putInt(frameBytes)
      var y = h - 1 // DIB rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val v = videoLuma(id, f, x, y).toByte
          b.put(v).put(v).put(v) // BGR gray
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        y -= 1
      }
      f += 1
    }
    b.put(fourcc("idx1")).putInt(n * 16)
    f = 0
    while (f < n) {
      b.put(fourcc("00db")).putInt(0x10).putInt(offsets(f)).putInt(frameBytes)
      f += 1
    }
    val total = b.position()
    b.putInt(4, total - 8) // patch the RIFF size
    java.util.Arrays.copyOf(b.array(), total)
  }

  /** Synthesize the video-typed media rows (doc_id % 3 == 2, the catalog's
    * modality split) with REAL AVI payloads. */
  def synthesizeVideos(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") % 3 === 2)
      .transform(sortedIds(s)) // pre-codec sort; see synthesizeImages
      .as[Long]
      .mapPartitions(ids => ids.map(id => MediaRow(id, "video", encodeAvi(id))))
  }

  case class VideoFrameFeatures(doc_id: Long, n_frames: Int, frame_idx: Int,
                                width: Int, height: Int, sum_luma: Long,
                                min_luma: Int, max_luma: Int)

  /** REAL frame sampling + decode: parse the RIFF/AVI container (strf →
    * the stream's BITMAPINFOHEADER, idx1 → frame offsets), pick up to
    * `maxSamples` evenly spaced frames (stride n div maxSamples),
    * and run ONLY those frames' DIB bits through ImageIO's BMP decoder.
    * Luma statistics come from the decoded raster. */
  /** RIFF/AVI parse + sampled-frame decode shared by [[decodeVideoFrames]]
    * and [[videoPipeline]]: walk the container (hdrl→strf for the
    * stream's BITMAPINFOHEADER, idx1 for frame offsets), pick up to
    * `maxSamples` evenly spaced frames, and run ONLY those frames' DIB
    * bits through ImageIO's BMP reader. Returns (total frame count,
    * decoded (frame_idx, raster) pairs). Callers do per-partition init
    * (ImageIO.setUseCache) before the row loop. */
  private def sampledAviFrames(payload: Array[Byte], docId: Long,
                               maxSamples: Int): (Int, Seq[(Int, java.awt.image.BufferedImage)]) = {
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt(0) == 0x46464952 && buf.getInt(8) == 0x20495641, // 'RIFF', 'AVI '
      s"not an AVI payload for doc $docId")
    // walk top-level chunks for LIST(hdrl)→…→strf, LIST(movi), idx1
    var strf: Array[Byte] = null
    var moviStart = -1
    var idx1: (Int, Int) = null // (pos, size)
    var p = 12
    while (p + 8 <= buf.limit()) {
      val ck = buf.getInt(p); val sz = buf.getInt(p + 4)
      if (ck == 0x5453494c) { // 'LIST'
        val kind = buf.getInt(p + 8)
        if (kind == 0x6c726468) { // 'hdrl' — scan inside for 'strf'
          var q = p + 12
          val end = p + 8 + sz
          while (q + 8 <= end && strf == null) {
            val c = buf.getInt(q); val s2 = buf.getInt(q + 4)
            if (c == 0x5453494c) q += 12 // descend into sub-LIST (strl)
            else {
              if (c == 0x66727473) { // 'strf'
                // declared chunk size bound BEFORE allocation: a header
                // claiming a huge strf must dead-letter, not OOM
                require(s2 >= 0 && q + 8 + s2 <= payload.length,
                  s"strf size out of bounds in AVI for doc $docId")
                strf = new Array[Byte](s2)
                java.lang.System.arraycopy(payload, q + 8, strf, 0, s2)
              }
              q += 8 + s2 + (s2 & 1)
            }
          }
        } else if (kind == 0x69766f6d) moviStart = p + 8 // the 'movi' fourcc
      } else if (ck == 0x31786469) idx1 = (p + 8, sz) // 'idx1'
      p += 8 + sz + (sz & 1)
    }
    require(strf != null && moviStart >= 0 && idx1 != null,
      s"missing strf/movi/idx1 in AVI for doc $docId")
    // declared frame dims bound: ImageIO's BMP reader allocates the full
    // raster from BITMAPINFOHEADER before decoding — the video-side
    // image bomb; bounce oversized declarations before any frame decode
    if (strf.length >= 12) {
      val sb = java.nio.ByteBuffer.wrap(strf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val bw = sb.getInt(4).toLong.abs
      val bh = sb.getInt(8).toLong.abs
      require(bw * bh <= MaxDecodePx, s"oversized frame: ${bw}x$bh in AVI for doc $docId")
    }
    require(idx1._1 + idx1._2 <= payload.length && idx1._2 >= 0,
      s"idx1 out of bounds in AVI for doc $docId")
    val n = idx1._2 / 16
    val step = math.max(1, n / maxSamples)
    val frames = (0 until n by step).take(maxSamples).map { f =>
      val off = buf.getInt(idx1._1 + f * 16 + 8) // from the 'movi' fourcc
      val size = buf.getInt(idx1._1 + f * 16 + 12)
      // index-entry bound BEFORE the rewrap allocation: a poisoned idx1
      // entry must dead-letter, not OOM or read out of bounds
      require(off >= 0 && size >= 0 && moviStart + off + 8 + size <= payload.length,
        s"frame $f out of bounds in AVI for doc $docId")
      // rewrap the DIB bits as a BMP file: 'BM' header + strf + bits
      val bmp = java.nio.ByteBuffer.allocate(14 + strf.length + size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bmp.put('B'.toByte).put('M'.toByte).putInt(14 + strf.length + size)
        .putInt(0).putInt(14 + strf.length)
        .put(strf).put(payload, moviStart + off + 8, size)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp.array()))
      require(img != null, s"undecodable frame $f for doc $docId")
      (f, img)
    }
    (n, frames)
  }

  def decodeVideoFrames(media: Dataset[MediaRow], maxSamples: Int = 4): Dataset[VideoFrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition, not per row
      rows.flatMap { r =>
        val (n, frames) = sampledAviFrames(r.payload, r.doc_id, maxSamples)
        frames.map { case (f, img) =>
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L; var mn = 255; var mx = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              sum += luma
              if (luma < mn) mn = luma
              if (luma > mx) mx = luma
              x += 1
            }
            y += 1
          }
          VideoFrameFeatures(r.doc_id, n, f, w, h, sum, mn, mx)
        }
      }
    }
  }

  case class VideoSignature(doc_id: Long, n_frames: Int, width: Int,
                            height: Int, sig: String)

  /** Sampled-keyframe fingerprint from REAL decoded AVI frames: the
    * q83 sample-before-decode contract (index-seek, `maxSamples` frames
    * at stride n div maxSamples), each sampled frame reduced to the 8×8
    * block-mean aHash ([[imageAHashes]]'s integer-exact threshold), and
    * the per-frame hashes concatenated in frame order — a 64·maxSamples
    * bit signature. Signature-identical videos are re-encoded /
    * re-containered copies; the relation groups them downstream. */
  /** Concatenated per-keyframe aHash — the signature core shared by
    * [[videoSignatures]] and [[videoSignaturesChecked]]: frame order
    * preserved, (width, height, sig) of the decoded frames. */
  private def signatureBits(frames: Seq[(Int, java.awt.image.BufferedImage)],
                            maxSamples: Int): (Int, Int, String) = {
    var w = 0
    var h = 0
    val sb = new java.lang.StringBuilder(64 * maxSamples)
    frames.foreach { case (_, img) =>
      w = img.getWidth
      h = img.getHeight
      sb.append(blockMeanBits(img, avgLuma = true))
    }
    (w, h, sb.toString)
  }

  def videoSignatures(media: Dataset[MediaRow], maxSamples: Int = 2): Dataset[VideoSignature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (n, frames) = sampledAviFrames(r.payload, r.doc_id, maxSamples)
        val (w, h, sig) = signatureBits(frames, maxSamples)
        VideoSignature(r.doc_id, n, w, h, sig)
      }
    }
  }

  case class CheckedVideoSignature(doc_id: Long, n_frames: Int, width: Int,
                                   height: Int, sig: String,
                                   decode_ok: Boolean, err: String)

  /** [[videoSignatures]] with the K8 dead-letter contract — the video
    * twin of [[imageAHashesChecked]]: malformed RIFF structure, missing
    * chunks, out-of-bounds frame index entries, and oversized declared
    * frame dimensions ([[sampledAviFrames]]' validation) come back as
    * `decode_ok = false` rows with the reason, never a stage kill or an
    * allocation bomb. */
  def videoSignaturesChecked(media: Dataset[MediaRow], maxSamples: Int = 2): Dataset[CheckedVideoSignature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        try {
          val (n, frames) = sampledAviFrames(r.payload, r.doc_id, maxSamples)
          val (w, h, sig) = signatureBits(frames, maxSamples)
          CheckedVideoSignature(r.doc_id, n, w, h, sig, decode_ok = true, "")
        } catch {
          case e: Exception =>
            CheckedVideoSignature(r.doc_id, 0, 0, 0, "", decode_ok = false,
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
        }
      }
    }
  }

  /** q49's video branch — REAL AVI payloads, index-seek frame sampling,
    * per-frame BMP decode: width/height are the decoded frame dims, the
    * box-fit plan runs on them, n_bytes = the decoded 8-bit luma sample
    * count across the sampled frames (|sampled|·w·h), and the 16-bin
    * histogram buckets decoded luma over those frames. */
  def videoPipeline(s: SparkSession, dir: String, maxSamples: Int = 4,
                    maxW: Int = 64, maxH: Int = 64): Dataset[MediaPipelineRow] = {
    import s.implicits._
    synthesizeVideos(s, dir).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (_, frames) = sampledAviFrames(r.payload, r.doc_id, maxSamples)
        val bins = new Array[Long](16)
        var w = 0; var h = 0
        var nPx = 0L
        frames.foreach { case (_, img) =>
          w = img.getWidth; h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              bins(luma >> 4) += 1
              x += 1
            }
            y += 1
          }
          nPx += w.toLong * h
        }
        val (ow, oh) = fitBox(w, h, maxW, maxH)
        MediaPipelineRow(r.doc_id, "video", w, h, ow, oh, nPx, bins)
      }
    }
  }
}
