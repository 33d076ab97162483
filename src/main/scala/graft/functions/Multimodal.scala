package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The real decode path (image/audio codecs) is STUBBED — this container
  * ships no media libraries — behind [[decodeStub]], which produces
  * deterministic pseudo-features from the payload's md5 so the pipeline is
  * end-to-end testable (and oracle-checkable: the same features are
  * SQL-expressible). Everything around the stub is the real Spark
  * plumbing a production decoder needs:
  *  - payloads travel as `BinaryType` columns (never stringified),
  *  - decoding runs in [[Dataset.mapPartitions]] so a real codec would
  *    amortize per-partition init (model load, decoder context) across
  *    the batch — same shape as a Pandas-UDF/mapInPandas stage,
  *  - output is a typed schema (media_type, width, height, n_frames,
  *    fingerprint), partition-preserving (no shuffle).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String,
                           width: Int, height: Int, n_frames: Int, fingerprint: String)

  // One MessageDigest per executor thread (i.e. per running task), reused
  // across every row of the partition — `getInstance` does a provider
  // lookup + allocation and must not run per row; `reset()` is O(1).
  // Hex via a char table: no per-byte format-string boxing.
  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5hex(bytes: Array[Byte]): String = {
    val md = digestLocal.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def hexPair(h: String, i: Int): Int =
    Integer.parseInt(h.substring(i, i + 2), 16)

  /** STUB decoder — replace with a real codec in production. Features are
    * deterministic functions of the payload hash so tests and the DuckDB
    * oracle can reproduce them exactly. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val h = md5hex(row.payload)
    MediaFeatures(
      doc_id = row.doc_id,
      media_type = row.media_type,
      width = 32 + hexPair(h, 0) % 224,
      height = 32 + hexPair(h, 2) % 224,
      n_frames = if (row.media_type == "image") 1 else 1 + hexPair(h, 4) % 32,
      fingerprint = h)
  }

  /** The mapPartitions decode stage. A real implementation would open the
    * codec once per partition here, then stream the batch through it. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (codec/model handles)
      rows.map(decodeStub)
    }
  }

  case class FrameFeatures(doc_id: Long, frame_idx: Int, fingerprint: String, luma: Int)

  /** Frame sampling for video media: take up to `maxSamples` evenly-
    * spaced frames per video and "decode" each (STUB — per-frame
    * features are deterministic functions of the media fingerprint +
    * frame index, so the pipeline is testable end-to-end and the oracle
    * can replay it). The real implementation would seek the container
    * per sampled index inside the same per-partition batch loop —
    * sampling-before-decode is the point: at 100 TB you never decode
    * frames you won't keep. */
  def sampleFrames(features: Dataset[MediaFeatures], maxSamples: Int = 4): Dataset[FrameFeatures] = {
    import features.sparkSession.implicits._
    features.flatMap { f =>
      if (f.media_type != "video") Seq.empty[FrameFeatures]
      else {
        val step = math.max(1, f.n_frames / maxSamples)
        (1 to f.n_frames by step).take(maxSamples).map { idx =>
          val h = md5hex(s"${f.fingerprint}:$idx".getBytes("UTF-8"))
          FrameFeatures(f.doc_id, idx, h, 16 + hexPair(h, 0) % 224)
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

  /** Resize planning: fit (width, height) into a maxW×maxH box
    * preserving aspect ratio, never upscaling. The dimension math is
    * real and INTEGER-exact (rational comparison + integer division, so
    * the oracle reproduces it bit-for-bit); the pixel resample itself
    * would run where the decode stub sits, consuming these plans. */
  def resizePlan(features: Dataset[MediaFeatures], maxW: Int = 64, maxH: Int = 64): Dataset[ResizePlan] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val (ow, oh) =
        if (f.width <= maxW && f.height <= maxH) (f.width, f.height)
        else if (f.width.toLong * maxH >= f.height.toLong * maxW) // width-bound
          (maxW, math.max(1, (f.height.toLong * maxW / f.width).toInt))
        else
          (math.max(1, (f.width.toLong * maxH / f.height).toInt), maxH)
      ResizePlan(f.doc_id, f.media_type, f.width, f.height, ow, oh)
    }
  }

  /** Build a media table from documents: payload = utf-8 bytes of text
    * (stand-in for real image/audio bytes), media_type by doc_id. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MediaRow]
  }
}
