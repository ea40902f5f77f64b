package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The container has no image/audio codecs (zero-egress, SURVEY.md §0.3),
  * so the DECODE STEP IS A STUB — a deterministic fake that derives
  * plausible metadata from the bytes (`fakeDecode`). Everything around it
  * is real and is what matters at 100 TB: the schema, the batched
  * per-partition decode loop (decoder init amortized once per partition,
  * exactly like the extraction registry), partition sizing, and the typed
  * result. Swapping in a real codec changes only the body of
  * `MediaDecoder.decode`.
  */
object Media {

  /** Typed metadata emitted per payload. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      frames: Int,
      checksum: String)

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Real implementation would parse headers / decode frames here. */
  final class MediaDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val b0 = if (n > 0) bytes(0) & 0xff else 0
      val fmt = (b0 % 3) match { case 0 => "img"; case 1 => "aud"; case _ => "vid" }
      MediaMeta(
        doc_id = id,
        n_bytes = n,
        format = fmt,
        width = 32 + (n % 64),
        height = 32 + (b0 % 48),
        frames = if (fmt == "vid") 1 + (n % 16) else 1,
        checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString)
    }
  }

  /** Attach a binary payload column derived from text (the sandbox's stand-in
    * for real media bytes). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(substring(col(textCol), 1, 64), "utf-8"))

  /** Batched decode: one decoder instance per partition, streaming over
    * rows (the mapInPandas-batch analog in Scala Spark). Input df must have
    * (doc_id: bigint, payload: binary). */
  def decodeMeta(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new MediaDecoder // init once per partition
        it.map { case (id, bytes) => dec.decode(id, bytes) }
      }
  }

  /** Frame-sampling stub: every `stride`-th frame index up to `frames`.
    * Real implementation would return decoded frame tensors; the Spark
    * plumbing (explode to one row per sampled frame) is the real part. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.withColumn("frame_idx",
        explode(sequence(lit(0), col("frames") - 1, lit(stride))))
      .select(col("doc_id"), col("frame_idx"), col("format"))

  /** Byte-level feature row: REAL computation (no codec needed). */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      hist: Seq[Long],     // 16-bin histogram over byte values (value >> 4)
      entropy_m3: Long,    // Shannon entropy over the 16 bins, milli-bits ×1000 floor
      zero_runs: Int)      // number of maximal runs of 0x00 bytes

  /** Feature extraction over opaque binary payloads — unlike the decoder
    * this is NOT a stub: byte histograms / entropy / zero-run counts are
    * the standard cheap signals for corrupt-or-padding detection and
    * format triage at corpus scale, computable without any codec. One
    * streaming pass per payload, per-partition batching. */
  def extractFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Long](16)
          var zeroRuns = 0; var inZero = false
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            hist(b >> 4) += 1
            if (b == 0) { if (!inZero) { zeroRuns += 1; inZero = true } }
            else inZero = false
            i += 1
          }
          val n = bytes.length.toDouble
          var ent = 0.0
          var k = 0
          while (k < 16) {
            if (hist(k) > 0) { val p = hist(k) / n; ent -= p * (math.log(p) / math.log(2)) }
            k += 1
          }
          MediaFeatures(id, bytes.length, hist.toVector,
            if (bytes.isEmpty) 0L else math.floor(ent * 1000).toLong, zeroRuns)
        }
      }
  }

  /** Resize stage stub: emits the target geometry + a deterministic
    * checksum of (payload, w, h) standing in for resized bytes — the real
    * part is the stage shape (pure row map, no shuffle; a real impl swaps
    * the body for an image-lib call exactly like MediaDecoder.decode). */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.select(col("doc_id"),
      lit(w).as("width"), lit(h).as("height"),
      md5(concat(base64(col("payload")), lit(s":$w:$h"))).as("resized_checksum"))
}
