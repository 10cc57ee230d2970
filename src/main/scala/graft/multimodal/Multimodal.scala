package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque binary record with typed metadata — image/audio/video columns for
  * a multimodal training-data pipeline. */
final case class MediaRecord(
    media_id: Long,
    kind: String, // image | audio | video
    content: Array[Byte],
    format: String,
    width: Int,
    height: Int,
    sample_rate: Int,
    duration_ms: Long)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    features: Array[Float])

/** Container-level metadata probed from the first bytes of a payload. */
final case class MediaInfo(
    format: String,
    width: Option[Int],
    height: Option[Int],
    sample_rate: Option[Int])

final case class ProbedMedia(
    media_id: Long,
    detected_format: Option[String],
    width: Option[Int],
    height: Option[Int],
    sample_rate: Option[Int])

/** Multimodal column plumbing: binary payload + typed metadata, partition
  * batching for decode, frame sampling — with the DECODE STEP STUBBED
  * (this runtime ships no image/audio codecs; see [[decodeStub]]). The
  * Spark-side mechanics are real: schema, `Dataset[MediaRecord]` encoders,
  * `mapPartitions` batch shape (the JVM analogue of `mapInPandas` batches),
  * and expression-level frame sampling.
  *
  * Scale: decode is per-row CPU work behind a partition iterator — it
  * parallelizes linearly with partitions and never shuffles; only the
  * (small) feature output flows on.
  */
object Multimodal {

  val FeatureDim = 64

  /** ======= STUB ======= Deterministic fake decoder: a normalized 64-bin
    * byte histogram standing in for a real JPEG/PNG/PCM decode + model
    * feature extraction. In production this body is replaced by the actual
    * codec call (e.g. javax.imageio / ffmpeg bindings); signature, batching
    * and schema stay exactly as-is. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xFF) % FeatureDim) += 1f
      i += 1
    }
    val n = bytes.length.toFloat
    hist.map(_ / n)
  }

  /** Decode/feature-extract over partition-sized batches: one iterator per
    * partition, rows streamed — the `mapInPandas` batch shape, JVM-side.
    * The decoder is injectable so tests/production swap it without touching
    * the plumbing. */
  def extractFeatures(
      media: Dataset[MediaRecord],
      decode: Array[Byte] => Array[Float] = decodeStub): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // Per-partition init happens here (codec handles, model weights, …) —
      // once per task, not per row.
      records.map { r =>
        MediaFeatures(r.media_id, r.kind,
          if (r.content == null) 0L else r.content.length.toLong,
          decode(r.content))
      }
    }
  }

  /** Frame sampling for "video" payloads, expression-level (no UDF): slice
    * the byte stream into `n` equal frames. With a real container format
    * the slicing boundaries come from the codec; the pipeline shape —
    * explode into (media_id, frame_idx, frame_bytes) — is the real one. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.select(
        col("media_id"),
        explode(array((0 until n).map(i =>
          struct(lit(i).as("frame_idx"),
            expr(s"substring(content, cast($i * (length(content) div $n) as int) + 1, " +
              s"cast(greatest(length(content) div $n, 1) as int))").as("frame_bytes"))): _*))
          .as("f"))
      .select(col("media_id"), col("f.frame_idx"), col("f.frame_bytes"))

  /** REAL container-header parsing — NOT part of the decode stub: PNG
    * IHDR, JPEG SOF0/1/2 markers, GIF logical-screen, and WAV fmt chunks
    * are plain byte arithmetic needing no codec, so dimension/sample-rate
    * extraction from opaque binary columns works in this runtime as-is.
    * Returns None for unrecognized or truncated payloads (a corrupt file
    * must not fail the pipeline — it surfaces as null metadata to filter
    * on). This is the metadata-validation pass a multimodal pipeline runs
    * BEFORE spending decode CPU: malformed/mislabeled payloads drop out
    * on header bytes alone. */
  def probeHeader(b: Array[Byte]): Option[MediaInfo] = {
    def be16(i: Int) = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def be32(i: Int) = ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    def le16(i: Int) = ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
    def le32(i: Int) = ((b(i + 3) & 0xFF) << 24) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
    def has(sig: Seq[Int], at: Int = 0) =
      b.length >= at + sig.length && sig.indices.forall(i => (b(at + i) & 0xFF) == sig(i))
    try {
      if (b == null || b.length < 12) None
      // PNG: 8-byte signature, then len+'IHDR'+width(BE32)+height(BE32)
      else if (has(Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)) &&
          b.length >= 24 && has(Seq('I', 'H', 'D', 'R'), at = 12))
        Some(MediaInfo("png", Some(be32(16)), Some(be32(20)), None))
      // JPEG: FFD8, walk FF-marker segments to a SOF0/1/2 frame header
      else if (has(Seq(0xFF, 0xD8))) {
        var i = 2
        var out: Option[MediaInfo] = None
        while (out.isEmpty && i + 9 < b.length && (b(i) & 0xFF) == 0xFF) {
          val marker = b(i + 1) & 0xFF
          val segLen = be16(i + 2)
          if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2)
            out = Some(MediaInfo("jpeg", Some(be16(i + 7)), Some(be16(i + 5)), None))
          else i += 2 + segLen
        }
        out
      }
      // GIF87a/89a: 6-byte signature then LE16 logical screen w, h
      else if (has(Seq('G', 'I', 'F', '8')) && b.length >= 10)
        Some(MediaInfo("gif", Some(le16(6)), Some(le16(8)), None))
      // WAV: RIFF....WAVEfmt , sample rate LE32 at offset 24
      else if (has(Seq('R', 'I', 'F', 'F')) && has(Seq('W', 'A', 'V', 'E'), at = 8) &&
          b.length >= 28)
        Some(MediaInfo("wav", None, None, Some(le32(24))))
      else None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Header-probe pass over a media table: same mapPartitions batch shape
    * as [[extractFeatures]], emitting detected format + dimensions /
    * sample rate (nulls for unrecognized payloads). */
  def probeMedia(media: Dataset[MediaRecord]): Dataset[ProbedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val info = probeHeader(r.content)
      ProbedMedia(r.media_id, info.map(_.format),
        info.flatMap(_.width), info.flatMap(_.height), info.flatMap(_.sample_rate))
    })
  }

  /** Deterministic synthetic media built from the documents table — fake
    * binary payloads with real schema/metadata so the plumbing is testable
    * at any scale. Kind cycles image/audio/video by doc_id. */
  def synthesizeFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        element_at(typedLit(Seq("png", "wav", "mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(8)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(8)) * 64 + 64).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (length(col("text")) * 10).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }

  /** Full stub pipeline: synthesize → batch decode → per-record features.
    * Deterministic end to end; emits the histogram bins for bytes 0x20 (' ',
    * bin 32) and 0x61 ('a', bin 33) — informative on text-backed payloads,
    * so the driver's DuckDB oracle checks real values, not zeros. */
  def mediaFeatureSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val feats = extractFeatures(synthesizeFromDocs(spark, docs))
    feats.toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        element_at(col("features"), 33).as("f_space"),
        element_at(col("features"), 34).as("f_a"))
  }
}
