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
