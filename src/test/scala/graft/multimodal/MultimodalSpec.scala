package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"),
    (1L, "another document body"),
    (2L, "third one here"),
    (3L, "hello world")).toDF("doc_id", "text")

  test("synthesizeFromDocs yields typed binary records with metadata") {
    val media = Multimodal.synthesizeFromDocs(spark, docs).collect()
    assert(media.length === 4)
    val m0 = media.find(_.media_id == 0L).get
    assert(m0.kind === "image" && m0.format === "png")
    assert(new String(m0.content, "UTF-8") === "hello world")
    assert(media.find(_.media_id == 1L).get.kind === "audio")
    assert(media.find(_.media_id == 2L).get.kind === "video")
  }

  test("extractFeatures runs per-partition batches, deterministic features") {
    val media = Multimodal.synthesizeFromDocs(spark, docs).repartition(2)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 4)
    assert(feats.forall(_.features.length === Multimodal.FeatureDim))
    // identical bytes → identical features; histogram is L1-normalized
    val f0 = feats.find(_.media_id == 0L).get
    val f3 = feats.find(_.media_id == 3L).get
    assert(f0.features.toSeq === f3.features.toSeq)
    assert(math.abs(f0.features.sum - 1f) < 1e-5)
    assert(f0.n_bytes === "hello world".length.toLong)
  }

  test("decoder is injectable without touching plumbing") {
    val media = Multimodal.synthesizeFromDocs(spark, docs)
    val feats = Multimodal.extractFeatures(media,
      bytes => Array(bytes.length.toFloat)).collect()
    assert(feats.find(_.media_id == 1L).get.features.toSeq ===
      Seq("another document body".length.toFloat))
  }

  test("sampleFrames slices content into n contiguous frames") {
    val media = Multimodal.synthesizeFromDocs(spark, docs).toDF()
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L), 3)
      .orderBy("frame_idx").collect()
    assert(frames.length === 3)
    val joined = frames.map(r => new String(r.getAs[Array[Byte]]("frame_bytes"), "UTF-8")).mkString
    // n*floor(len/n) bytes covered, head-aligned
    assert("another document body".startsWith(joined))
    assert(joined.length === ("another document body".length / 3) * 3)
  }

  test("probeHeader parses real PNG/JPEG/GIF/WAV headers, rejects garbage") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG, 640x480: signature + IHDR chunk
    val png = bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, /* 640 */ 0, 0, 0x01, 0xE0 /* 480 */) ++ new Array[Byte](8)
    assert(Multimodal.probeHeader(png) ===
      Some(MediaInfo("png", Some(640), Some(480), None)))
    // JPEG, 200x100: SOI, APP0 segment (skipped), SOF0 (height 100, width 200)
    val jpeg = bytes(0xFF, 0xD8,
      0xFF, 0xE0, 0, 4, 0x4A, 0x46, // APP0, len 4
      0xFF, 0xC0, 0, 11, 8, 0, 100, 0, 200, 3, 0, 0, 0)
    assert(Multimodal.probeHeader(jpeg) ===
      Some(MediaInfo("jpeg", Some(200), Some(100), None)))
    // GIF89a, 12x34 little-endian
    val gif = bytes('G', 'I', 'F', '8', '9', 'a', 12, 0, 34, 0) ++ new Array[Byte](4)
    assert(Multimodal.probeHeader(gif) ===
      Some(MediaInfo("gif", Some(12), Some(34), None)))
    // WAV, 44100 Hz
    val wav = bytes('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 2, 0,
      0x44, 0xAC, 0, 0 /* 44100 LE */) ++ new Array[Byte](4)
    assert(Multimodal.probeHeader(wav) ===
      Some(MediaInfo("wav", None, None, Some(44100))))
    // garbage / truncated → None, never a throw
    assert(Multimodal.probeHeader("not media".getBytes) === None)
    assert(Multimodal.probeHeader(bytes(0xFF, 0xD8, 0xFF)) === None)
    assert(Multimodal.probeHeader(Array.empty[Byte]) === None)
  }

  test("probeMedia maps the probe over a media table with null-safe output") {
    val media = Multimodal.synthesizeFromDocs(spark, docs)
    val probed = Multimodal.probeMedia(media).collect()
    // synthesized payloads are UTF-8 text, so every probe is None-format
    assert(probed.nonEmpty)
    assert(probed.forall(_.detected_format.isEmpty))
  }
}
