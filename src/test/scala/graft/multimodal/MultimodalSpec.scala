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
}
