package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.dedup.Dedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming signatures are bit-identical to the batch MinHash path") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "spark shuffles wide joins into hash partitions every time")
    val batch = Dedup.minhashSignatures(
        texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text"),
        n = 3, k = 16, seed = 42L)
      .orderBy("doc_id").collect()
      .map(_.getSeq[Long](1).toArray)
    val streamed = texts.map(StreamingDedup.signatureOf(_, n = 3, k = 16, seed = 42L))
    batch.zip(streamed).foreach { case (b, s) => assert(b.sameElements(s)) }
  }

  test("exact streaming dedup keeps first occurrence, drops repeats") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = StreamingDedup.exactDedupStream(input.toDF())
      .writeStream.format("memory").queryName("exact_dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        StreamDoc(1L, t("2024-01-01 10:00:00"), "alpha beta gamma"),
        StreamDoc(2L, t("2024-01-01 10:00:01"), "delta epsilon zeta"))
      q.processAllAvailable()
      input.addData( // same content, later arrival → dropped
        StreamDoc(3L, t("2024-01-01 10:00:05"), "alpha beta gamma"))
      q.processAllAvailable()
      val ids = spark.table("exact_dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L))
    } finally q.stop()
  }

  test("streaming near-dup flags shingle-overlapping docs, passes distinct ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val base = "one two three four five six seven eight nine ten"
    val nearDup = base + " eleven" // long shared prefix → shared shingles
    val distinct = "completely different words about unrelated topics entirely here"
    val q = StreamingDedup.nearDupStream(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("near_dup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(StreamDoc(1L, t("2024-01-01 10:00:00"), base))
      q.processAllAvailable()
      input.addData(
        StreamDoc(2L, t("2024-01-01 10:01:00"), nearDup),
        StreamDoc(3L, t("2024-01-01 10:02:00"), distinct))
      q.processAllAvailable()
      // sink-side dedup over the per-band emissions, as documented
      val verdicts = spark.table("near_dup_out")
        .groupBy("doc_id", "dup_of").agg(max("est_jaccard").as("est"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(verdicts.map(v => (v._1, v._2)).toSet === Set((2L, 1L)))
      assert(verdicts.head._3 >= 0.5)
    } finally q.stop()
  }
}
