package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup

/** One streaming document. */
final case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

/** A streaming near-dup verdict: `doc_id` collided with the earlier
  * `dup_of` in some LSH band, with `est_jaccard` estimated from the full
  * MinHash signatures. */
final case class StreamNearDup(doc_id: Long, dup_of: Long, est_jaccard: Double)

private[streaming] final case class BandEntry(
    bucket: String, doc_id: Long, ts: Timestamp, sig: Array[Long])

private[streaming] final case class BucketRep(rep_id: Long, sig: Array[Long])

/** The streaming face of the dedup family (ROADMAP round-3 #1): the batch
  * operators answer "which documents in this corpus are duplicates"; these
  * answer it continuously as documents arrive, with state bounded by the
  * event-time watermark.
  *
  *  - Exact dedup rides Spark's `dropDuplicatesWithinWatermark` on the
  *    content hash: per-key state, dropped once the watermark passes.
  *  - Near-dup dedup is MinHash+LSH re-expressed as STATE instead of a
  *    self-join: each band bucket keeps its first member as representative
  *    (one tiny row per active bucket), and a new arrival in an occupied
  *    bucket is emitted as a candidate with the signature-estimated
  *    Jaccard. Signatures are BIT-IDENTICAL to the batch path — same
  *    xxhash64 base (seed 42, Spark's default), same Carter-Wegman
  *    permutations over GF(2^31−1) from [[Dedup.hashParams]] — so a doc
  *    signed by the stream matches one signed by a batch backfill.
  *
  * Scale: work per document is O(shingles × k) map-side plus one shuffle
  * on the band buckets; state is O(active buckets) and expires via
  * event-time timeout — the same O(batch)-not-O(corpus) contract as the
  * incremental MVs.
  */
object StreamingDedup {

  /** Exact streaming dedup: first occurrence of each content hash passes,
    * repeats within the watermark window are dropped. */
  def exactDedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Per-document MinHash signature, computed map-side in one pass —
    * value-identical to [[Dedup.signaturesFromShingles]] for the same
    * (n, k, seed). Returns empty for documents with fewer than n tokens
    * (the batch path emits no signature row for those either). */
  private[streaming] def signatureOf(
      text: String, n: Int, k: Int, seed: Long): Array[Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    val params = Dedup.hashParams(k, seed).toArray
    val out = Array.fill(k)(Long.MaxValue)
    toks.sliding(n).foreach { gram =>
      val s = UTF8String.fromString(gram.mkString(" "))
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val hh = java.lang.Math.floorMod(h, Dedup.Prime31)
      var i = 0
      while (i < k) {
        val v = java.lang.Math.floorMod(hh * params(i)._1 + params(i)._2, Dedup.Prime31)
        if (v < out(i)) out(i) = v
        i += 1
      }
    }
    out
  }

  /** Continuous MinHash+LSH near-dup detection. The watermark is applied
    * HERE, after the band explosion — a typed flatMap re-serializes its
    * output, so a watermark set upstream would not survive to the stateful
    * operator. `retentionMs` is how long a bucket representative stays
    * eligible after its last sighting.
    *
    * A document colliding with the representative in SEVERAL bands is
    * emitted once per band — sink-side dedup on (doc_id, dup_of) is one
    * `groupBy` in the `foreachBatch` that lands the verdicts (chaining a
    * second stateful dedup operator here would tie both to one watermark). */
  def nearDupStream(
      docs: Dataset[StreamDoc],
      n: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      retentionMs: Long = 60L * 60 * 1000,
      seed: Long = 42L,
      watermark: String = "1 hour"): Dataset[StreamNearDup] = {
    import docs.sparkSession.implicits._
    implicit val repEnc = Encoders.product[BucketRep]
    val rowsPerBand = k / bands

    docs
      .flatMap { d =>
        val sig = signatureOf(d.text, n, k, seed)
        if (sig.isEmpty) Iterator.empty
        else (0 until bands).iterator.map { b =>
          val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
          BandEntry(s"$b:${slice.mkString(",")}", d.doc_id, d.ts, sig)
        }
      }
      .withWatermark("ts", watermark)
      .as[BandEntry]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: String, rows: Iterator[BandEntry], state: GroupState[BucketRep]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
            val out = Seq.newBuilder[StreamNearDup]
            var rep = state.getOption
            var maxTs = Long.MinValue
            sorted.foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              rep match {
                case None => rep = Some(BucketRep(e.doc_id, e.sig))
                case Some(r) if r.rep_id != e.doc_id =>
                  val matches = r.sig.zip(e.sig).count { case (a, b) => a == b }
                  val est = matches.toDouble / r.sig.length
                  if (est >= threshold) out += StreamNearDup(e.doc_id, r.rep_id, est)
                case _ => ()
              }
            }
            rep.foreach { r =>
              state.update(r)
              state.setTimeoutTimestamp(maxTs + retentionMs)
            }
            out.result().iterator
          }
        })
  }
}
