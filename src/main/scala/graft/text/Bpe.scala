package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training + encoding (ROADMAP #5: the real
  * merge-table tokenizer behind the regex approximation in
  * [[TextFunctions.bpeTokenCount]]).
  *
  * Scale shape: the DISTRIBUTED step is the word-frequency count (one
  * hash aggregate over the corpus); merge learning then iterates over the
  * word-frequency DICTIONARY, which is bounded by vocabulary size, not
  * corpus size — this is how production BPE vocabularies are trained, and
  * it means the driver-side loop stays the same size at 100 TB as at 100 MB.
  * Encoding is a per-row native expression with the merge table riding the
  * plan as a reference object ([[org.apache.spark.sql.graftnative.BpeTokens]]).
  */
object Bpe {

  /** Learn `numMerges` merge rules from the corpus. Deterministic: the most
    * frequent adjacent symbol pair wins each round, ties broken
    * lexicographically. Stops early when no pair repeats.
    *
    * The driver-side dictionary is BOUNDED regardless of corpus size:
    * `minCount` floors out hapax noise and `maxVocab` caps the collect at
    * the top-N types by frequency (deterministic tie-break on the word) —
    * a TakeOrdered, not a full sort. Without the cap, Heap's-law type
    * growth on noisy 100 TB text (10^8–10^9 types) would OOM the driver;
    * with it, training sees the mass of the distribution (vocabulary
    * learning never needed the tail) and driver memory is O(maxVocab). */
  def trainMerges(docs: DataFrame, textCol: Column, numMerges: Int,
      minCount: Long = 1, maxVocab: Int = 1 << 20): IndexedSeq[(String, String)] = {
    val wordCounts: Array[(Array[String], Long)] = docs
      .select(explode(TextFunctions.tokens(textCol)).as("w"))
      .groupBy("w").count()
      .filter(col("count") >= minCount)
      .orderBy(desc("count"), col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))

    var words = wordCounts
    val out = IndexedSeq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (parts, c) =>
        var i = 0
        while (i < parts.length - 1) {
          val k = (parts(i), parts(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        words = words.map { case (parts, c) => (mergePair(parts, best), c) }
        round += 1
      }
    }
    out.result()
  }

  /** Encode ONE word by applying each merge rule in learned order, one
    * greedy left-to-right pass per rule — exactly how [[trainMerges]]
    * evolves its dictionary, and the semantics [[BpeOracle]] reproduces in
    * DuckDB. The native encode ([[org.apache.spark.sql.graftnative.BpeTokens]])
    * instead merges the lowest-RANK adjacent pair first (the classic encode
    * loop); the two orders can differ only when a later rule materializes a
    * pair an earlier rule already passed over, which needs the same symbol
    * string to be producible by two different rules — BpeSpec proves the
    * encodes agree on every word of every test corpus, which is what
    * licenses the sequential oracle. */
  def encodeSequential(word: String, merges: IndexedSeq[(String, String)]): Array[String] = {
    var parts = word.map(_.toString).toArray
    merges.foreach(m => parts = mergePair(parts, m))
    parts
  }

  private def mergePair(parts: Array[String], pair: (String, String)): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < parts.length) {
      if (i < parts.length - 1 && parts(i) == pair._1 && parts(i + 1) == pair._2) {
        buf += parts(i) + parts(i + 1)
        i += 2
      } else {
        buf += parts(i)
        i += 1
      }
    }
    buf.toArray
  }

  /** BPE token array of `text` under `merges`. */
  def tokens(text: Column, merges: IndexedSeq[(String, String)]): Column =
    org.apache.spark.sql.graftnative.TextExpressions.bpeTokens(text, merges)

  /** Token count under the learned vocabulary. */
  def tokenCount(text: Column, merges: IndexedSeq[(String, String)]): Column =
    size(tokens(text, merges))
}
