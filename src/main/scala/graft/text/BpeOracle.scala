package graft.text

/** Generates the DuckDB oracle for the BPE-tokenize driver query
  * (q47): given the merge table [[Bpe.trainMerges]] learned from the
  * corpus, emit SQL that re-tokenizes every document FROM SCRATCH in
  * DuckDB — whitespace pre-tokenization, characters as initial symbols,
  * then the merge rules applied in learned order, one greedy
  * left-to-right pass per rule (the [[Bpe.encodeSequential]] semantics;
  * BpeSpec proves the native rank-order encode agrees on these corpora).
  *
  * Same pattern as the generated SimHash oracle: training is shared
  * (deterministic, corpus-derived), but the ENCODE hot path — the native
  * [[org.apache.spark.sql.graftnative.BpeTokens]] expression — is
  * reproduced independently, symbol by symbol, by a different engine.
  *
  * One merge rule (a, b) is one `list_reduce` over a word's symbol list
  * (kept as a space-joined string; symbols never contain whitespace —
  * they are concatenations of word characters): append each symbol,
  * except that a symbol equal to `b` arriving while the accumulator ends
  * with element `a` fuses into `a||b` (appending just `b`). A fused
  * element can never fuse again in the same pass (that would need
  * `a||b == a`), which is exactly the single-pass greedy scan.
  *
  * Encoding runs over DISTINCT words — the corpus draws from a bounded
  * vocabulary, so the 64-rule chain touches a few hundred rows, and
  * per-document counts come from joining occurrences back to the encoded
  * vocabulary.
  */
object BpeOracle {

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `s` rewritten by one merge rule — a `list_reduce` fold over the
    * space-joined symbol string. */
  private def mergeStep(a: String, b: String): String = {
    val la = lit(a); val lb = lit(b)
    // single-symbol accumulator (acc = a) vs last-element match
    s"list_reduce(string_split(s, ' '), (acc, x) -> " +
      s"CASE WHEN x = $lb AND (acc = $la OR ends_with(acc, ' ' || $la)) " +
      s"THEN acc || $lb ELSE acc || ' ' || x END)"
  }

  def sql(merges: IndexedSeq[(String, String)]): String = {
    val steps = merges.zipWithIndex.map { case ((a, b), i) =>
      s"m${i + 1} AS (SELECT w, ${mergeStep(a, b)} AS s FROM m$i)"
    }
    val last = s"m${merges.length}"
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
       |), occ AS (
       |  SELECT doc_id, w FROM (SELECT doc_id, unnest(ws) AS w FROM toks) WHERE w <> ''
       |), m0 AS (
       |  SELECT w, array_to_string(split(w, ''), ' ') AS s FROM (SELECT DISTINCT w FROM occ)
       |), ${steps.mkString(",\n")},
       |wtok AS (
       |  SELECT w, len(string_split(s, ' ')) AS ntok FROM $last
       |), counts AS (
       |  SELECT o.doc_id, SUM(k.ntok) AS bpe_tokens, COUNT(*) AS words
       |  FROM occ o JOIN wtok k USING (w) GROUP BY o.doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(c.bpe_tokens, 0) AS BIGINT) AS bpe_tokens,
       |  CAST(COALESCE(c.words, 0) AS BIGINT) AS words
       |FROM documents d LEFT JOIN counts c USING (doc_id)""".stripMargin
  }
}
