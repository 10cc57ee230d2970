package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale corpus pipelines: token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  * Everything is a pure `functions._` expression — codegen'd, no UDFs — and
  * per-row, so it scales embarrassingly (no shuffle) over any corpus size.
  *
  * Beyond-reference surface (builder prompt): the reference stores documents
  * only as CDC payloads; these are the operations a training-data pipeline
  * runs over a 100 TB text corpus.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (empty tokens dropped). Native
    * single-pass expression — a 1-gram shingle — instead of the interpreted
    * split + filter-lambda chain. */
  def tokens(text: Column): Column =
    org.apache.spark.sql.graftnative.TextExpressions.wordShingles(text, 1)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer count: alnum runs + isolated non-space symbols —
    * the usual "word or punctuation" split LLM tokenizers start from. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  def charCount(text: Column): Column = length(text)

  /** Fraction of non-alnum, non-space characters. */
  def punctRatio(text: Column): Column =
    (charCount(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", "")))
      .cast("double") / greatest(charCount(text), lit(1))

  private val StopwordList = Seq("the", "a", "an", "and", "of", "to", "in")

  /** Fraction of tokens that are stopwords — a standard quality signal. */
  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(StopwordList)))
      .cast("double") / greatest(tokenCount(text), lit(1))

  /** Mean token length (whitespace removed / token count). */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1))

  /** Composite quality score in [0,1]: long-enough, low punctuation, sane
    * stopword density — the length/punct/stopword recipe quality filters
    * (e.g. C4/Gopher rules) compose. Deterministic arithmetic only. */
  def qualityScore(text: Column): Column = {
    val lenOk = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val stopOk = least(stopwordRatio(text) * 5.0, lit(1.0))
    (lenOk + punctOk + stopOk) / 3.0
  }

  /** Fraction of tokens that repeat an earlier token: 1 − distinct/total.
    * The cheapest Gopher-style repetition signal — high values flag
    * boilerplate and degenerate generations. */
  def dupTokenRatio(text: Column): Column = {
    val ts = tokens(text)
    lit(1.0) - size(array_distinct(ts)).cast("double") / greatest(size(ts), lit(1))
  }

  /** Fraction of all word 2-grams occupied by the single most frequent
    * 2-gram (the Gopher repetition rule). Documents with fewer than two
    * tokens score 0. One native linear pass with a per-row count map
    * ([[org.apache.spark.sql.graftnative.TopGramFraction]]) — the
    * distinct × filter HOF phrasing was O(d·n) interpreted per row and
    * dominated the q57 bench. */
  def top2GramFraction(text: Column): Column =
    coalesce(
      org.apache.spark.sql.graftnative.TextExpressions.topGramFraction(text, 2),
      lit(0.0))

  /** Training-data hygiene scrub: URLs → `<URL>`, email addresses →
    * `<EMAIL>`, whitespace runs collapsed, ends trimmed. Pure
    * regexp_replace chain — codegen'd, per-row, no shuffle. */
  def scrubbed(text: Column): Column = {
    val noUrl = regexp_replace(text, "https?://\\S+|www\\.\\S+", "<URL>")
    val noMail = regexp_replace(noUrl,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    trim(regexp_replace(noMail, "\\s+", " "))
  }

  /** PII redaction patterns, applied in [[piiRedacted]]'s fixed order.
    * Deliberately RE2-safe (no lookaround/backreferences) so the exact
    * same patterns run identically under Java regex here and RE2-family
    * engines elsewhere — redacted output is engine-portable. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "PHONE" -> "\\+?\\d{1,2} \\d{3}-\\d{3}-\\d{4}",
    "SSN" -> "\\d{3}-\\d{2}-\\d{4}",
    "IP" -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}")

  /** PII scrub for training corpora: emails, phone numbers, SSN-shaped
    * ids and IPv4 addresses → typed placeholders, in a fixed order (phone
    * before SSN: the two digit shapes are disjoint by construction, but
    * the order is part of the contract). Pure regexp_replace chain —
    * codegen'd, per-row, shuffle-free, composes with [[scrubbed]]. */
  def piiRedacted(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (tag, pat)) =>
      regexp_replace(c, pat, s"<$tag>")
    }

  /** Occurrences of one [[PiiPatterns]] entry in `text` (pre-redaction
    * audit counts). */
  def piiCount(text: Column, tag: String): Column = {
    val pat = PiiPatterns.toMap.apply(tag)
    size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
  }

  /** URL canonicalization — the standard web-corpus normalization before
    * URL-keyed dedup (w3lib/trafilatura shape): scheme and host lowercase,
    * default ports stripped (`:80` http / `:443` https), query parameters
    * sorted so param order can't split identical pages, fragment dropped.
    * Pure string/array built-ins (regexp_extract, split, array_sort,
    * array_join) — codegen'd, per-row, engine-portable (the same steps
    * express 1:1 in any SQL dialect with list sort). Malformed URLs (no
    * `://`) pass through unchanged. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[^:]+://([^/?#]*)", 1))
    val host = when(
      (scheme === "https" && hostPort.endsWith(":443")) ||
        (scheme === "http" && hostPort.endsWith(":80")),
      regexp_replace(hostPort, ":[0-9]+$", "")).otherwise(hostPort)
    val path = regexp_extract(url, "^[^:]+://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val sortedQuery = array_join(array_sort(split(query, "&")), "&")
    when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
      concat(scheme, lit("://"), host, path,
        when(query =!= "", concat(lit("?"), sortedQuery)).otherwise(lit(""))))
      .otherwise(url)
  }

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** Marker-token language-ID heuristic: count stopword hits per language,
    * pick the first language (in fixed order en/de/es/fr) with the maximal
    * non-zero score. N-gram-profile LangID reduces to the same shape —
    * per-row feature counts + argmax — with a bigger marker table. */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(ts, t => t.isInCollection(markers)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown")) { case ((lang, s), rest) =>
      when(s === best && s > 0, lang).otherwise(rest)
    }
  }

  /** Polynomial rolling hash over characters, mod 1e9+7 — the classic
    * Rabin-Karp document fingerprint. One native codegen'd loop
    * ([[org.apache.spark.sql.graftnative.RollingHash]]) — the
    * aggregate(transform(sequence…)) phrasing allocated an index array and
    * a substring per character; values identical. Null text hashes to 0,
    * matching the previous guarded form. */
  def rollingHash(text: Column): Column =
    coalesce(
      org.apache.spark.sql.graftnative.TextExpressions.rollingHash(text),
      lit(0L))

  /** Content hash for exact dedup. */
  def contentHash(text: Column): Column = md5(text)

  /** Bag-of-words fingerprint: md5 of the sorted distinct token set. Groups
    * word-order permutations — the cheapest near-dup key. */
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Word n-gram shingles; documents shorter than n shingle to empty.
    * Native single-pass expression
    * ([[org.apache.spark.sql.graftnative.WordShingles]]) — the
    * transform+slice phrasing is O(tokens²) per row and interpreted. */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graftnative.TextExpressions.wordShingles(text, n)

  /** Winnowed fingerprint set (MOSS): distinct per-window minima of
    * position-encoded token-k-gram hashes. See
    * [[org.apache.spark.sql.graftnative.WinnowFingerprints]]. */
  def winnowPrints(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graftnative.TextExpressions.winnowFingerprints(text, k, w)
}
