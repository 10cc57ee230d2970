package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of whitespace-tokenized text, single pass.
  *
  * The `functions._` phrasing — `transform(sequence(1, L-n+1),
  * i => concat_ws(" ", slice(tokens, i, n)))` — is O(tokens²) per document
  * (each slice copies) and every lambda hop is interpreted; it was the
  * dominant cost of the dedup pipelines (shingling 5k docs took ~10 s).
  * This expression tokenizes once and emits all shingles in one linear
  * sweep. Interpreted-eval via CodegenFallback: the per-row work is real
  * string assembly, not expression dispatch, so codegen would add little.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Byte-pair-encoding tokenization against a learned merge table, as a
  * native expression (ROADMAP #5 — replaces the regex approximation for
  * callers that have a vocabulary). Words are whitespace-pretokenized, each
  * word starts as characters, and adjacent pairs merge greedily in learned
  * rank order — the standard BPE encode. The merge table rides the plan as
  * a reference object (the broadcast-vocabulary pattern); per-row work is
  * real string assembly, so CodegenFallback like [[WordShingles]].
  *
  * Emits the token array; `size(...)` gives the BPE token count.
  */
case class BpeTokens(child: Expression, merges: IndexedSeq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + "\u0000" + b, i) }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe"

  private def encodeWord(word: String, out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var parts = word.map(_.toString).toBuffer
    var done = parts.length < 2
    while (!done) {
      // lowest-rank adjacent pair merges first — BPE's learned order
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = rank.get(parts(i) + "\u0000" + parts(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        parts(bestIdx) = parts(bestIdx) + parts(bestIdx + 1)
        parts.remove(bestIdx + 1)
        if (parts.length < 2) done = true
      }
    }
    parts.foreach(p => out += UTF8String.fromString(p))
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    words.foreach(encodeWord(_, out))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** Rabin-Karp rolling hash over the characters of a string:
  * `acc ← (acc·31 + char) mod 1e9+7`, sequential left-to-right — one
  * codegen'd loop. The `functions._` phrasing
  * (`aggregate(transform(sequence(1, L), i → ascii(substr(i, 1))), …)`)
  * allocates an index array and a substring per character and dispatches
  * two interpreted lambdas per step; value-identical (same integer
  * recurrence, same modulus) but ~an order of magnitude cheaper per row.
  * Characters are UTF-16 code units to match `ascii(substr)` on ASCII
  * corpora; empty/null handled as 0 by the caller. */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |String $s = $v.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31 + $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Mass of the most frequent word n-gram: max count / total n-grams, 0.0
  * below n tokens — the Gopher repetition rule as ONE linear pass with a
  * per-row hash map. The `functions._` phrasing
  * (`array_max(transform(array_distinct(g), x -> size(filter(g, y -> …))))`)
  * is O(distinct × grams) interpreted lambda hops per row — it was ~80% of
  * the q57 bench cost. Numerically identical: counts and division only. */
case class TopGramFraction(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_top_gram_fraction"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    val sb = new java.lang.StringBuilder
    var maxCount = 0
    var i = 0
    val total = toks.length - n + 1
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > maxCount) maxCount = c
      i += 1
    }
    maxCount.toDouble / total
  }

  override protected def withNewChildInternal(newChild: Expression): TopGramFraction =
    copy(child = newChild)
}

/** Intersection size of two SORTED string arrays by a single merge pass —
  * the verification kernel of the jaccard dedup pipelines. `array_intersect`
  * builds a hash set PER ROW (it was ~half the verify-stage cost at 310k
  * candidate pairs); the merge does ~|a|+|b| binary UTF8String comparisons
  * with zero allocation. Inputs must be duplicate-free and sorted in
  * Spark's binary string order (`array_sort`) — the caller's shingle-set
  * builder guarantees both. Exact string identity: no hashing, so the
  * result matches the oracle's true set intersection by construction. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0; var j = 0; var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken SIGMOD'03,
  * the MOSS scheme) in ONE linear pass per document: token `k`-grams are
  * hashed with the base-31 mod 1e9+7 polynomial (the repo's portable
  * rolling-hash convention, replicated verbatim by the DuckDB oracle),
  * each hash is position-encoded as `h·2^16 + pos` (pos 1-based) so the
  * per-window minimum breaks ties deterministically toward the leftmost
  * occurrence, and a sliding window of `w` keeps each window's minimum.
  * Emits the DISTINCT encoded minima.
  *
  * Exists as a native expression because the `functions._` phrasing —
  * nested transform/aggregate/slice lambdas over aliased arrays — is
  * re-inlined by projection collapse into an O(grams³)-ish interpreted
  * tree (observed: one sf0.01 partition pinned a core for 12+ minutes);
  * here the whole selection is O(text) per row. CodegenFallback as
  * [[WordShingles]]: the work is real hashing, not dispatch. Guarantee
  * carried: any shared token run of length ≥ w+k-1 between two docs
  * shares at least one selected fingerprint. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "winnowing needs k >= 1 and w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  private val Mod = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim
      .split("\\s+").filter(_.nonEmpty)
    val nGrams = toks.length - k + 1
    val nWin = nGrams - w + 1
    if (nWin < 1) return new GenericArrayData(Array.empty[Any])
    // encoded gram hashes: h·2^16 + (i+1)
    val enc = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      var h = 0L
      var c = 0
      val len = sb.length
      while (c < len) {
        // codepoint-stepped to match the oracle's character semantics
        val cp = sb.codePointAt(c)
        h = (h * 31 + cp) % Mod
        c += Character.charCount(cp)
      }
      enc(i) = h * 65536L + (i + 1)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s < nWin) {
      var m = enc(s)
      var j = 1
      while (j < w) { if (enc(s + j) < m) m = enc(s + j); j += 1 }
      seen.add(m)
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object TextExpressions {
  def wordShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(text), k, w))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def topGramFraction(text: Column, n: Int): Column =
    ExpressionUtils.column(TopGramFraction(ExpressionUtils.expression(text), n))

  def bpeTokens(text: Column, merges: IndexedSeq[(String, String)]): Column =
    ExpressionUtils.column(BpeTokens(ExpressionUtils.expression(text), merges))

  def rollingHash(text: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(text)))
}
