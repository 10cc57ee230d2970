package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](text: String, c: org.apache.spark.sql.Column): T =
    Seq(text).toDF("text").select(c.as("r")).head().getAs[T]("r")

  test("token and char counts, including empty and whitespace-only text") {
    assert(one[Int]("a bb  ccc", TextFunctions.tokenCount(col("text"))) === 3)
    assert(one[Int]("", TextFunctions.tokenCount(col("text"))) === 0)
    assert(one[Int]("   ", TextFunctions.tokenCount(col("text"))) === 0)
    assert(one[Int]("a,b c!", TextFunctions.bpeTokenCount(col("text"))) === 5)
  }

  test("rollingHash: reference value, determinism, empty guard") {
    // h("ab") = ((0*31 + 97) * 31 + 98) mod 1e9+7 = 3105
    assert(one[Long]("ab", TextFunctions.rollingHash(col("text"))) === 3105L)
    assert(one[Long]("", TextFunctions.rollingHash(col("text"))) === 0L)
    assert(one[Long]("spark", TextFunctions.rollingHash(col("text"))) ===
      one[Long]("spark", TextFunctions.rollingHash(col("text"))))
    assert(one[Long]("spark", TextFunctions.rollingHash(col("text"))) !==
      one[Long]("sparks", TextFunctions.rollingHash(col("text"))))
  }

  test("contentHash is md5; tokenSetFingerprint is order-insensitive") {
    assert(one[String]("hello", TextFunctions.contentHash(col("text"))) ===
      "5d41402abc4b2a76b9719d911017c592")
    val a = one[String]("x y z", TextFunctions.tokenSetFingerprint(col("text")))
    val b = one[String]("z x y x", TextFunctions.tokenSetFingerprint(col("text")))
    assert(a === b)
  }

  test("langId picks marker language; unknown when no markers") {
    assert(one[String]("the cat and the dog", TextFunctions.langId(col("text"))) === "en")
    assert(one[String]("der hund und die katze", TextFunctions.langId(col("text"))) === "de")
    assert(one[String]("zzz qqq", TextFunctions.langId(col("text"))) === "unknown")
  }

  test("shingles: boundaries at n-1, n, n+1 tokens") {
    def sh(t: String) = Seq(t).toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("r"))
      .head().getSeq[String](0).toList
    assert(sh("a b") === Seq.empty)
    assert(sh("a b c") === Seq("a b c"))
    assert(sh("a b c d") === Seq("a b c", "b c d"))
    assert(sh("") === Seq.empty)
  }

  test("qualityScore stays in [0,1] and rewards longer clean text") {
    val short = one[Double]("hi", TextFunctions.qualityScore(col("text")))
    val long = one[Double](
      ("the quick brown fox and a dog " * 10).trim,
      TextFunctions.qualityScore(col("text")))
    assert(short >= 0.0 && short <= 1.0)
    assert(long >= 0.0 && long <= 1.0)
    assert(long > short)
  }

  test("repetition signals: dup-token ratio and top-2-gram fraction") {
    // "a b a b a": 5 tokens, 2 distinct → dup = 1 - 2/5 = 0.6;
    // 2-grams = [a b, b a, a b, b a] → top fraction 2/4 = 0.5
    assert(one[Double]("a b a b a", TextFunctions.dupTokenRatio(col("text"))) === 0.6)
    assert(one[Double]("a b a b a", TextFunctions.top2GramFraction(col("text"))) === 0.5)
    // all-distinct text: dup 0, every 2-gram unique → 1/3
    assert(one[Double]("w x y z", TextFunctions.dupTokenRatio(col("text"))) === 0.0)
    assert(one[Double]("w x y z", TextFunctions.top2GramFraction(col("text"))) === 1.0 / 3)
    // degenerate repetition maxes both signals
    assert(one[Double]("spam spam spam spam", TextFunctions.dupTokenRatio(col("text"))) === 0.75)
    assert(one[Double]("spam spam spam spam", TextFunctions.top2GramFraction(col("text"))) === 1.0)
    // fewer than two tokens: no grams, fraction 0
    assert(one[Double]("solo", TextFunctions.top2GramFraction(col("text"))) === 0.0)
  }

  test("sortedIntersectCount equals array_intersect size on sorted sets") {
    import org.apache.spark.sql.graftnative.TextExpressions.sortedIntersectCount
    val df = Seq(
      (Seq("a", "b", "c", "e"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq("x"), Seq.empty[String]),
      (Seq("p", "q"), Seq("p", "q")),
      (Seq("aa", "ab"), Seq("ac", "ad"))).toDF("a", "b")
    val got = df.select(
      sortedIntersectCount(col("a"), col("b")).as("m"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
    // stays inside whole-stage codegen (the point of doGenCode) — force a
    // non-local plan first (LocalTableScan folds projections eagerly)
    val q = df.repartition(2).select(sortedIntersectCount(col("a"), col("b")))
    q.collect() // finalize the adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    // "*(n) Project" is the compact WholeStageCodegen marker
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project.*graft_sorted_intersect_count.*"), plan)
  }

  test("scrubbed: URLs and emails replaced, whitespace normalized") {
    assert(one[String](
      "see https://ex.com/a?b=1 or www.ex.org and mail bob.smith+x@ex-mail.co.uk now",
      TextFunctions.scrubbed(col("text"))) ===
      "see <URL> or <URL> and mail <EMAIL> now")
    assert(one[String]("  spaced\tout\n\ntext  ", TextFunctions.scrubbed(col("text"))) ===
      "spaced out text")
    // text without PII passes through (modulo whitespace normalization)
    assert(one[String]("plain words only", TextFunctions.scrubbed(col("text"))) ===
      "plain words only")
  }

  test("canonicalUrl: case, default ports, param order, fragments") {
    def canon(u: String) = one[String](u, TextFunctions.canonicalUrl(col("text")))
    assert(canon("HTTPS://Ex.COM:443/P?b=2&a=1#frag") === "https://ex.com/P?a=1&b=2")
    assert(canon("http://EX.com:80/x") === "http://ex.com/x")
    // non-default port survives; path case survives; no query → no '?'
    assert(canon("http://ex.com:8080/x#f") === "http://ex.com:8080/x")
    assert(canon("https://ex.com/") === "https://ex.com/")
    // :443 on plain http is NOT a default port — kept
    assert(canon("http://ex.com:443/x") === "http://ex.com:443/x")
    // malformed (no scheme) passes through untouched
    assert(canon("not a url") === "not a url")
  }

  test("piiRedacted: typed placeholders per category, counts audit") {
    val s = "mail a.b@ex.com call +1 555-123-4567 ssn 078-05-1120 host 192.168.0.1 done"
    assert(one[String](s, TextFunctions.piiRedacted(col("text"))) ===
      "mail <EMAIL> call <PHONE> ssn <SSN> host <IP> done")
    assert(one[Long](s, TextFunctions.piiCount(col("text"), "EMAIL")) === 1L)
    assert(one[Long](s, TextFunctions.piiCount(col("text"), "PHONE")) === 1L)
    assert(one[Long](s, TextFunctions.piiCount(col("text"), "SSN")) === 1L)
    assert(one[Long](s, TextFunctions.piiCount(col("text"), "IP")) === 1L)
    // the phone's digit run must NOT be eaten by the SSN shape
    assert(one[Long]("x +1 555-123-4567 y", TextFunctions.piiCount(col("text"), "SSN")) === 0L)
    assert(one[String]("no pii here", TextFunctions.piiRedacted(col("text"))) ===
      "no pii here")
  }
}
