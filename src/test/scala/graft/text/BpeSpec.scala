package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "low lower lowest low low"),
    (2L, "newer newest new news low"),
    (3L, "widest wider wide low lower")
  ).toDF("doc_id", "text")

  /** Driver-side reference encode — independent of the expression. */
  private def refEncode(word: String, merges: IndexedSeq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var parts = word.map(_.toString).toVector
    var changed = true
    while (changed && parts.length > 1) {
      val ranked = parts.zip(parts.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (ranked.isEmpty) changed = false
      else {
        val (_, i) = ranked.minBy(_._1)
        parts = (parts.take(i) :+ (parts(i) + parts(i + 1))) ++ parts.drop(i + 2)
      }
    }
    parts
  }

  test("training is deterministic and learns frequent pairs first") {
    val m1 = Bpe.trainMerges(docs, col("text"), 16)
    val m2 = Bpe.trainMerges(docs, col("text"), 16)
    assert(m1 === m2)
    assert(m1.nonEmpty)
    // 'l'+'o' and then 'lo'+'w' must appear early: "low" dominates the corpus
    assert(m1.take(4).contains(("l", "o")))
    assert(m1.exists { case (a, b) => a + b == "low" })
  }

  test("expression encode matches the reference implementation per word") {
    val merges = Bpe.trainMerges(docs, col("text"), 16)
    val got = docs.select(col("doc_id"), Bpe.tokens(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val expect = text.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => refEncode(w, merges))
      assert(got(id) === expect, s"doc $id")
    }
  }

  test("rank-order encode equals sequential per-rule encode on every corpus word") {
    // The generated q47 DuckDB oracle applies merges sequentially (one
    // greedy pass per rule); the native expression merges by learned rank.
    // The orders can only diverge on adversarial vocabularies (same symbol
    // string producible by two different rules) — prove they agree on every
    // DISTINCT word of every test corpus, which is what licenses the oracle.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val real = spark.read.parquet(s"$dir/documents.parquet")
      val merges = Bpe.trainMerges(real, col("text"), 64)
      val words = real.select(explode(TextFunctions.tokens(col("text"))).as("w"))
        .distinct().as[String].collect()
      assert(words.nonEmpty)
      words.foreach { w =>
        val seqEnc = Bpe.encodeSequential(w, merges).toSeq
        assert(refEncode(w, merges) === seqEnc, s"word '$w' in $dir")
      }
    }
  }

  test("generated oracle SQL embeds every merge rule") {
    val merges = Bpe.trainMerges(docs, col("text"), 16)
    val sql = BpeOracle.sql(merges)
    assert(sql.contains("FROM documents"))
    merges.foreach { case (a, b) =>
      assert(sql.contains(s"'${a}'") && sql.contains(s"'${b}'"))
    }
    assert(sql.split("list_reduce").length === merges.length + 1)
  }

  test("vocabulary collection is capped independent of corpus size") {
    // 1 frequent word + unique hapax words per doc; with maxVocab=1 and a
    // frequency floor, training must see ONLY the frequent word — merges
    // come from "shared" and never mention hapax-only characters.
    val noisy = (1L to 30L).map(i => (i, s"shared shared zq$i")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(noisy, col("text"), 16, minCount = 2, maxVocab = 1)
    assert(merges.nonEmpty)
    assert(merges.exists { case (a, b) => (a + b).contains("sh") })
    merges.foreach { case (a, b) =>
      assert(!(a + b).contains("z") && !(a + b).contains("q"),
        s"hapax characters leaked into merge ($a,$b)")
    }
    // identical corpus twice -> identical capped training (determinism)
    assert(merges === Bpe.trainMerges(noisy, col("text"), 16, minCount = 2, maxVocab = 1))
  }

  test("more merges never increase the token count; zero merges = chars") {
    val m8 = Bpe.trainMerges(docs, col("text"), 8)
    val m32 = Bpe.trainMerges(docs, col("text"), 32)
    val counts = docs.select(
      Bpe.tokenCount(col("text"), IndexedSeq.empty).as("c0"),
      Bpe.tokenCount(col("text"), m8).as("c8"),
      Bpe.tokenCount(col("text"), m32).as("c32"),
      length(regexp_replace(col("text"), "\\s+", "")).as("chars")).collect()
    counts.foreach { r =>
      assert(r.getAs[Int]("c0") === r.getAs[Int]("chars"))
      assert(r.getAs[Int]("c8") <= r.getAs[Int]("c0"))
      assert(r.getAs[Int]("c32") <= r.getAs[Int]("c8"))
    }
  }
}
