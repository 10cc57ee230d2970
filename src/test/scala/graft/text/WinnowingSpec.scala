package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[org.apache.spark.sql.graftnative.WinnowFingerprints]] — brute-force
  * replay of the selection and the MOSS coverage guarantee. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val Mod = 1000000007L
  private def bruteWinnow(text: String, k: Int, w: Int): Seq[Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val grams = toks.sliding(k).filter(_.length == k).map(_.mkString(" ")).toArray
    val enc = grams.zipWithIndex.map { case (g, i) =>
      g.foldLeft(0L)((h, c) => (h * 31 + c) % Mod) * 65536L + (i + 1)
    }
    enc.sliding(w).filter(_.length == w).map(_.min).toSeq.distinct
  }

  test("expression matches the brute-force selection") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again and again",
      "alpha beta gamma delta epsilon zeta eta theta",
      "x x x x x x x x x x",       // all-identical grams: tie-break exercised
      "a b c d e f g h",           // exactly k+w-1 tokens → one window
      "too short here")            // below the floor → empty
    val got = texts.toDF("text")
      .select(TextFunctions.winnowPrints(col("text"), 4, 5).as("fps"))
      .collect().map(_.getSeq[Long](0).toSet)
    texts.zip(got).foreach { case (t, g) =>
      assert(g === bruteWinnow(t, 4, 5).toSet, s"text: $t")
    }
  }

  test("coverage guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    val shared = "one two three four five six seven eight" // 8 = w+k-1
    val a = s"prefix junk words here $shared trailing bits"
    val b = s"$shared completely different suffix tokens now"
    val Seq(fa, fb) = Seq(a, b).toDF("text")
      .select(TextFunctions.winnowPrints(col("text"), 4, 5).as("fps"))
      .collect().toSeq.map(_.getSeq[Long](0).map(_ / 65536L).toSet)
    assert((fa intersect fb).nonEmpty)
  }

  test("winnowPairs matches a collected posting-list recompute") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.trim.split("\\s+").count(_.nonEmpty) >= 8)
    val x = docs.flatMap { case (id, t) =>
      bruteWinnow(t, 4, 5).map(e => (e / 65536L, id)).distinct }
    val byFp = x.groupBy(_._1).map { case (h, xs) =>
      h -> xs.map(_._2).distinct.toSeq }
    val expect = byFp.values.filter(ds => ds.size >= 2 && ds.size <= 10)
      .flatMap(ds => for (a <- ds; b <- ds if a < b) yield (a, b))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 3)
    val got = graft.analytics.CorpusQueries.winnowPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
  }

  test("driver query q187 counts agree with a collected recompute") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.trim.split("\\s+").count(_.nonEmpty) >= 8)
    val fps = docs.map { case (id, t) => id -> bruteWinnow(t, 4, 5) }.toMap
    val postings = fps.toSeq.flatMap { case (id, es) =>
      es.map(e => (e / 65536L, id)) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.size }
    val expect = fps.map { case (id, es) =>
      id -> ((es.size.toLong,
        es.count(e => postings(e / 65536L) >= 2).toLong)) }
    val got = graft.analytics.CorpusQueries.winnowingFingerprints(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
  }
}
