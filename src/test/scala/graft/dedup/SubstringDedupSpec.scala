package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Substring-level (positional) dedup — q109/q110 semantics on a corpus
  * with planted span structure:
  *   - doc 1 and doc 2 share their first 8-token span (cross-document dup;
  *     doc 1's site is globally first),
  *   - doc 3 is all-unique,
  *   - doc 4 repeats an 8-token phrase twice WITHIN itself,
  *   - doc 5 is too short to form a single window.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "a b c d e f g h x y"),
    (3L, "p q r s t u v w z1 z2"),
    (4L, "m1 m2 m3 m4 m5 m6 m7 m8 m1 m2 m3 m4 m5 m6 m7 m8"),
    (5L, "s1 s2")
  ).toDF("doc_id", "text")

  private def statsByDoc =
    Dedup.substringDupStats(docs, windowTokens = 8).collect()
      .map(r => r.getLong(0) -> r).toMap

  private def scrubByDoc =
    Dedup.substringScrub(docs, windowTokens = 8).collect()
      .map(r => r.getLong(0) -> r).toMap

  test("substringDupStats counts duplicated window sites per document") {
    val s = statsByDoc
    assert(s.keySet === Set(1L, 2L, 3L, 4L, 5L)) // every doc appears
    // docs 1/2: 3 windows each (10 tokens), exactly the shared first window dup
    assert(s(1L).getAs[Long]("n_windows") === 3L)
    assert(s(1L).getAs[Long]("dup_windows") === 1L)
    assert(s(2L).getAs[Long]("dup_windows") === 1L)
    // doc 3: unique everywhere
    assert(s(3L).getAs[Long]("dup_windows") === 0L)
    assert(s(3L).getAs[Double]("dup_frac") === 0.0)
    // doc 4: 9 windows over 16 periodic tokens; sites i=1 and i=9 share text
    assert(s(4L).getAs[Long]("n_windows") === 9L)
    assert(s(4L).getAs[Long]("dup_windows") === 2L)
    // doc 5: too short for any window — present with zeros, frac 0.0
    assert(s(5L).getAs[Long]("n_windows") === 0L)
    assert(s(5L).getAs[Double]("dup_frac") === 0.0)
  }

  test("substringScrub removes later occurrences, keeps the globally first") {
    val s = scrubByDoc
    // doc 1 owns the first site of the shared span — fully intact
    assert(s(1L).getAs[Long]("kept_tokens") === 10L)
    assert(s(1L).getAs[String]("cleaned_text") === "a b c d e f g h i j")
    // doc 2 loses tokens 1..8, keeps its unique tail
    assert(s(2L).getAs[Long]("kept_tokens") === 2L)
    assert(s(2L).getAs[String]("cleaned_text") === "x y")
    // doc 3 untouched
    assert(s(3L).getAs[String]("cleaned_text") === "p q r s t u v w z1 z2")
    // doc 4's second in-document occurrence (positions 9..16) is spliced out
    assert(s(4L).getAs[Long]("n_tokens") === 16L)
    assert(s(4L).getAs[Long]("kept_tokens") === 8L)
    assert(s(4L).getAs[String]("cleaned_text") === "m1 m2 m3 m4 m5 m6 m7 m8")
    // doc 5 short doc passes through
    assert(s(5L).getAs[String]("cleaned_text") === "s1 s2")
  }

  test("semanticDedupKeepers drops higher-id near-dups within a cluster only") {
    // cluster 0: ids 1,2 nearly identical (cos≈1), id 3 orthogonal;
    // cluster 1: id 4 IDENTICAL to id 1 but in another cluster — survives;
    //            ids 5,6,7 mutually identical — only the lowest id survives
    val members = Seq(
      (1L, 0L, Seq(1.0, 0.0, 0.0)),
      (2L, 0L, Seq(0.999, 0.001, 0.0)),
      (3L, 0L, Seq(0.0, 1.0, 0.0)),
      (4L, 1L, Seq(1.0, 0.0, 0.0)),
      (5L, 1L, Seq(0.0, 0.0, 1.0)),
      (6L, 1L, Seq(0.0, 0.0, 1.0)),
      (7L, 1L, Seq(0.0, 0.0, 1.0))
    ).toDF("vec_id", "centroid_id", "vec")
    val kept = Dedup.semanticDedupKeepers(members, tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 5L))
  }

  test("semanticDedupKeepers exact-dup collapse matches the direct quadratic on dup-heavy input") {
    // The collapsed path must be row-identical to the naive all-pairs rule;
    // byte-exact duplicate groups are exactly what the collapse rewrites.
    val rnd = new scala.util.Random(7)
    val base = (0 until 12).map(_ => Seq.fill(4)(rnd.nextGaussian()))
    val rows = (0 until 120).map { i =>
      val v =
        if (i % 3 == 0) base(i % base.size)                 // exact duplicate groups
        else Seq.fill(4)(rnd.nextGaussian())
      (i.toLong, (i % 5).toLong, v)
    }
    val members = rows.toDF("vec_id", "centroid_id", "vec")
    def directKeepers(tau: Double): Set[(Long, Long)] = {
      import org.apache.spark.sql.functions.col
      val a = members.select(col("centroid_id"), col("vec_id").as("a_id"),
        col("vec").as("a_vec"))
      val b = members.select(col("centroid_id"), col("vec_id").as("b_id"),
        col("vec").as("b_vec"))
      val dropped = a.join(b, "centroid_id")
        .filter(col("a_id") < col("b_id"))
        .filter(Dedup.cosine(col("a_vec"), col("b_vec")) >= tau)
        .select(col("b_id").as("vec_id")).distinct()
      members.join(dropped, Seq("vec_id"), "left_anti")
        .select("vec_id", "centroid_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for (tau <- Seq(0.3, 0.7, 0.95)) {
      val collapsed = Dedup.semanticDedupKeepers(members, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(collapsed === directKeepers(tau), s"diverged at tau=$tau")
    }
  }

  test("semanticDedupKeepers: a lone zero vector in its own cluster evaluates no cosine") {
    // ANSI parity with the direct quadratic: a singleton cluster never
    // joins into a pair there, so its (possibly zero) vector never reaches
    // the divide — the collapsed path's self-cosine term must be equally
    // lazy instead of erroring the whole job on one degenerate row.
    val members = Seq(
      (1L, 0L, Seq(1.0, 0.0)), (2L, 0L, Seq(1.0, 0.0)),
      (9L, 7L, Seq(0.0, 0.0))  // zero vector, alone in cluster 7
    ).toDF("vec_id", "centroid_id", "vec")
    val kept = Dedup.semanticDedupKeepers(members, tau = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 9L))
  }
}
