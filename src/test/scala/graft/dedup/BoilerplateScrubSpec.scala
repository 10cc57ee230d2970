package graft.dedup

import graft.SparkSpec

/** Interdoc boilerplate scrub — q155 semantics on a corpus with planted
  * boilerplate structure:
  *   - docs 1/2 share their first 8-token segment (a "header") but have
  *     unique tails,
  *   - doc 3 is ONLY the header,
  *   - doc 4 is all-unique with a trailing short segment,
  *   - doc 5 contains the header OFFSET by one token (stride-anchored
  *     segmentation must NOT match — that case belongs to the positional
  *     span scrub, q110),
  *   - docs 6/7 are identical short docs (a trailing sub-8-token segment
  *     is a unit too),
  *   - doc 8 repeats a segment twice WITHIN itself only (df counts
  *     DISTINCT docs, so within-doc repetition is not boilerplate).
  */
class BoilerplateScrubSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "h1 h2 h3 h4 h5 h6 h7 h8 u1 u2 u3 u4 u5 u6 u7 u8"),
    (2L, "h1 h2 h3 h4 h5 h6 h7 h8 v1 v2 v3 v4 v5 v6 v7 v8"),
    (3L, "h1 h2 h3 h4 h5 h6 h7 h8"),
    (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
    (5L, "x1 h1 h2 h3 h4 h5 h6 h7 h8"),
    (6L, "t1 t2"),
    (7L, "t1 t2"),
    (8L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8")
  ).toDF("doc_id", "text")

  private lazy val byDoc =
    Dedup.boilerplateScrub(docs, segTokens = 8).collect()
      .map(r => r.getLong(0) -> r).toMap

  test("a segment shared by >= 2 distinct docs is removed from ALL of them") {
    assert(byDoc(1L).getAs[String]("cleaned_text") === "u1 u2 u3 u4 u5 u6 u7 u8")
    assert(byDoc(2L).getAs[String]("cleaned_text") === "v1 v2 v3 v4 v5 v6 v7 v8")
    assert(byDoc(1L).getAs[Long]("kept_segments") === 1L)
    // doc 3 was ONLY boilerplate — scrubbed to empty, still present
    assert(byDoc(3L).getAs[Long]("n_segments") === 1L)
    assert(byDoc(3L).getAs[Long]("kept_segments") === 0L)
    assert(byDoc(3L).getAs[String]("cleaned_text") === "")
  }

  test("unique docs pass through intact, trailing short segment included") {
    assert(byDoc(4L).getAs[Long]("n_segments") === 2L)
    assert(byDoc(4L).getAs[Long]("kept_segments") === 2L)
    assert(byDoc(4L).getAs[String]("cleaned_text") === "w1 w2 w3 w4 w5 w6 w7 w8 w9")
  }

  test("segmentation is stride-anchored: an offset copy of the header survives") {
    // the complementary positional pass (substringScrub) catches this one
    assert(byDoc(5L).getAs[Long]("kept_segments") === 2L)
    assert(byDoc(5L).getAs[String]("cleaned_text") === "x1 h1 h2 h3 h4 h5 h6 h7 h8")
  }

  test("short whole-doc duplicates die; within-doc repetition does not") {
    // docs 6/7: the 2-token trailing segment has df = 2 -> both emptied
    assert(byDoc(6L).getAs[Long]("kept_segments") === 0L)
    assert(byDoc(7L).getAs[Long]("kept_segments") === 0L)
    // doc 8: same segment at idx 0 and 1 but ONE distinct doc -> df = 1, kept
    assert(byDoc(8L).getAs[Long]("kept_segments") === 2L)
    assert(byDoc(8L).getAs[String]("cleaned_text") ===
      "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8")
  }
}
