package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftOps

import graft.SparkSpec

/** q216's KMV sketch: two contracts that BENCH and the sf-scale oracle
  * cannot see.
  *
  * 1. Plan shape — the "one distributed pass" claim rests on the
  *    row_number ≤ k idiom lowering to the heap operator. A regression
  *    back to a full per-source Window sort stays green on correctness
  *    (same rows) while re-sorting the whole corpus per source, so the
  *    plan itself is pinned here.
  * 2. Hash width — a KMV estimator saturates once distinct values
  *    approach the hash-space size: every source's hash set blankets
  *    the space, every sketch converges to the same k minima, and
  *    est_jaccard → 1.0 for DISJOINT sources with no error signal.
  *    That is exactly why the production hash is 60-bit (saturation at
  *    ~1.2e18 distinct shingles, four orders of magnitude past a 100 TB
  *    corpus) and not the 32-bit spelling the rest of the md5 family
  *    uses (saturation at ~4e9 — i.e. AT the design point). The second
  *    test reproduces the failure mode empirically in a deliberately
  *    tiny space and shows the 60-bit hash stays calibrated on the same
  *    corpus.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  /** sourceOverlapSketch's driver-side estimation arithmetic, verbatim,
    * over an arbitrary (source, h) frame — so the saturation test
    * exercises the same estimator with a controlled hash. */
  private def kmvEstimate(hashed: DataFrame, k: Int): Map[(String, String), Double] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h")
    val sketches = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("source", "h")
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).toSet }
    val names = sketches.keys.toSeq.sorted
    (for {
      a <- names; b <- names if a < b
      unionK = (sketches(a) | sketches(b)).toSeq.sorted.take(k) if unionK.nonEmpty
    } yield (a, b) ->
      unionK.count(v => sketches(a)(v) && sketches(b)(v)).toDouble / unionK.size).toMap
  }

  /** Two sources with fully disjoint shingle vocabularies: one doc per
    * source whose tokens are source-prefixed, so every 3-shingle is
    * distinct within a source and shared by neither. */
  private lazy val disjointDocs: DataFrame = {
    def text(prefix: String, n: Int) = (0 until n).map(p => s"$prefix$p").mkString(" ")
    Seq(("srcA", text("a", 5001)), ("srcB", text("b", 5001)))
      .toDF("source", "text")
  }

  test("sketch stage plans through the heap operator, no per-source sort") {
    GraftOps.enableTopKRewrite(spark)
    val stage = CorpusQueries.kmvSketchStage(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), 256)
    val physical = stage.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), s"no heap operator in:\n$physical")
    assert(!physical.contains("Window"), s"window survived in:\n$physical")
    assert(!physical.contains("Sort"), s"sort survived in:\n$physical")
    // and the stage really is k-bounded per source
    val counts = stage.groupBy("source").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) <= 256))
  }

  test("60-bit hash stays calibrated where a saturated space lies") {
    GraftOps.enableTopKRewrite(spark)
    val k = 128
    // ~5k distinct shingles per source, disjoint across sources.
    val prod = CorpusQueries.kmvSketchStage(disjointDocs, k)
      .collect().groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getLong(1)).toSet }
    val unionK = (prod("srcA") | prod("srcB")).toSeq.sorted.take(k)
    val est60 = unionK.count(v => prod("srcA")(v) && prod("srcB")(v)).toDouble / unionK.size
    assert(est60 === 0.0, s"60-bit KMV must report 0 for disjoint sources, got $est60")

    // The SAME estimator in a 512-value space: ~5k distinct shingles
    // blanket the space on both sides, the two sketches converge to the
    // same k minima, and the estimate reads near-total overlap for the
    // SAME disjoint corpus. This is the 32-bit failure mode at 100 TB,
    // scaled down so a spec can watch it happen.
    val tinyHashed = disjointDocs
      .select(col("source"),
        explode(array_distinct(graft.text.TextFunctions.shingles(col("text"), 3))).as("shingle"))
      .select(col("source"), pmod(xxhash64(col("shingle")), lit(512L)).cast("long").as("h"))
      .distinct()
    val estTiny = kmvEstimate(tinyHashed, k)(("srcA", "srcB"))
    assert(estTiny > 0.8,
      s"saturated-space estimate should approach 1.0 for disjoint sources, got $estTiny")
  }
}
