package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plain SQL over a registered graft view must get the same dir-level
  * skipping `where()` performs — proven by inspecting the OPTIMIZED
  * plan's scan relation (how many dir paths survived), not row counts,
  * since the filter on top hides pruning from the result. */
class SqlSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** Dir paths the optimized plan's parquet scan would list. */
  private def scanDirs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case r: HadoopFsRelation => r.location.rootPaths.size
        case _ => 0
      }
    }.sum

  test("SQL WHERE prunes dirs through the registered view") {
    val root = tmpDir("sqlskip")
    def rows(lo: Long, hi: Long, pfx: String) =
      (lo to hi).map(i => (i, f"$pfx-$i%05d", i * 1.0)).toDF("id", "doc_id", "x")
    val t = GraftTable.create(spark, root, rows(1, 1000, "alpha"))
    t.append(rows(1001, 2000, "bravo"))
    t.append(rows(2001, 3000, "charlie"))
    t.append(rows(3001, 4000, "delta"))
    t.view("skip_docs")

    // numeric range: one dir survives in the scan's listing
    val range = spark.sql(
      "SELECT * FROM skip_docs WHERE id BETWEEN 1200 AND 1300")
    assert(scanDirs(range) < 4, s"range not pruned: ${scanDirs(range)} dirs")
    assert(range.count() === 101)

    // string prefix via LIKE 'x%' (optimizer turns it into StartsWith)
    val like = spark.sql(
      "SELECT count(*) AS n FROM skip_docs WHERE doc_id LIKE 'charlie%'")
    assert(scanDirs(like) < 4, "LIKE prefix not pruned")
    assert(like.head().getLong(0) === 1000L)

    // disjunction keeps both branch dirs, drops the others
    val or = spark.sql(
      "SELECT * FROM skip_docs WHERE id = 1500 OR id = 3500")
    assert(scanDirs(or) === 2, s"OR kept ${scanDirs(or)} dirs")
    assert(or.count() === 2)

    // an opaque predicate scans everything and stays correct
    val opaque = spark.sql(
      "SELECT * FROM skip_docs WHERE length(doc_id) = 11")
    assert(scanDirs(opaque) === 4, "opaque predicate must not prune")
    assert(opaque.count() === 3000) // charlie ids are 13 chars

    // aggregate over a pruned scan matches the unpruned answer
    val agg = spark.sql(
      "SELECT sum(x) AS s FROM skip_docs WHERE id BETWEEN 2001 AND 3000")
    assert(scanDirs(agg) === 1)
    assert(agg.head().getDouble(0) === (2001L to 3000L).map(_ * 1.0).sum)
  }

  test("SQL point lookups consult bloom sidecars through the view") {
    val root = tmpDir("sqlskip-bloom")
    def rows(k: Long) = (1L to 4000L).filter(_ % 4 == k).map(i => (i, i * 1.0))
      .toDF("id", "x")
    val t = GraftTable.create(spark, root, rows(0))
    t.append(rows(1)); t.append(rows(2)); t.append(rows(3))
    t.buildBloomIndex("id")
    t.view("skip_kv")
    // interleaved keys: range stats can't skip, only the bloom can
    val needle = spark.sql("SELECT * FROM skip_kv WHERE id = 10")
    assert(scanDirs(needle) < 4, "bloom sidecar not consulted from SQL")
    assert(needle.count() === 1)
    // a 12-key IN list becomes InSet past the conversion threshold; all
    // needles live in the k≡2 (mod 4) dir, so the others are skipped
    val keys = (0 until 12).map(i => 2 + 4 * i) // 2, 6, …, 46
    val inSet = spark.sql(
      s"SELECT * FROM skip_kv WHERE id IN (${keys.mkString(",")})")
    assert(scanDirs(inSet) < 4, "InSet needles not consulted")
    assert(inSet.count() === 12)
  }

  test("partitioned views skip whole version dirs from SQL") {
    val root = tmpDir("sqlskip-part")
    def rows(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, if (i % 2 == 0) "A" else "B", i * 1.0))
        .toDF("id", "status", "x")
    val t = GraftTable.create(spark, root, rows(1, 1000), partitionBy = Seq("status"))
    t.append(rows(1001, 2000)); t.append(rows(2001, 3000)); t.append(rows(3001, 4000))
    t.view("skip_part")
    // partitioned reads are a union of one single-dir relation per
    // version dir; a data-column range empties the non-matching branches
    val full = scanDirs(spark.sql("SELECT * FROM skip_part WHERE x > 0"))
    assert(full === 4)
    val pruned = spark.sql("SELECT * FROM skip_part WHERE id <= 1000")
    assert(scanDirs(pruned) === 1, s"kept ${scanDirs(pruned)} branches")
    assert(pruned.count() === 1000)
    // composes with Spark's own hive-partition pruning inside the branch
    val both = spark.sql(
      "SELECT * FROM skip_part WHERE id <= 1000 AND status = 'A'")
    assert(scanDirs(both) === 1)
    assert(both.count() === 500)
  }

  test("ungrouped COUNTs are answered from metadata — no scan in the plan") {
    val root = tmpDir("metacount")
    def rows(lo: Long, hi: Long) = (lo to hi)
      .map(i => (i, if (i % 10 == 0) null else s"d-$i", i * 1.0)).toDF("id", "tag", "x")
    val t = GraftTable.create(spark, root, rows(1, 1000))
    t.append(rows(1001, 2000))
    // additive evolution: only the third segment carries `extra`
    t.append((2001L to 3000L).map(i => (i, s"d-$i", i * 1.0, i)).toDF("id", "tag", "x", "extra"))
    t.view("meta_docs")

    def noScan(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect { case lr: LogicalRelation => lr }.isEmpty

    val q = spark.sql(
      "SELECT count(*) AS cnt, count(tag) AS t, count(extra) AS e FROM meta_docs")
    assert(noScan(q), "metadata-answerable COUNT must plan as a LocalRelation")
    val r = q.head()
    assert(r.getLong(0) === 3000L)
    assert(r.getLong(1) === 2800L) // 10% null tags in the first two segments
    assert(r.getLong(2) === 1000L) // pre-evolution segments are all-null

    // MIN/MAX from exact int64 footer stats — mixed with counts, still no scan
    val mm = spark.sql(
      "SELECT min(id) AS lo, max(id) AS hi, count(*) AS n FROM meta_docs")
    assert(noScan(mm), "long MIN/MAX must be answered from stats")
    assert(mm.head().getLong(0) === 1L)
    assert(mm.head().getLong(1) === 3000L)
    // the evolved column: pre-evolution segments provably contribute no
    // values, the stats of the one carrying segment answer
    val em = spark.sql("SELECT min(extra) AS lo FROM meta_docs")
    assert(noScan(em), "evolved-column MIN must be answered from stats")
    assert(em.head().getLong(0) === 2001L)
    // inexact encodings bail to a scan and stay correct: string stats are
    // order-preserving prefixes (not values), float/double footers have
    // NaN hazards
    val sm = spark.sql("SELECT min(tag) AS lo FROM meta_docs")
    assert(!noScan(sm), "string MIN must scan")
    assert(sm.head().getString(0) === "d-1")
    val dm = spark.sql("SELECT max(x) AS hi FROM meta_docs")
    assert(!noScan(dm), "double MAX must scan")
    assert(dm.head().getDouble(0) === 3000.0)

    // anything the metadata can't answer exactly still scans — and stays right
    val filtered = spark.sql("SELECT count(*) AS n FROM meta_docs WHERE id > 100")
    assert(!noScan(filtered), "a filtered count must scan")
    assert(filtered.head().getLong(0) === 2900L)
    val distinct = spark.sql("SELECT count(DISTINCT tag) AS n FROM meta_docs")
    assert(!noScan(distinct), "count distinct must scan")
    val mixed = spark.sql("SELECT count(*) AS a, sum(id) AS b FROM meta_docs")
    assert(!noScan(mixed), "a mixed aggregate list must scan")
    assert(mixed.head().getLong(0) === 3000L)
    val grouped = spark.sql("SELECT tag, count(*) AS n FROM meta_docs GROUP BY tag")
    assert(!noScan(grouped), "a grouped count must scan")

    // merge-on-read state disqualifies the metadata answer: rows the
    // commit doesn't itemize are subtracted at read time
    val t2 = GraftTable.create(spark, tmpDir("metacount-dv"), rows(1, 1000))
    t2.deletePositional(col("id") <= 100L)
    t2.view("meta_docs_dv")
    val dv = spark.sql("SELECT count(*) AS n FROM meta_docs_dv")
    assert(dv.head().getLong(0) === 900L)
  }

  test("head and versioned views coexist, each pruning and counting from its own snapshot") {
    val root = tmpDir("sqlskip-ver")
    val t = GraftTable.create(spark, root, (1L to 1000L).toDF("id"))
    t.append((1001L to 2000L).toDF("id"))
    t.append((2001L to 3000L).toDF("id"))
    t.view("ver_head")
    t.view("ver_old", versionAsOf = 1)
    def noScan(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect { case lr: LogicalRelation => lr }.isEmpty
    // each view reads — and prunes — its own snapshot
    assert(spark.sql("SELECT * FROM ver_head").count() === 3000)
    assert(spark.sql("SELECT * FROM ver_old").count() === 2000)
    val prunedOld = spark.sql("SELECT * FROM ver_old WHERE id <= 1000")
    assert(scanDirs(prunedOld) === 1, "historical view must prune from its own stats")
    assert(prunedOld.count() === 1000)
    assert(scanDirs(spark.sql("SELECT * FROM ver_head WHERE id > 2500")) === 1)
    // metadata-only counts answer per snapshot
    val oldCnt = spark.sql("SELECT count(*) AS n FROM ver_old")
    assert(noScan(oldCnt), "historical count should come from that commit's metadata")
    assert(oldCnt.head().getLong(0) === 2000L)
    assert(spark.sql("SELECT count(*) AS n FROM ver_head").head().getLong(0) === 3000L)
  }

  test("view pins its snapshot; later appends don't break registered pruning") {
    val root = tmpDir("sqlskip-pin")
    val t = GraftTable.create(spark, root, (1L to 1000L).toDF("id"))
    t.append((1001L to 2000L).toDF("id"))
    t.view("skip_pin")
    t.append((2001L to 3000L).toDF("id")) // after registration
    // the view still reads its 2-dir snapshot, pruned correctly
    val q = spark.sql("SELECT * FROM skip_pin WHERE id <= 1000")
    assert(scanDirs(q) === 1)
    assert(q.count() === 1000)
    assert(spark.sql("SELECT * FROM skip_pin").count() === 2000)
    // re-registering picks up the new head
    t.view("skip_pin")
    assert(spark.sql("SELECT * FROM skip_pin").count() === 3000)
    assert(scanDirs(spark.sql("SELECT * FROM skip_pin WHERE id > 2500")) === 1)
  }
}
