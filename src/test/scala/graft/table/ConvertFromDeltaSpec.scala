package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{DeltaExport, DeltaImport}

/** CONVERT FROM DELTA — in-place adoption of a Delta table: live files
  * renamed into the graft v0 dir (dead files left behind), partition
  * subpaths preserved, constraints carried, refusals for DV'd and
  * column-mapped sources. Fixtures are Delta tables the export bridge
  * wrote — the same `_delta_log` shape delta-spark produces. */
class ConvertFromDeltaSpec extends SparkSpec {
  import spark.implicits._

  /** A Delta table directory with dead files: create + append + delete
    * (the delete's rewrite leaves superseded parquet on disk). */
  private def deltaFixture(tag: String): (String, Long) = {
    val root = tmpDir(tag)
    val t = GraftTable.create(spark, root,
      (0L until 60L).map(i => (i, s"s$i", i % 7)).toDF("k", "s", "grp"), Nil)
    t.append((60L until 90L).map(i => (i, s"s$i", i % 7)).toDF("k", "s", "grp"))
    t.delete(col("k") % 5 === 0L)
    DeltaExport.exportLog(t)
    val expect = t.read().count()
    // retire the graft log so the dir is a PURE Delta table (what a
    // delta-spark user hands us); data files and _delta_log remain
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_graft_log"), true)
    (root, expect)
  }

  test("adopts live files only; dead files stay behind; content intact") {
    val (root, expect) = deltaFixture("cfd-flat")
    val liveBefore = DeltaImport.read(spark, root)
      .select("k", "s", "grp").as[(Long, String, Long)].collect().toSet
    val t = GraftTable.convertFromDelta(spark, root)
    assert(t.version === 0L)
    assert(t.read().count() === expect)
    assert(t.read().select("k", "s", "grp")
      .as[(Long, String, Long)].collect().toSet === liveBefore)
    // deleted rows are really gone (the dead file was not adopted)
    assert(t.read().filter(col("k") % 5 === 0L).count() === 0L)
    // the commit records the adoption
    val h = t.history().filter(col("version") === 0L).collect().head
    assert(h.getAs[String]("operation") === "CREATE")
    // mutation surface works immediately on the adopted files
    t.delete(col("grp") === 3L)
    assert(t.read().filter(col("grp") === 3L).count() === 0L)
    // crash-rerun convergence: a second adoption attempt is refused only
    // by the existing graft log, not by half-moved state
    intercept[IllegalArgumentException](GraftTable.convertFromDelta(spark, root))
  }

  test("partitioned Delta table adopts with partition subpaths preserved") {
    val root = tmpDir("cfd-part")
    val t0 = GraftTable.create(spark, root,
      (0L until 80L).map(i => (i, s"s$i", i % 4)).toDF("k", "s", "p"),
      partitionBy = Seq("p"))
    t0.delete(col("k") % 9 === 0L)
    DeltaExport.exportLog(t0)
    val expect = t0.read().count()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_graft_log"), true)

    val t = GraftTable.convertFromDelta(spark, root)
    assert(t.read().count() === expect)
    // partition values decoded from the preserved subpaths
    assert(t.read().filter(col("p") === 2L).count() ===
      (0L until 80L).count(i => i % 4 == 2 && i % 9 != 0))
    // partition pruning still applies (partitionCols carried over)
    assert(t.read().select("p").distinct().count() === 4L)
  }

  test("CHECK constraints carry over and enforce on the adopted table") {
    val root = tmpDir("cfd-constraints")
    val t0 = GraftTable.create(spark, root,
      (1L until 40L).map(i => (i, i * 2.0)).toDF("k", "v"), Nil)
    t0.addConstraint("positive_k", "k > 0")
    DeltaExport.exportLog(t0)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_graft_log"), true)

    val t = GraftTable.convertFromDelta(spark, root)
    val e = intercept[Exception](
      t.append(Seq((-1L, 1.0)).toDF("k", "v")))
    assert(e.getMessage.contains("positive_k"))
  }

  private def retireGraftLog(root: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_graft_log"), true)
  }

  test("deletion-vector'd source adopts: positions translate to graft DVs") {
    val root = tmpDir("cfd-dv")
    val t0 = GraftTable.create(spark, root,
      (0L until 50L).map(i => (i, s"s$i")).toDF("k", "s"), Nil)
    t0.append((50L until 80L).map(i => (i, s"s$i")).toDF("k", "s"))
    t0.deletePositional(col("k") % 11 === 0L)
    DeltaExport.exportLog(t0)
    retireGraftLog(root)
    val liveBefore = DeltaImport.read(spark, root)
      .select("k", "s").as[(Long, String)].collect().toSet
    assert(liveBefore.size === (0L until 80L).count(_ % 11 != 0))

    val t = GraftTable.convertFromDelta(spark, root)
    assert(t.read().select("k", "s")
      .as[(Long, String)].collect().toSet === liveBefore)
    // metadata-only row count subtracts the translated DV positions
    assert(t.rowCount === liveBefore.size.toLong)
    // the adopted DVs compose with further mutation
    t.delete(col("k") >= 70L)
    assert(t.read().count() ===
      (0L until 70L).count(_ % 11 != 0).toLong)
    // rerun convergence: only the existing graft log refuses, not state
    intercept[IllegalArgumentException](GraftTable.convertFromDelta(spark, root))
  }

  test("column-mapped source adopts: physical names carry into graft.colmap") {
    val root = tmpDir("cfd-mapped")
    val t0 = GraftTable.create(spark, root,
      (0L until 40L).map(i => (i, s"s$i", i * 2.0)).toDF("k", "s", "v"), Nil)
    t0.renameColumnMetadataOnly("s", "label")
    t0.append((40L until 60L).map(i => (i, s"s$i", i * 2.0))
      .toDF("k", "label", "v"))
    DeltaExport.exportLog(t0)
    retireGraftLog(root)
    val liveBefore = DeltaImport.read(spark, root)
      .select("k", "label", "v").as[(Long, String, Double)].collect().toSet

    val t = GraftTable.convertFromDelta(spark, root)
    assert(t.read().columns.toSeq === Seq("k", "label", "v"))
    assert(t.read().select("k", "label", "v")
      .as[(Long, String, Double)].collect().toSet === liveBefore)
    // skipping stats were remapped to LOGICAL keys at adoption
    assert(t.where(col("k") <= 5L).count() === 6L)
    // the adopted mapping stays metadata-only for further renames
    t.renameColumn("label", "tag")
    assert(t.read().filter(col("tag") === "s7").count() === 1L)
  }

  test("DV'd AND mapped source adopts with both translated") {
    val root = tmpDir("cfd-dv-mapped")
    val t0 = GraftTable.create(spark, root,
      (0L until 60L).map(i => (i, s"s$i")).toDF("k", "s"), Nil)
    t0.renameColumnMetadataOnly("s", "label")
    t0.deletePositional(col("k") % 7 === 0L)
    DeltaExport.exportLog(t0)
    retireGraftLog(root)
    val t = GraftTable.convertFromDelta(spark, root)
    assert(t.read().count() === (0L until 60L).count(_ % 7 != 0).toLong)
    assert(t.read().filter(col("label") === "s7").count() === 0L)
    assert(t.read().filter(col("label") === "s8").count() === 1L)
  }

  test("mapped PARTITIONED source is refused with guidance") {
    val root = tmpDir("cfd-mapped-part")
    val t0 = GraftTable.create(spark, root,
      (0L until 40L).map(i => (i, s"s$i", i % 4)).toDF("k", "s", "p"),
      partitionBy = Seq("p"))
    t0.renameColumnMetadataOnly("s", "label")
    DeltaExport.exportLog(t0)
    retireGraftLog(root)
    val e = intercept[IllegalArgumentException](
      GraftTable.convertFromDelta(spark, root))
    assert(e.getMessage.contains("column mapping on a partitioned"))
  }
}
