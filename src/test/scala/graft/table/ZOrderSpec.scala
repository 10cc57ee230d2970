package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OPTIMIZE … ZORDER BY must make parquet min/max stats selective on EVERY
  * z column at once: after clustering, a narrow predicate on either
  * dimension should read rows from only a subset of the files (row-group
  * stats skip the rest), where a linear sort would only ever prune on its
  * lead key. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
    df.select(input_file_name()).distinct().count()

  test("zorder compaction prunes files on both dimensions") {
    val root = tmpDir("zorder")
    // two independent uniform dimensions, written in shuffled order so the
    // incoming layout has no accidental locality
    val rows = scala.util.Random.shuffle(
      (for (a <- 0 until 128; b <- 0 until 128) yield (a.toLong, b.toLong))).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val t = GraftTable.create(spark, root, rows.toDF("id", "a", "b"))
    // small target size → many files, so per-file stats have something to cut
    t.optimize(targetFileBytes = 4 * 1024, zorderBy = Seq("a", "b"))

    val snap = t.read()
    val total = filesTouched(snap)
    assume(total >= 8, s"need a multi-file layout to observe pruning, got $total")
    val onA = filesTouched(snap.filter(col("a") < 16))
    val onB = filesTouched(snap.filter(col("b") < 16))
    assert(onA < total, s"no pruning on a: $onA of $total files")
    assert(onB < total, s"no pruning on b: $onB of $total files")
    // data unchanged by the rewrite
    assert(snap.count() === 128L * 128L)
    assert(snap.agg(sum("a"), sum("b")).head() ===
      t.readVersion(0).agg(sum("a"), sum("b")).head())
  }

  test("zorder on a string column clusters by prefix (parquet stats prune)") {
    val root = tmpDir("zorder-str")
    // 16 prefixes × 1024 rows, shuffled — string dimension plus a numeric one
    val rows = scala.util.Random.shuffle(
      (for (p <- 0 until 16; i <- 0 until 1024)
        yield (f"cat$p%02d-item$i%04d", i.toLong)).toSeq).zipWithIndex
      .map { case ((s, v), id) => (id.toLong, s, v) }
    val t = GraftTable.create(spark, root, rows.toDF("id", "name", "v"))
    t.optimize(targetFileBytes = 16 * 1024, zorderBy = Seq("name", "v"))

    val snap = t.read()
    val total = filesTouched(snap)
    assume(total >= 8, s"need a multi-file layout, got $total")
    // a single string prefix should live in a small subset of files
    val onName = filesTouched(snap.filter(col("name").startsWith("cat03-")))
    val onV = filesTouched(snap.filter(col("v") < 128))
    assert(onName < total, s"no string pruning: $onName of $total files")
    assert(onV < total, s"no numeric pruning: $onV of $total files")
    assert(snap.count() === 16L * 1024L)
  }

  test("clusterBy: bare OPTIMIZE clusters on the declaration") {
    val root = tmpDir("clusterby")
    val rows = scala.util.Random.shuffle(
      (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val t = GraftTable.create(spark, root, rows.toDF("id", "a", "b"))
    t.clusterBy(Seq("a", "b"))
    assert(t.clusteringColumns === Seq("a", "b"))
    t.optimize(targetFileBytes = 4 * 1024) // no explicit order
    val snap = t.read()
    val total = filesTouched(snap)
    assume(total >= 8, s"need a multi-file layout, got $total")
    assert(filesTouched(snap.filter(col("a") < 8)) < total, "no pruning on a")
    assert(filesTouched(snap.filter(col("b") < 8)) < total, "no pruning on b")
    // an explicit zorderBy still overrides the declaration
    t.optimize(targetFileBytes = 4 * 1024, zorderBy = Seq("id"))
    assert(t.read().count() === 64L * 64L)
  }

  test("clusterBy: compactSmall re-clusters the folded dir on the declaration") {
    val root = tmpDir("clusterby-compact")
    val t = GraftTable.create(spark, root,
      (0 until 512).map(i => (i.toLong, (i % 64).toLong)).toDF("id", "a"))
    t.clusterBy(Seq("a"))
    // accrete small shuffled appends (the streaming-sink shape)
    (1 to 4).foreach { r =>
      t.append(scala.util.Random.shuffle((0 until 512).toList)
        .map(i => ((r * 1000 + i).toLong, (i % 64).toLong)).toDF("id", "a"))
    }
    val c = t.compactSmall(targetFileBytes = 4 * 1024,
      smallDirBytes = Long.MaxValue / 2)
    assert(c.isDefined)
    val snap = t.read()
    val total = filesTouched(snap)
    assume(total >= 4, s"need a multi-file layout, got $total")
    assert(filesTouched(snap.filter(col("a") < 8)) < total,
      "compacted dir lost the clustering")
    assert(snap.count() === 512L * 5)
  }

  test("clusterBy: validation, rename rekey, drop removes the column") {
    val root = tmpDir("clusterby-ddl")
    import spark.implicits._
    val t = GraftTable.create(spark, root,
      (0L until 10L).map(i => (i, s"s$i", i * 2)).toDF("k", "s", "n"))
    intercept[IllegalArgumentException](t.clusterBy(Seq("nope")))
    t.clusterBy(Seq("s", "n"))
    // engine-managed: a stray SET/UNSET cannot corrupt the declaration
    intercept[IllegalArgumentException](
      t.setProperties(Map("graft.clusterBy" -> "k")))
    intercept[IllegalArgumentException](
      t.unsetProperties(Seq("graft.clusterBy")))
    t.renameColumnMetadataOnly("s", "label")
    assert(t.clusteringColumns === Seq("label", "n"))
    t.dropColumn("n")
    assert(t.clusteringColumns === Seq("label"))
    t.clusterBy(Nil) // CLUSTER BY NONE
    assert(t.clusteringColumns === Nil)
  }
}
