package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** [[DeltaFsck]] — each failure class detected on a deliberately damaged
  * mirror, and a healthy mirror reporting all-ok. */
class DeltaFsckSpec extends SparkSpec {
  import spark.implicits._

  private def checkMap(root: String, deep: Boolean = true): Map[String, (String, Long)] =
    DeltaFsck(spark, root, deep).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap

  test("healthy mirror: every check ok; unreferenced counts history only") {
    val root = tmpDir("fsck-ok")
    val t = GraftTable.create(spark, root,
      (0L until 40L).map(i => (i, s"s$i")).toDF("k", "s"), Nil)
    t.append((40L until 60L).map(i => (i, s"s$i")).toDF("k", "s"))
    t.delete(col("k") < 5L) // rewrite: superseded files stay on disk
    DeltaExport.exportLog(t)

    val m = checkMap(root)
    assert(m("snapshot_replay") === ("ok", 0L))
    assert(m("protocol_supported") === ("ok", 0L))
    assert(m("adds_resolvable") === ("ok", 0L))
    assert(m("add_size_match") === ("ok", 0L))
    assert(m("dv_files_resolvable") === ("ok", 0L))
    assert(m("last_checkpoint")._1 === "ok")
    // the delete's rewrite superseded earlier files — they are VACUUM
    // candidates, reported as info, never a failure
    assert(m("unreferenced_data_files")._1 === "info")
    assert(m("unreferenced_data_files")._2 > 0L)
    // shallow mode skips the listing-cost check entirely
    assert(!checkMap(root, deep = false).contains("unreferenced_data_files"))
  }

  test("missing data file and size mismatch are counted") {
    val root = tmpDir("fsck-damage")
    val t = GraftTable.create(spark, root,
      (0L until 50L).map(i => (i, s"s$i")).toDF("k", "s"), Nil)
    t.append((50L until 90L).map(i => (i, s"s$i")).toDF("k", "s"))
    DeltaExport.exportLog(t)
    val live = DeltaImport.snapshot(spark, root).files
      .map(f => DeltaImport.resolveFile(root, f.path))
    assert(live.size >= 2, "need two live files to damage independently")
    // delete one file, truncate another
    Files.delete(Paths.get(live.head.toUri.getPath))
    Files.write(Paths.get(live.last.toUri.getPath), Array[Byte](1, 2, 3))

    val m = checkMap(root)
    assert(m("snapshot_replay") === ("ok", 0L)) // metadata replay still fine
    assert(m("adds_resolvable") === ("fail", 1L))
    assert(m("add_size_match") === ("fail", 1L))
  }

  test("missing DV file and dangling _last_checkpoint are counted") {
    val root = tmpDir("fsck-dv")
    val t = GraftTable.create(spark, root,
      (0L until 60L).map(i => (i, s"s$i")).toDF("k", "s"), Nil)
    t.deletePositional(col("k") % 7 === 0L) // on-disk deletion vector
    DeltaExport.exportLog(t)
    DeltaExport.writeCheckpoint(spark, root)
    assert(checkMap(root)("last_checkpoint") === ("ok", 0L))
    var deletedDv = false
    DeltaImport.snapshot(spark, root).files.flatMap(_.deletionVector)
      .filter(_.storageType != "i").headOption.foreach { d =>
        Files.delete(Paths.get(
          DeltaDeletionVectors.filePathOf(d, root).toUri.getPath))
        deletedDv = true
      }
    assume(deletedDv, "fixture must produce an on-disk deletion vector")
    // dangle the checkpoint pointer: delete the checkpoint parquet
    Files.list(Paths.get(root, "_delta_log")).iterator().forEachRemaining { p =>
      if (p.getFileName.toString.contains(".checkpoint.")) Files.delete(p)
    }
    val m = checkMap(root)
    // several adds share one packed DV file — the count is per dangling
    // DESCRIPTOR (the blast radius), not per missing file
    assert(m("dv_files_resolvable")._1 === "fail")
    assert(m("dv_files_resolvable")._2 >= 1L)
    assert(m("last_checkpoint")._1 === "fail")
  }

  test("unreadable log reports snapshot_replay fail and stops") {
    val root = tmpDir("fsck-dead")
    val t = GraftTable.create(spark, root,
      (0L until 10L).map(i => (i, s"s$i")).toDF("k", "s"), Nil)
    DeltaExport.exportLog(t)
    // corrupt v0 beyond parse
    Files.write(Paths.get(root, "_delta_log", f"${0L}%020d.json"),
      "not json".getBytes)
    val m = checkMap(root)
    assert(m("snapshot_replay") === ("fail", 1L))
    assert(m.size === 1, "no downstream checks on a dead log")
  }
}
