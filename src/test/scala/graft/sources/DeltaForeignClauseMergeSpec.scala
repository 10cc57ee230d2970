package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.{GraftTable, MergeClause}

/** General clause MERGE into a FOREIGN Delta table
  * ([[DeltaExport.mergeForeignClauses]]) — the full row-level surface
  * (conditional update / delete clauses, compound keys, by-source
  * branch) over the foreign commit path, with the change-detection
  * contract front and center: a matched row no clause claims is left
  * physically untouched (no DV bit, no restage). */
class DeltaForeignClauseMergeSpec extends SparkSpec {
  import spark.implicits._

  private def retire(root: String): Unit = {
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root, "_graft_log"), true)
  }

  /** (k1, k2, s, v) rows over a compound key, DV-advertising. */
  private def fixture(name: String): String = {
    val root = tmpDir(name)
    val t = GraftTable.create(spark, root,
      (0L until 41L).map(i => (i % 5, i / 5, s"s$i", i * 1.0))
        .toDF("k1", "k2", "s", "v"), Nil)
    t.deletePositional(col("v") === 40.0) // advertise deletionVectors
    DeltaExport.exportLog(t)
    retire(root)
    root
  }

  test("update-if-changed + delete clause + compound key, one commit") {
    val root = fixture("fcm-main")
    val before = DeltaImport.latestVersion(spark, root)
    // source: key (1,0)=row6... use exact pairs — (k1,k2) identifies i =
    // k1 + 5*k2. Unchanged: (0,0) carries the row's own values. Changed:
    // (1,0) re-prices. Deleted: (2,0). Fresh: (4,9) (i=49, absent).
    val source = Seq(
      (0L, 0L, "s0", 0.0, "keep"),     // matched, values identical
      (1L, 0L, "s1", 100.0, "keep"),   // matched, v differs → update
      (2L, 0L, "ignored", 0.0, "del"), // matched → delete
      (4L, 9L, "new49", 49.0, "keep")  // not matched → insert
    ).toDF("k1", "k2", "s", "v", "op")
    val changed = col("t.`s`") =!= col("s.`s`") ||
      col("t.`v`") =!= col("s.`v`")
    val (v, upd, del, ins) = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k1", "k2"),
      matched = Seq(
        MergeClause.Delete(condition = Some(col("s.op") === "del")),
        MergeClause.Update(
          Map("s" -> col("s.`s`"), "v" -> col("s.`v`")),
          condition = Some(changed))),
      notMatched = Seq(
        MergeClause.InsertAll(condition = Some(col("s.op") =!= "del"))))
    assert(v === before + 1) // ONE commit for updates+deletes+inserts
    assert(upd === 1L && del === 1L && ins === 1L)
    val read = DeltaImport.read(spark, root)
    assert(read.count() === 40L) // 40 - 1 deleted + 1 inserted
    assert(read.filter(col("k1") === 1L && col("k2") === 0L)
      .select("v").head().getDouble(0) === 100.0)
    assert(read.filter(col("k1") === 2L && col("k2") === 0L).count() === 0L)
    assert(read.filter(col("s") === "new49").count() === 1L)
    // the UNCHANGED matched row was not re-recorded: total new DV bits
    // across the commit = 2 (one update pre-image, one delete)
    val dvCards = DeltaImport.snapshot(spark, root).files
      .flatMap(_.deletionVector).map(_.cardinality).sum
    assert(dvCards === 1L + 2L) // prehistory DV + exactly the 2 claims
    // CDF classifies per clause
    val ch = DeltaImport.readChanges(spark, root, v, v)
    assert(ch.filter(col("_change_type") === "update_preimage").count() === 1L)
    assert(ch.filter(col("_change_type") === "update_postimage")
      .filter(col("v") === 100.0).count() === 1L)
    assert(ch.filter(col("_change_type") === "delete").count() === 1L)
    assert(ch.filter(col("_change_type") === "insert").count() === 1L)
  }

  test("identical re-send is a no-op: zero updates, nothing committed") {
    // The change-detection contract promoted from the r10 probe: a CDC
    // producer that re-delivers the same batch (at-least-once delivery)
    // must cost nothing — every matched row compares identical, the
    // deleted key is gone (and its guarded insert refuses), the inserted
    // row re-matches with identical values. Zero claims → zero counts AND
    // no new Delta version.
    val root = fixture("fcm-resend")
    val source = Seq(
      (0L, 0L, "s0", 0.0, "keep"),
      (1L, 0L, "s1", 100.0, "keep"),
      (2L, 0L, "ignored", 0.0, "del"),
      (4L, 9L, "new49", 49.0, "keep")
    ).toDF("k1", "k2", "s", "v", "op")
    val changed = col("t.`s`") =!= col("s.`s`") ||
      col("t.`v`") =!= col("s.`v`")
    def send() = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k1", "k2"),
      matched = Seq(
        MergeClause.Delete(condition = Some(col("s.op") === "del")),
        MergeClause.Update(
          Map("s" -> col("s.`s`"), "v" -> col("s.`v`")),
          condition = Some(changed))),
      notMatched = Seq(
        MergeClause.InsertAll(condition = Some(col("s.op") =!= "del"))))
    val (v1, u1, d1, i1) = send()
    assert(u1 === 1L && d1 === 1L && i1 === 1L)
    val (v2, u2, d2, i2) = send()
    assert(u2 === 0L && d2 === 0L && i2 === 0L,
      s"identical re-send claimed rows: upd=$u2 del=$d2 ins=$i2")
    assert(v2 === v1, "identical re-send committed a new version")
    assert(DeltaImport.read(spark, root).count() === 40L)
  }

  test("clause order: first matching clause wins") {
    val root = fixture("fcm-order")
    val source = Seq((3L, 0L, "x", 1.0)).toDF("k1", "k2", "s", "v")
    val (_, upd, del, _) = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k1", "k2"),
      matched = Seq(
        MergeClause.Update(Map("s" -> lit("first")),
          condition = Some(lit(true))),
        MergeClause.Delete(condition = Some(lit(true)))))
    assert(upd === 1L && del === 0L)
    assert(DeltaImport.read(spark, root)
      .filter(col("s") === "first").count() === 1L)
  }

  test("NOT MATCHED BY SOURCE: prune target rows absent from the source") {
    val root = fixture("fcm-bysrc")
    // keep only k2 <= 3 (i <= 19): everything else deletes by-source,
    // except stale rows which instead get flagged
    val source = (0L until 20L).map(i => (i % 5, i / 5))
      .toDF("k1", "k2")
    val (v, upd, del, ins) = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k1", "k2"),
      notMatchedBySource = Seq(
        MergeClause.Update(Map("s" -> lit("stale")),
          condition = Some(col("t.`v`") < 25.0)),
        MergeClause.Delete()))
    assert(ins === 0L)
    assert(upd === 5L)  // i in 20..24 flagged stale
    assert(del === 15L) // i in 25..39 dropped
    val read = DeltaImport.read(spark, root)
    assert(read.count() === 25L)
    assert(read.filter(col("s") === "stale").count() === 5L)
    assert(v === DeltaImport.latestVersion(spark, root))
  }

  test("a no-op merge commits nothing; unknown assignment refuses") {
    val root = fixture("fcm-noop")
    val head = DeltaImport.latestVersion(spark, root)
    // all-unchanged source with a change-detection condition → no commit
    val source = Seq((0L, 0L, "s0", 0.0)).toDF("k1", "k2", "s", "v")
    val (v, upd, del, ins) = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k1", "k2"),
      matched = Seq(MergeClause.UpdateAll(
        condition = Some(col("t.`v`") =!= col("s.`v`")))))
    assert(v === head && upd + del + ins === 0L)
    assert(DeltaImport.latestVersion(spark, root) === head)
    val e = intercept[IllegalArgumentException](
      DeltaExport.mergeForeignClauses(spark, root, source, Seq("k1", "k2"),
        matched = Seq(MergeClause.Update(Map("nope" -> lit(1))))))
    assert(e.getMessage.contains("unknown column"))
  }

  test("a zero-claim batch with a txn stamp still commits the watermark") {
    val root = fixture("fcm-txn-empty")
    val head = DeltaImport.latestVersion(spark, root)
    // batch 5: a delete for a key that does not exist — zero claims, but
    // the stamp MUST land or a redelivery after the owning engine adds
    // the key would delete a row the CDC stream never owned
    val ghost = Seq((99L, 99L)).toDF("k1", "k2")
    val (v, upd, del, ins) = DeltaExport.mergeForeignClauses(spark, root,
      ghost, Seq("k1", "k2"),
      matched = Seq(MergeClause.Delete()),
      txn = Some(("cdc-app", 5L)))
    assert(upd + del + ins === 0L)
    assert(v === head + 1, "txn-only commit must still land")
    assert(DeltaImport.snapshot(spark, root)
      .setTransactions.get("cdc-app").contains(5L))
    // the owning engine now adds the key; the redelivered batch no-ops
    DeltaExport.appendToForeign(spark, root,
      Seq((99L, 99L, "late", 1.0)).toDF("k1", "k2", "s", "v"))
    val (v2, _, del2, _) = DeltaExport.mergeForeignClauses(spark, root,
      ghost, Seq("k1", "k2"),
      matched = Seq(MergeClause.Delete()),
      txn = Some(("cdc-app", 5L)))
    assert(del2 === 0L && v2 === DeltaImport.latestVersion(spark, root))
    assert(DeltaImport.read(spark, root)
      .filter(col("s") === "late").count() === 1L)
  }

  test("SQL spelling: MERGE INTO delta.`path` with conditional clauses") {
    val root = fixture("fcm-sql")
    Seq((0L, 0L, "sqlupd", 5.0, "upd"), (2L, 1L, "x", 0.0, "del"))
      .toDF("k1", "k2", "s", "v", "op")
      .createOrReplaceTempView("fcm_sql_src")
    val row = spark.sql(
      s"""MERGE INTO delta.`$root` AS t USING fcm_sql_src AS s
         |ON t.k1 = s.k1 AND t.k2 = s.k2
         |WHEN MATCHED AND s.op = 'del' THEN DELETE
         |WHEN MATCHED AND t.v <> s.v THEN UPDATE SET s = s.s, v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    // (0,0) re-priced (update), (2,1) = row 7 deleted, nothing inserted
    assert(row.getLong(1) === 1L) // updated
    assert(row.getLong(2) === 1L) // deleted
    assert(row.getLong(3) === 0L) // inserted
    val read = DeltaImport.read(spark, root)
    assert(read.filter(col("k1") === 0L && col("k2") === 0L)
      .select("s").head().getString(0) === "sqlupd")
    assert(read.filter(col("k1") === 2L && col("k2") === 1L).count() === 0L)
  }

  test("predicated ON: a key-matched pair failing the residual splits " +
      "into NOT MATCHED and NOT MATCHED BY SOURCE") {
    val root = fixture("fcm-onextra")
    // row (0,0) has v=0 (fails t.v >= 1), row (1,0) has v=1 (passes)
    val source = Seq((0L, 0L, "img0", 50.0), (1L, 0L, "img1", 51.0))
      .toDF("k1", "k2", "s", "v")
    val (_, upd, del, ins) = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k1", "k2"),
      matched = Seq(MergeClause.UpdateAll()),
      notMatched = Seq(MergeClause.InsertAll()),
      notMatchedBySource = Seq(MergeClause.Delete(
        condition = Some(col("t.`k2`") === 0L && col("t.`v`") < 1.0))),
      onExtra = Some(col("t.`v`") >= 1.0))
    // (1,0): matched under the full ON → updated.
    // (0,0): key-matched but v=0 fails the residual → the source row
    // INSERTS and the target row deletes by-source.
    assert(upd === 1L && ins === 1L && del === 1L)
    val read = DeltaImport.read(spark, root)
    assert(read.filter(col("k1") === 1L && col("k2") === 0L)
      .select("v").head().getDouble(0) === 51.0)
    val zz = read.filter(col("k1") === 0L && col("k2") === 0L).collect()
    assert(zz.length === 1 && zz.head.getAs[Double]("v") === 50.0)
  }

  test("generated + identity tables take the full clause surface") {
    val root = tmpDir("fcm-genid")
    val t = GraftTable.create(spark, root,
      (0L until 10L).map(i => (i, i * 2)).toDF("k", "twice"), Nil,
      generated = Map("twice" -> "k * 2"),
      identity = Map("rid" -> (100L, 5L)))
    t.deletePositional(col("k") === 9L) // advertise deletionVectors
    DeltaExport.exportLog(t)
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root, "_graft_log"), true)
    def hwmOf(): Long = DeltaImport.snapshot(spark, root).schema("rid")
      .metadata.getLong("delta.identity.highWaterMark")
    val hwm0 = hwmOf()
    val rid3 = DeltaImport.read(spark, root)
      .filter(col("k") === 3L).select("rid").head().getLong(0)
    // update k=3 → generated `twice` recomputes, identity `rid` rides;
    // insert k=50 → `twice` computed, `rid` allocated above the mark
    val source = Seq((3L, 333L), (50L, 555L)).toDF("k", "newk")
    val (_, upd, _, ins) = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k"),
      matched = Seq(MergeClause.Update(Map("k" -> col("s.`newk`")))),
      notMatched = Seq(MergeClause.Insert(Map("k" -> col("s.`k`")))))
    assert(upd === 1L && ins === 1L)
    val read = DeltaImport.read(spark, root)
    val updated = read.filter(col("k") === 333L).head()
    assert(updated.getAs[Long]("twice") === 666L) // recomputed
    assert(updated.getAs[Long]("rid") === rid3)   // identity rode
    val inserted = read.filter(col("k") === 50L).head()
    assert(inserted.getAs[Long]("twice") === 100L)
    assert(inserted.getAs[Long]("rid") > hwm0)    // allocated
    assert(hwmOf() >= inserted.getAs[Long]("rid")) // metaData advanced
    // ids stay globally unique
    val ids = read.select("rid").as[Long].collect()
    assert(ids.distinct.length === ids.length)
    // engine-maintained columns are not assignable
    val e = intercept[IllegalArgumentException](
      DeltaExport.mergeForeignClauses(spark, root, source, Seq("k"),
        matched = Seq(MergeClause.Update(Map("twice" -> lit(0L))))))
    assert(e.getMessage.contains("engine-maintained"))
  }

  test("canonical upsert on a generated/identity table delegates to " +
      "the clause path") {
    val root = tmpDir("fcm-upsert-gen")
    val t = GraftTable.create(spark, root,
      (0L until 10L).map(i => (i, s"s$i", i * 2)).toDF("k", "s", "twice"),
      Nil, generated = Map("twice" -> "k * 2"),
      identity = Map("rid" -> (100L, 5L)))
    t.deletePositional(col("k") === 9L)
    DeltaExport.exportLog(t)
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root, "_graft_log"), true)
    val rid3 = DeltaImport.read(spark, root)
      .filter(col("k") === 3L).select("rid").head().getLong(0)
    val (_, u, i) = DeltaExport.mergeForeignUpsert(spark, root,
      Seq((3L, "upd"), (50L, "new")).toDF("k", "s"), "k")
    assert(u === 1L && i === 1L)
    val read = DeltaImport.read(spark, root)
    val m = read.filter(col("k") === 3L).head()
    assert(m.getAs[String]("s") === "upd")
    assert(m.getAs[Long]("twice") === 6L)   // invariant holds
    assert(m.getAs[Long]("rid") === rid3)   // identity rode
    val n = read.filter(col("k") === 50L).head()
    assert(n.getAs[Long]("twice") === 100L) // computed
    assert(n.getAs[Long]("rid") > rid3)     // allocated fresh
  }

  test("txn stamp makes the whole clause merge exactly-once") {
    val root = fixture("fcm-txn")
    val source = Seq((0L, 0L, "updated", 7.0)).toDF("k1", "k2", "s", "v")
    val clauses = Seq(MergeClause.UpdateAll())
    val (v1, upd1, _, _) = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k1", "k2"), matched = clauses,
      txn = Some(("cdc-app", 3L)))
    assert(upd1 === 1L)
    // redelivery of the same batch: watermarked no-op
    val (v2, upd2, _, _) = DeltaExport.mergeForeignClauses(spark, root,
      source, Seq("k1", "k2"), matched = clauses,
      txn = Some(("cdc-app", 3L)))
    assert(v2 === v1 && upd2 === 0L)
    assert(DeltaImport.read(spark, root)
      .filter(col("s") === "updated").count() === 1L)
  }
}
