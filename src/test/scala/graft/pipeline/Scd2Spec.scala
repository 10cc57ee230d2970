package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD Type 2 semantics: version open/close per branch, no-op change
  * suppression, tombstones, multi-batch chaining, compareIgnore. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private def dim0 = Scd2.init(
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal"),
    ts("2020-01-01 00:00:00"))

  test("init opens one current version per row") {
    val d = dim0.collect()
    assert(d.length == 3)
    assert(d.forall(_.getAs[Boolean](Scd2.IsCurrent)))
    assert(d.forall(_.isNullAt(d.head.fieldIndex(Scd2.ValidTo))))
  }

  test("update closes the old version and opens a new one; no-op opens nothing") {
    val batch = Seq(
      (1L, "a", 15.0, false), // real change
      (2L, "b", 20.0, false), // identical attrs → no-op
      (4L, "d", 40.0, false)  // insert
    ).toDF("id", "name", "bal", "del")
    val d1 = Scd2(dim0, batch, "id", ts("2021-01-01 00:00:00"), Some("del"))
    assert(d1.count() == 5) // 3 original + closed(1) has become 2 rows + insert

    val v1 = d1.filter(col("id") === 1).orderBy(Scd2.ValidFrom).collect()
    assert(v1.length == 2)
    assert(!v1(0).getAs[Boolean](Scd2.IsCurrent) && v1(0).getAs[Double]("bal") == 10.0)
    assert(v1(0).getAs[java.sql.Timestamp](Scd2.ValidTo) != null)
    assert(v1(1).getAs[Boolean](Scd2.IsCurrent) && v1(1).getAs[Double]("bal") == 15.0)

    assert(d1.filter(col("id") === 2).count() == 1) // no spurious version
    val ins = d1.filter(col("id") === 4).collect()
    assert(ins.length == 1 && ins(0).getAs[Boolean](Scd2.IsCurrent))
  }

  test("tombstone closes without opening; history survives a later rebirth") {
    val del = Seq((2L, "b", 20.0, true)).toDF("id", "name", "bal", "del")
    val d1 = Scd2(dim0, del, "id", ts("2021-01-01 00:00:00"), Some("del"))
    val r2 = d1.filter(col("id") === 2).collect()
    assert(r2.length == 1 && !r2(0).getAs[Boolean](Scd2.IsCurrent))

    // the key can come back later: a fresh open version, old one stays closed
    val rebirth = Seq((2L, "b2", 25.0, false)).toDF("id", "name", "bal", "del")
    val d2 = Scd2(d1, rebirth, "id", ts("2022-01-01 00:00:00"), Some("del"))
    val rows = d2.filter(col("id") === 2).orderBy(Scd2.ValidFrom).collect()
    assert(rows.length == 2)
    assert(!rows(0).getAs[Boolean](Scd2.IsCurrent))
    assert(rows(1).getAs[Boolean](Scd2.IsCurrent) && rows(1).getAs[String]("name") == "b2")
  }

  test("three chained batches accumulate one closed version per change") {
    val b1 = Seq((1L, "a", 11.0)).toDF("id", "name", "bal")
    val b2 = Seq((1L, "a", 12.0)).toDF("id", "name", "bal")
    val d = Scd2(Scd2(dim0, b1, "id", ts("2021-01-01 00:00:00")),
      b2, "id", ts("2022-01-01 00:00:00"))
    val rows = d.filter(col("id") === 1).orderBy(Scd2.ValidFrom).collect()
    assert(rows.map(_.getAs[Double]("bal")).toSeq == Seq(10.0, 11.0, 12.0))
    assert(rows.map(_.getAs[Boolean](Scd2.IsCurrent)).toSeq == Seq(false, false, true))
    // intervals chain: each closed version's valid_to equals the next's valid_from
    assert(rows(0).getAs[java.sql.Timestamp](Scd2.ValidTo) ==
      rows(1).getAs[java.sql.Timestamp](Scd2.ValidFrom))
  }

  test("compareIgnore suppresses versions from volatile columns") {
    val d0 = Scd2.init(Seq((1L, "a", 10.0, "x")).toDF("id", "name", "bal", "etl_tag"),
      ts("2020-01-01 00:00:00"))
    val batch = Seq((1L, "a", 10.0, "y")).toDF("id", "name", "bal", "etl_tag")
    val d1 = Scd2(d0, batch, "id", ts("2021-01-01 00:00:00"),
      compareIgnore = Seq("etl_tag"))
    assert(d1.count() == 1) // only etl_tag differs → no new version
  }

  test("delta emits only changed/added version rows") {
    val batch = Seq(
      (1L, "a", 15.0, false), // update → closed + opened
      (2L, "b", 20.0, false), // no-op → nothing
      (4L, "d", 40.0, false), // insert → opened
      (3L, "c", 30.0, true)   // delete → closed
    ).toDF("id", "name", "bal", "del")
    val d = Scd2.delta(dim0, batch, "id", ts("2021-01-01 00:00:00"), Some("del"))
    assert(d.count() == 4) // 2 (update) + 1 (insert) + 1 (delete-close)
    assert(d.filter(col("id") === 2).count() == 0)
    // delta ∪ untouched rows ≡ full apply()
    val full = Scd2(dim0, batch, "id", ts("2021-01-01 00:00:00"), Some("del"))
    assert(full.count() == 5)
  }

  test("maintain merges deltas into a stored table; replay is a no-op") {
    val root = tmpDir("scd2-maintain")
    val t = Scd2.initTable(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal"),
      "id", ts("2020-01-01 00:00:00"))
    val batch = Seq((1L, "a", 15.0, false), (3L, "c", 30.0, false))
      .toDF("id", "name", "bal", "del")
    Scd2.maintain(t, batch, "id", ts("2021-01-01 00:00:00"), Some("del"))

    def snapshot = t.read().drop(Scd2.MergeKey)
    assert(snapshot.count() == 4) // closed v1 + opened v2 + untouched + insert
    val v1 = snapshot.filter(col("id") === 1).orderBy(Scd2.ValidFrom).collect()
    assert(!v1(0).getAs[Boolean](Scd2.IsCurrent) && v1(0).getAs[Double]("bal") == 10.0)
    assert(v1(1).getAs[Boolean](Scd2.IsCurrent) && v1(1).getAs[Double]("bal") == 15.0)

    // replayed batch (at-least-once delivery): value-level no-op
    val versionBefore = t.version
    Scd2.maintain(t, batch, "id", ts("2021-01-01 00:00:00"), Some("del"))
    assert(snapshot.count() == 4)
    assert(snapshot.filter(col(Scd2.IsCurrent)).count() == 3)

    // a later real batch closes the re-opened version incrementally
    val batch2 = Seq((1L, "a", 17.0, false)).toDF("id", "name", "bal", "del")
    Scd2.maintain(t, batch2, "id", ts("2022-01-01 00:00:00"), Some("del"))
    assert(snapshot.filter(col("id") === 1).count() == 3)
    // incremental result ≡ batch-wise apply() chain
    val replayed = Scd2(Scd2(Scd2.init(
        Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal"),
        ts("2020-01-01 00:00:00")),
      batch, "id", ts("2021-01-01 00:00:00"), Some("del")),
      batch2, "id", ts("2022-01-01 00:00:00"), Some("del"))
    val a = snapshot.orderBy("id", Scd2.ValidFrom).collect().toSeq
    val b = replayed.orderBy("id", Scd2.ValidFrom).collect().toSeq
    assert(a == b)
    assert(versionBefore >= 1)
  }

  test("equal effectiveFrom per key clamps forward: merge keys stay unique") {
    // Debezium ts_ms is millisecond-resolution — consecutive batches can
    // carry the SAME effective instant for one key. The clamp must keep
    // (key, valid_from) unique and version intervals strictly positive.
    val root = tmpDir("scd2-tie")
    val t0 = ts("2020-06-01 00:00:00")
    val tab = Scd2.initTable(spark, root,
      Seq((1L, 10.0)).toDF("id", "bal"), "id", t0)
    Scd2.maintain(tab, Seq((1L, 20.0)).toDF("id", "bal"), "id", t0) // tie #1
    Scd2.maintain(tab, Seq((1L, 30.0)).toDF("id", "bal"), "id", t0) // tie #2
    val rows = tab.read().orderBy(Scd2.ValidFrom).collect()
    assert(rows.length == 3, rows.mkString("\n"))
    // merge keys (key|valid_from µs) all distinct — the upsert unit is unique
    assert(rows.map(_.getAs[String](Scd2.MergeKey)).distinct.length == 3)
    // exactly one open current version, holding the LAST value
    val current = rows.filter(_.getAs[Boolean](Scd2.IsCurrent))
    assert(current.length == 1 && current(0).getAs[Double]("bal") == 30.0)
    // intervals chain strictly: each closed row ends exactly where the next
    // starts (µs-resolution — compare full Timestamps, getTime is ms-only)
    val vf = rows.map(_.getAs[java.sql.Timestamp](Scd2.ValidFrom))
    assert(vf.distinct.length == 3 && vf.toSeq == vf.sortBy(_.toInstant).toSeq)
    assert(rows.init.zip(rows.tail).forall { case (closed, next) =>
      closed.getAs[java.sql.Timestamp](Scd2.ValidTo) ==
        next.getAs[java.sql.Timestamp](Scd2.ValidFrom)
    })
  }

  test("maintain refuses a table created without the merge key") {
    val root = tmpDir("scd2-nokey")
    val t = graft.table.GraftTable.create(spark, root,
      Scd2.init(Seq((1L, "a", 10.0)).toDF("id", "name", "bal"),
        ts("2020-01-01 00:00:00")))
    val e = intercept[IllegalArgumentException] {
      Scd2.maintain(t, Seq((1L, "a", 11.0)).toDF("id", "name", "bal"),
        "id", ts("2021-01-01 00:00:00"))
    }
    assert(e.getMessage.contains(Scd2.MergeKey))
  }

  test("change batch missing a dimension attribute is rejected") {
    val bad = Seq((1L, "a")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      Scd2(dim0, bad, "id", ts("2021-01-01 00:00:00"))
    }
    assert(e.getMessage.contains("bal"))
  }
}
