package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** GraftTables as streaming SOURCES: appends stream to downstream queries,
  * and the Change Data Feed streams the per-commit change rows — the
  * table-to-table pipeline surface (Delta's readStream / streaming CDF). */
class TableStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streamAppends delivers rows appended after the stream starts") {
    val t = GraftTable.create(spark, tmpDir("ts-app"),
      Seq((1L, "a")).toDF("id", "s"))
    val q = t.streamAppends()
      .writeStream.format("memory").queryName("appends_out")
      .option("checkpointLocation", tmpDir("ts-app-ckpt"))
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("appends_out").count() === 1)
      t.append(Seq((2L, "b"), (3L, "c")).toDF("id", "s"))
      q.processAllAvailable()
      assert(spark.table("appends_out").as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the table source and stops on its own") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("ts-avnow")
    val t = GraftTable.create(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    t.append(Seq((2L, "b")).toDF("id", "s"))
    val q = spark.readStream
      .format("org.apache.spark.sql.graftnative.GraftTableSourceProvider")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("avnow_out")
      .option("checkpointLocation", tmpDir("ts-avnow-ckpt"))
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    // AvailableNow's contract: process what exists, then terminate —
    // batch-style backfill jobs over a streaming table (Delta parity).
    assert(q.awaitTermination(120000))
    assert(spark.table("avnow_out").count() === 2)
    // a commit landing AFTER the drain is untouched until the next run
    t.append(Seq((3L, "c")).toDF("id", "s"))
    val q2 = spark.readStream
      .format("org.apache.spark.sql.graftnative.GraftTableSourceProvider")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("avnow_out2")
      .option("checkpointLocation", tmpDir("ts-avnow-ckpt2"))
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000))
    assert(spark.table("avnow_out2").count() === 3)
  }

  test("version-aware source streams appends, ignores compaction, rejects rewrites") {
    val dir = tmpDir("ts-vsrc")
    val t = GraftTable.create(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    val q = spark.readStream
      .format("org.apache.spark.sql.graftnative.GraftTableSourceProvider")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("vsrc_out")
      .option("checkpointLocation", tmpDir("ts-vsrc-ckpt"))
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("vsrc_out").count() === 1)
      t.append(Seq((2L, "b")).toDF("id", "s"))
      t.append(Seq((3L, "c")).toDF("id", "s"))
      q.processAllAvailable()
      assert(spark.table("vsrc_out").count() === 3)
      // compaction rewrites files but adds no rows: nothing re-emitted
      t.optimize()
      q.processAllAvailable()
      assert(spark.table("vsrc_out").count() === 3)
      // appends after compaction still flow
      t.append(Seq((4L, "d")).toDF("id", "s"))
      q.processAllAvailable()
      assert(spark.table("vsrc_out").as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      // a rewrite commit fails the stream with a clear contract error
      t.delete(col("id") === 1L)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("readChangeFeed source streams per-commit CDF batches for mutating tables") {
    val dir = tmpDir("ts-cdfsrc")
    val t = GraftTable.create(spark, dir, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    t.merge(Seq((2L, 25.0), (3L, 30.0)).toDF("id", "v"), "id") // v1
    val q = spark.readStream
      .format("org.apache.spark.sql.graftnative.GraftTableSourceProvider")
      .option("path", dir).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("cdfsrc_out")
      .option("checkpointLocation", tmpDir("ts-cdfsrc-ckpt"))
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdfsrc_out").count() === 3) // pre/post + insert
      // mutating commits keep flowing — deletes included, compaction silent
      t.delete(col("id") === 1L) // v2
      t.optimize()               // v3: no CDF
      t.merge(Seq((4L, 40.0)).toDF("id", "v"), "id") // v4
      q.processAllAvailable()
      val byType = spark.table("cdfsrc_out")
        .groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType("delete") === 1)
      assert(byType("insert") === 2) // id 3 and id 4
      val versions = spark.table("cdfsrc_out")
        .select("_commit_version").distinct().collect().map(_.getLong(0)).sorted.toSeq
      assert(versions === Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("readChangeFeed source synthesizes inserts for APPEND commits (batch parity)") {
    val dir = tmpDir("ts-cdfapp")
    val t = GraftTable.create(spark, dir, Seq((1L, 10.0)).toDF("id", "v"))
    t.merge(Seq((1L, 11.0)).toDF("id", "v"), "id")          // v1: real _changes dir
    t.append(Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v"))   // v2: no _changes dir
    val q = spark.readStream
      .format("graft")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName("cdfapp_out")
      .option("checkpointLocation", tmpDir("ts-cdfapp-ckpt"))
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // appends landing while the stream runs surface too
      t.append(Seq((4L, 40.0)).toDF("id", "v"))             // v3
      q.processAllAvailable()
      val streamed = spark.table("cdfapp_out")
        .select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === Set(
        (1L, "update_preimage", 1L), (1L, "update_postimage", 1L),
        (2L, "insert", 2L), (3L, "insert", 2L), (4L, "insert", 3L)))
      // batch and streaming CDF agree row-for-row over the same range
      val batch = t.readChanges(1L, 3L)
        .select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(batch === streamed)
    } finally q.stop()
  }

  test("maxVersionsPerTrigger slices a backlog into per-commit-range batches") {
    val dir = tmpDir("ts-throttle")
    val t = GraftTable.create(spark, dir, Seq((0L, "s")).toDF("id", "s"))
    (1L to 5L).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "s")))
    // 6 commits of backlog; one commit per micro-batch
    val batchSizes = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = spark.readStream
      .format("org.apache.spark.sql.graftnative.GraftTableSourceProvider")
      .option("path", dir)
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("ts-throttle-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()); ()
      }
      .start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val sizes = batchSizes.asScala.filter(_ > 0)
      assert(sizes.sum === 6)
      // throttled: the backlog must NOT arrive as one batch
      assert(sizes.length >= 6, s"expected one commit per batch, got $sizes")
    } finally q.stop()
  }

  test("maxBytesPerTrigger bounds each batch's admitted bytes") {
    val dir = tmpDir("ts-bytes")
    val t = GraftTable.create(spark, dir, Seq((0L, "s")).toDF("id", "s"))
    (1L to 4L).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "s")))
    // each appended dir is a few hundred bytes; a 1-byte budget forces the
    // always-admit-the-first-version rule per batch → one commit per batch
    val batchSizes = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = spark.readStream
      .format("graft")
      .option("maxBytesPerTrigger", "1")
      .load(dir)
      .writeStream
      .option("checkpointLocation", tmpDir("ts-bytes-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()); ()
      }
      .start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val sizes = batchSizes.asScala.filter(_ > 0)
      assert(sizes.sum === 5)
      assert(sizes.length >= 5, s"expected one commit per batch, got $sizes")
    } finally q.stop()

    // a budget large enough for everything admits the backlog in one batch
    val big = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q2 = spark.readStream
      .format("graft")
      .option("maxBytesPerTrigger", (64L * 1024 * 1024).toString)
      .load(dir)
      .writeStream
      .option("checkpointLocation", tmpDir("ts-bytes-ckpt2"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        big.add(df.count()); ()
      }
      .start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(big.asScala.filter(_ > 0).toSeq === Seq(5L))
    } finally q2.stop()
  }

  test("streamChanges delivers positional-DV delete and update CDF") {
    val t = GraftTable.create(spark, tmpDir("ts-dvcdf"),
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"))
    val q = t.streamChanges()
      .writeStream.format("memory").queryName("dvcdf_out")
      .option("checkpointLocation", tmpDir("ts-dvcdf-ckpt"))
      .outputMode(OutputMode.Append()).start()
    try {
      val cDel = t.deletePositional(col("id") === 2L)
      val cUpd = t.updatePositional(col("id") === 1L, Map("v" -> lit(11.0)))
      q.processAllAvailable()
      val rows = spark.table("dvcdf_out")
        .select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        (2L, "delete", cDel.version),
        (1L, "update_preimage", cUpd.version),
        (1L, "update_postimage", cUpd.version)))
    } finally q.stop()
  }

  test("streamChanges delivers CDF rows of merges and deletes") {
    val t = GraftTable.create(spark, tmpDir("ts-cdf"),
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    // commits BEFORE the stream starts are part of the feed too
    t.merge(Seq((2L, 25.0), (3L, 30.0)).toDF("id", "v"), "id")
    val q = t.streamChanges()
      .writeStream.format("memory").queryName("cdf_out")
      .option("checkpointLocation", tmpDir("ts-cdf-ckpt"))
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val first = spark.table("cdf_out")
        .select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(first === Set(
        (2L, "update_preimage", 1L), (2L, "update_postimage", 1L),
        (3L, "insert", 1L)))
      t.delete(col("id") === 1L)
      q.processAllAvailable()
      val afterDelete = spark.table("cdf_out")
        .filter($"_change_type" === "delete").collect()
      assert(afterDelete.length === 1)
      assert(afterDelete(0).getAs[Long]("id") === 1L)
      assert(afterDelete(0).getAs[Long]("_commit_version") === 2L)
    } finally q.stop()
  }
}
