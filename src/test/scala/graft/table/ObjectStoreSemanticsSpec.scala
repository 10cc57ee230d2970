package graft.table

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Object-store stand-in for S14: a Hadoop filesystem with s3-class
  * semantics — a custom scheme (so the commit seam must route by scheme,
  * not assume POSIX), and a rename() that silently REPLACES any existing
  * target (object-store "rename" is copy+delete; it arbitrates nothing).
  * Any engine reliance on rename refusal or hard-link EEXIST would pass on
  * local disk and corrupt the log here — which is exactly what this suite
  * exists to catch. Backed by local disk; instantiated by Hadoop via
  * reflection from `fs.s3fake.impl`. */
class FakeObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3fake"
  override def getUri: java.net.URI = java.net.URI.create("s3fake:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, true)
    super.rename(src, dst)
  }
}

object FakeObjectStoreFileSystem {
  /** Conditional-put publisher for the fake store: arbitration is an
    * atomic if-none-match primitive (CHM standing in for S3
    * `If-None-Match: *`), NOT the filesystem — mirroring how a real
    * object-store publisher uses the store API, never rename. */
  object Publisher extends ConditionalPutPublisher {
    private val keys = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val attempts = new AtomicInteger(0)
    val wins = new AtomicInteger(0)
    override protected def putIfAbsent(
        fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean = {
      attempts.incrementAndGet()
      if (keys.putIfAbsent(target.toString, true) != null) return false
      val out = fs.create(target, false)
      try out.write(bytes) finally out.close()
      wins.incrementAndGet()
      true
    }
  }
}

/** Drives the FULL table lifecycle — create, append, merge, delete,
  * update, optimize, vacuum, time travel, CDF, restore, checkpoint —
  * over the no-rename object-store filesystem, proving the versioned
  * layer needs nothing from the store beyond read/write/list/delete plus
  * one conditional put (the s3a deployment contract from SURVEY S14). */
class ObjectStoreSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def objectStoreRoot(prefix: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3fake.impl", classOf[FakeObjectStoreFileSystem].getName)
    CommitLog.registerPublisher("s3fake", FakeObjectStoreFileSystem.Publisher)
    "s3fake://" + tmpDir(prefix)
  }

  test("full mutation cycle over the no-rename object store") {
    val root = objectStoreRoot("os-cycle")
    val seed = (1L to 100L).map(i => (i, s"v$i", i * 1.0)).toDF("id", "name", "x")

    val t = GraftTable.create(spark, root, seed)                     // v0
    t.append((101L to 120L).map(i => (i, s"v$i", i * 1.0)).toDF("id", "name", "x")) // v1
    t.merge(Seq((1L, "updated", -1.0), (200L, "inserted", 0.0)).toDF("id", "name", "x"),
      "id")                                                          // v2
    t.delete(col("id") > 110L && col("id") <= 120L)                  // v3
    t.update(col("id") === 2L, Map("x" -> lit(42.0)))                // v4

    assert(t.read().count() === 111) // 100 + 20 + 1 insert - 10 deleted
    assert(t.read().filter(col("id") === 1L).head().getString(1) === "updated")
    assert(t.read().filter(col("id") === 2L).head().getDouble(2) === 42.0)

    // time travel + CDF read the pre-mutation states back
    assert(t.readVersion(0).count() === 100)
    assert(t.readVersion(1).count() === 120)
    val cdf = t.readChanges(fromVersion = 2, toVersion = 3)
    assert(cdf.filter(col("_change_type") === "insert").count() >= 1)
    assert(cdf.filter(col("_change_type") === "delete").count() === 10)

    val vBefore = t.version
    t.optimize(targetFileBytes = 256 * 1024)                         // v5
    assert(t.version === vBefore + 1)
    assert(t.read().count() === 111) // compaction changes layout, not data

    t.restore(0)                                                     // v6
    assert(t.read().count() === 100)
    new CommitLog(root, spark.sessionState.newHadoopConf()).checkpoint()
    val reopened = GraftTable.forPath(spark, root)
    assert(reopened.version === t.version)
    assert(reopened.read().count() === 100)

    // vacuum far in the future drops expired versions, head survives
    val future = System.currentTimeMillis() + 400L * 3600 * 1000
    val deleted = t.vacuum(retentionHours = 168.0, nowMs = future)
    assert(deleted.nonEmpty)
    assert(GraftTable.forPath(spark, root).read().count() === 100)

    // every commit went through the conditional-put seam
    assert(FakeObjectStoreFileSystem.Publisher.wins.get() >= 7)
  }

  test("streaming exactly-once appends + table-as-source over the no-rename store") {
    val root = objectStoreRoot("os-stream")
    GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "v"))

    // MemoryStream → foreachBatch appendOnce: the CDC sink shape, with
    // every commit publishing through the conditional-put seam
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", tmpDir("os-stream-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        GraftTable.forPath(spark, root).appendOnce(df, "os-app", batchId); ()
      }.start()
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      input.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()

    val t = GraftTable.forPath(spark, root)
    assert(t.read().count() === 4)
    // a replayed batch id is skipped (exactly-once survives restarts)
    assert(t.appendOnce(Seq((9L, "dup")).toDF("id", "v"), "os-app", 0L).isEmpty)
    assert(t.read().count() === 4)

    // and the object-store table streams back OUT as a source
    val out = t.streamAppends()
      .writeStream.format("memory").queryName("os_stream_out")
      .option("checkpointLocation", tmpDir("os-stream-out-ckpt"))
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      out.processAllAvailable()
      assert(spark.table("os_stream_out").count() === 4)
    } finally out.stop()
  }

  test("racing rewrites on the no-rename store: conditional put arbitrates") {
    val root = objectStoreRoot("os-race")
    GraftTable.create(spark, root, (1L to 50L).map(i => (i, i * 1.0)).toDF("id", "x"))
    val winsBefore = FakeObjectStoreFileSystem.Publisher.wins.get()
    val attemptsBefore = FakeObjectStoreFileSystem.Publisher.attempts.get()

    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val outcomes = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    (0 until 2).foreach { i =>
      val t = GraftTable.forPath(spark, root) // independent handles
      pool.execute { () =>
        start.await()
        try { t.delete(col("id") === (10L + i)); outcomes.add("ok"); () }
        catch {
          case _: ConcurrentWriteException => outcomes.add("conflict"); ()
          case e: Throwable => outcomes.add(s"unexpected: $e"); ()
        }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    val results = outcomes.asScala.toList
    assert(results.forall(r => r == "ok" || r == "conflict"), s"got $results")
    assert(results.contains("ok"))
    // On THIS store a same-version race can only have been decided by the
    // conditional put (rename overwrites silently, hard links unused):
    // wins advanced by exactly the successful deletes.
    val okCount = results.count(_ == "ok")
    assert(FakeObjectStoreFileSystem.Publisher.wins.get() - winsBefore === okCount)
    assert(FakeObjectStoreFileSystem.Publisher.attempts.get() - attemptsBefore >= okCount)
    val t = GraftTable.forPath(spark, root)
    assert(t.read().count() === (50 - okCount).toLong)
  }
}
