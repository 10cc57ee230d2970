package graft.table

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** COPY INTO ([[GraftTable.copyInto]] + its SQL spelling) — Delta's
  * idempotent bulk file load: the loaded-file ledger rides in the commit
  * itself ([[Commit.copiedFiles]]), so re-running a statement is a no-op
  * and a crash can never load a file twice or lose one. */
class CopyIntoSpec extends SparkSpec {

  private def writeOneFile(dir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val staging = tmpDir("copy-staging")
    rows.toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(staging)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val part = fs.listStatus(new Path(staging))
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath
    fs.rename(part, new Path(dir, name))
  }

  test("loads fresh files once; re-run is a no-op; later files load incrementally") {
    import spark.implicits._
    val root = tmpDir("copyinto") + "/tbl"
    val src = tmpDir("copyinto-src")
    val t = GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "s"))
    writeOneFile(src, "a.parquet", Seq((1L, "a")))
    writeOneFile(src, "b.parquet", Seq((2L, "b")))

    val c1 = t.copyInto(src, "*.parquet")
    assert(c1.nonEmpty)
    assert(c1.get.copiedFiles.size === 2)
    assert(c1.get.operation === "COPY INTO")
    assert(t.read().count() === 3)
    // idempotent: same statement again loads nothing, commits nothing
    val v = t.version
    assert(t.copyInto(src, "*.parquet").isEmpty)
    assert(t.version === v)
    // a file arriving later is the only thing the next run loads
    writeOneFile(src, "c.parquet", Seq((3L, "c")))
    val c2 = t.copyInto(src, "*.parquet")
    assert(c2.get.copiedFiles.map(p => new Path(p).getName) === Seq("c.parquet"))
    assert(t.read().count() === 4)
    // the ledger is visible in history (one COPY INTO row per load)
    assert(t.history().collect().count(_.getAs[String]("operation") === "COPY INTO") === 2)
  }

  test("hidden files are skipped; COPY INTO needs an existing table") {
    import spark.implicits._
    val root = tmpDir("copyinto2") + "/tbl"
    val src = tmpDir("copyinto2-src")
    writeOneFile(src, "data.parquet", Seq((1L, "a")))
    writeOneFile(src, "_hidden.parquet", Seq((99L, "no")))
    // no table there yet: forPath/copyInto refuse rather than auto-create
    val missing = intercept[Exception] {
      GraftTable.forPath(spark, root).copyInto(src)
    }
    assert(missing.getMessage.contains("no graft table") ||
      missing.getMessage.contains("existing table"))
    val t = GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "s"))
    val c = t.copyInto(src, "*.parquet")
    assert(c.get.copiedFiles.size === 1)
    assert(t.read().count() === 2)
  }

  test("a matched directory expands to the data files under it") {
    import spark.implicits._
    val root = tmpDir("copyinto4") + "/tbl"
    val src = tmpDir("copyinto4-src")
    // a parquet DIRECTORY (part files + _SUCCESS) — FROM 'src' must load
    // its data files and skip the hidden marker
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .repartition(2).write.mode("overwrite").parquet(s"$src/batch")
    val t = GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "s"))
    val c = t.copyInto(src) // default pattern * matches the batch dir
    assert(c.nonEmpty && t.read().count() === 3)
    assert(c.get.copiedFiles.forall(_.endsWith(".parquet")))
    // idempotent across the expansion too
    assert(t.copyInto(src).isEmpty)
  }

  test("FILEFORMAT = JSON loads and schema-aligns") {
    import spark.implicits._
    val root = tmpDir("copyinto5") + "/tbl"
    val src = tmpDir("copyinto5-src")
    new java.io.File(src).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/rows.json"),
      """{"id": 5, "s": "j1"}
        |{"id": 6, "s": "j2"}""".stripMargin.getBytes("UTF-8"))
    val t = GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "s"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW copyj_t USING graft OPTIONS (path '$root')")
    val res = spark.sql(
      s"COPY INTO copyj_t FROM '$src' FILEFORMAT = JSON PATTERN = '*.json'").head()
    assert(res.getLong(0) === 2)
    assert(t.read().count() === 3)
  }

  test("ledger identity survives URI-spelling differences across patterns") {
    import spark.implicits._
    val root = tmpDir("copyinto8") + "/tbl"
    val src = tmpDir("copyinto8-src")
    val t = GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "s"))
    writeOneFile(src, "a.parquet", Seq((1L, "a")))
    // A literal pattern lists the file as file:///…, a wildcard as file:/…
    // (Hadoop keeps null vs empty authority distinct); the ledger must
    // treat both spellings as the SAME file.
    assert(t.copyInto(src, "a.parquet").nonEmpty)
    assert(t.copyInto(src, "*.parquet").isEmpty)
    assert(t.read().count() === 2)
  }

  test("cross-process race: a concurrent COPY INTO claiming a subset never double-loads") {
    import spark.implicits._
    val root = tmpDir("copyinto6") + "/tbl"
    val src = tmpDir("copyinto6-src")
    val t = GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "s"))
    writeOneFile(src, "a.parquet", Seq((1L, "a")))
    writeOneFile(src, "b.parquet", Seq((2L, "b")))
    // "another process": a second instance over the same root (the JVM
    // lock is per-instance, so this exercises the log-level race exactly).
    val other = GraftTable.forPath(spark, root)
    // After t computed fresh = {a, b} and wrote its dir, but BEFORE its
    // commit publishes, the other process loads a.parquet.
    t.beforeCommitHook = () => {
      t.beforeCommitHook = () => ()
      assert(other.copyInto(src, "a.parquet").nonEmpty)
    }
    val c = t.copyInto(src, "*.parquet")
    // t must detect the ledger overlap, roll back, and load ONLY b.
    assert(c.get.copiedFiles.map(p => new Path(p).getName) === Seq("b.parquet"))
    assert(t.read().count() === 3)
    assert(t.read().select("id").as[Long].collect().sorted === Array(0L, 1L, 2L))
  }

  test("cross-process race: a full concurrent replay makes the loser a no-op") {
    import spark.implicits._
    val root = tmpDir("copyinto7") + "/tbl"
    val src = tmpDir("copyinto7-src")
    val t = GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "s"))
    writeOneFile(src, "a.parquet", Seq((1L, "a")))
    val other = GraftTable.forPath(spark, root)
    t.beforeCommitHook = () => {
      t.beforeCommitHook = () => ()
      assert(other.copyInto(src, "*.parquet").nonEmpty)
    }
    // the other process claimed EVERY file first: the loser commits nothing
    assert(t.copyInto(src, "*.parquet").isEmpty)
    assert(t.read().count() === 2)
    // and the log holds exactly one COPY INTO commit
    assert(t.history().collect().count(_.getAs[String]("operation") === "COPY INTO") === 1)
  }

  test("SQL spelling with PATTERN, through the injected parser") {
    import spark.implicits._
    val root = tmpDir("copyinto3") + "/tbl"
    val src = tmpDir("copyinto3-src")
    GraftTable.create(spark, root, Seq((0L, "seed")).toDF("id", "s"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW copy_t USING graft OPTIONS (path '$root')")
    writeOneFile(src, "x.parquet", Seq((1L, "x")))
    writeOneFile(src, "skipme.data", Seq((9L, "no"))) // pattern excludes it
    val res = spark.sql(
      s"COPY INTO copy_t FROM '$src' FILEFORMAT = PARQUET PATTERN = '*.parquet'").head()
    assert(res.getLong(0) === 1 && res.getLong(1) === 1)
    // re-run: zero rows, zero files
    val res2 = spark.sql(
      s"COPY INTO copy_t FROM '$src' FILEFORMAT = PARQUET PATTERN = '*.parquet'").head()
    assert(res2.getLong(0) === 0 && res2.getLong(1) === 0)
    assert(spark.sql("SELECT count(*) FROM copy_t").head().getLong(0) === 2)
  }
}
