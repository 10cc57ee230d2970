package graft.table

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `format("graft")` connector: SaveMode mapping, time travel / CDF
  * options, SQL `USING graft`, and pushdown reaching the scan. */
class GraftDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRows = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "bal")

  test("write-then-read roundtrip through format(\"graft\")") {
    val root = tmpDir("dsv1-rt")
    freshRows.write.format("graft").mode(SaveMode.Overwrite).save(root)
    val back = spark.read.format("graft").load(root)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b", "c"))
  }

  test("append mode lands an APPEND commit; overwrite replaces") {
    val root = tmpDir("dsv1-append")
    freshRows.write.format("graft").mode(SaveMode.Append).save(root) // creates
    Seq((4L, "d", 40.0)).toDF("id", "name", "bal")
      .write.format("graft").mode(SaveMode.Append).save(root)
    assert(spark.read.format("graft").load(root).count() == 4)
    assert(GraftTable.forPath(spark, root).history()
      .filter(col("operation") === "APPEND").count() == 1)

    Seq((9L, "z", 0.0)).toDF("id", "name", "bal")
      .write.format("graft").mode(SaveMode.Overwrite).save(root)
    assert(spark.read.format("graft").load(root).count() == 1)
  }

  test("ErrorIfExists refuses an existing table; Ignore leaves it untouched") {
    val root = tmpDir("dsv1-modes")
    freshRows.write.format("graft").save(root) // default ErrorIfExists, creates
    intercept[IllegalStateException] {
      freshRows.write.format("graft").save(root)
    }
    Seq((4L, "d", 40.0)).toDF("id", "name", "bal")
      .write.format("graft").mode(SaveMode.Ignore).save(root)
    assert(spark.read.format("graft").load(root).count() == 3)
  }

  test("versionAsOf and timestampAsOf options time-travel") {
    val root = tmpDir("dsv1-tt")
    freshRows.write.format("graft").save(root)
    val t = GraftTable.forPath(spark, root)
    val ts0 = t.history().filter(col("version") === 0L)
      .select("timestamp").head().getTimestamp(0).getTime
    Seq((4L, "d", 40.0)).toDF("id", "name", "bal")
      .write.format("graft").mode(SaveMode.Append).save(root)

    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(root).count() == 3)
    assert(spark.read.format("graft").option("timestampAsOf", ts0.toString)
      .load(root).count() == 3)
    assert(spark.read.format("graft").load(root).count() == 4)

    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "0")
        .option("readChangeFeed", "true").load(root).collect()
    }
  }

  test("readChangeFeed option serves CDF rows with version bounds") {
    val root = tmpDir("dsv1-cdf")
    freshRows.write.format("graft").save(root)
    Seq((4L, "d", 40.0)).toDF("id", "name", "bal")
      .write.format("graft").mode(SaveMode.Append).save(root)
    val cdf = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(root)
    assert(cdf.columns.contains("_change_type"))
    val rows = cdf.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("_change_type") == "insert")
  }

  test("CDF timestamp bounds resolve on the adjusted clock (options + table_changes)") {
    val root = tmpDir("dsv1-cdf-ts")
    freshRows.write.format("graft").save(root)
    Seq((4L, "d", 40.0)).toDF("id", "name", "bal")
      .write.format("graft").mode(SaveMode.Append).save(root)
    val t = GraftTable.forPath(spark, root)
    // the adjusted commit instants, read off history (they round-trip)
    val ts = t.history().orderBy("version")
      .collect().map(_.getAs[java.sql.Timestamp]("timestamp"))
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    val v1ts = fmt.format(ts(1))
    // startingTimestamp at v1's instant serves exactly v1's changes
    val viaOpt = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingTimestamp", v1ts)
      .load(root).collect()
    assert(viaOpt.length == 1 && viaOpt(0).getAs[Long]("id") == 4L)
    // API form with an end bound: the full range reproduces both commits
    assert(t.readChangesAsOf(ts(0).getTime, ts(1).getTime).count() ==
      t.readChanges(0, 1).count())
    // table_changes accepts a timestamp literal where Delta does
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdfts_t USING graft OPTIONS (path '$root')")
    val viaTvf = spark.sql(
      s"SELECT id FROM table_changes('cdfts_t', '$v1ts')").collect()
    assert(viaTvf.map(_.getLong(0)).toSeq == Seq(4L))
    // a start beyond the head refuses (Delta's after-latest-commit error)
    intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingTimestamp", "2999-01-01 00:00:00").load(root).collect()
    }
    // mixing version and timestamp for one bound refuses
    intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", "0").option("startingTimestamp", v1ts)
        .load(root).collect()
    }
  }

  test("SQL: CREATE TABLE USING graft OPTIONS(path) reads the table") {
    val root = tmpDir("dsv1-sql")
    freshRows.write.format("graft").save(root)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ds_sql USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT sum(bal) FROM ds_sql WHERE id <= 2").head().getDouble(0) == 30.0)
  }

  test("filters reach the relation scan (PushedFilters in the plan)") {
    val root = tmpDir("dsv1-push")
    freshRows.write.format("graft").save(root)
    val q = spark.read.format("graft").load(root).filter(col("id") === 2L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(id,2)"), plan)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("b"))
  }

  test("projection pruning: scan returns only requested columns") {
    val root = tmpDir("dsv1-prune")
    freshRows.write.format("graft").save(root)
    val q = spark.read.format("graft").load(root).select("name")
    assert(q.schema.fieldNames.toSeq == Seq("name"))
    assert(q.orderBy("name").collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }

  test("CTAS: CREATE TABLE … USING graft AS SELECT materializes a table") {
    val root = tmpDir("dsv1-ctas")
    spark.sql(s"CREATE TABLE ctas_graft USING graft OPTIONS (path '$root') " +
      "AS SELECT id, id * 2 AS doubled FROM range(5)")
    try {
      assert(GraftTable.isTable(spark, root))
      assert(spark.sql("SELECT sum(doubled) FROM ctas_graft").head().getLong(0) == 20L)
    } finally spark.sql("DROP TABLE ctas_graft")
  }

  test("SQL INSERT INTO a USING graft relation lands an APPEND commit") {
    val root = tmpDir("dsv1-insert")
    freshRows.write.format("graft").save(root)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ds_ins USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO ds_ins VALUES (4, 'd', 40.0)")
    assert(GraftTable.forPath(spark, root).read().count() == 4)
    assert(GraftTable.forPath(spark, root).history()
      .filter(col("operation") === "APPEND").count() == 1)
  }

  test("writeStream.format(\"graft\") appends one exactly-once commit per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("dsv1-sink")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "name").writeStream
      .format("graft")
      .option("checkpointLocation", tmpDir("dsv1-sink-ckpt"))
      .start(root)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.read.format("graft").load(root).count() == 2)
      input.addData((3L, "c"))
      q.processAllAvailable()
      val t = GraftTable.forPath(spark, root)
      assert(t.read().count() == 3)
      assert(t.history().filter(col("operation") === "APPEND").count() == 2)
    } finally q.stop()
  }

  test("sink stamp appId defaults to the query id — two queries never collide") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("dsv1-appid")
    // checkpoint set ONLY via the session conf: the sink's writer options
    // carry no checkpointLocation, so a table-root fallback would give BOTH
    // queries the same appId and the second query's batch 0 would be
    // silently skipped as a replay of the first's.
    spark.conf.set("spark.sql.streaming.checkpointLocation",
      tmpDir("dsv1-appid-ckpts"))
    try {
      val in1 = MemoryStream[(Long, String)]
      val q1 = in1.toDF().toDF("id", "name").writeStream.format("graft").start(root)
      try { in1.addData((1L, "a")); q1.processAllAvailable() } finally q1.stop()
      val in2 = MemoryStream[(Long, String)]
      val q2 = in2.toDF().toDF("id", "name").writeStream.format("graft").start(root)
      try { in2.addData((2L, "b")); q2.processAllAvailable() } finally q2.stop()
      assert(spark.read.format("graft").load(root).orderBy("id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
      // one APPEND commit per distinct (query, batch) — no skips, no dups
      assert(GraftTable.forPath(spark, root).history()
        .filter(col("operation") === "APPEND").count() == 2)
    } finally spark.conf.unset("spark.sql.streaming.checkpointLocation")
  }

  test("history and detail options serve table metadata") {
    val root = tmpDir("dsv1-meta")
    freshRows.write.format("graft").save(root)
    Seq((4L, "d", 40.0)).toDF("id", "name", "bal")
      .write.format("graft").mode(SaveMode.Append).save(root)
    val h = spark.read.format("graft").option("history", "true").load(root)
    assert(h.select("operation").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("APPEND", "CREATE"))
    val d = spark.read.format("graft").option("detail", "true").load(root)
    assert(d.count() == 1 && d.columns.contains("numFiles"))
  }

  test("readStream.format(\"graft\") streams appended versions into a graft sink") {
    val src = tmpDir("dsv1-ssrc")
    val dst = tmpDir("dsv1-sdst")
    freshRows.write.format("graft").save(src)
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("graft")
      .option("checkpointLocation", tmpDir("dsv1-s-ckpt"))
      .start(dst)
    try {
      q.processAllAvailable()
      assert(spark.read.format("graft").load(dst).count() == 3)
      Seq((4L, "d", 40.0)).toDF("id", "name", "bal")
        .write.format("graft").mode(SaveMode.Append).save(src)
      q.processAllAvailable()
      assert(spark.read.format("graft").load(dst).orderBy("id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("partitionBy option partitions the created table") {
    val root = tmpDir("dsv1-part")
    freshRows.withColumn("grp", col("id") % 2)
      .write.format("graft").option("partitionBy", "grp").save(root)
    assert(GraftTable.forPath(spark, root).read().count() == 3)
    // partition values round-trip (they live in dir paths)
    assert(spark.read.format("graft").load(root)
      .filter(col("grp") === 0L).count() == 1)
  }

  test("clusterBy option declares clustering at create") {
    val root = tmpDir("dsv1-cluster")
    freshRows.write.format("graft").option("clusterBy", "name, bal").save(root)
    val t = GraftTable.forPath(spark, root)
    assert(t.clusteringColumns === Seq("name", "bal"))
    // appends to the existing table leave the declaration untouched
    freshRows.write.format("graft").mode("append").save(root)
    assert(t.clusteringColumns === Seq("name", "bal"))
    assert(t.read().count() === 6)
  }
}
