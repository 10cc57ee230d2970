package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpec
import graft.table.GraftTable

/** [[DeltaSkipping]] — file-level pruning over `add.stats` and
  * partitionValues: range/point/null/prefix skipping, exact partition
  * elimination, conservative keeps, and end-to-end equality with the
  * unpruned read. */
class DeltaSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def dataFile(table: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = tmpDir("skip-stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    val dest = Paths.get(table, name)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest, StandardCopyOption.REPLACE_EXISTING)
  }

  private def commit(table: String, version: Long, lines: Seq[String]): Unit = {
    val log = Paths.get(table, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"$version%020d.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  private val idS = new StructType().add("id", LongType).add("s", StringType)

  private def fixtureTable(): String = {
    val table = tmpDir("skip-fix")
    dataFile(table, "lo.parquet", Seq((1L, "apple"), (10L, "fig")).toDF("id", "s"))
    dataFile(table, "hi.parquet", Seq((100L, "pear"), (200L, "plum")).toDF("id", "s"))
    dataFile(table, "nul.parquet",
      Seq((500L, null.asInstanceOf[String]), (600L, null.asInstanceOf[String])).toDF("id", "s"))
    val meta = s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${idS.json.replace("\"", "\\\"")}","partitionColumns":[],"configuration":{}}}"""
    commit(table, 0L, Seq(
      """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta,
      """{"add":{"path":"lo.parquet","partitionValues":{},"size":1,"dataChange":true,""" +
        """"stats":"{\"numRecords\":2,\"minValues\":{\"id\":1,\"s\":\"apple\"},\"maxValues\":{\"id\":10,\"s\":\"fig\"},\"nullCount\":{\"id\":0,\"s\":0}}"}}""",
      """{"add":{"path":"hi.parquet","partitionValues":{},"size":1,"dataChange":true,""" +
        """"stats":"{\"numRecords\":2,\"minValues\":{\"id\":100,\"s\":\"pear\"},\"maxValues\":{\"id\":200,\"s\":\"plum\"},\"nullCount\":{\"id\":0,\"s\":0}}"}}""",
      """{"add":{"path":"nul.parquet","partitionValues":{},"size":1,"dataChange":true,""" +
        """"stats":"{\"numRecords\":2,\"minValues\":{\"id\":500},\"maxValues\":{\"id\":600},\"nullCount\":{\"id\":0,\"s\":2}}"}}"""))
    table
  }

  private def prunedPaths(table: String,
      pred: org.apache.spark.sql.Column): Set[String] = {
    val s = DeltaImport.snapshot(spark, table)
    DeltaSkipping.prune(spark, s, pred).map(_.path).toSet
  }

  test("range and point predicates prune by min/max; results stay exact") {
    val table = fixtureTable()
    assert(prunedPaths(table, col("id") < 50L) === Set("lo.parquet"))
    assert(prunedPaths(table, col("id") >= 150L) === Set("hi.parquet", "nul.parquet"))
    assert(prunedPaths(table, col("id") === 600L) === Set("nul.parquet"))
    assert(prunedPaths(table, col("id") === 50L) === Set.empty)
    assert(prunedPaths(table, col("id") isin (5L, 550L))
      === Set("lo.parquet", "nul.parquet"))
    // OR keeps the union; AND intersects
    assert(prunedPaths(table, col("id") < 5L || col("id") > 550L)
      === Set("lo.parquet", "nul.parquet"))
    assert(prunedPaths(table, col("id") > 50L && col("id") < 300L) === Set("hi.parquet"))
    // string bounds
    assert(prunedPaths(table, col("s") === "banana") === Set("lo.parquet"))
    assert(prunedPaths(table, col("s").startsWith("pe")) === Set("hi.parquet"))
    // where() equals read().filter() on every predicate above
    for (p <- Seq(col("id") < 50L, col("id") === 600L, col("s") === "banana",
        col("id") > 50L && col("id") < 300L)) {
      val a = DeltaImport.where(spark, table, p).collect().toSet
      val b = DeltaImport.read(spark, table).filter(p).collect().toSet
      assert(a === b, p.toString)
    }
  }

  test("null-count skipping: IS NULL / IS NOT NULL and all-null comparisons") {
    val table = fixtureTable()
    assert(prunedPaths(table, col("s").isNull) === Set("nul.parquet"))
    assert(prunedPaths(table, col("s").isNotNull) === Set("lo.parquet", "hi.parquet"))
    // comparisons on a provably all-null column can't match
    assert(prunedPaths(table, col("s") === "x" && col("id") >= 400L) === Set.empty)
  }

  test("partition values prune exactly; unknown shapes keep all files") {
    val table = tmpDir("skip-part")
    val s2 = new StructType().add("id", LongType).add("region", StringType)
    dataFile(table, "us.parquet", Seq(Tuple1(1L)).toDF("id"))
    dataFile(table, "de.parquet", Seq(Tuple1(2L)).toDF("id"))
    val meta = s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${s2.json.replace("\"", "\\\"")}","partitionColumns":["region"],"configuration":{}}}"""
    commit(table, 0L, Seq(
      """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta,
      """{"add":{"path":"us.parquet","partitionValues":{"region":"us"},"size":1,"dataChange":true}}""",
      """{"add":{"path":"de.parquet","partitionValues":{"region":"de"},"size":1,"dataChange":true}}"""))
    assert(prunedPaths(table, col("region") === "us") === Set("us.parquet"))
    assert(prunedPaths(table, col("region") > "eu") === Set("us.parquet"))
    assert(prunedPaths(table, col("region").isNotNull)
      === Set("us.parquet", "de.parquet"))
    // no stats on id: comparisons keep everything (conservative)
    assert(prunedPaths(table, col("id") === 1L) === Set("us.parquet", "de.parquet"))
    // unrecognized shape: conservative keep
    assert(prunedPaths(table, length(col("region")) === 2)
      === Set("us.parquet", "de.parquet"))
    val rows = DeltaImport.where(spark, table, col("region") === "us")
      .select("id", "region").as[(Long, String)].collect().toSet
    assert(rows === Set((1L, "us")))
  }

  test("unorderable partition types never read as null: timestamp partition keeps files") {
    import org.apache.spark.sql.types.TimestampType
    val table = tmpDir("skip-tspart")
    val s2 = new StructType().add("id", LongType).add("ts", TimestampType)
    dataFile(table, "a.parquet", Seq(Tuple1(1L)).toDF("id"))
    val meta = s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${s2.json.replace("\"", "\\\"")}","partitionColumns":["ts"],"configuration":{}}}"""
    commit(table, 0L, Seq(
      """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta,
      """{"add":{"path":"a.parquet","partitionValues":{"ts":"2024-01-01 00:00:00"},"size":1,"dataChange":true}}"""))
    // a concrete partition value must never read as the null partition:
    // IsNotNull (pushed alongside every comparison) keeps the file
    assert(prunedPaths(table, col("ts").isNotNull) === Set("a.parquet"))
    assert(prunedPaths(table, col("ts") >= "2020-01-01") === Set("a.parquet"))
    assert(prunedPaths(table, col("ts").isNull) === Set.empty) // value present: exact
    // timestamp partitions order exactly (UTC sessions): out-of-range prunes
    assert(prunedPaths(table, col("ts") < "2020-01-01") === Set.empty)
    assert(prunedPaths(table, col("ts") === "2024-01-01 00:00:00") === Set("a.parquet"))
    val n = DeltaImport.where(spark, table, col("ts").isNotNull).count()
    assert(n === 1L)

    // under a non-UTC session the partition wall clock shifts WITH the
    // session zone (Delta's convention: values render in the writer's
    // session zone, parse in the reader's) — bounds stay consistent with
    // how the partition column itself materializes, so results are exact
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val rows = DeltaImport.where(spark, table,
        col("ts") === "2024-01-01 00:00:00").count()
      assert(rows === 1L) // literal and partition parse in the SAME zone
      assert(prunedPaths(table, col("ts") === "2024-01-01 00:00:00")
        === Set("a.parquet"))
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }

  test("exported graft tables prune through their own stats via the connector") {
    val root = tmpDir("skip-exp")
    val t = GraftTable.create(spark, root,
      spark.range(0, 1000).select(col("id"), (col("id") % 10).as("k")), Nil)
    t.append(spark.range(1000, 2000).select(col("id"), (col("id") % 10).as("k")))
    DeltaExport.exportLog(t)

    val s = DeltaImport.snapshot(spark, root)
    assert(s.files.forall(_.stats.nonEmpty)) // export wrote per-file stats
    val kept = DeltaSkipping.prune(spark, s, col("id") < 100L)
    assert(kept.size < s.files.size, s"pruned ${kept.size} of ${s.files.size}")

    // the SQL/connector path returns exact results with pruning active
    val viaSql = spark.read.format("graft-delta").load(root)
      .filter(col("id") >= 1990L).agg(count(lit(1)).as("n"), sum("k").as("sk"))
      .as[(Long, Long)].head()
    assert(viaSql === ((10L, (1990L to 1999L).map(_ % 10).sum)))
  }

  test("column-mapped tables prune through PHYSICAL stats keys on renamed columns") {
    val root = tmpDir("skip-colmap")
    val t = GraftTable.create(spark, root,
      spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v")), Nil)
    t.renameColumnMetadataOnly("v", "value")
    // post-rename append: files + stats carry the physical name "v"
    t.append(spark.range(1000, 2000).select(col("id"), (col("id") * 2).as("value")))
    DeltaExport.exportLog(t)

    val s = DeltaImport.snapshot(spark, root)
    assert(s.configuration.get("delta.columnMapping.mode") === Some("name"))
    // a predicate on the LOGICAL name must reach the physical stats keys
    // — without the mapping lookup every file conservatively survives
    val kept = DeltaSkipping.prune(spark, s, col("value") < 100L)
    assert(kept.size < s.files.size,
      s"mapped-column pruning kept all ${s.files.size} files")
    // and the pruned read is still exact
    val rows = DeltaImport.where(spark, root, col("value") < 100L)
      .agg(count(lit(1))).head().getLong(0)
    assert(rows === 50L)
  }
}
