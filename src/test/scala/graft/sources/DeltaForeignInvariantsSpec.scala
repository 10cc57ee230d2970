package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.MergeClause

/** Legacy `delta.invariants` (PROTOCOL.md "Column Invariants", writer
  * version 2 — the pre-CHECK-constraints form) now VALIDATE on foreign
  * writes instead of refusing the table: a conforming batch commits, a
  * violating batch refuses with the invariant named and the staging
  * reaped, and — delta-spark's CheckDeltaInvariant convention — a NULL
  * predicate result counts as a violation (unlike `delta.constraints.*`,
  * where unknown passes). Fixtures are hand-written foreign logs: graft's
  * native tables never carry invariant metadata, exactly like the
  * descending-identity fixture in DeltaForeignAppendSpec. */
class DeltaForeignInvariantsSpec extends SparkSpec {
  import spark.implicits._

  /** v0 log: schema (k long, v long nullable) where v carries the legacy
    * invariant `v > 0`. minWriterVersion 2 — the true legacy protocol
    * shape, no table-features list at all. */
  private def fixture(prefix: String,
      invariantDoc: String =
        """{\"expression\":{\"expression\":\"v > 0\"}}"""): String = {
    val root = tmpDir(prefix)
    val logDir = new Path(root, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(logDir)
    val schema = ("""{"type":"struct","fields":[""" +
      """{"name":"k","type":"long","nullable":false,"metadata":{}},""" +
      """{"name":"v","type":"long","nullable":true,"metadata":{""" +
      s""""delta.invariants":"$invariantDoc"}}]}""")
    val v0 =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        s"""{"metaData":{"id":"legacy-inv","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${org.json4s.jackson.JsonMethods
          .compact(org.json4s.JString(schema))},"partitionColumns":[],""" +
        """"configuration":{}}}""" + "\n"
    val out = fs.create(new Path(logDir, f"${0L}%020d.json"), false)
    out.write(v0.getBytes("UTF-8")); out.close()
    root
  }

  test("append: conforming batch commits; violating batch refused by name") {
    val root = fixture("inv-append")
    val v1 = DeltaExport.appendToForeign(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    assert(v1 === 1L)
    assert(DeltaImport.read(spark, root).count() === 2L)

    val err = intercept[IllegalArgumentException] {
      DeltaExport.appendToForeign(spark, root,
        Seq((3L, 30L), (4L, -4L)).toDF("k", "v"))
    }
    assert(err.getMessage.contains("invariant v"))
    // refusal reaped the staging and published nothing
    assert(DeltaImport.snapshot(spark, root).version === 1L)
    assert(DeltaImport.read(spark, root).count() === 2L)
  }

  test("append: NULL invariant result violates (CheckDeltaInvariant rule)") {
    val root = fixture("inv-null")
    val err = intercept[IllegalArgumentException] {
      DeltaExport.appendToForeign(spark, root,
        Seq((1L, Some(5L)), (2L, None)).toDF("k", "v"))
    }
    assert(err.getMessage.contains("invariant v"))
    assert(err.getMessage.contains("1 row(s)"))
  }

  test("clause merge: violating insert refused, conforming merge commits") {
    val root = fixture("inv-merge")
    DeltaExport.appendToForeign(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))

    val err = intercept[IllegalArgumentException] {
      DeltaExport.mergeForeignClauses(spark, root,
        Seq((2L, -2L), (9L, 90L)).toDF("k", "v"), Seq("k"),
        matched = Seq(MergeClause.UpdateAll()),
        notMatched = Seq(MergeClause.InsertAll()))
    }
    assert(err.getMessage.contains("invariant v"))
    assert(DeltaImport.snapshot(spark, root).version === 1L)

    val (v2, updated, _, inserted) = DeltaExport.mergeForeignClauses(spark,
      root, Seq((2L, 22L), (9L, 90L)).toDF("k", "v"), Seq("k"),
      matched = Seq(MergeClause.UpdateAll()),
      notMatched = Seq(MergeClause.InsertAll()))
    assert(v2 === 2L && updated === 1L && inserted === 1L)
    val rows = DeltaImport.read(spark, root).as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 10L, 2L -> 22L, 9L -> 90L))
  }

  test("upsert API: invariant tables no longer refused, violations still are") {
    val root = fixture("inv-upsert")
    DeltaExport.appendToForeign(spark, root, Seq((1L, 10L)).toDF("k", "v"))
    val (_, m, i) = DeltaExport.mergeForeignUpsert(spark, root,
      Seq((1L, 11L), (5L, 50L)).toDF("k", "v"), "k")
    assert(m === 1L && i === 1L)
    val err = intercept[IllegalArgumentException] {
      DeltaExport.mergeForeignUpsert(spark, root,
        Seq((5L, 0L)).toDF("k", "v"), "k")
    }
    assert(err.getMessage.contains("invariant v"))
  }

  test("malformed invariant document refuses up front, before staging") {
    val root = fixture("inv-malformed",
      invariantDoc = """{\"not\":\"the protocol shape\"}""")
    val err = intercept[IllegalArgumentException] {
      DeltaExport.appendToForeign(spark, root, Seq((1L, 1L)).toDF("k", "v"))
    }
    assert(err.getMessage.contains("malformed delta.invariants"))
    // nothing staged into the table root
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(root, "_appends")))
  }

  test("rename refused while a legacy invariant references the column") {
    // An invariant document keeps its SQL verbatim through a rename; since
    // every foreign write re-evaluates invariants, renaming v would leave
    // `v > 0` unresolvable and brick all subsequent writes.
    val root = fixture("inv-rename")
    DeltaExport.appendToForeign(spark, root, Seq((1L, 10L)).toDF("k", "v"))
    DeltaExport.setForeignProperties(spark, root,
      Map("delta.columnMapping.mode" -> "name"))
    val err = intercept[IllegalArgumentException] {
      DeltaExport.renameForeignColumn(spark, root, "v", "val")
    }
    assert(err.getMessage.contains("legacy invariant on v"))
    // a column the invariant does NOT reference still renames, and the
    // invariant keeps validating writes afterwards
    DeltaExport.renameForeignColumn(spark, root, "k", "kk")
    DeltaExport.appendToForeign(spark, root, Seq((2L, 20L)).toDF("kk", "v"))
    val err2 = intercept[IllegalArgumentException] {
      DeltaExport.appendToForeign(spark, root, Seq((3L, -3L)).toDF("kk", "v"))
    }
    assert(err2.getMessage.contains("invariant v"))
  }

  test("invariant inside an array element struct refuses the write") {
    // Not expressible as a row predicate (many elements per row) — the
    // owning engine enforces it per-element at its own writes; both
    // collecting and skipping would be wrong, so the write refuses.
    val root = tmpDir("inv-array")
    val logDir = new Path(root, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(logDir)
    val schema = ("""{"type":"struct","fields":[""" +
      """{"name":"k","type":"long","nullable":false,"metadata":{}},""" +
      """{"name":"arr","type":{"type":"array","elementType":""" +
      """{"type":"struct","fields":[{"name":"x","type":"long",""" +
      """"nullable":true,"metadata":{"delta.invariants":""" +
      """"{\"expression\":{\"expression\":\"x > 0\"}}"}}]},""" +
      """"containsNull":true},"nullable":true,"metadata":{}}]}""")
    val v0 =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        s"""{"metaData":{"id":"array-inv","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${org.json4s.jackson.JsonMethods
          .compact(org.json4s.JString(schema))},"partitionColumns":[],""" +
        """"configuration":{}}}""" + "\n"
    val out = fs.create(new Path(logDir, f"${0L}%020d.json"), false)
    out.write(v0.getBytes("UTF-8")); out.close()

    val err = intercept[IllegalArgumentException] {
      DeltaExport.appendToForeign(spark, root,
        Seq((1L, Seq(Tuple1(1L)))).toDF("k", "arr"))
    }
    assert(err.getMessage.contains("array/map element"))
    assert(!fs.exists(new Path(root, "_appends")))
  }

  test("feature-form table (minWriterVersion 7, invariants listed) accepted") {
    val root = tmpDir("inv-feature")
    val logDir = new Path(root, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(logDir)
    val schema = ("""{"type":"struct","fields":[""" +
      """{"name":"k","type":"long","nullable":false,"metadata":{}},""" +
      """{"name":"v","type":"long","nullable":true,"metadata":{""" +
      """"delta.invariants":"{\"expression\":{\"expression\":\"v > 0\"}}"}}]}""")
    val v0 =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["invariants"]}}""" + "\n" +
        s"""{"metaData":{"id":"feat-inv","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${org.json4s.jackson.JsonMethods
          .compact(org.json4s.JString(schema))},"partitionColumns":[],""" +
        """"configuration":{}}}""" + "\n"
    val out = fs.create(new Path(logDir, f"${0L}%020d.json"), false)
    out.write(v0.getBytes("UTF-8")); out.close()

    DeltaExport.appendToForeign(spark, root, Seq((1L, 1L)).toDF("k", "v"))
    assert(DeltaImport.read(spark, root).count() === 1L)
    val err = intercept[IllegalArgumentException] {
      DeltaExport.appendToForeign(spark, root, Seq((2L, -1L)).toDF("k", "v"))
    }
    assert(err.getMessage.contains("invariant v"))
  }
}
