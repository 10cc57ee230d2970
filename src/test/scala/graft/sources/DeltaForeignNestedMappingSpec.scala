package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.MergeClause

/** NESTED column mapping on the foreign write verbs: a table whose inner
  * struct fields carry `delta.columnMapping.physicalName` annotations
  * (delta-spark assigns them at every nesting level in `name` mode) used
  * to be refused by every writer gate; staging now renders frames under
  * the FULL physical schema via one positional struct cast per column
  * (`DeltaImport.physicalRender`), the mirror image of what the reader's
  * logical restore does. These specs drive append / clause merge /
  * update / DV delete / CDF against a hand-written nested-mapped log and
  * assert both the logical round-trip AND that the staged parquet
  * carries physical names at BOTH levels (a logically-named inner field
  * would be invisible to every other engine's reader). */
class DeltaForeignNestedMappingSpec extends SparkSpec {
  import spark.implicits._

  private def meta(phys: String, id: Long): Metadata = new MetadataBuilder()
    .putString("delta.columnMapping.physicalName", phys)
    .putLong("delta.columnMapping.id", id).build()

  private val payloadType = StructType(Seq(
    StructField("a", StringType, nullable = true, meta("col-a3", 3)),
    StructField("b", LongType, nullable = true, meta("col-b4", 4))))
  private val tableSchema = StructType(Seq(
    StructField("k", LongType, nullable = false, meta("col-k1", 1)),
    StructField("payload", payloadType, nullable = true, meta("col-p2", 2))))

  /** v0 log: columnMapping name mode + deletionVectors advertised, so
    * every verb (update needs DVs) can run against it. */
  private def fixture(prefix: String, cdf: Boolean = false): String = {
    val root = tmpDir(prefix)
    val logDir = new Path(root, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(logDir)
    val cfg = (if (cdf) """"delta.enableChangeDataFeed":"true",""" else "") +
      """"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"4""""
    val v0 =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping","deletionVectors"],""" +
        """"writerFeatures":["columnMapping","deletionVectors"""" +
        (if (cdf) ""","changeDataFeed"]}}""" else """]}}""") + "\n" +
        s"""{"metaData":{"id":"nested-map","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${org.json4s.jackson.JsonMethods
          .compact(org.json4s.JString(tableSchema.json))},"partitionColumns":[],""" +
        s""""configuration":{$cfg}}}""" + "\n"
    val out = fs.create(new Path(logDir, f"${0L}%020d.json"), false)
    out.write(v0.getBytes("UTF-8")); out.close()
    root
  }

  private def rows(ks: Seq[(Long, String, Long)]) =
    ks.toDF("k", "a", "b")
      .select(col("k"), struct(col("a"), col("b")).as("payload"))

  /** Leaf names of every staged data file, as parquet declares them. */
  private def stagedParquetLeaves(root: String): Set[String] = {
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(root, "_appends"), true)
    val names = Set.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          st.getPath, spark.sessionState.newHadoopConf()))
        try {
          val md = r.getFooter.getFileMetaData.getSchema
          import scala.jdk.CollectionConverters._
          md.getPaths.asScala.foreach(p => p.foreach(n => names += n))
        } finally r.close()
      }
    }
    names.result()
  }

  test("append: nested physical names on disk, logical names on read") {
    val root = fixture("nm-append")
    DeltaExport.appendToForeign(spark, root,
      rows(Seq((1L, "x", 10L), (2L, "y", 20L))))
    val back = DeltaImport.read(spark, root)
      .select(col("k"), col("payload.a"), col("payload.b"))
      .as[(Long, String, Long)].collect().toSet
    assert(back === Set((1L, "x", 10L), (2L, "y", 20L)))
    val leaves = stagedParquetLeaves(root)
    assert(leaves === Set("col-k1", "col-p2", "col-a3", "col-b4"),
      s"staged parquet must carry PHYSICAL names at every level: $leaves")
  }

  test("clause merge: nested update + insert round-trips logically") {
    val root = fixture("nm-merge")
    DeltaExport.appendToForeign(spark, root,
      rows(Seq((1L, "x", 10L), (2L, "y", 20L))))
    val (v, u, _, i) = DeltaExport.mergeForeignClauses(spark, root,
      rows(Seq((2L, "Y", 22L), (3L, "z", 30L))), Seq("k"),
      matched = Seq(MergeClause.UpdateAll()),
      notMatched = Seq(MergeClause.InsertAll()))
    assert(v === 2L && u === 1L && i === 1L)
    val back = DeltaImport.read(spark, root)
      .select(col("k"), col("payload.a"), col("payload.b"))
      .as[(Long, String, Long)].collect().toSet
    assert(back === Set((1L, "x", 10L), (2L, "Y", 22L), (3L, "z", 30L)))
  }

  test("update + DV delete with predicates over the NESTED field") {
    val root = fixture("nm-update")
    DeltaExport.appendToForeign(spark, root,
      rows(Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))))
    val (_, nUpd) = DeltaExport.updateForeign(spark, root,
      col("payload.b") === 20L,
      Map("payload" -> struct(lit("Y").as("a"), lit(200L).as("b"))))
    assert(nUpd === 1L)
    val (_, nDel) = DeltaExport.deleteFromForeign(spark, root,
      col("payload.b") === 30L)
    assert(nDel === 1L)
    val back = DeltaImport.read(spark, root)
      .select(col("k"), col("payload.a"), col("payload.b"))
      .as[(Long, String, Long)].collect().toSet
    assert(back === Set((1L, "x", 10L), (2L, "Y", 200L)))
  }

  test("CDF images of a nested-mapped merge read back logically") {
    val root = fixture("nm-cdf", cdf = true)
    DeltaExport.appendToForeign(spark, root, rows(Seq((1L, "x", 10L))))
    DeltaExport.mergeForeignClauses(spark, root,
      rows(Seq((1L, "X", 11L), (4L, "w", 40L))), Seq("k"),
      matched = Seq(MergeClause.UpdateAll()),
      notMatched = Seq(MergeClause.InsertAll()))
    val changes = DeltaImport.readChanges(spark, root, 2L, 2L)
      .select(col("_change_type"), col("k"), col("payload.a"))
      .as[(String, Long, String)].collect().toSet
    assert(changes === Set(
      ("update_preimage", 1L, "x"), ("update_postimage", 1L, "X"),
      ("insert", 4L, "w")))
  }
}
