package graft.table

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** ALTER TABLE … DROP FEATURE deletionVectors: Delta's feature-downgrade
  * lifecycle — purge precondition, historical-traces refusal, TRUNCATE
  * HISTORY semantics (time travel floor, history cut, data intact), the
  * mirror's protocol downgrade action, and the SQL spelling. */
class DropFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String): (GraftTable, String) = {
    val root = tmpDir(tag)
    val t = GraftTable.create(spark, root,
      (1L to 30L).map(i => (i, s"row$i")).toDF("k", "s"))
    (t, root)
  }

  test("refuses while the current snapshot carries DVs; purge unblocks") {
    val (t, _) = mk("dropdv-cur")
    t.deletePositional(col("k") % 3 === 0)
    val e = intercept[IllegalArgumentException](t.dropFeature("deletionVectors"))
    assert(e.getMessage.contains("materializeDeletes"))
    t.materializeDeletes()
    // clean snapshot, but DV history remains → needs TRUNCATE HISTORY
    val e2 = intercept[IllegalStateException](t.dropFeature("deletionVectors"))
    assert(e2.getMessage.contains("truncateHistory"))
  }

  test("TRUNCATE HISTORY: floor moves, data intact, old versions gone") {
    val (t, root) = mk("dropdv-trunc")
    t.deletePositional(col("k") % 3 === 0)   // v1: DVs
    t.materializeDeletes()                   // v2: clean rewrite
    val c = t.dropFeature("deletionVectors", truncateHistory = true) // v3
    assert(c.operation === "DROP FEATURE deletionVectors")
    // survivors unchanged
    assert(t.read().select("k").as[Long].collect().sorted
      === (1L to 30L).filterNot(_ % 3 == 0).toArray)
    // history starts at the drop commit
    val hist = t.history().select("version").as[Long].collect().sorted
    assert(hist === Array(c.version))
    // time travel below the floor fails version lookup
    intercept[Exception](t.readVersion(0).collect())
    // superseded dirs were reclaimed: one data dir (the purge rewrite)
    // survives and no DV dir does
    val dataDirs = Files.list(Paths.get(root, "data")).iterator().asScala.size
    assert(dataDirs === 1)
    val dvsPath = Paths.get(root, "dvs")
    assert(!Files.exists(dvsPath) ||
      !Files.list(dvsPath).iterator().asScala.hasNext)
    // appends keep working after the drop
    t.append(Seq((100L, "new")).toDF("k", "s"))
    assert(t.read().count() === 21)
  }

  test("mirror maps the drop to a protocol downgrade action") {
    val (t, root) = mk("dropdv-mirror")
    t.deletePositional(col("k") % 3 === 0)
    graft.sources.DeltaExport.exportLog(t)
    // feature advertised while DVs live
    val s1 = graft.sources.DeltaImport.snapshot(spark, root)
    assert(s1.protocol.exists(_.readerFeatures.contains("deletionVectors")))
    t.materializeDeletes()
    graft.sources.DeltaExport.exportLog(t)
    t.dropFeature("deletionVectors", truncateHistory = true)
    graft.sources.DeltaExport.exportLog(t)
    // the drop commit carries a downgraded protocol action
    val lines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"${3L}%020d.json")).asScala
      .filter(_.trim.nonEmpty).map(JsonMethods.parse(_))
    val proto = lines.map(_ \ "protocol").find(_ != JNothing)
    assert(proto.isDefined, "drop commit must emit a protocol action")
    val feats = proto.get \ "readerFeatures" match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _ => Nil
    }
    assert(!feats.contains("deletionVectors"))
    // the cold-open snapshot agrees
    val s2 = graft.sources.DeltaImport.snapshot(spark, root)
    assert(s2.protocol.exists(p =>
      !p.readerFeatures.contains("deletionVectors") &&
        !p.writerFeatures.contains("deletionVectors")))
    assert(graft.sources.DeltaImport.read(spark, root).count() === 20)
  }

  test("export refuses a truncation gap it never mirrored") {
    val (t, _) = mk("dropdv-gap")
    graft.sources.DeltaExport.exportLog(t) // mirror at v0
    t.deletePositional(col("k") % 3 === 0) // v1 (never mirrored)
    t.materializeDeletes()                 // v2 (never mirrored)
    t.dropFeature("deletionVectors", truncateHistory = true) // v3 + cut
    val e = intercept[IllegalArgumentException](
      graft.sources.DeltaExport.exportLog(t))
    assert(e.getMessage.contains("truncated"))
  }

  test("SQL: ALTER TABLE … DROP FEATURE deletionVectors TRUNCATE HISTORY") {
    val (t, root) = mk("dropdv-sql")
    t.deletePositional(col("k") % 3 === 0)
    t.materializeDeletes()
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW dropdv_t USING graft " +
      s"OPTIONS (path '$root')")
    // without TRUNCATE HISTORY the historical DVs block it
    intercept[Exception](
      spark.sql("ALTER TABLE dropdv_t DROP FEATURE deletionVectors").collect())
    val v = spark.sql(
      "ALTER TABLE dropdv_t DROP FEATURE deletionVectors TRUNCATE HISTORY")
      .collect().head.getLong(0)
    assert(v === 3L)
    assert(t.read().count() === 20)
    // unsupported feature name is loud
    val e = intercept[Exception](
      spark.sql("ALTER TABLE dropdv_t DROP FEATURE columnMapping").collect())
    assert(e.getMessage.contains("droppable"))
  }
}
