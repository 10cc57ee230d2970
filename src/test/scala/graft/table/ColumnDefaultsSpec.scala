package graft.table

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** Column defaults (Delta `allowColumnDefaults`): declared via ALTER
  * COLUMN SET DEFAULT, applied by STOCK Spark insert resolution through
  * the relation schema's CURRENT_DEFAULT field metadata — no custom
  * insert path — and mirrored into the Delta schema + writer feature. */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String, view: String): (GraftTable, String) = {
    val root = tmpDir(tag)
    Seq((1L, "a", 10.0)).toDF("id", "s", "v").write.format("graft").save(root)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view USING graft " +
      s"OPTIONS (path '$root')")
    (GraftTable.forPath(spark, root), root)
  }

  test("INSERT with omitted column gets the default; existing rows keep NULL semantics") {
    val (t, _) = mk("defaults", "def_t")
    spark.sql("ALTER TABLE def_t ALTER COLUMN s SET DEFAULT 'unset'").collect()
    spark.sql("ALTER TABLE def_t ALTER COLUMN v SET DEFAULT 1.5").collect()
    // column list omits s and v → both defaults fill
    spark.sql("INSERT INTO def_t (id) VALUES (2)").collect()
    // explicit DEFAULT keyword
    spark.sql("INSERT INTO def_t VALUES (3, DEFAULT, 2.5)").collect()
    val rows = t.read().orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows === Array((1L, "a", 10.0), (2L, "unset", 1.5), (3L, "unset", 2.5)))
    // DROP DEFAULT: the next omitted insert falls back to NULL
    spark.sql("ALTER TABLE def_t ALTER COLUMN s DROP DEFAULT").collect()
    spark.sql("INSERT INTO def_t (id) VALUES (4)").collect()
    val r4 = t.read().filter("id = 4").collect().head
    assert(r4.isNullAt(1) && r4.getDouble(2) === 1.5)
    // history records the DDL
    val ops = t.history().collect().map(_.getAs[String]("operation"))
    assert(ops.contains("SET DEFAULT") && ops.contains("DROP DEFAULT"))
  }

  test("bad default fails at DDL time, not first insert") {
    val (t, _) = mk("defaults-bad", "defb_t")
    val e = intercept[IllegalArgumentException](
      t.setColumnDefault("v", "'not-a-number'"))
    assert(e.getMessage.contains("constant of"))
    intercept[IllegalArgumentException](t.setColumnDefault("nope", "1"))
    // non-constant expressions refused too
    intercept[IllegalArgumentException](t.setColumnDefault("v", "id + 1"))
  }

  test("mirror carries CURRENT_DEFAULT metadata and the writer feature") {
    val (t, root) = mk("defaults-mirror", "defm_t")
    t.setColumnDefault("s", "'unset'")
    graft.sources.DeltaExport.exportLog(t)
    val v = t.version
    val lines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"$v%020d.json")).asScala
      .filter(_.trim.nonEmpty).map(JsonMethods.parse(_))
    val meta = lines.map(_ \ "metaData").find(_ != JNothing).get
    val JString(schemaStr) = (meta \ "schemaString"): @unchecked
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaStr)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val sField = schema.fields.find(_.name == "s").get
    assert(sField.metadata.getString("CURRENT_DEFAULT") === "'unset'")
    // graft-namespace key stays out of the Delta configuration
    val conf = (meta \ "configuration").asInstanceOf[JObject].obj.map(_._1)
    assert(!conf.exists(_.startsWith("graft.default")))
    // protocol advertises the writer feature in the same commit
    val proto = lines.map(_ \ "protocol").find(_ != JNothing).get
    val feats = proto \ "writerFeatures" match {
      case JArray(vs) => vs.collect { case JString(x) => x }
      case _ => Nil
    }
    assert(feats.contains("allowColumnDefaults"))
  }
}
