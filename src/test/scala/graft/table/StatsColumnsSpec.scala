package graft.table

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** Stats-column budget (`delta.dataSkippingStatsColumns` /
  * `delta.dataSkippingNumIndexedCols`): write-time trim of per-dir
  * skipping stats and mirror per-add stats JSON — the wide-table cost
  * control. Absent stats must stay CORRECT (no pruning), never wrong. */
class StatsColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def dirStatsOf(root: String): Map[String, Map[String, (Double, Double)]] = {
    val log = new CommitLog(root, spark.sessionState.newHadoopConf())
    log.latest().get.dirStats
  }

  test("NumIndexedCols trims to the first N schema columns at write time") {
    val root = tmpDir("statscols-n")
    val t = GraftTable.create(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v"))
    t.setProperties(Map("delta.dataSkippingNumIndexedCols" -> "1"))
    t.append(Seq((3L, "c", 30.0)).toDF("k", "s", "v"))
    val stats = dirStatsOf(root)
    // v0 dir (pre-property) carries full stats; the post-property dir
    // carries only column k
    val perDir = stats.values.map(_.keySet).toSeq
    assert(perDir.exists(_ == Set("k", "s", "v")))
    assert(perDir.exists(_ == Set("k")))
    // pruning on the now-unstatted column is conservative, not wrong
    assert(t.read().filter(col("v") === 30.0).count() === 1)
    assert(t.read().filter(col("k") === 3L).count() === 1)
  }

  test("explicit StatsColumns list wins over NumIndexedCols") {
    val root = tmpDir("statscols-list")
    val t = GraftTable.create(spark, root,
      Seq((1L, "a", 10.0)).toDF("k", "s", "v"))
    t.setProperties(Map(
      "delta.dataSkippingNumIndexedCols" -> "1",
      "delta.dataSkippingStatsColumns" -> "v, s"))
    t.append(Seq((2L, "b", 20.0)).toDF("k", "s", "v"))
    val perDir = dirStatsOf(root).values.map(_.keySet).toSeq
    assert(perDir.exists(_ == Set("s", "v")))
  }

  test("mirror per-add stats honor the budget") {
    val root = tmpDir("statscols-mirror")
    val t = GraftTable.create(spark, root,
      Seq((1L, "a", 10.0)).toDF("k", "s", "v"))
    t.setProperties(Map("delta.dataSkippingNumIndexedCols" -> "1"))
    t.append(Seq((2L, "b", 20.0)).toDF("k", "s", "v"))
    graft.sources.DeltaExport.exportLog(t)
    val v = t.version
    val lines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"$v%020d.json")).asScala
      .filter(_.trim.nonEmpty).map(JsonMethods.parse(_))
    val adds = lines.map(_ \ "add").filter(_ != JNothing)
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val JString(statsStr) = (a \ "stats"): @unchecked
      val stats = JsonMethods.parse(statsStr)
      val minKeys = (stats \ "minValues").asInstanceOf[JObject].obj.map(_._1).toSet
      assert(minKeys === Set("k"), s"got $minKeys")
      // numRecords survives the trim — it is not a column stat
      assert((stats \ "numRecords") != JNothing)
    }
  }
}
