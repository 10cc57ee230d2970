package graft

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared-filesystem scratch-space resolution, used by every component
  * that persists intermediate or index data the EXECUTORS must read back
  * (dedup staging tables, the on-disk IVF index). A driver-local
  * `java.nio` temp dir passes on `local[*]` and fails on any real
  * cluster — executors cannot read the driver's /tmp — so all such paths
  * route through here instead.
  *
  * Root resolution: `spark.graft.scratch.dir` if set (an s3a:// / hdfs://
  * / any Hadoop-FS URI), else `_graft_scratch/` under the Spark warehouse
  * dir — both shared locations by deployment contract, mirroring how
  * [[graft.table.CommitLog]] reaches table storage.
  */
object Scratch {

  /** The resolved scratch root (not created). */
  def root(spark: SparkSession): Path = new Path(
    spark.conf.getOption("spark.graft.scratch.dir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir") + "/_graft_scratch"))

  /** A fresh unique directory path under the scratch root. Registered with
    * Hadoop's deleteOnExit when `transient` (staging tables die with the
    * app); persistent artifacts like a served index pass
    * `transient = false` and own their lifecycle. */
  def dir(spark: SparkSession, tag: String, transient: Boolean = true): String = {
    val r = root(spark)
    val p = new Path(r, s"$tag-${UUID.randomUUID().toString.take(12)}")
    if (transient) {
      val fs = r.getFileSystem(spark.sessionState.newHadoopConf())
      fs.deleteOnExit(p)
    }
    p.toString
  }
}
