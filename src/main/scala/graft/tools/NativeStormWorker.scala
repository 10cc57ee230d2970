package graft.tools

import org.apache.spark.sql.SparkSession

/** Test-harness main: one INDEPENDENT writer JVM in a cross-process storm
  * on a NATIVE graft table — the [[ForeignStormWorker]] shape pointed at
  * [[graft.table.GraftTable]] instead of a foreign Delta log, so the spec
  * drives [[graft.table.LinkPublisher]]'s link(2) put-if-absent where the
  * same-JVM serialization can't help.
  *
  * Args: tablePath writerId nAppends rowsPerAppend.
  * Prints `[worker] <id> <i> -> <version>` per committed append; exits
  * nonzero on any failure (native appends rebase-and-retry, so every
  * lost race must end in a win). */
object NativeStormWorker {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, idStr, nStr, rowsStr) = args
    val (id, n, rows) = (idStr.toLong, nStr.toInt, rowsStr.toInt)
    val spark = SparkSession.builder()
      .appName(s"graft-native-storm-worker-$id")
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      val t = graft.table.GraftTable.forPath(spark, tablePath)
      (0 until n).foreach { i =>
        val batch = (0 until rows)
          .map(j => (id * 1000000L + i * 1000L + j, s"w$id-$i-$j"))
          .toDF("id", "v")
        val c = t.append(batch)
        // scalastyle:off println
        println(s"[worker] $id $i -> ${c.version}")
        // scalastyle:on println
      }
    } finally spark.stop()
  }
}
