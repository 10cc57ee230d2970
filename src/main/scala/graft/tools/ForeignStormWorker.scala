package graft.tools

import org.apache.spark.sql.SparkSession

/** Test-harness main: one INDEPENDENT writer JVM in a cross-process
  * storm on a foreign Delta table. DeltaForeignCrossProcessStormSpec
  * launches several of these (plus its own in-JVM writer) against one
  * local `_delta_log` to drive the publish primitive where the same-JVM
  * lock cannot help — mutual exclusion must come from link(2)
  * ([[graft.sources.DeltaExport]] `linkPublish`).
  *
  * Args: tablePath writerId nAppends rowsPerAppend.
  * Prints one `[worker] <id> <i> -> <version>` line per committed
  * append (the spec parses these to assert every version is
  * single-owned); exits nonzero on any refusal, which the spec treats
  * as a lost-exclusion failure (blind appends always commute, so every
  * lost race must retry to a win). */
object ForeignStormWorker {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, idStr, nStr, rowsStr) = args
    val (id, n, rows) = (idStr.toLong, nStr.toInt, rowsStr.toInt)
    val spark = SparkSession.builder()
      .appName(s"graft-storm-worker-$id")
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      (0 until n).foreach { i =>
        val batch = (0 until rows)
          .map(j => (id * 1000000L + i * 1000L + j, s"w$id-$i-$j"))
          .toDF("k", "s")
        val v = graft.sources.DeltaExport.appendToForeign(
          spark, tablePath, batch)
        // scalastyle:off println
        println(s"[worker] $id $i -> $v")
        // scalastyle:on println
      }
    } finally spark.stop()
  }
}
