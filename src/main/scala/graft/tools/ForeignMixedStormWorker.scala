package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Test-harness main: one independent writer JVM in a MIXED-VERB
  * cross-process storm on a foreign Delta table
  * (DeltaForeignMixedStormSpec). The append-only cross-process storm
  * proves the link(2) publish excludes rival processes; this worker
  * drives the verbs whose commits do NOT all commute — DV deletes racing
  * appends and racing each other — so the spec can assert the conflict
  * rules (retry-to-win when the winner left the touched files
  * byte-identical, the documented "re-run" refusal otherwise) hold
  * across process boundaries, not just under the same-JVM lock.
  *
  * Args: tablePath verb id n a1 a2
  *  - verb=append: n appends of a2 rows each, keys id·10⁶ + i·1000 + j.
  *  - verb=delete: n delete waves; wave i DV-deletes k in
  *    [a1 + i·a2, a1 + (i+1)·a2). A refusal carrying the documented
  *    conflict error ("re-run …") re-runs the wave against the new
  *    state — the refusal message's own remedy — up to 30 times; the
  *    delete predicate stays valid against any rival's state because
  *    every storm writer owns a disjoint key range.
  *
  * Prints one `[worker] <verb> <i> -> <version>` per commit and one
  * `[worker] <verb> <i> refused: …` per legal conflict refusal (the
  * spec asserts every refusal carries the documented text). Exits
  * nonzero if any wave never commits. */
object ForeignMixedStormWorker {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, verb, idStr, nStr, a1Str, a2Str) = args
    val (id, n, a1, a2) = (idStr.toLong, nStr.toInt, a1Str.toLong, a2Str.toLong)
    val spark = SparkSession.builder()
      .appName(s"graft-mixed-storm-worker-$verb-$id")
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    // scalastyle:off println
    try {
      verb match {
        case "append" =>
          (0 until n).foreach { i =>
            val batch = (0L until a2)
              .map(j => (id * 1000000L + i * 1000L + j, s"w$id-$i-$j"))
              .toDF("k", "s")
            val v = graft.sources.DeltaExport.appendToForeign(
              spark, tablePath, batch)
            println(s"[worker] append $i -> $v")
          }
        case "delete" =>
          (0 until n).foreach { i =>
            val lo = a1 + i * a2
            val hi = lo + a2
            var attempt = 0
            var committed = -1L
            while (committed < 0) {
              attempt += 1
              try {
                committed = graft.sources.DeltaExport.deleteFromForeign(
                  spark, tablePath, col("k") >= lo && col("k") < hi)._1
                println(s"[worker] delete $i -> $committed")
              } catch {
                case e: IllegalArgumentException
                    if e.getMessage.contains("re-run") && attempt < 30 =>
                  println(s"[worker] delete $i refused: ${e.getMessage}")
              }
            }
          }
        case other => sys.error(s"unknown verb $other")
      }
    } finally spark.stop()
    // scalastyle:on println
  }
}
