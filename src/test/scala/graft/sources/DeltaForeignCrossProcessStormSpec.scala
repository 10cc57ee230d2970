package graft.sources

import java.util.concurrent.TimeUnit

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** CROSS-PROCESS writer storm: the same-JVM storm suite
  * (DeltaForeignStormSpec) exercises the publishLocks serialization;
  * this one removes it from the picture entirely by racing SEPARATE
  * JVMs — two spawned `graft.tools.ForeignStormWorker` processes plus
  * this test's own session — against one local foreign `_delta_log`.
  * Cross-process exclusion then rests solely on the put-if-absent
  * primitive: on file:// that is `linkPublish`'s link(2), which fails
  * with EEXIST atomically in the kernel (Hadoop's Rename.NONE on LocalFs
  * is a non-atomic exists-check — delta-spark's LocalLogStore documents
  * multi-driver local writes as unsafe for exactly that reason; the
  * link-based publish is what closes the caveat for graft-vs-graft
  * writers, and rival NON-graft processes publishing via plain rename
  * remain outside anyone's control).
  *
  * Invariants asserted: every writer's every append commits (blind
  * appends commute, so a lost race must retry to a win — a worker that
  * gives up exits nonzero); the committed versions are contiguous and
  * SINGLE-OWNED (no version reported by two writers — the lost-commit
  * signature); the final table holds every writer's every row. */
class DeltaForeignCrossProcessStormSpec extends SparkSpec {
  import spark.implicits._

  test("three JVMs racing appends: versions single-owned, no commit lost") {
    val root = tmpDir("xproc-storm")
    val t = GraftTable.create(spark, root,
      (0L until 20L).map(i => (i, s"s$i")).toDF("k", "s"), Nil)
    DeltaExport.exportLog(t)
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(root, "_graft_log"), true)
    val before = DeltaImport.latestVersion(spark, root)

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    // Spark-on-JDK17 needs the same --add-opens this (forked) test JVM
    // already runs with; lift them straight off our own command line.
    val inArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toList
    val opens = inArgs.zip(inArgs.drop(1)).collect {
      case (flag, value) if flag == "--add-opens" => Seq(flag, value)
    }.flatten

    val nAppends = 6
    val rowsPer = 4
    def launch(id: Int): Process =
      new ProcessBuilder((Seq(javaBin, "-Xmx3g") ++ opens ++ Seq("-cp", cp,
        "graft.tools.ForeignStormWorker", root, id.toString,
        nAppends.toString, rowsPer.toString)).asJava)
        .redirectErrorStream(true).start()
    val workers = Seq(1, 2).map(id => id -> launch(id))

    // The third writer is THIS JVM — different process than both workers.
    val myVersions = (0 until nAppends).map { i =>
      DeltaExport.appendToForeign(spark, root,
        (0 until rowsPer).map(j => (3L * 1000000L + i * 1000L + j,
          s"w3-$i-$j")).toDF("k", "s"))
    }

    val outputs = workers.map { case (id, p) =>
      val out = new mutable.StringBuilder
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      // drain while waiting (a full pipe buffer would deadlock waitFor)
      val drained = new Thread(() => {
        var line = reader.readLine()
        while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
      })
      drained.start()
      assert(p.waitFor(300, TimeUnit.SECONDS), s"worker $id timed out")
      drained.join(10000)
      assert(p.exitValue() === 0,
        s"worker $id exited ${p.exitValue()}:\n${out.result().takeRight(4000)}")
      id -> out.result()
    }

    val workerVersions: Map[Int, Seq[Long]] = outputs.map { case (id, log) =>
      id -> "\\[worker\\] (\\d+) \\d+ -> (\\d+)".r
        .findAllMatchIn(log).map(m => m.group(2).toLong).toSeq
    }.toMap
    workerVersions.foreach { case (id, vs) =>
      assert(vs.length === nAppends, s"worker $id committed ${vs.length}") }

    val all = workerVersions.values.flatten.toSeq ++ myVersions
    // single ownership: 18 commits, 18 DISTINCT versions, contiguous
    assert(all.length === 3 * nAppends)
    assert(all.distinct.length === all.length,
      s"a version was double-owned (lost commit): ${all.sorted}")
    assert(all.sorted === (before + 1 to before + 3 * nAppends),
      s"non-contiguous versions: ${all.sorted}")

    // no rows lost: every writer's every batch is readable
    val read = DeltaImport.read(spark, root)
    assert(read.count() === 20L + 3L * nAppends * rowsPer)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(read.filter(col("k") >= id * 1000000L &&
        col("k") < (id + 1) * 1000000L).count() === nAppends.toLong * rowsPer,
        s"writer $id lost rows")
    }
  }
}
