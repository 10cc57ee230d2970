package graft.table

import java.util.concurrent.TimeUnit

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-PROCESS storm on a NATIVE graft table — ConcurrencySpec races
  * independent handles inside one JVM; this one races separate JVMs
  * (two spawned `graft.tools.NativeStormWorker` processes plus this
  * test's session), so the only thing serializing the log is
  * [[LinkPublisher]]'s link(2) put-if-absent. Same invariants as the
  * foreign-side DeltaForeignCrossProcessStormSpec: every append from
  * every process commits (rebase-and-retry), versions are contiguous
  * and single-owned, and no rows are lost. */
class GraftCrossProcessStormSpec extends SparkSpec {
  import spark.implicits._

  test("three JVMs racing native appends: single-owned versions, no rows lost") {
    val root = tmpDir("native-xproc")
    val t = GraftTable.create(spark, root,
      (0L until 10L).map(i => (i, s"s$i")).toDF("id", "v"))
    val before = t.version

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val inArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toList
    val opens = inArgs.zip(inArgs.drop(1)).collect {
      case (flag, value) if flag == "--add-opens" => Seq(flag, value)
    }.flatten

    val nAppends = 6
    val rowsPer = 4
    def launch(id: Int): Process =
      new ProcessBuilder((Seq(javaBin, "-Xmx3g") ++ opens ++ Seq("-cp", cp,
        "graft.tools.NativeStormWorker", root, id.toString,
        nAppends.toString, rowsPer.toString)).asJava)
        .redirectErrorStream(true).start()
    val workers = Seq(1, 2).map(id => id -> launch(id))

    val mine = GraftTable.forPath(spark, root)
    val myVersions = (0 until nAppends).map { i =>
      mine.append((0 until rowsPer).map(j =>
        (3L * 1000000L + i * 1000L + j, s"w3-$i-$j")).toDF("id", "v")).version
    }

    val outputs = workers.map { case (id, p) =>
      val out = new mutable.StringBuilder
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
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
    assert(all.length === 3 * nAppends)
    assert(all.distinct.length === all.length,
      s"a version was double-owned (lost commit): ${all.sorted}")
    assert(all.sorted === (before + 1 to before + 3 * nAppends),
      s"non-contiguous versions: ${all.sorted}")

    val read = GraftTable.forPath(spark, root).read()
    assert(read.count() === 10L + 3L * nAppends * rowsPer)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(read.filter(col("id") >= id * 1000000L &&
        col("id") < (id + 1) * 1000000L).count() === nAppends.toLong * rowsPer,
        s"writer $id lost rows")
    }
  }
}
