package graft.sources

import java.util.concurrent.TimeUnit

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable
import graft.table.MergeClause

/** MIXED-VERB cross-process storm: the append-only cross-process storm
  * (DeltaForeignCrossProcessStormSpec) proves the link(2) publish
  * excludes rival JVMs for commits that always commute. These tests race
  * NON-commuting verbs — DV deletes, clause merges, OPTIMIZE — against
  * appends and against each other from SEPARATE processes, the
  * reference's actual topology (three writer services sharing one lake).
  * The conflict rules under test:
  *  - a lost race RETRIES to a win when the winner left every touched
  *    file byte-identical (appends never touch existing files);
  *  - otherwise it refuses with the documented "re-run … against the
  *    new state" error, and re-running against the new state succeeds
  *    (rival deletes of disjoint rows serialize through DV unions).
  * Invariants asserted in every test: all commits single-owned (no
  * version reported twice — the lost-commit signature), contiguous, and
  * the final table is the serial-equivalent state. */
class DeltaForeignMixedStormSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Foreign table with keys [0, n) spread round-robin over 4 files, DV
    * support advertised (one positional delete pre-export, the
    * DeltaForeignStormSpec fixture shape). */
  private def foreignTable(name: String, n: Long): String = {
    val root = tmpDir(name)
    val t = GraftTable.create(spark, root,
      (0L to n).map(i => (i, s"s$i")).toDF("k", "s").repartition(4), Nil)
    t.deletePositional(col("k") === n)
    DeltaExport.exportLog(t)
    fs.delete(new Path(root, "_graft_log"), true)
    root
  }

  private def launchWorker(root: String, verb: String, id: Int, n: Int,
      a1: Long, a2: Long): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val inArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toList
    val opens = inArgs.zip(inArgs.drop(1)).collect {
      case (flag, value) if flag == "--add-opens" => Seq(flag, value)
    }.flatten
    new ProcessBuilder((Seq(javaBin, "-Xmx3g") ++ opens ++ Seq("-cp", cp,
      "graft.tools.ForeignMixedStormWorker", root, verb, id.toString,
      n.toString, a1.toString, a2.toString)).asJava)
      .redirectErrorStream(true).start()
  }

  /** Drain + wait; returns stdout. Fails the test on nonzero exit. */
  private def awaitWorker(tag: String, p: Process): String = {
    val out = new mutable.StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val drained = new Thread(() => {
      var line = reader.readLine()
      while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
    })
    drained.start()
    assert(p.waitFor(300, TimeUnit.SECONDS), s"worker $tag timed out")
    drained.join(10000)
    assert(p.exitValue() === 0,
      s"worker $tag exited ${p.exitValue()}:\n${out.result().takeRight(4000)}")
    out.result()
  }

  private def workerVersions(log: String): Seq[Long] =
    "\\[worker\\] \\w+ \\d+ -> (\\d+)".r
      .findAllMatchIn(log).map(_.group(1).toLong).toSeq

  private def workerRefusals(log: String): Seq[String] =
    "\\[worker\\] \\w+ \\d+ refused: (.*)".r
      .findAllMatchIn(log).map(_.group(1)).toSeq

  /** This-JVM verb with the refusal's own remedy applied: a documented
    * "re-run" conflict refusal re-runs against the new state. */
  private def rerun[T](maxAttempts: Int = 30)(body: => T): (T, Seq[String]) = {
    val refusals = Seq.newBuilder[String]
    var attempt = 0
    while (true) {
      attempt += 1
      try return (body, refusals.result())
      catch {
        case e: IllegalArgumentException
            if e.getMessage.contains("re-run") && attempt < maxAttempts =>
          refusals += e.getMessage
      }
    }
    sys.error("unreachable")
  }

  test("appends (rival JVM) vs DV deletes (this JVM): both verbs win") {
    val root = foreignTable("mixed-ad", 200L)
    val before = DeltaImport.latestVersion(spark, root)
    val appender = launchWorker(root, "append", 7, 5, 0L, 4L)
    // 6 delete waves over the ORIGINAL files while the appends land —
    // appends never touch those files, so every lost race must RETRY to
    // a win (and any interim refusal must carry the documented text)
    val mine = (0 until 6).map { i =>
      val ((v, _), refusals) = rerun() {
        DeltaExport.deleteFromForeign(spark, root,
          col("k") >= i * 10L && col("k") < (i + 1) * 10L)
      }
      refusals.foreach(m => assert(m.contains("re-run the delete"), m))
      v
    }
    val log = awaitWorker("appender", appender)
    val theirs = workerVersions(log)
    assert(theirs.length === 5, s"appender committed ${theirs.length}:\n$log")
    val all = mine ++ theirs
    assert(all.distinct.length === all.length,
      s"a version was double-owned: ${all.sorted}")
    assert(all.sorted === (before + 1 to before + 11), s"${all.sorted}")
    val read = DeltaImport.read(spark, root)
    assert(read.filter(col("k") < 60L).count() === 0L, "delete lost rows")
    assert(read.filter(col("k") >= 60L && col("k") < 200L).count() === 140L)
    assert(read.filter(col("k") >= 7000000L).count() === 20L, "append lost rows")
  }

  test("rival DV deletes from two JVMs on the same files serialize") {
    val root = foreignTable("mixed-dd", 200L)
    val before = DeltaImport.latestVersion(spark, root)
    // both writers delete disjoint KEY ranges living in the SAME 4 files
    // (round-robin layout): the loser of each race sees the winner's new
    // DV on a touched file → the documented refusal → its re-run unions
    // the DVs and wins. Serial-equivalent end state either way.
    val rival = launchWorker(root, "delete", 1, 5, 0L, 10L) // [0,50)
    val mine = (0 until 5).map { i =>
      val ((v, deleted), refusals) = rerun() {
        DeltaExport.deleteFromForeign(spark, root,
          col("k") >= 100L + i * 10L && col("k") < 100L + (i + 1) * 10L)
      }
      refusals.foreach(m => assert(m.contains("re-run the delete"), m))
      assert(deleted === 10L)
      v
    }
    val log = awaitWorker("deleter", rival)
    val theirs = workerVersions(log)
    workerRefusals(log).foreach(m => assert(m.contains("re-run the delete"), m))
    assert(theirs.length === 5, s"rival committed ${theirs.length}:\n$log")
    val all = mine ++ theirs
    assert(all.distinct.length === all.length,
      s"a version was double-owned: ${all.sorted}")
    assert(all.sorted === (before + 1 to before + 10), s"${all.sorted}")
    val read = DeltaImport.read(spark, root)
    assert(read.filter(col("k") < 50L).count() === 0L)
    assert(read.filter(col("k") >= 100L && col("k") < 150L).count() === 0L)
    assert(read.count() === 200L - 100L)
  }

  test("clause merge + OPTIMIZE (this JVM) vs appends (rival JVM)") {
    val root = foreignTable("mixed-mo", 100L)
    val before = DeltaImport.latestVersion(spark, root)
    val appender = launchWorker(root, "append", 9, 5, 0L, 4L)
    // upsert over the original key range: rival appends are stats-
    // disjoint (keys ≥ 9e6), so the merge's conflict check proves them
    // key-disjoint and a lost race retries to a win
    val ((mv, updated, _, inserted), mRefusals) = rerun() {
      DeltaExport.mergeForeignClauses(spark, root,
        (0L until 30L).map(k => (k, s"merged$k")).toDF("k", "s"), Seq("k"),
        matched = Seq(MergeClause.UpdateAll()),
        notMatched = Seq(MergeClause.InsertAll()))
    }
    mRefusals.foreach(m => assert(m.contains("re-run the merge"), m))
    assert(updated === 30L && inserted === 0L)
    // compaction racing the same appends: rival commits never touch the
    // files being compacted, so OPTIMIZE retries to a win too
    val ((ov, removed, added), oRefusals) = rerun() {
      DeltaExport.optimizeForeign(spark, root)
    }
    oRefusals.foreach(m => assert(m.contains("re-run"), m))
    assert(removed > 0L && added > 0L)
    val log = awaitWorker("appender", appender)
    val theirs = workerVersions(log)
    assert(theirs.length === 5, s"appender committed ${theirs.length}:\n$log")
    val all = Seq(mv, ov) ++ theirs
    assert(all.distinct.length === all.length,
      s"a version was double-owned: ${all.sorted}")
    assert(all.sorted === (before + 1 to before + 7), s"${all.sorted}")
    val read = DeltaImport.read(spark, root)
    assert(read.filter(col("s").startsWith("merged")).count() === 30L)
    assert(read.filter(col("k") >= 9000000L).count() === 20L)
    assert(read.count() === 100L + 20L)
  }
}
