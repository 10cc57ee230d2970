package graft.sources

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** GENUINE multi-threaded writer storms on one foreign Delta table —
  * the race specs stage one rival at a deterministic seam; these run
  * real concurrent verbs through the optimistic commit loop and assert
  * the protocol's global invariants: no commit lost, every version
  * owned by exactly one writer, the final state the serial-equivalent
  * one. (Spark sessions are thread-safe for concurrent actions; the
  * exclusive publish is what serializes the log.) */
class DeltaForeignStormSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def foreignTable(name: String, n: Long): String = {
    val root = tmpDir(name)
    val t = GraftTable.create(spark, root,
      (0L to n).map(i => (i, s"s$i")).toDF("k", "s"), Nil)
    t.deletePositional(col("k") === n)
    DeltaExport.exportLog(t)
    fs.delete(new Path(root, "_graft_log"), true)
    root
  }

  test("six concurrent appenders: all land, versions distinct, no rows lost") {
    val root = foreignTable("storm-append", 20L)
    val before = DeltaImport.latestVersion(spark, root)
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = (0 until 6).map { i =>
        Future {
          DeltaExport.appendToForeign(spark, root,
            (0 until 5).map(j => (1000L + i * 10 + j, s"t$i-$j"))
              .toDF("k", "s"))
        }
      }
      val versions = Await.result(Future.sequence(futs), 180.seconds)
      // every appender owns its own version; together they fill the
      // range contiguously (blind appends always commute)
      assert(versions.distinct.length === 6)
      assert(versions.sorted === (before + 1 to before + 6))
    } finally pool.shutdown()
    val read = DeltaImport.read(spark, root)
    assert(read.count() === 20L + 30L)
    assert(read.filter(col("k") >= 1000L).count() === 30L)
  }

  test("concurrent identity appenders never produce duplicate ids") {
    val root = tmpDir("storm-ident")
    val t = GraftTable.create(spark, root,
      (0L until 5L).map(i => Tuple1(s"s$i")).toDF("s"), Nil,
      generated = Map.empty, identity = Map("id" -> (100L, 5L)))
    DeltaExport.exportLog(t)
    fs.delete(new Path(root, "_graft_log"), true)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val outcomes =
      try Await.result(Future.sequence((0 until 4).map { i =>
        Future {
          // Identity allocation does NOT commute: a rival's watermark
          // advance changes the schema JSON, so losers must REFUSE
          // (restage), never allocate over the winner.
          try Right(DeltaExport.appendToForeign(spark, root,
            (0 until 3).map(j => Tuple1(s"w$i-$j")).toDF("s")))
          catch { case e: IllegalArgumentException => Left(e.getMessage) }
        }
      }), 180.seconds)
      finally pool.shutdown()
    val wins = outcomes.count(_.isRight)
    assert(wins >= 1, s"no appender won: $outcomes")
    outcomes.collect { case Left(msg) =>
      assert(msg.contains("restage") || msg.contains("schema"), msg) }
    // the invariant that matters: every committed id unique, watermark
    // consistent with the max committed id
    val ids = DeltaImport.read(spark, root).select("id").as[Long].collect()
    assert(ids.length === 5 + wins * 3)
    assert(ids.distinct.length === ids.length,
      s"duplicate identity ids under contention: ${ids.sorted.toSeq}")
    assert(DeltaImport.snapshot(spark, root).schema("id")
      .metadata.getLong("delta.identity.highWaterMark") === ids.max)
  }

  test("concurrent disjoint appends + one delete: a serializable outcome") {
    val root = foreignTable("storm-mixed", 40L)
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results =
      try Await.result(Future.sequence(Seq(
        Future(Right(DeltaExport.appendToForeign(spark, root,
          Seq((2000L, "a")).toDF("k", "s"))): Either[String, Long]),
        Future(Right(DeltaExport.appendToForeign(spark, root,
          Seq((3000L, "b")).toDF("k", "s"))): Either[String, Long]),
        Future {
          // deletes k<40 rows; the rival appends are stats-disjoint so
          // a lost race RETRIES and commits — but an unlucky interleave
          // may still abort with the re-run message, which is legal
          try Right(DeltaExport.deleteFromForeign(spark, root,
            col("k") % 10 === 0L && col("k") < 40L)._1)
          catch { case e: IllegalArgumentException => Left(e.getMessage) }
        })), 180.seconds)
      finally pool.shutdown()
    val read = DeltaImport.read(spark, root)
    // both appends always land
    assert(read.filter(col("k") >= 2000L).count() === 2L)
    results(2) match {
      case Right(_) => // delete committed: its rows are gone
        assert(read.filter(col("k") % 10 === 0L && col("k") < 40L)
          .count() === 0L)
      case Left(msg) => // clean abort: nothing half-deleted
        assert(msg.contains("re-run"))
        assert(read.filter(col("k") % 10 === 0L && col("k") < 40L)
          .count() === 4L)
    }
  }
}
