package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: scale probe of the FOREIGN Delta writer verbs beyond the
  * shipped testdata — ×K-replicated sf0.1 orders (K=10 ≈ 1.5 M rows)
  * become a pure Delta table (export, graft log retired), then each verb
  * runs timed:
  *
  *   - append: a 10%-sized batch of fresh keys (stage + exclusive publish)
  *   - delete: a ~1% selective DV delete, then a 10% ARBITRARY-PREDICATE
  *     delete — the case that used to funnel every matched position
  *     through one driver array; with the distributed DV build the
  *     driver receives only per-file DESCRIPTORS, so the probe prints
  *     rows-deleted vs descriptors-collected to make the driver payload
  *     visible (positions aggregate into RoaringBitmaps on executors)
  *   - merge: a 10%-sized CDC batch, half matched / half fresh (the
  *     applyBatchToForeign shape), plus the same batch through the
  *     general CLAUSE merge (delete clause + update-if-changed)
  *
  * The point is the SHAPE: per-verb wall should track the batch size and
  * the touched-file count, never the table size — the table-sized work is
  * one snapshot resolution (log replay) per verb — and driver memory
  * stays file-count-sized at ANY selectivity.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.ForeignWriterProbe 10"
  */
object ForeignWriterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .appName("graft-foreign-writer-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val big = base.crossJoin(
        spark.range(k.toLong).select(col("id").as("__r")))
      .select((col("o_orderkey") * k + col("__r")).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    val n = big.count()

    val root = graft.Scratch.dir(spark, "foreign-writer-probe")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    timed(s"build ($n rows, export)") {
      val t = graft.table.GraftTable.create(spark, root, big)
      // a REAL positional delete so the exported protocol advertises
      // deletionVectors (a zero-row delete commits no DV feature)
      val firstKey = big.agg(min(col("o_orderkey"))).head().getLong(0)
      t.deletePositional(col("o_orderkey") === firstKey)
      graft.sources.DeltaExport.exportLog(t)
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(root, "_graft_log"), true)
    }
    require(graft.sources.DeltaImport.snapshot(spark, root).protocol
      .exists(_.writerFeatures.contains("deletionVectors")),
      "probe fixture must advertise deletionVectors")

    val appendBatch = base.limit((n / k / 10).toInt)
      .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    timed(s"append (${n / 10 / k} rows)") {
      graft.sources.DeltaExport.appendToForeign(spark, root, appendBatch)
    }

    timed("delete (~1% selective)") {
      val (_, d) = graft.sources.DeltaExport.deleteFromForeign(spark, root,
        col("o_orderkey") % 100 === 7L)
      println(s"[probe]   deleted rows: $d")
    }

    // The arbitrary-predicate broad delete — the shape that used to OOM
    // the driver at scale. Driver payload is now per-file descriptors.
    timed("delete (10% predicate)") {
      val before = graft.sources.DeltaImport.snapshot(spark, root)
      val (_, d) = graft.sources.DeltaExport.deleteFromForeign(spark, root,
        col("o_orderkey") % 10 === 3L)
      val after = graft.sources.DeltaImport.snapshot(spark, root)
      val dvFiles = after.files.count(f =>
        f.deletionVector != before.files.find(_.path == f.path)
          .flatMap(_.deletionVector))
      println(s"[probe]   deleted rows: $d; driver payload: " +
        s"$dvFiles descriptors (was $d positions)")
    }

    val mergeBatch = base.limit((n / k / 10).toInt).select(
        // half the batch hits existing keys, half is fresh
        when(col("o_orderkey") % 2 === 0, col("o_orderkey") * k)
          .otherwise(col("o_orderkey") + 950000000L).as("o_orderkey"),
        col("o_custkey"), lit("P").as("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"))
      .dropDuplicates("o_orderkey")
    timed("merge (10% CDC batch)") {
      val (_, u, i) = graft.sources.DeltaExport.mergeForeignUpsert(
        spark, root, mergeBatch, "o_orderkey")
      println(s"[probe]   updated: $u inserted: $i")
    }

    // The general clause merge over the same batch shape: delete clause
    // for a third of the keys, update-if-changed for the rest (unchanged
    // rows — re-sent verbatim — must cost nothing to re-record).
    val clauseBatch = mergeBatch
      .withColumn("op", when(col("o_orderkey") % 3 === 0, lit("del"))
        .otherwise(lit("upd")))
    timed("clause merge (10% batch)") {
      import graft.table.MergeClause
      val changed = col("t.o_totalprice") =!= col("s.o_totalprice")
      val (_, u, d, i) = graft.sources.DeltaExport.mergeForeignClauses(
        spark, root, clauseBatch, Seq("o_orderkey"),
        matched = Seq(
          MergeClause.Delete(condition = Some(col("s.op") === "del")),
          MergeClause.UpdateAll(
            condition = Some(col("s.op") =!= "del" && changed))),
        notMatched = Seq(
          MergeClause.InsertAll(condition = Some(col("s.op") =!= "del"))))
      println(s"[probe]   updated: $u deleted: $d inserted: $i")
    }

    val total = graft.sources.DeltaImport.read(spark, root).count()
    println(s"[probe] final row count: $total")
    spark.stop()
  }
}
