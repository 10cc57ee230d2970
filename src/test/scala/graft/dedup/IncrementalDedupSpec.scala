package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental MinHash-LSH dedup ([[IncrementalDedup]]): each batch
  * dedups against the persisted index without recomputing corpus
  * signatures, and the accumulated answer must match the one-shot
  * [[Dedup.minhashNearDups]] over the union. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, base: String, mutate: Int = 0): (Long, String) = {
    val words = (1 to 30).map(i => s"$base$i")
    val mutated = words.zipWithIndex.map { case (w, i) =>
      if (i < mutate) s"x$w" else w }
    (id, mutated.mkString(" "))
  }

  test("batches accumulate; pairs match the one-shot recompute over the union") {
    // corpus: two families (a*, b*) + noise; batch 1 brings a near-dup of
    // a and an exact dup of b; batch 2 brings a near-dup of the batch-1 doc
    val corpus = Seq(doc(1, "a"), doc(2, "b"), doc(3, "noise"))
      .toDF("doc_id", "text")
    val batch1 = Seq(doc(10, "a", mutate = 2), doc(11, "b"), doc(12, "fresh"))
      .toDF("doc_id", "text")
    val batch2 = Seq(doc(20, "a", mutate = 3), doc(21, "unrelated"))
      .toDF("doc_id", "text")

    val root = tmpDir("incdedup")
    val idx = IncrementalDedup.create(spark, root, corpus)
    assert(idx.docCount === 3)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0) min r.getLong(1), r.getLong(0) max r.getLong(1)))
        .toSet

    val p1 = pairs(IncrementalDedup.addBatch(idx, corpus, batch1, 0.8))
    assert(p1 === Set((1L, 10L), (2L, 11L)))
    assert(idx.docCount === 6) // batch admitted

    val corpus2 = corpus.unionByName(batch1)
    val p2 = pairs(IncrementalDedup.addBatch(idx, corpus2, batch2, 0.8))
    // 20 is a near-dup of BOTH 1 and 10 (3 mutations vs a-family)
    assert(p2.contains((1L, 20L)) && p2.contains((10L, 20L)))
    assert(idx.docCount === 8)

    // ground truth: one-shot LSH dedup over everything, restricted to
    // pairs involving at least one post-corpus doc
    val all = corpus2.unionByName(batch2)
    val oneShot = pairs(Dedup.minhashNearDups(all, threshold = 0.8))
      .filter { case (a, b) => a >= 10 || b >= 10 }
    assert((p1 ++ p2) === oneShot)
  }

  test("open validates geometry; index time-travels to pre-batch state") {
    val corpus = Seq(doc(1, "a"), doc(2, "b")).toDF("doc_id", "text")
    val root = tmpDir("incdedup-geom")
    IncrementalDedup.create(spark, root, corpus,
      IncrementalDedup.Params(k = 32, bands = 8))
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.open(spark, root, IncrementalDedup.Params(k = 64, bands = 16))
    }
    assert(e.getMessage.contains("geometry"))
    val idx = IncrementalDedup.open(spark, root)
    IncrementalDedup.addBatch(idx, corpus,
      Seq(doc(10, "a")).toDF("doc_id", "text"), 0.8)
    // the index is a versioned table: the pre-batch signature set is
    // still a readable version (ingest-audit / rollback surface)
    assert(idx.signatures.read().count() === 3)
    val versions = idx.signatures.history().collect().map(_.getAs[Long]("version"))
    assert(idx.signatures.readVersion(versions.min).count() === 2)
  }

  test("open refuses an index with NO stored geometry (half-created / foreign table)") {
    import graft.table.GraftTable
    val root = tmpDir("incdedup-unstamped")
    // a table that LOOKS like a signatures table but carries no stamp —
    // e.g. written by something else, or a hypothetical pre-stamp writer
    GraftTable.create(spark, s"$root/signatures",
      Seq((1L, Array(1L, 2L))).toDF("doc_id", "signature"))
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.open(spark, root)
    }
    assert(e.getMessage.contains("no stored MinHash geometry"))
  }

  test("small batch broadcasts against the index: no shuffle of the persisted buckets") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val corpus = (1 to 50).map(i => doc(i, s"corpus doc number $i with shared words"))
      .toDF("doc_id", "text")
    val root = tmpDir("incdedup-bcast")
    val idx = IncrementalDedup.create(spark, root, corpus)
    val batch = Seq(doc(100, "corpus doc number 7 with shared words"))
      .toDF("doc_id", "text")
    val verified = IncrementalDedup.addBatch(idx, corpus, batch, 0.8, admit = false)
    verified.collect()
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = finalPlan(verified.queryExecution.executedPlan)
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"batch bands were not broadcast:\n$plan")
    // the persisted index must stream partition-local: no shuffle exchange
    // may sit anywhere above the buckets table's file scan
    val bucketShuffles = plan.collect {
      case e: ShuffleExchangeExec
          if e.collectLeaves().exists(_.toString.contains("/buckets")) => e
    }
    assert(bucketShuffles.isEmpty,
      s"the index buckets scan was shuffled:\n${bucketShuffles.mkString("\n")}")
  }

  test("streaming: batches grow the index; dup pairs land exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.table.GraftTable
    val corpusRoot = tmpDir("incdedup-scorpus")
    val corpusT = GraftTable.create(spark, corpusRoot,
      Seq(doc(1, "a"), doc(2, "b")).toDF("doc_id", "text"))
    val idx = IncrementalDedup.create(spark, tmpDir("incdedup-sidx"),
      corpusT.read())
    val dups = GraftTable.create(spark, tmpDir("incdedup-sdups"),
      Seq.empty[(Long, Long, Double, Long)].toDF("a_id", "b_id", "jaccard", "batch_id"))
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[(Long, String)]
    // batch 1: near-dup of corpus doc 1 + a fresh doc
    input.addData(doc(10, "a", 2), doc(11, "fresh"))
    val q = IncrementalDedup.startStream(idx,
      () => corpusT.read(), input.toDF().toDF("doc_id", "text"), dups,
      threshold = 0.8, checkpoint = tmpDir("incdedup-sckpt"),
      admitDocsTo = Some(corpusT),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      assert(dups.read().select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 10L)))
      assert(idx.docCount === 4)
      // batch 2 near-dups BATCH-1's doc 10 — provable only because the
      // stream admitted batch 1 into the index
      input.addData(doc(20, "a", 2))
      q.processAllAvailable()
      val got = dups.read().select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((10L, 20L)) && got.contains((1L, 20L)))
      assert(idx.docCount === 5)
    } finally q.stop()
  }

  test("long-run maintenance: bucket/signature file growth is bounded across many batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.table.GraftTable
    val corpusRoot = tmpDir("incdedup-mcorpus")
    val corpusT = GraftTable.create(spark, corpusRoot,
      Seq(doc(1, "seed")).toDF("doc_id", "text"))
    val idx = IncrementalDedup.create(spark, tmpDir("incdedup-midx"),
      corpusT.read())
    val dups = GraftTable.create(spark, tmpDir("incdedup-mdups"),
      Seq.empty[(Long, Long, Double, Long)].toDF("a_id", "b_id", "jaccard", "batch_id"))
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[(Long, String)]
    val nBatches = 24
    val q = IncrementalDedup.startStream(idx,
      () => corpusT.read(), input.toDF().toDF("doc_id", "text"), dups,
      threshold = 0.8, checkpoint = tmpDir("incdedup-mckpt"),
      admitDocsTo = Some(corpusT),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      maintainEvery = 6, vacuumRetainHours = 0.0)
    try {
      (1 to nBatches).foreach { b =>
        input.addData(doc(100L + b, s"unique text $b"))
        q.processAllAvailable()
      }
      assert(idx.docCount === 1L + nBatches)
      // Without maintenance each batch leaves one more dir per table
      // (≈ nBatches dirs); the cadence folds the tail and vacuums the
      // superseded dirs, so live file counts stay bounded well below it.
      val bucketDirs = idx.buckets.detail().head().getAs[Int]("numDirs")
      val sigDirs = idx.signatures.detail().head().getAs[Int]("numDirs")
      assert(bucketDirs < nBatches / 2,
        s"bucket dirs not bounded: $bucketDirs after $nBatches batches")
      assert(sigDirs < nBatches / 2,
        s"signature dirs not bounded: $sigDirs after $nBatches batches")
      // correctness survives the maintenance: every admitted doc still
      // probes against the folded index
      val probe = IncrementalDedup.addBatch(idx, corpusT.read(),
        Seq(doc(999, s"unique text 5")).toDF("doc_id", "text"), 0.8, admit = false)
      assert(probe.select("a_id").collect().map(_.getLong(0)).toSet === Set(105L))
    } finally q.stop()
  }

  test("stamped admission is exactly-once: a replayed batch is skipped") {
    val corpus = Seq(doc(1, "a")).toDF("doc_id", "text")
    val idx = IncrementalDedup.create(spark, tmpDir("incdedup-replay"), corpus)
    val batch = Seq(doc(10, "b")).toDF("doc_id", "text")
    IncrementalDedup.addBatch(idx, corpus, batch, 0.8,
      txn = Some(("replay-app", 7L)))
    assert(idx.docCount === 2)
    // the at-least-once replay (same app + batch id): both index tables
    // detect the stamp and skip — no duplicate signature/bucket rows
    IncrementalDedup.addBatch(idx, corpus, batch, 0.8,
      txn = Some(("replay-app", 7L)))
    assert(idx.docCount === 2)
    assert(idx.buckets.read().count() ===
      2 * idx.params.bands) // bands rows per doc, exactly once each
  }

  test("admit = false probes without mutating the index") {
    val corpus = Seq(doc(1, "a")).toDF("doc_id", "text")
    val root = tmpDir("incdedup-probe")
    val idx = IncrementalDedup.create(spark, root, corpus)
    val got = IncrementalDedup.addBatch(idx, corpus,
      Seq(doc(10, "a")).toDF("doc_id", "text"), 0.8, admit = false)
    assert(got.count() === 1)
    assert(idx.docCount === 1)
  }
}
