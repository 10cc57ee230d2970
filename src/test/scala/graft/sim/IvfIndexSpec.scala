package graft.sim

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec
import graft.analytics.CorpusQueries.AnnParams

/** The persisted IVF layout must (a) actually PRUNE — the probe's scan
  * plans over exactly the nprobe partition directories, never listing the
  * rest of the index — and (b) stay exact: with the swept AnnParams
  * geometry the pruned+shortlisted+reranked result equals the brute-force
  * ranking bit-for-bit. */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("probe prunes to nprobe partitions and reproduces the exact ranking") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val centroids = Similarity.trainCentroids(emb,
      k = AnnParams.kCoarse, iters = AnnParams.coarseIters)
    val model = Pq.train(emb, m = AnnParams.pqM, k = AnnParams.pqK,
      iters = AnnParams.pqIters, dim = AnnParams.dim)
    val path = tmpDir("ivf-index") + "/index"
    IvfIndex.write(emb, centroids, model, path)

    // one directory per coarse cell
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("centroid_id=")).map(_.getPath.getName)
    assert(cellDirs.length === AnnParams.kCoarse)

    val (q0, _) = Pq.queryVector(emb, 0L)
    val probe = IvfIndex.probe(spark, path, emb, model,
      IvfIndex.localCentroids(centroids), q0, k = 10,
      nprobe = AnnParams.nprobe, shortlist = AnnParams.shortlist,
      excludeId = Some(0L))

    // the index scan's partition count is nprobe — pruning, not filtering
    val scans = probe.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }.flatMap(_.collect { case s: FileSourceScanExec => s })
    val indexScan = scans.find(_.metadata.get("Location").exists(_.contains("ivf-index")))
      .getOrElse(fail(s"no index scan in:\n${probe.queryExecution.executedPlan}"))
    assert(indexScan.partitionFilters.nonEmpty, "no partition filters on the index scan")
    val selected = indexScan.selectedPartitions.partitionCount
    assert(selected === AnnParams.nprobe,
      s"expected ${AnnParams.nprobe} pruned partitions, scanned $selected")

    // and the pruned probe is still the exact top-10
    val exact = Similarity.bruteForceTopK(emb, 0L, 10).collect().toSeq
    val got = probe.collect().toSeq
    assert(got === exact)
  }

  test("incremental append indexes new vectors without a rebuild") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    import org.apache.spark.sql.functions._
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val cut = maxId - 20
    val base = emb.filter(col("vec_id") <= cut)
    val late = emb.filter(col("vec_id") > cut)
    // index built from the BASE corpus only
    val centroids = Similarity.trainCentroids(base,
      k = AnnParams.kCoarse, iters = AnnParams.coarseIters)
    val model = Pq.train(base, m = AnnParams.pqM, k = AnnParams.pqK,
      iters = AnnParams.pqIters, dim = AnnParams.dim)
    val path = tmpDir("ivf-incr") + "/index"
    IvfIndex.write(base, centroids, model, path)
    // late batch appended with the EXISTING centroids/codebooks
    IvfIndex.append(late, centroids, model, path)
    // index covers the full corpus exactly once
    assert(spark.read.parquet(path).count() === emb.count())
    // probe over the grown index equals brute force on the full corpus
    val (q0, _) = Pq.queryVector(emb, 0L)
    val got = IvfIndex.probe(spark, path, emb, model,
      IvfIndex.localCentroids(centroids), q0, k = 10,
      nprobe = AnnParams.nprobe, shortlist = AnnParams.shortlist,
      excludeId = Some(0L)).collect().toSeq
    val exact = Similarity.bruteForceTopK(emb, 0L, 10).collect().toSeq
    assert(got === exact)
  }

  test("index written via Scratch lands on the object store and probes exactly") {
    // The q72 production path: the served index is written under the
    // graft.Scratch shared-FS root (spark.graft.scratch.dir), never a
    // driver-local temp dir. Point that root at the no-rename s3fake://
    // store and drive the SAME write+probe calls ivfIndexProbe makes —
    // proving the layout needs nothing from the store beyond
    // write/list/read, so executors on a real cluster can serve it.
    spark.sparkContext.hadoopConfiguration.set("fs.s3fake.impl",
      classOf[graft.table.FakeObjectStoreFileSystem].getName)
    val prev = spark.conf.getOption("spark.graft.scratch.dir")
    spark.conf.set("spark.graft.scratch.dir", "s3fake://" + tmpDir("ivf-s3-root"))
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val centroids = Similarity.trainCentroids(emb,
        k = AnnParams.kCoarse, iters = AnnParams.coarseIters)
      val model = Pq.train(emb, m = AnnParams.pqM, k = AnnParams.pqK,
        iters = AnnParams.pqIters, dim = AnnParams.dim)
      val path = graft.Scratch.dir(spark, "ivfidx", transient = false) + "/index"
      assert(new org.apache.hadoop.fs.Path(path).toUri.getScheme === "s3fake",
        s"scratch did not resolve to the store: $path")
      IvfIndex.write(emb, centroids, model, path)
      val (q0, _) = Pq.queryVector(emb, 0L)
      val got = IvfIndex.probe(spark, path, emb, model,
        IvfIndex.localCentroids(centroids), q0, k = 10,
        nprobe = AnnParams.nprobe, shortlist = AnnParams.shortlist,
        excludeId = Some(0L)).collect().toSeq
      val exact = Similarity.bruteForceTopK(emb, 0L, 10).collect().toSeq
      assert(got === exact)
    } finally {
      prev.fold(spark.conf.unset("spark.graft.scratch.dir"))(
        spark.conf.set("spark.graft.scratch.dir", _))
    }
  }

  test("needsRetrain: same-distribution batch passes, shifted batch triggers") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val centroids = Similarity.trainCentroids(emb,
      k = AnnParams.kCoarse, iters = AnnParams.coarseIters)
    val (baseScore, baseImb) = IvfIndex.assignmentStats(emb, centroids)
    assert(baseScore > 0.0 && baseImb >= 1.0)
    // a batch drawn from the same corpus: no drift signal
    val sameDist = emb.filter(col("vec_id") % 5 === 0)
    assert(!IvfIndex.needsRetrain(baseScore, sameDist, centroids))
    // an adversarial batch far from every centroid (constant direction all
    // centroids are near-orthogonal to on average): quality collapses and
    // everything piles into one cell
    val dim = emb.head().getAs[Seq[Float]]("embedding").length
    val shifted = (10000L to 10099L)
      .map(i => (i, Seq.tabulate(dim)(j => if (j == 0) 100f else 0.001f * i)))
      .toDF("vec_id", "embedding")
    assert(IvfIndex.needsRetrain(baseScore, shifted, centroids))
  }
}
