package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: scale probe of the dedup family beyond the shipped testdata.
  * Synthesizes a ×K corpus from sf0.1 (each replica's text is lightly
  * perturbed, so replicas are NEAR-dups — the adversarial case for
  * candidate generation: every bucket key collides K ways), writes it as
  * a sfDir-shaped scratch directory, and times the dedup driver queries
  * against it. K=10 over sf0.1 ≈ the sf1 document count the round-6 plan
  * asks to validate (staging threshold + bucket-skew caps beyond toy
  * scale).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.DedupScaleProbe 10 [exact] q23_exact_dedup …"
  * (`exact` as the second arg makes document replicas byte-identical
  * instead of near-dups — the hot-bucket case for signature paths.)
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val exactCopies = args.lift(1).contains("exact")
    val rest0 = args.drop(if (exactCopies) 2 else 1).toSeq
    // `conf:key=value` args set session confs before the timed queries —
    // e.g. conf:spark.graft.dedup.broadcastThreshold=1 forces the
    // incremental-dedup co-partitioned fallback path.
    val (confArgs, rest) = rest0.partition(_.startsWith("conf:"))
    val queries =
      if (rest.nonEmpty) rest
      else Seq("q23_exact_dedup", "q24_tokenset_dedup", "q25_minhash_neardup",
        "q26_simhash_neardup", "q27_ngram_jaccard", "q73_dup_clusters",
        "q81_dup_clusters_lsh", "q110_substring_scrub", "q111_semantic_dedup",
        "q29_embedding_neardup", "q30_embedding_neardup_lsh")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      // same extension surface as Verify/Bench — the SQL-DML queries
      // (q132+) route through the injected parser
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confArgs.foreach { a =>
      val Array(ck, cv) = a.stripPrefix("conf:").split("=", 2)
      spark.conf.set(ck, cv)
      println(s"PROBE conf $ck=$cv")
    }

    val dir = graft.Scratch.dir(spark, s"dedup-scale-x$k")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    // Replica r of a doc keeps the text prefix and appends a distinct
    // tail: same shingle mass ⇒ same buckets, near-dup pairs across all
    // K replicas of one doc. IDs stay unique and deterministic.
    val replicaText =
      if (exactCopies) col("text")
      else when(col("id") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" replica marker "),
          col("id").cast("string")))
    spark.range(k).crossJoin(docs)
      .select(
        (col("doc_id") + col("id") * nDocs * 10L).as("doc_id"),
        replicaText.as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVec = emb.count()
    // Near-dup mode perturbs each replica's vector by a tiny per-replica
    // offset: cosine stays near-1 (the pairs remain semantic dups) but the
    // vectors are UNEQUAL — the adversarial case for SemDeDup, whose
    // exact-dup collapse cannot fire and the centroid-confined quadratic
    // must carry the full duplicate mass. Exact mode keeps byte-identical
    // vectors (the hot-bucket / collapse-friendly case).
    val replicaVec =
      if (exactCopies) col("embedding")
      else transform(col("embedding"),
        x => x + col("id").cast("float") * lit(1e-4f))
    spark.range(k).crossJoin(emb)
      .select((col("vec_id") + col("id") * nVec * 10L).as("vec_id"),
        replicaVec.as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // orders too, so the mutation-family queries (q136 general merge …)
    // probe at the same ×K
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val nOrd = ord.count()
    spark.range(k).crossJoin(ord)
      .select((col("o_orderkey") + col("id") * nOrd * 100L).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    println(s"PROBE corpus x$k at $dir: ${nDocs * k} docs, ${nVec * k} vecs, ${nOrd * k} orders")

    queries.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"PROBE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      } catch { case e: Throwable =>
        println(s"PROBE $name FAILED: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
