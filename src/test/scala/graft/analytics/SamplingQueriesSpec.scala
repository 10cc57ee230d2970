package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftOps

import graft.SparkSpec

/** Dataset-construction operators must be deterministic (content-hash,
  * not rand()) and respect their caps/budgets. */
class SamplingQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("hashSplit is deterministic and roughly 90/5/5") {
    val a = SamplingQueries.hashSplit(spark, sf).collect().map(r => (r.getLong(0), r.getString(2)))
    val b = SamplingQueries.hashSplit(spark, sf).collect().map(r => (r.getLong(0), r.getString(2)))
    assert(a.toSet === b.toSet) // rerun-stable
    val n = a.length.toDouble
    val frac = a.groupBy(_._2).map { case (s, xs) => s -> xs.length / n }
    assert(frac("train") > 0.8 && frac("train") < 0.97, frac.toString)
    assert(frac.getOrElse("val", 0.0) < 0.12 && frac.getOrElse("test", 0.0) < 0.12)
  }

  test("quotaSample caps every source at k and rewrites to the heap operator") {
    GraftOps.enableTopKRewrite(spark)
    val q = SamplingQueries.quotaSample(spark, sf, k = 3)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val bySource = q.groupBy("source").count().collect()
    assert(bySource.nonEmpty)
    assert(bySource.forall(_.getLong(1) <= 3))
    // deterministic: same sample both runs
    assert(q.collect().toSet === SamplingQueries.quotaSample(spark, sf, k = 3).collect().toSet)
  }

  test("packedPayloads: bin payload is the bin's docs in doc_id order") {
    val payloads = SamplingQueries.packedPayloads(spark, sf, budget = 256)
    val packed = SamplingQueries.packSequences(spark, sf, budget = 256)
      .collect().map(r => (r.getString(1), r.getLong(3)) -> (r.getLong(0), r.getLong(2)))
      .groupBy(_._1)
    payloads.collect().foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val members = packed(key).map(_._2)
      assert(r.getLong(2) === members.map(_._2).sum, s"bin_tokens of $key")
      assert(r.getLong(3) === members.length.toLong, s"bin_docs of $key")
      assert(r.getString(4).nonEmpty)
    }
  }

  test("sourceMix fills each source's weighted budget, overshooting by at most one doc") {
    val mix = SamplingQueries.sourceMix(spark, sf, tokensPerWeight = 200L).collect()
    assert(mix.nonEmpty)
    // deterministic re-run
    assert(SamplingQueries.sourceMix(spark, sf, tokensPerWeight = 200L)
      .collect().toSet === mix.toSet)
    mix.groupBy(_.getString(0)).foreach { case (source, rows) =>
      val weight = rows.head.getLong(2)
      assert(weight === (source.drop(3).toInt % 4 + 1).toLong, source)
      val budget = weight * 200L
      val total = rows.map(_.getLong(3)).sum
      val maxDoc = rows.map(_.getLong(3)).max
      // every selected doc STARTS inside the budget → total < budget + last doc
      assert(total < budget + maxDoc, s"$source total=$total budget=$budget")
    }
  }

  test("decontaminate: flags only train docs overlapping the eval slice") {
    val flagged = SamplingQueries.decontaminate(spark, sf, n = 8, evalDocs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // eval docs never flag themselves; counts are positive
    assert(flagged.forall { case (id, c) => id >= 10L && c > 0L })
    // determinism
    val again = SamplingQueries.decontaminate(spark, sf, n = 8, evalDocs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged.toSet === again.toSet)
  }

  test("decontaminateBloom: identical output to the exact path, prefilter in plan") {
    val exact = SamplingQueries.decontaminate(spark, sf, n = 8, evalDocs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = SamplingQueries.decontaminateBloom(spark, sf, n = 8, evalDocs = 10L)
    assert(bloom.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === exact)
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("packSequences with shards keeps the invariant per (source, shard)") {
    val packed = SamplingQueries.packSequences(spark, sf, budget = 256, shards = 4)
    assert(packed.columns.contains("shard"))
    val rows = packed.orderBy("source", "shard", "doc_id")
      .collect().map(r => (r.getString(1) + "/" + r.getLong(3), r.getLong(2), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, xs) =>
      assert(xs.map(_._3).sameElements(xs.map(_._3).sorted))
      xs.groupBy(_._3).foreach { case (_, bin) =>
        assert(bin.map(_._2).init.sum < 256 || bin.length == 1)
      }
    }
  }

  test("corpusShuffle is a seeded permutation: dense per-shard positions, seed-sensitive") {
    val a = SamplingQueries.corpusShuffle(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    // every document appears exactly once
    assert(a.map(_._1).distinct.length === a.length)
    // shard ids are nibbles; positions within a shard are dense 1..n
    assert(a.forall(x => x._2 >= 0 && x._2 < 16))
    a.groupBy(_._2).foreach { case (shard, xs) =>
      assert(xs.map(_._3).sorted.sameElements(1L to xs.length.toLong),
        s"shard $shard positions not dense")
    }
    // bit-reproducible across runs; a different seed is a different permutation
    val b = SamplingQueries.corpusShuffle(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(a.toSet === b.toSet)
    val c = SamplingQueries.corpusShuffle(spark, sf, seed = "graft-shuffle-v2:")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(a.toSet !== c.toSet)
    // the permutation is uncorrelated with ingestion order: within the
    // largest shard, walking docs in doc_id order must not walk positions
    // monotonically (that would mean no shuffle happened)
    val largest = a.groupBy(_._2).maxBy(_._2.length)._2
    val posByDocId = largest.sortBy(_._1).map(_._3)
    assert(posByDocId.length < 3 || !posByDocId.sameElements(posByDocId.sorted))
  }

  test("packSequences: bins are contiguous per source and near the budget") {
    val packed = SamplingQueries.packSequences(spark, sf, budget = 256)
    val rows = packed.orderBy("source", "doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // bin ids never decrease within a source, and a bin's token mass stays
    // under budget + its last document (next-fit invariant)
    rows.groupBy(_._1).foreach { case (_, xs) =>
      assert(xs.map(_._3).sameElements(xs.map(_._3).sorted))
      xs.groupBy(_._3).foreach { case (_, bin) =>
        val sums = bin.map(_._2)
        assert(sums.init.sum < 256 || bin.length == 1,
          s"bin overfilled before its last doc: ${sums.toSeq}")
      }
    }
  }
}
