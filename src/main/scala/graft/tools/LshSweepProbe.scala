package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: decompose q215's wall time into its stages — the exact
  * ranking pass, the per-config candidate flag joins, the per-query
  * tally frame, the p10 selections, and the bucket fan-out pass — to
  * find where a rework moved the cost. Not part of the shipped surface.
  */
object LshSweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    println(s"[probe] embeddings: ${emb.count()}")

    // warm-up: one full run
    timed("full lshRecallSweep (warm-up)") {
      graft.sim.Similarity.lshRecallSweep(emb, k = 10).collect()
    }
    (1 to 2).foreach { i =>
      timed(s"full lshRecallSweep (run $i)") {
        graft.sim.Similarity.lshRecallSweep(emb, k = 10).collect()
      }
    }

    // decomposed: rebuild the stages inline (mirrors Similarity)
    val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("norm", sqrt(graft.dedup.Dedup.dot(col("vec"), col("vec"))))
    val a = v.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id").as("a_id"), col("vec").as("a_vec"),
        col("norm").as("a_norm"))
    val b = v.select(col("vec_id").as("b_id"), col("vec").as("b_vec"),
      col("norm").as("b_norm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(col("cosine").desc, col("b_id"))
    def exact() = a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        (graft.dedup.Dedup.dot(col("a_vec"), col("b_vec")) /
          (col("a_norm") * col("b_norm"))).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("a_id"), col("b_id"))
    timed("exact pass alone (count)") { println(exact().count()) }

    val configs = Seq((2, 4), (4, 4), (8, 4), (8, 8))
    val maxDim = 64
    val pivAggs = (0 until maxDim).map(d =>
      sum(floor(col("vec").getItem(d) * lit(1000000.0d))).as(s"s$d")) :+
      count(lit(1)).as("n")
    val (piv, n) = timed("signPivots") {
      val row = v.agg(pivAggs.head, pivAggs.tail: _*).collect().head
      (Array.tabulate(maxDim)(d => row.getLong(d)), row.getLong(maxDim))
    }
    def sig(j: Int, bits: Int) = (0 until bits).map { i =>
      val d = j * bits + i
      when(floor(col("vec").getItem(d) * lit(1000000.0d)) * lit(n) >= lit(piv(d)),
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    def candidates(bands: Int, bits: Int): DataFrame = {
      val signed = v.select(Seq(col("vec_id")) ++
        (0 until bands).map(j => sig(j, bits).as(s"sig$j")): _*)
      val qs = signed.filter(col("vec_id") % 4 === 0)
      (0 until bands).map { j =>
        qs.select(col("vec_id").as("a_id"), col(s"sig$j").as("sig"))
          .join(signed.select(col("vec_id").as("b_id"),
            col(s"sig$j").as("sig")), Seq("sig"))
          .filter(col("a_id") =!= col("b_id"))
          .select(col("a_id"), col("b_id"))
      }.reduce(_ unionByName _).distinct()
    }
    configs.foreach { case (bands, bits) =>
      timed(s"candidates($bands,$bits) count") {
        println(candidates(bands, bits).count())
      }
    }
    val flagged = configs.zipWithIndex.foldLeft(exact()) {
      case (acc, ((bands, bits), i)) =>
        acc.join(candidates(bands, bits).withColumn(s"hit$i", lit(1L)),
          Seq("a_id", "b_id"), "left")
    }
    timed("flagged single global agg (old shape)") {
      val aggs = Seq(countDistinct(col("a_id")).as("n_queries"),
        count(lit(1)).as("exact_pairs")) ++
        configs.indices.map(i =>
          sum(coalesce(col(s"hit$i"), lit(0L))).as(s"hits$i"))
      println(flagged.agg(aggs.head, aggs.tail: _*).collect().head)
    }
    val pqAggs = count(lit(1)).as("ex_a") +:
      configs.indices.map(i => sum(coalesce(col(s"hit$i"), lit(0L))).as(s"h$i"))
    timed("perQ groupBy + persist + top agg (new shape)") {
      val perQ = flagged.groupBy("a_id").agg(pqAggs.head, pqAggs.tail: _*)
        .persist()
      val topAggs = Seq(count(lit(1)).as("n_queries"),
        sum(col("ex_a")).as("exact_pairs")) ++
        configs.indices.flatMap(i => Seq(
          sum(col(s"h$i")).as(s"hits$i"),
          min(col(s"h$i").cast("double") / col("ex_a")).as(s"min$i")))
      println(perQ.agg(topAggs.head, topAggs.tail: _*).collect().head)
      timed("4 p10 jobs on cached perQ") {
        configs.indices.foreach { i =>
          perQ.select((col(s"h$i").cast("double") / col("ex_a")).as("r"))
            .orderBy(col("r")).limit(160).agg(max(col("r"))).collect()
        }
      }
      perQ.unpersist(false)
    }
    timed("fan pass") {
      val fanStructs = configs.zipWithIndex.flatMap { case ((bands, bits), ci) =>
        (0 until bands).map(j =>
          struct(lit(ci).as("cfg"), lit(j).as("band"), sig(j, bits).as("sg")))
      }
      v.select(col("vec_id"), explode(array(fanStructs: _*)).as("x"))
        .groupBy(col("x.cfg").as("cfg"), col("x.band"), col("x.sg"))
        .agg(sum(when(col("vec_id") % 4 === 0, 1L).otherwise(0L)).as("qc"),
          count(lit(1)).as("ac"))
        .groupBy("cfg").agg(sum(col("qc") * (col("ac") - lit(1L))).as("candidates"))
        .collect().foreach(r => println(s"[probe] fan $r"))
    }
    spark.stop()
  }
}
