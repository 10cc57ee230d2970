package graft.tools

import org.apache.spark.sql.SparkSession

import graft.dedup.Dedup

/** Dev probe: measures the real parquet-to-parquet expansion factor of the
  * dedup staging tables (shingle-hash explode, prefix table) against the
  * source corpus bytes — the constant [[Dedup.stageIfLarge]]'s physical
  * gate uses instead of optimizer estimates. */
object ExpansionProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def bytesOf(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.getContentSummary(p).getLength
    }
    val in = bytesOf(s"$dir/documents.parquet")
    def staged(df: org.apache.spark.sql.DataFrame, tag: String): Long = {
      val p = graft.Scratch.dir(spark, s"exp-$tag")
      df.write.mode("overwrite").parquet(p)
      bytesOf(p)
    }
    val sh = staged(Dedup.docShingleHashes(docs, 3), "sh")
    println(f"[exp] input=$in%d shingles=$sh%d factor=${sh.toDouble / in}%.2f")
    spark.stop()
  }
}
