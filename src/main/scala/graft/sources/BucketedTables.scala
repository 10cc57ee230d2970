package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table writer: persists a DataFrame hash-bucketed and sorted on
  * its join/agg key, so repeated equi-joins and aggregations on that key
  * run with NO shuffle — both sides are already co-partitioned on disk.
  *
  * At 100 TB this is the difference between shuffling the fact table per
  * query and scanning pre-bucketed files: bucket the big tables once on
  * their FK keys (orders/lineitem on orderkey, customer/orders on custkey)
  * and every downstream join is exchange-free (verified in
  * `BucketedTablesSpec` by asserting the physical plan has no Exchange).
  * The reference leaves every table unpartitioned
  * (SURVEY §4: `partitionColumns: []` in its Delta logs) — this is the
  * engine-side upgrade.
  */
object BucketedTables {

  /** Write as a bucketed+sorted parquet catalog table (bucketBy requires
    * `saveAsTable`; `path` keeps data at an explicit location). */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      numBuckets: Int,
      path: String): Unit = {
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)
  }
}
