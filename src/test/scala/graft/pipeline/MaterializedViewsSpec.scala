package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.CdcFixtures
import graft.table.GraftTable

/** MV maintenance through the streaming pipeline: after each batch the MV
  * tables must equal a fresh recompute over the snapshots — the contract
  * RisingWave's incremental maintenance provides
  * (init-risingwave.sql:73-109). */
class MaterializedViewsSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, name: String,
      recs: Seq[(String, String, String, Int, Long, java.sql.Timestamp)]): Unit = {
    val lines = recs.map { case (k, v, topic, part, off, ts) =>
      val vs = Option(v).map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"").getOrElse("null")
      s"""{"key":"${k.replace("\"", "\\\"")}","value":$vs,"topic":"$topic","partition":$part,"offset":$off,"timestamp":"${ts.toInstant}"}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))
    ()
  }

  test("MVs refresh per batch and match snapshot recompute") {
    val in = tmpDir("mv-in")
    val cfg = CdcPipeline.Config(
      inputDir = in,
      tableRoot = tmpDir("mv-tables"),
      checkpointRoot = tmpDir("mv-ckpt"),
      availableNow = true,
      tables = Seq("customers", "products", "orders"),
      maintainMvs = true)

    writeBatch(in, "b1.json", Seq(
      CdcFixtures.record("customers", "c", 1,
        Some(CdcFixtures.customerJson(1, "John", "Doe", "john@x.com")), off = 0),
      CdcFixtures.record("customers", "c", 2,
        Some(CdcFixtures.customerJson(2, "Jane", "Roe", "jane@x.com")), off = 1),
      CdcFixtures.record("products", "c", 1,
        Some(CdcFixtures.productJson(1, "Laptop", 999.99, 0)), off = 2),
      CdcFixtures.record("products", "c", 2,
        Some(CdcFixtures.productJson(2, "Mouse", 19.99, 5)), off = 3),
      CdcFixtures.record("products", "c", 3,
        Some(CdcFixtures.productJson(3, "Desk", 149.0, 50)), off = 4),
      CdcFixtures.record("orders", "c", 10,
        Some(CdcFixtures.orderJson(10, 1, "pending", 100.0)), off = 5),
      CdcFixtures.record("orders", "c", 11,
        Some(CdcFixtures.orderJson(11, 1, "shipped", 50.0)), off = 6)))
    CdcPipeline.runOnce(spark, cfg)

    // product_inventory: CASE bucketing
    val inv = GraftTable.forPath(spark, MaterializedViews.mvPath(cfg, "product_inventory"))
      .read().orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("stock_status")))
    assert(inv.toSeq === Seq((1L, "Out of Stock"), (2L, "Low Stock"), (3L, "In Stock")))

    // customer_order_summary: John 2 orders / 150, Jane 0 / 0
    val cos = GraftTable.forPath(spark, MaterializedViews.mvPath(cfg, "customer_order_summary"))
      .read().orderBy("customer_id").collect()
      .map(r => (r.getAs[Long]("customer_id"), r.getAs[Long]("total_orders"),
        r.getAs[Double]("lifetime_value")))
    assert(cos.toSeq === Seq((1L, 2L, 150.0), (2L, 0L, 0.0)))

    // Second batch: order update + delete; MVs must follow.
    writeBatch(in, "b2.json", Seq(
      CdcFixtures.record("orders", "u", 11,
        Some(CdcFixtures.orderJson(11, 1, "delivered", 75.0)),
        Some(CdcFixtures.orderJson(11, 1, "shipped", 50.0)), off = 7),
      CdcFixtures.record("orders", "d", 10, None,
        Some(CdcFixtures.orderJson(10, 1, "pending", 100.0)), off = 8)))
    CdcPipeline.runOnce(spark, cfg)

    val cos2 = GraftTable.forPath(spark, MaterializedViews.mvPath(cfg, "customer_order_summary"))
      .read().filter(col("customer_id") === 1L).collect().head
    assert(cos2.getAs[Long]("total_orders") === 1L)
    assert(cos2.getAs[Double]("lifetime_value") === 75.0)

    // order_analytics matches a recompute from the snapshot
    val ordersSnap = GraftTable.forPath(spark, CdcPipeline.snapshotPath(cfg, "orders")).read()
    val expect = MaterializedViews.orderAnalytics(ordersSnap).collect().toSet
    val got = GraftTable.forPath(spark, MaterializedViews.mvPath(cfg, "order_analytics"))
      .read().collect().toSet
    assert(got === expect)

    // MV history: one CREATE + one refresh commit
    val h = GraftTable.forPath(spark, MaterializedViews.mvPath(cfg, "order_analytics"))
      .history().select("operation").collect().map(_.getString(0)).toSeq
    assert(h === Seq("WRITE", "CREATE"))
  }
}
