package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.table.GraftTable

/** Delta-incremental MV maintenance from CDF rows must equal a full
  * recompute after every batch — the invariant RisingWave's incremental
  * dataflows guarantee (init-risingwave.sql:73-81). */
class IncrementalMvSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def ordersDf(rows: Seq[(Long, Timestamp, String, Double)]): DataFrame =
    rows.toDF("id", "order_date", "status", "total_amount")

  private def recompute(snapshot: DataFrame): Set[(String, String, Long, Double, Double)] =
    MaterializedViews.orderAnalytics(snapshot)
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet

  private def incremental(state: GraftTable): Set[(String, String, Long, Double, Double)] =
    MaterializedViews.incrementalOrderAnalyticsView(state.read())
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet

  test("incremental CDF application equals recompute across batch kinds") {
    val seed = ordersDf(Seq(
      (1L, t("2024-01-01 10:00:00"), "pending", 100.0),
      (2L, t("2024-01-01 11:00:00"), "pending", 50.0),
      (3L, t("2024-01-02 09:00:00"), "shipped", 75.0)))

    val snap = GraftTable.create(spark, tmpDir("imv-orders"), seed.limit(0))
    val emptyState = seed.limit(0).select(
      to_date(col("order_date")).as("order_day"),
      col("status"),
      lit(0L).as("order_count"),
      lit(0).cast(DecimalType(18, 2)).as("sum_revenue"))
    val mv = GraftTable.create(spark, tmpDir("imv-state"), emptyState)

    def applyLatest(): Unit = {
      val v = snap.version
      MaterializedViews.applyOrderChangesIncrementally(
        spark, mv, snap.readChanges(v, v))
    }

    // Batch 1: initial load (all inserts via merge)
    snap.merge(seed, "id")
    applyLatest()
    assert(incremental(mv) === recompute(snap.read()))

    // Batch 2: status change (update pre/post), amount change, one insert
    snap.merge(ordersDf(Seq(
      (1L, t("2024-01-01 10:00:00"), "shipped", 100.0), // status moves groups
      (2L, t("2024-01-01 11:00:00"), "pending", 60.0),  // amount changes in place
      (4L, t("2024-01-02 14:00:00"), "pending", 25.0))), "id")
    applyLatest()
    assert(incremental(mv) === recompute(snap.read()))

    // Batch 3: delete one row (group count drops; day-1 'pending' shrinks)
    snap.deleteKeys(Seq(2L).toDF("id"), "id")
    applyLatest()
    assert(incremental(mv) === recompute(snap.read()))

    // Batch 4: delete the last 'shipped' of day-2 → group must vanish
    snap.deleteKeys(Seq(3L).toDF("id"), "id")
    applyLatest()
    assert(incremental(mv) === recompute(snap.read()))
    assert(!incremental(mv).exists { case (d, s, _, _, _) => d == "2024-01-02" && s == "shipped" })
  }

  test("incremental MV stays exact across positional-DV delete and update") {
    // DV mutations emit the same CDF contract as rewrites, so the O(batch)
    // maintainer must not notice the physical difference.
    val seed = ordersDf(Seq(
      (1L, t("2024-01-01 10:00:00"), "pending", 100.0),
      (2L, t("2024-01-01 11:00:00"), "pending", 50.0),
      (3L, t("2024-01-02 09:00:00"), "shipped", 75.0)))
    val snap = GraftTable.create(spark, tmpDir("imv-dv-orders"), seed.limit(0))
    val emptyState = seed.limit(0).select(
      to_date(col("order_date")).as("order_day"),
      col("status"),
      lit(0L).as("order_count"),
      lit(0).cast(DecimalType(18, 2)).as("sum_revenue"))
    val mv = GraftTable.create(spark, tmpDir("imv-dv-state"), emptyState)
    def applyLatest(): Unit = {
      val v = snap.version
      MaterializedViews.applyOrderChangesIncrementally(
        spark, mv, snap.readChanges(v, v))
    }
    snap.merge(seed, "id") // initial load: CDF inserts
    applyLatest()
    assert(incremental(mv) === recompute(snap.read()))
    // positional delete: CDF delete rows must shrink (and drop) groups
    snap.deletePositional(col("status") === "shipped")
    applyLatest()
    assert(incremental(mv) === recompute(snap.read()))
    assert(!incremental(mv).exists { case (_, s, _, _, _) => s == "shipped" })
    // positional update: pre/post images must move revenue in place
    snap.updatePositional(col("id") === 2L, Map("total_amount" -> lit(60.0)))
    applyLatest()
    assert(incremental(mv) === recompute(snap.read()))
  }

  test("a replayed micro-batch is detected by its txn stamp and skipped") {
    val seed = ordersDf(Seq(
      (1L, t("2024-03-01 10:00:00"), "pending", 100.0),
      (2L, t("2024-03-01 11:00:00"), "shipped", 50.0)))
    val snap = GraftTable.create(spark, tmpDir("rmv-orders"), seed.limit(0))
    val emptyState = seed.limit(0).select(
      to_date(col("order_date")).as("order_day"),
      col("status"),
      lit(0L).as("order_count"),
      lit(0).cast(DecimalType(18, 2)).as("sum_revenue"))
    val mv = GraftTable.create(spark, tmpDir("rmv-state"), emptyState)

    snap.merge(seed, "id")
    val changes = snap.readChanges(1, 1)
    MaterializedViews.applyOrderChangesIncrementally(
      spark, mv, changes, txn = Some(("q", 0L)))
    val after = incremental(mv)
    assert(after === recompute(snap.read()))
    // foreachBatch is at-least-once: the same batch arrives again after a
    // crash between MV commit and checkpoint commit. Without the stamp the
    // signed deltas double-apply; with it the publish is a no-op.
    MaterializedViews.applyOrderChangesIncrementally(
      spark, mv, changes, txn = Some(("q", 0L)))
    assert(incremental(mv) === after)
    // the NEXT batch id still applies
    snap.merge(ordersDf(Seq((3L, t("2024-03-02 09:00:00"), "pending", 25.0))), "id")
    MaterializedViews.applyOrderChangesIncrementally(
      spark, mv, snap.readChanges(2, 2), txn = Some(("q", 1L)))
    assert(incremental(mv) === recompute(snap.read()))
  }

  test("incremental product_inventory (projection MV) equals recompute") {
    val products = Seq(
      (1L, "Laptop", "tech", 999.99, 10),
      (2L, "Mouse", "tech", 19.99, 0)
    ).toDF("id", "name", "category", "price", "stock_quantity")
    val snap = GraftTable.create(spark, tmpDir("ipv-prod"), products.limit(0))
    val mv = GraftTable.create(spark, tmpDir("ipv-mv"),
      MaterializedViews.productInventory(products.limit(0)))

    def applyLatest(): Unit = MaterializedViews.applyProductChangesIncrementally(
      spark, mv, snap.readChanges(snap.version, snap.version))
    def check(): Unit = {
      val expect = MaterializedViews.productInventory(snap.read()).collect().toSet
      assert(mv.read().collect().toSet === expect)
    }

    snap.merge(products, "id"); applyLatest(); check()
    snap.merge(Seq((2L, "Mouse", "tech", 17.99, 25), (3L, "Desk", "office", 149.0, 5))
      .toDF("id", "name", "category", "price", "stock_quantity"), "id")
    applyLatest(); check()
    snap.deleteKeys(Seq(1L).toDF("id"), "id"); applyLatest(); check()
    // stock_status buckets reflect the updates
    val statuses = mv.read().orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("stock_status")))
    assert(statuses.toSeq === Seq((2L, "In Stock"), (3L, "Low Stock")))
  }

  test("continuous incremental MV over the streaming CDF equals recompute") {
    val cfg = CdcPipeline.Config(
      inputDir = tmpDir("cimv-in"),
      tableRoot = tmpDir("cimv-tables"),
      checkpointRoot = tmpDir("cimv-ckpt"))
    val snapPath = CdcPipeline.snapshotPath(cfg, "orders")
    // build the snapshot through real mutations (each emits CDF)
    val snap = GraftTable.create(spark, snapPath, ordersDf(Nil).limit(0))
    snap.merge(ordersDf(Seq(
      (1L, t("2024-02-01 08:00:00"), "pending", 10.0),
      (2L, t("2024-02-01 09:00:00"), "pending", 20.0),
      (3L, t("2024-02-02 10:00:00"), "shipped", 30.0))), "id")
    snap.merge(ordersDf(Seq(
      (2L, t("2024-02-01 09:00:00"), "shipped", 20.0),
      (4L, t("2024-02-03 11:00:00"), "pending", 40.0))), "id")
    snap.deleteKeys(Seq(1L).toDF("id"), "id")

    val q = MaterializedViews.startIncrementalOrderAnalytics(spark, cfg, availableNow = true)
    q.awaitTermination()
    val state = GraftTable.forPath(spark,
      MaterializedViews.mvPath(cfg, "order_analytics_inc"))
    assert(incremental(state) === recompute(snap.read()))

    // one more commit, resume the stream from its checkpoint
    snap.merge(ordersDf(Seq((5L, t("2024-02-03 12:00:00"), "pending", 50.0))), "id")
    val q2 = MaterializedViews.startIncrementalOrderAnalytics(spark, cfg, availableNow = true)
    q2.awaitTermination()
    assert(incremental(state) === recompute(snap.read()))
  }
}
