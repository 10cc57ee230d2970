package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** The reference's analytics query surface, re-phrased Spark-first over the
  * driver testdata star schema.
  *
  * Sources (reference @ /root/reference):
  *  - `consumer/risingwave-connector/init-risingwave.sql:73-109` — the three
  *    incrementally-maintained materialized views (order_analytics,
  *    customer_order_summary, product_inventory).
  *  - `notebooks/deltalake-query.ipynb` cells 28-30, 37 — ad-hoc join +
  *    group-aggregate + top-k queries.
  *
  * Determinism conventions (so the DuckDB oracle hash-matches):
  *  - Money sums go through DECIMAL(18,2): decimal aggregation is exact and
  *    order-independent, unlike a double sum whose value depends on the
  *    (nondeterministic) partition reduce order. The final column is cast
  *    back to DOUBLE so Spark and DuckDB produce the identical bit pattern.
  *  - NO round() on double outputs: Spark (BigDecimal HALF_UP on the exact
  *    binary value) and DuckDB disagree on e.g. round(2.675d, 2). Averages
  *    are a single IEEE division of two exact values instead.
  *  - Every ORDER BY ... LIMIT k carries a unique-key tiebreaker so the
  *    selected row set is engine-independent.
  */
object Views {

  /** Exact, order-independent sum of a money-ish double column. */
  def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** avg = exact decimal sum (as double) / count: one IEEE division on
    * identical operands on both engines — bit-deterministic, no rounding.
    */
  def moneyAvg(c: Column): Column = moneySum(c) / count(c)

  /** MV `order_analytics` (init-risingwave.sql:73-81): orders per day ×
    * status with count / revenue / avg order value. Single hash-aggregate
    * after a pruned scan of 3 columns; partial aggregation map-side.
    */
  def orderAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(
        to_date(date_trunc("day", col("o_orderdate"))).as("order_day"),
        col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("order_count"),
        moneySum(col("o_totalprice")).as("total_revenue"),
        moneyAvg(col("o_totalprice")).as("avg_order_value"))
  }

  /** MV `customer_order_summary` (init-risingwave.sql:84-94): customer LEFT
    * JOIN orders + per-customer count and lifetime value. The flagship query.
    *
    * Scale note: both sides shuffle on the customer key; at 100 TB this is a
    * plain co-partitioned shuffle join + partial agg. At test scale Catalyst
    * broadcasts the smaller side via AQE — no hint needed, and a hint would
    * be wrong at 1000× customer cardinality.
    */
  def customerOrderSummary(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"), c("c_name"), c("c_mktsegment"))
      .agg(
        count(o("o_orderkey")).as("total_orders"),
        coalesce(moneySum(o("o_totalprice")), lit(0.0)).as("lifetime_value"))
  }

  /** Notebook cell 28 (`deltalake-query.ipynb:1620-1627`): product
    * popularity — part LEFT JOIN lineitem, times-ordered / quantity sold,
    * top 10 by times_ordered (unique-key tiebreak on p_partkey).
    */
  def productPopularity(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    // Aggregate-below-join: lineitem reduces to one row per partkey
    // BEFORE the join (map-side partial + one narrow shuffle), so the
    // join sees |part| rows on both sides instead of the full fact table
    // — at 100 TB the fact shuffles once at two-column width and the
    // joined aggregate becomes broadcast-sized, where join-then-group
    // shuffles every fact row at full width. `part` is unique on
    // p_partkey, so the regrouping is exact (same counts, same decimal
    // sums in the same per-key order class).
    val la = l.groupBy(col("l_partkey"))
      .agg(count(col("l_orderkey")).as("__n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("__q"))
    p.join(la, p("p_partkey") === la("l_partkey"), "left")
      .select(p("p_partkey"), p("p_name"), p("p_brand"),
        coalesce(col("__n"), lit(0L)).as("times_ordered"),
        coalesce(col("__q").cast(DoubleType), lit(0.0)).as("total_quantity_sold"))
      .orderBy(desc("times_ordered"), col("p_partkey"))
      .limit(10)
  }

  /** Notebook cell 29 (`deltalake-query.ipynb:1678-1680`): items per order —
    * orders LEFT JOIN lineitem, item count / total quantity, top 10.
    */
  def itemsPerOrder(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    // Same aggregate-below-join shape as [[productPopularity]]: orders is
    // unique on o_orderkey, so grouping the fact first is exact and the
    // join never carries more than one row per order per side.
    val la = l.groupBy(col("l_orderkey"))
      .agg(count(col("l_linenumber")).as("__n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("__q"))
    o.join(la, o("o_orderkey") === la("l_orderkey"), "left")
      .select(o("o_orderkey"), o("o_orderstatus"),
        coalesce(col("__n"), lit(0L)).as("item_count"),
        coalesce(col("__q").cast(DoubleType), lit(0.0)).as("total_quantity"))
      .orderBy(desc("item_count"), col("o_orderkey"))
      .limit(10)
  }

  /** MV `product_inventory` stock_status CASE bucketing
    * (init-risingwave.sql:104-108), phrased over part.p_size.
    */
  def stockStatus(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.select(
        col("p_partkey"),
        col("p_name"),
        col("p_size"),
        when(col("p_size") === 0, "Out of Stock")
          .when(col("p_size") < 10, "Low Stock")
          .otherwise("In Stock").as("stock_status"))
  }

  /** Notebook cell 37 (`deltalake-query.ipynb:1985-1992`): filtered
    * group-agg with count/avg/min + ORDER BY post-agg — phrased as
    * per-nation customer stats over positive-balance customers.
    */
  def customerStatsByNation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    c.filter(col("c_acctbal") > 0)
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("nation"))
      .agg(
        count(lit(1)).as("customer_count"),
        moneyAvg(col("c_acctbal")).as("avg_balance"),
        min(col("c_acctbal")).as("min_balance"))
      .orderBy(desc("avg_balance"), col("nation"))
  }

  /** 3-way FK chain (SURVEY J4): revenue per nation via
    * lineitem ⋈ orders ⋈ customer ⋈ nation. nation is broadcast (tiny dim);
    * the two big joins shuffle on their FK keys and AQE handles skew.
    */
  def revenuePerNation(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // Aggregate-below-join (the q3/q4 shape, optimization round 12): the
    // fact table collapses to one (count, exact-decimal sum) row per
    // orderkey BEFORE the join chain, so the o⋈c⋈n joins carry |orders|
    // rows instead of |lineitem| and the per-nation regroup sums the
    // partial decimal sums — exact under decimal associativity, same
    // doubles out (orders is unique on o_orderkey, inner joins drop the
    // same rows either way). At 100 TB the fact crosses the network once
    // at three-column width; join-then-group shuffled every lineitem row
    // through two joins at full width.
    val la = l.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("__n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("__s"))
    la.join(o, la("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("nation"))
      .agg(
        sum(col("__n")).as("lineitem_count"),
        sum(col("__s")).cast(DoubleType).as("gross_revenue"))
      .orderBy(desc("gross_revenue"), col("nation"))
  }

  /** TPC-H Q1-shaped pricing summary — the headline bench aggregation.
    * Pruned 7-column scan → single hash aggregate with map-side combine.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Summary views `analytics_summary`/`sync_summary`
    * (datalake-init.sql:90-113, target-init.sql:83-106): 4-way UNION ALL of
    * per-table global COUNT/aggregate rows.
    */
  def tableSummary(spark: SparkSession, dir: String): DataFrame = {
    def row(name: String, df: DataFrame, key: String): DataFrame =
      df.agg(count(lit(1)).as("row_count"), max(col(key)).cast("long").as("max_key"))
        .select(lit(name).as("table_name"), col("row_count"), col("max_key"))
    row("customer", Tables.customer(spark, dir), "c_custkey")
      .unionByName(row("orders", Tables.orders(spark, dir), "o_orderkey"))
      .unionByName(row("lineitem", Tables.lineitem(spark, dir), "l_orderkey"))
      .unionByName(row("part", Tables.part(spark, dir), "p_partkey"))
  }
}
