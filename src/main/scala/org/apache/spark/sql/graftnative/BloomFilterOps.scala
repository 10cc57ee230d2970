package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's runtime-filter bloom expressions (built for its
  * runtime row-level filtering, not registered as public functions): an
  * aggregate that serializes a bloom filter over LongType keys, and a
  * `might_contain` predicate whose filter rides the plan as a scalar
  * subquery — [[BloomFilterMightContain]] deserializes it ONCE per task,
  * then tests each row against in-memory bits.
  *
  * This is the broadcast-prefilter shape for asymmetric joins at scale:
  * build the filter over the SMALL side's keys (one tiny aggregate),
  * semi-filter the 100 TB side map-side — no shuffle of the big side's
  * non-matching rows — then run the exact join on the survivors (bloom
  * false positives are eliminated there, so results are exact).
  */
object BloomOps {

  /** Serialized bloom filter over a LongType column. `numBits` defaults to
    * ~8 bits/item (~2% fpp). */
  def bloomFilterAgg(longCol: Column, estimatedItems: Long,
      numBits: Long = -1L): Column = {
    val bits = if (numBits > 0) numBits else math.max(64L, estimatedItems * 8L)
    ExpressionUtils.column(
      BloomFilterAggregate(ExpressionUtils.expression(longCol),
        org.apache.spark.sql.catalyst.expressions.Literal(estimatedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(bits), 0, 0)
        .toAggregateExpression())
  }

  /** Membership test of `longCol` against the 1-row/1-column filter frame
    * (the output of [[bloomFilterAgg]]), attached as a scalar subquery. */
  def mightContain(filterDf: DataFrame, longCol: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ScalarSubquery(filterDf.queryExecution.analyzed),
      ExpressionUtils.expression(longCol)))

  /** Materialize the serialized filter bytes (one driver action — bounded
    * by the SMALL side's size, like a broadcast). For contexts where a
    * scalar subquery can't ride the plan: streaming queries build the
    * filter ONCE at start and embed it as a foldable literal. */
  def buildFilterBytes(df: DataFrame, longCol: Column, estimatedItems: Long,
      numBits: Long = -1L): Array[Byte] =
    df.agg(bloomFilterAgg(longCol, estimatedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Membership test against pre-built filter bytes (foldable literal —
    * deserialized once per task, streaming-safe). */
  def mightContainBytes(filter: Array[Byte], longCol: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(filter,
        org.apache.spark.sql.types.BinaryType),
      ExpressionUtils.expression(longCol)))
}
