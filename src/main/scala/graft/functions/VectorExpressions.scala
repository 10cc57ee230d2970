package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftnative.{DotProduct, VectorExpressions}

/** Public facade over graft's native Catalyst expressions
  * ([[org.apache.spark.sql.graftnative]]). */
object GraftFunctions {

  /** Codegen'd `Σ a(i)*b(i)` over `array<double>` columns — bit-identical
    * to the interpreted `aggregate(zip_with(…))` phrasing. */
  def dotProduct(a: Column, b: Column): Column =
    VectorExpressions.dotProduct(a, b)

  private[functions] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children.head, children(1)))

  /** Register `graft_dot` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = dotProductDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}

/** `SparkSessionExtensions` hook: set
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions` and plain SQL
  * sees `graft_dot`, and the planner knows graft's physical operators
  * (grouped top-k), without programmatic registration. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotProductDescriptor)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftnative.GraftStrategies)
  }
}
