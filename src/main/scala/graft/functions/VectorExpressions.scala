package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftnative.{DotProduct, RollingHash, TextExpressions, VectorExpressions, WordShingles}

/** Public facade over graft's native Catalyst expressions
  * ([[org.apache.spark.sql.graftnative]]). */
object GraftFunctions {

  /** Codegen'd `Σ a(i)*b(i)` over `array<double>` columns — bit-identical
    * to the interpreted `aggregate(zip_with(…))` phrasing. */
  def dotProduct(a: Column, b: Column): Column =
    VectorExpressions.dotProduct(a, b)

  /** Single-pass word n-gram shingles. */
  def wordShingles(text: Column, n: Int): Column =
    TextExpressions.wordShingles(text, n)

  /** Codegen'd Rabin-Karp rolling hash (`(acc·31 + char) mod 1e9+7`). */
  def rollingHash(text: Column): Column =
    TextExpressions.rollingHash(text)

  private type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private[functions] val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        WordShingles(children.head, litInt(children(1), "graft_shingles"))),
    (FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))

  /** Register the SQL-expressible native functions on an existing session.
    * (Expressions that carry trained model state — LSH planes, PQ
    * codebooks, BPE merges — are DataFrame-API-only by design: their
    * reference objects don't fit SQL literals.) */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `SparkSessionExtensions` hook: set
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions` and plain SQL
  * sees the graft functions, and the planner knows graft's physical
  * operators (grouped top-k), without programmatic registration. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    // Delta's SQL time-travel clause (VERSION AS OF / TIMESTAMP AS OF) for
    // graft relations — a pre-analysis rewrite, because the stock analyzer
    // resolves RelationTimeTravel only for DSv2 catalog tables.
    ext.injectParser((session, parser) =>
      new org.apache.spark.sql.graftnative.GraftSqlParser(session, parser))
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftnative.GraftStrategies)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftnative.TopKRewrite)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftnative.GraftScanSkipping)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftnative.GraftMetadataOnlyAggregate)
  }
}
