package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Sequential-fold dot product of two double arrays as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`: higher-order functions
  * are interpreted (per-row lambda dispatch + an allocated intermediate
  * array), which made the all-pairs cosine scan the bench bottleneck. This
  * emits a tight multiply-accumulate loop inside WholeStageCodegen — same
  * left-to-right double accumulation, so results are bit-identical to the
  * HOF phrasing and to DuckDB's `list_inner_product` (the oracle).
  *
  * Null semantics also follow the HOF phrasing: a null array, a null
  * element, or mismatched lengths yield null (`zip_with` pads the shorter
  * side with nulls, which poison the sum) — a dimension bug upstream
  * surfaces as null rather than a plausible-looking truncated score.
  *
  * Lives under `org.apache.spark.sql` because the expression framework's
  * input-type plumbing (`AbstractDataType`) and the Column↔Expression bridge
  * (`ExpressionUtils`) are `private[sql]` — the established pattern for
  * Spark-native extension libraries.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Mismatched lengths / null elements yield null even when both array
  // columns are non-nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column↔Expression bridge for graft's native expressions. */
object VectorExpressions {
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
