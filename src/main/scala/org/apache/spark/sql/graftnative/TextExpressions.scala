package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of whitespace-tokenized text, single pass.
  *
  * The `functions._` phrasing — `transform(sequence(1, L-n+1),
  * i => concat_ws(" ", slice(tokens, i, n)))` — is O(tokens²) per document
  * (each slice copies) and every lambda hop is interpreted; it was the
  * dominant cost of the dedup pipelines (shingling 5k docs took ~10 s).
  * This expression tokenizes once and emits all shingles in one linear
  * sweep. Interpreted-eval via CodegenFallback: the per-row work is real
  * string assembly, not expression dispatch, so codegen would add little.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object TextExpressions {
  def wordShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))
}
