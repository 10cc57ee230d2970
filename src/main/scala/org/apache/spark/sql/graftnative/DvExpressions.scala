package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector membership test: true iff (file, pos) is a recorded
  * deleted position — the read-side primitive of positional deletes
  * ([[graft.table.GraftTable]] deletePositional/updatePositional; the
  * reference's delete path, consumer/python-consumer/delta_handler.py:
  * 215-225, rewrites files copy-on-write — this is the Delta-DV upgrade).
  *
  * Why an expression and not a composed predicate: the DataFrame phrasing
  * is an OR chain of `file = f AND pos IN (…)` — per row up to one string
  * equality PER TOUCHED FILE before the matching arm is found (measured
  * 1.35 s on q88's 32-file fixture). This evaluates ONE hash lookup on the
  * file (UTF8String-keyed — no per-row String allocation) + one binary
  * search in that file's sorted positions, inside whole-stage codegen, so
  * the cost is O(log deletes-in-file) and independent of how many files
  * carry deletions. The DV map rides the plan as a reference object (the
  * broadcast-small-metadata pattern of the PQ codebooks/BPE merge table).
  *
  * Null semantics: null file or pos → null (the caller wraps in
  * `!coalesce(…, false)` so null means "not deleted").
  */
case class DvPositionDeleted(left: Expression, right: Expression,
    dv: Map[String, Array[Long]])
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_dv_deleted"

  // UTF8String-keyed so eval compares the scan's native string form
  // directly; positions pre-sorted by the loader for binarySearch.
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](dv.size * 2)
    dv.foreach { case (f, ps) => m.put(UTF8String.fromString(f), ps) }
    m
  }

  override def nullSafeEval(file: Any, pos: Any): Any = {
    val ps = lookup.get(file.asInstanceOf[UTF8String])
    ps != null && java.util.Arrays.binarySearch(ps, pos.asInstanceOf[Long]) >= 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dvLookup", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (f, p) => {
      val ps = ctx.freshName("dvPositions")
      s"""
         |long[] $ps = (long[]) $mapRef.get($f);
         |${ev.value} = $ps != null && java.util.Arrays.binarySearch($ps, $p) >= 0;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvPositionDeleted =
    copy(left = newLeft, right = newRight)
}

/** [[DvPositionDeleted]] over SERIALIZED roaring-bitmap bytes
  * ([[graft.sources.DeltaDeletionVectors.PositionSet]]): the compressed
  * form is what rides the plan and the task closure — never an
  * 8-bytes-per-deleted-row long array — so the scan-side DV filter of a
  * heavily-deleted 100 TB table costs what the bitmaps cost on the
  * driver AND the executors. Deserialization happens lazily once per
  * JVM; the membership test is one hash probe + one roaring container
  * probe, still inside whole-stage codegen. */
case class DvBitmapDeleted(left: Expression, right: Expression,
    dv: Map[String, graft.sources.DeltaDeletionVectors.PositionSet])
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_dv_bitmap_deleted"

  @transient private lazy val lookup
      : java.util.HashMap[UTF8String, graft.sources.DeltaDeletionVectors.PositionSet] = {
    val m = new java.util.HashMap[
      UTF8String, graft.sources.DeltaDeletionVectors.PositionSet](dv.size * 2)
    dv.foreach { case (f, ps) => m.put(UTF8String.fromString(f), ps) }
    m
  }

  override def nullSafeEval(file: Any, pos: Any): Any = {
    val ps = lookup.get(file.asInstanceOf[UTF8String])
    ps != null && ps.contains(pos.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dvBitmapLookup", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (f, p) => {
      val ps = ctx.freshName("dvSet")
      s"""
         |graft.sources.DeltaDeletionVectors.PositionSet $ps =
         |  (graft.sources.DeltaDeletionVectors.PositionSet) $mapRef.get($f);
         |${ev.value} = $ps != null && $ps.contains($p);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvBitmapDeleted =
    copy(left = newLeft, right = newRight)
}

/** Column↔Expression bridge. */
object DvExpressions {
  def positionDeleted(file: Column, pos: Column, dv: Map[String, Array[Long]]): Column =
    ExpressionUtils.column(DvPositionDeleted(
      ExpressionUtils.expression(file), ExpressionUtils.expression(pos), dv))

  def bitmapDeleted(file: Column, pos: Column,
      dv: Map[String, graft.sources.DeltaDeletionVectors.PositionSet]): Column =
    ExpressionUtils.column(DvBitmapDeleted(
      ExpressionUtils.expression(file), ExpressionUtils.expression(pos), dv))
}
