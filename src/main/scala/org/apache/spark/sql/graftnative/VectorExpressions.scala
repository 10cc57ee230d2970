package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, Decimal, DecimalType, DoubleType, IntegerType, LongType}

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

/** All banded sign-LSH bucket codes of a vector in ONE codegen'd pass: the
  * constant plane matrix (`bands`×`planesPerBand` rows of `dim` doubles,
  * flattened band-major) lives in a plan reference object, and the generated
  * code is a tight triple loop emitting `bands` bucket longs.
  *
  * Why not `bands × planesPerBand` separate `DotProduct(typedLit(plane))`
  * nodes: at 128 planes that expression forest blew whole-stage codegen past
  * JIT-able method sizes — the banded-LSH bucket computation alone cost ~9 s
  * on 2 000 vectors, dominating the near-dup pipeline end to end. This
  * expression computes identical bucket values (same sequential
  * multiply-accumulate per plane, same `>= 0` sign convention) in one node.
  *
  * Null semantics follow [[DotProduct]]: null array, null element, or a
  * vector whose length differs from `dim` yields null.
  */
case class SignProjectionBuckets(
    child: Expression,
    planes: IndexedSeq[Double],
    bands: Int,
    planesPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private val dim = planes.length / (bands * planesPerBand)
  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var d = 0
    while (d < dim) { if (v.isNullAt(d)) return null; d += 1 }
    val out = new Array[Long](bands)
    var idx = 0
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var i = 0
      while (i < planesPerBand) {
        var acc = 0.0
        val off = idx * dim
        var j = 0
        while (j < dim) { acc += v.getDouble(j) * planesArr(off + j); j += 1 }
        if (acc >= 0.0) bucket |= (1L << i)
        idx += 1
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planesArr, "double[]")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      val bad = ctx.freshName("bad")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($v.isNullAt($d)) { $bad = true; break; }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long[] $out = new long[$bands];
         |    int $idx = 0;
         |    for (int $b = 0; $b < $bands; $b++) {
         |      long $bucket = 0L;
         |      for (int $i = 0; $i < $planesPerBand; $i++) {
         |        double $acc = 0.0;
         |        int $off = $idx * $dim;
         |        for (int $j = 0; $j < $dim; $j++) {
         |          $acc += $v.getDouble($j) * $planesRef[$off + $j];
         |        }
         |        if ($acc >= 0.0) $bucket |= (1L << $i);
         |        $idx++;
         |      }
         |      $out[$b] = $bucket;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignProjectionBuckets =
    copy(child = newChild)
}

/** Product-quantization encode: split the vector into `m` sub-vectors of
  * `subDim` and emit, per subspace, the id of the nearest (L2) codebook
  * centroid — `m` small ints replace `m·subDim` doubles, the ~16×
  * scan-bandwidth cut that makes billion-vector ANN shortlists affordable.
  * The codebook matrix (m×k rows of subDim doubles, flattened
  * subspace-major) rides the plan as a reference object. One codegen'd
  * triple loop, like [[SignProjectionBuckets]].
  *
  * Null array / null element / wrong length → null. */
case class PqEncode(
    child: Expression,
    codebooks: IndexedSeq[Double],
    m: Int,
    k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private val subDim = codebooks.length / (m * k)
  private val dim = m * subDim
  @transient private lazy val cb: Array[Double] = codebooks.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var d = 0
    while (d < dim) { if (v.isNullAt(d)) return null; d += 1 }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < k) {
        var dist = 0.0
        val off = (s * k + c) * subDim
        var j = 0
        while (j < subDim) {
          val diff = v.getDouble(s * subDim + j) - cb(off + j)
          dist += diff * diff
          j += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("codebooks", cb, "double[]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val off = ctx.freshName("off")
      val diff = ctx.freshName("diff")
      val bad = ctx.freshName("bad")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($v.isNullAt($d)) { $bad = true; break; }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    int[] $out = new int[$m];
         |    for (int $s = 0; $s < $m; $s++) {
         |      int $best = 0;
         |      double $bestDist = Double.MAX_VALUE;
         |      for (int $c = 0; $c < $k; $c++) {
         |        double $dist = 0.0;
         |        int $off = ($s * $k + $c) * $subDim;
         |        for (int $j = 0; $j < $subDim; $j++) {
         |          double $diff = $v.getDouble($s * $subDim + $j) - $cbRef[$off + $j];
         |          $dist += $diff * $diff;
         |        }
         |        if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |      }
         |      $out[$s] = $best;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance score: the query's per-(subspace, centroid) partial
  * inner products live in a lookup table (m×k doubles, flattened
  * subspace-major, a reference object); the score of a coded vector is one
  * table lookup per subspace — `Σ lut[s·k + code(s)]` ≈ `dot(query, x)`.
  * Null codes / wrong length → null. */
case class PqAdcScore(child: Expression, lut: IndexedSeq[Double], k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private val m = lut.length / k
  @transient private lazy val lutArr: Array[Double] = lut.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      acc += lutArr(s * k + codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val lutRef = ctx.addReferenceObj("lut", lutArr, "double[]")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |if ($codes.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  double $acc = 0.0;
         |  for (int $s = 0; $s < $m; $s++) {
         |    if ($codes.isNullAt($s)) { $bad = true; break; }
         |    $acc += $lutRef[$s * $k + $codes.getInt($s)];
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

/** Flattened fixed-point outer product `floor(x_i·x_j·scale)` of a vector
  * with itself — the per-row contribution to a corpus-wide second-moment
  * (gram / covariance) matrix, row-major (`d·d` longs for a `d`-vector).
  *
  * Why fixed point: the downstream cross-moment sums must be
  * order-independent (Spark partial-aggregates in partition order, DuckDB
  * sums in file order), so the per-row contribution is floored to an
  * integer once — one IEEE multiply + floor, bit-identical across engines —
  * and everything after is exact integer arithmetic (same device as the
  * per-dimension moments in q85). Why a native expression: the HOF phrasing
  * (`flatten(transform(transform(...)))`) allocates two nested object
  * arrays per row and runs interpreted; this emits one tight codegen'd
  * double loop into a primitive long array.
  *
  * Null array / null element → null. */
case class OuterProductFixed(child: Expression, scale: Double)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_outer_product_fixed"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    var z = 0
    while (z < d) { if (v.isNullAt(z)) return null; z += 1 }
    val out = new Array[Long](d * d)
    var i = 0
    while (i < d) {
      val xi = v.getDouble(i)
      var j = 0
      while (j < d) {
        out(i * d + j) = math.floor(xi * v.getDouble(j) * scale).toLong
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val d = ctx.freshName("d")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      s"""
         |int $d = $v.numElements();
         |boolean $bad = false;
         |for (int $z = 0; $z < $d; $z++) {
         |  if ($v.isNullAt($z)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$d * $d];
         |  for (int $i = 0; $i < $d; $i++) {
         |    double $xi = $v.getDouble($i);
         |    for (int $j = 0; $j < $d; $j++) {
         |      $out[$i * $d + $j] = (long) Math.floor($xi * $v.getDouble($j) * $scale);
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OuterProductFixed =
    copy(child = newChild)
}

/** Element-wise EXACT sum of `array<long>` rows — the aggregate half of the
  * q149 covariance kernel. [[OuterProductFixed]] already emits each row's d²
  * fixed-point cross products as one primitive array; summing them used to
  * go through `posexplode` + a d²-group hash aggregate, which materializes
  * and hash-probes corpus×d² ROWS just to add longs that are already laid
  * out positionally. This aggregate adds each input array into a single
  * per-partition accumulator in one tight loop — the shuffle still carries
  * at most partitions×d² values (the same one-pass 100 TB shape), but the
  * per-row cost drops from d² row materializations + hash probes to d²
  * integer adds.
  *
  * Exactness: each element accumulates into a SIGNED 128-BIT integer (two
  * longs, standard carry propagation), so the result equals
  * `sum(cast(element as decimal(38,0)))` — order-independent, overflow-free
  * until ~1.7e38 (beyond decimal(38,0) itself) — and the evaluated value is
  * `array<decimal(38,0)>`, the exact type the posexplode phrasing summed
  * into. No floating point anywhere, so the oracle hash argument is
  * unchanged.
  *
  * Semantics (matches the exploded phrasing per position):
  *  - a NULL input array contributes nothing (its exploded rows never
  *    existed);
  *  - a null ELEMENT contributes nothing at its position (sum skips nulls);
  *  - ragged lengths: position p sums over rows long enough to have p; the
  *    result length is the max input length (q149 groups by `size(v)`, so
  *    within a group lengths are uniform);
  *  - an empty/all-null group evaluates to an EMPTY array (explodes to no
  *    rows), never null.
  *
  * Buffer layout: interleaved [hi0, lo0, hi1, lo1, …] in one primitive
  * long array; serialization is the raw longs (partial aggregation across
  * the exchange works, ObjectHashAggregate plans it map-side). */
case class SumLongArrayExact(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sum_long_array_exact"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  // Carry-out of the unsigned add a + b (0 or 1), branch-free.
  @inline private def carry(a: Long, b: Long, s: Long): Long =
    ((a & b) | ((a | b) & ~s)) >>> 63

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.length >= 2 * n) buffer
      else java.util.Arrays.copyOf(buffer, 2 * n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        val lo = buf(2 * i + 1)
        val s = lo + x
        // adding the sign-extended 64-bit x to the 128-bit (hi, lo)
        buf(2 * i) += (x >> 63) + carry(lo, x, s)
        buf(2 * i + 1) = s
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val buf =
      if (b1.length >= b2.length) b1
      else java.util.Arrays.copyOf(b1, b2.length)
    var i = 0
    while (i + 1 < b2.length) {
      val lo1 = buf(i + 1)
      val lo2 = b2(i + 1)
      val s = lo1 + lo2
      buf(i) += b2(i) + carry(lo1, lo2, s)
      buf(i + 1) = s
      i += 2
    }
    buf
  }

  override def eval(buffer: Array[Long]): Any = {
    val n = buffer.length / 2
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val hi = buffer(2 * i)
      val lo = buffer(2 * i + 1)
      out(i) =
        if (hi == (lo >> 63)) Decimal(lo) // fits in a signed 64-bit long
        else {
          val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
            .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
          Decimal(new java.math.BigDecimal(bi), 38, 0)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SumLongArrayExact =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumLongArrayExact =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SumLongArrayExact =
    copy(child = newChild)
}

/** Column↔Expression bridge for graft's native expressions. */
object VectorExpressions {
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def signProjectionBuckets(v: Column, planes: IndexedSeq[Double],
      bands: Int, planesPerBand: Int): Column =
    ExpressionUtils.column(
      SignProjectionBuckets(ExpressionUtils.expression(v), planes, bands, planesPerBand))

  def pqEncode(v: Column, codebooks: IndexedSeq[Double], m: Int, k: Int): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(v), codebooks, m, k))

  def pqAdcScore(codes: Column, lut: IndexedSeq[Double], k: Int): Column =
    ExpressionUtils.column(PqAdcScore(ExpressionUtils.expression(codes), lut, k))

  def outerProductFixed(v: Column, scale: Double): Column =
    ExpressionUtils.column(OuterProductFixed(ExpressionUtils.expression(v), scale))

  def sumLongArrayExact(c: Column): Column =
    ExpressionUtils.column(
      SumLongArrayExact(ExpressionUtils.expression(c)).toAggregateExpression())
}
