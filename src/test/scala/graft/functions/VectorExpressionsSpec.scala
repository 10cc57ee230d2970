package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.1, 0.2), Seq(0.3, 0.4))).toDF("a", "b")

  test("DotProduct equals the interpreted HOF phrasing bit-for-bit") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(
      GraftFunctions.dotProduct(col("a"), col("b")).as("fast"),
      hof.as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows(0).getDouble(0) === 32.0)
  }

  test("null array yields null") {
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = withNull.select(GraftFunctions.dotProduct(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("mismatched lengths and null elements yield null, matching zip_with") {
    val mixed = Seq(
      (Seq(Option(1.0), Option(2.0)), Seq(Option(3.0))),           // length mismatch
      (Seq(Option(1.0), Option.empty[Double]), Seq(Option(3.0), Option(4.0))), // null element
      (Seq(Option(1.0), Option(2.0)), Seq(Option(3.0), Option(4.0)))           // clean
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = mixed.select(
      GraftFunctions.dotProduct(col("a"), col("b")).as("fast"), hof.as("slow")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) === 11.0 && rows(2).getDouble(1) === 11.0)
  }

  test("graft_dot is SQL-callable after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1d, 2d), array(3d, 4d)) AS d").collect()
    assert(r(0).getDouble(0) === 11.0)
  }

  test("graft_shingles and graft_rolling_hash are SQL-callable") {
    GraftFunctions.register(spark)
    val sh = spark.sql("SELECT graft_shingles('a b c d', 2) AS s").collect()
    assert(sh(0).getSeq[String](0) === Seq("a b", "b c", "c d"))
    val rh = spark.sql("SELECT graft_rolling_hash('ab') AS h").collect()
    assert(rh(0).getLong(0) === ('a'.toLong * 31 + 'b'.toLong) % 1000000007L)
  }

  test("native rolling hash equals the interpreted fold") {
    val texts = Seq("", "x", "hello world", "a" * 500).toDF("t")
    val interpreted = when(length(col("t")) > 0,
      aggregate(
        transform(sequence(lit(1), length(col("t"))), i => ascii(col("t").substr(i, lit(1)))),
        lit(0L),
        (acc, x) => pmod(acc * 31 + x, lit(1000000007L))))
      .otherwise(0L)
    val rows = texts.select(
      graft.text.TextFunctions.rollingHash(col("t")).as("fast"),
      interpreted.as("slow")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("the expression participates in whole-stage codegen") {
    // LocalTableScan never enters a codegen stage; use a range-backed plan.
    val plan = spark.range(8)
      .select(GraftFunctions.dotProduct(
        array(col("id").cast("double"), lit(1.0)),
        array(lit(2.0), lit(3.0))).as("d"))
      .queryExecution.executedPlan
    // `*(n)` notation in toString marks a WholeStageCodegen stage; assert on
    // the tree to be robust.
    assert(plan.exists(_.getClass.getSimpleName == "WholeStageCodegenExec"),
      s"no codegen stage in:\n$plan")
  }

  test("outerProductFixed equals the interpreted HOF phrasing bit-for-bit") {
    import org.apache.spark.sql.graftnative.VectorExpressions.outerProductFixed
    val vecs = Seq(
      Seq(1.0, -2.5, 0.0),
      Seq(0.123456789, -0.987654321),
      Seq(3.7)).toDF("v")
    val hof = flatten(transform(col("v"), x =>
      transform(col("v"), y => floor(x * y * lit(1e12)).cast("long"))))
    val rows = vecs.select(
      outerProductFixed(col("v"), 1e12).as("fast"), hof.as("slow")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // spot-check layout: row-major, d*d entries
    assert(rows(0).getSeq[Long](0).length === 9)
    assert(rows(0).getSeq[Long](0)(1) ===
      math.floor(1.0 * -2.5 * 1e12).toLong) // (i=0, j=1)
    assert(rows(0).getSeq[Long](0)(3) ===
      math.floor(-2.5 * 1.0 * 1e12).toLong) // (i=1, j=0)
  }

  test("outerProductFixed: null array and null element yield null") {
    import org.apache.spark.sql.graftnative.VectorExpressions.outerProductFixed
    val df = Seq(
      Option.empty[Seq[Option[Double]]],
      Some(Seq(Some(1.0), None)),
      Some(Seq(Some(2.0)))).toDF("v")
    val r = df.select(outerProductFixed(col("v").cast("array<double>"), 1e12))
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).isNullAt(0))
    assert(r(2).getSeq[Long](0) === Seq(math.floor(4.0 * 1e12).toLong))
  }

  test("sumLongArrayExact equals the posexplode + per-position decimal sum") {
    import org.apache.spark.sql.graftnative.VectorExpressions.sumLongArrayExact
    val df = Seq(
      (1, Seq(1L, -2L, 3L)),
      (1, Seq(10L, 20L, 30L)),
      (2, Seq(-7L, Long.MaxValue, 0L)),
      (2, Seq(-7L, Long.MaxValue, -1L))).toDF("g", "arr")
      .repartition(4) // force partial buffers + serialize/merge across the exchange
    val fast = df.groupBy("g").agg(sumLongArrayExact(col("arr")).as("s"))
      .select(col("g"), posexplode(col("s")).as(Seq("pos", "v")))
    val slow = df.select(col("g"), posexplode(col("arr")).as(Seq("pos", "f")))
      .groupBy("g", "pos")
      .agg(sum(col("f").cast("decimal(38,0)")).as("v"))
    assert(fast.schema("v").dataType.typeName === "decimal(38,0)")
    // Long.MaxValue + Long.MaxValue overflows a signed 64-bit long — the
    // 128-bit accumulator must carry it exactly, as the decimal sum does.
    val f = fast.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val s = slow.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    assert(f === s)
    assert(f((2, 1)) === new java.math.BigDecimal("18446744073709551614"))
  }

  test("sumLongArrayExact: null arrays, null elements, ragged lengths, empty group") {
    import org.apache.spark.sql.graftnative.VectorExpressions.sumLongArrayExact
    val df = Seq(
      (1, Some(Seq(Some(1L), None, Some(3L)))),
      (1, None),                       // whole array null: contributes nothing
      (1, Some(Seq(Some(10L)))),       // ragged: only position 0
      (2, Option.empty[Seq[Option[Long]]])).toDF("g", "arr")
    val rows = df.groupBy("g")
      .agg(sumLongArrayExact(col("arr").cast("array<long>")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[java.math.BigDecimal](1)).toMap
    assert(rows(1).map(_.longValueExact()) === Seq(11L, 0L, 3L))
    // all-null group evaluates to an EMPTY array (explodes to no rows), not null
    assert(rows(2) === Seq.empty)
  }

  test("outerProductFixed participates in whole-stage codegen and matches eval") {
    import org.apache.spark.sql.graftnative.VectorExpressions.outerProductFixed
    // range-backed plan enters codegen; compare against the interpreted
    // nullSafeEval path via a LocalTableScan of the same values
    val gen = spark.range(4)
      .select(outerProductFixed(
        array(col("id").cast("double") / 7.0, lit(-0.3)), 1e12).as("o"))
    assert(gen.queryExecution.executedPlan.exists(
      _.getClass.getSimpleName == "WholeStageCodegenExec"))
    val interp = (0 until 4).map { id =>
      val v = Array(id.toDouble / 7.0, -0.3)
      (for (i <- 0 until 2; j <- 0 until 2)
        yield math.floor(v(i) * v(j) * 1e12).toLong).toSeq
    }
    assert(gen.collect().map(_.getSeq[Long](0)).toSeq === interp)
  }
}
