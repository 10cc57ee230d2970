package graft.props

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.DeltaImport

/** Seeded randomized invariant for the column-mapping write machinery:
  * for ARBITRARY nested schemas (structs in structs, arrays of structs,
  * maps with struct values, partial physical-name annotation — exactly
  * what delta-spark's `name` mode emits),
  * `logicalRestore(physicalRender(df)) == df` field-for-field, and the
  * physically-rendered schema equals [[DeltaImport.toPhysicalSchema]]
  * (what the staged parquet will declare and what the stats harvest
  * reads). The renders are positional struct casts, so the invariant is
  * also a guard against any future reordering bug: a positionally-wrong
  * cast would scramble values, not just names. */
class PhysicalRenderInvariantSpec extends SparkSpec {

  private def meta(phys: Option[String], id: Int): Metadata = phys match {
    case Some(p) => new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", p)
      .putLong("delta.columnMapping.id", id.toLong).build()
    case None => Metadata.empty
  }

  /** Random schema: leaves are long/string/double; containers are
    * struct/array-of-struct/map-to-struct; ~2/3 of fields carry a
    * physical name (delta annotates all, but the machinery must also
    * survive identity fields). */
  private def randomSchema(rnd: Random, depth: Int, nextId: () => Int): StructType = {
    val n = 2 + rnd.nextInt(3)
    StructType((0 until n).map { i =>
      val id = nextId()
      val dt: DataType =
        if (depth == 0) Seq(LongType, StringType, DoubleType)(rnd.nextInt(3))
        else rnd.nextInt(4) match {
          case 0 => randomSchema(rnd, depth - 1, nextId)
          case 1 => ArrayType(randomSchema(rnd, depth - 1, nextId))
          case 2 => MapType(StringType, randomSchema(rnd, depth - 1, nextId))
          case _ => Seq(LongType, StringType, DoubleType)(rnd.nextInt(3))
        }
      val phys = if (rnd.nextInt(3) < 2) Some(s"col-${id}-${rnd.nextInt(100)}")
        else None
      StructField(s"f$id", dt, nullable = true, meta(phys, id))
    })
  }

  private def randomValue(rnd: Random, dt: DataType): Any = dt match {
    case LongType => rnd.nextLong() % 1000
    case StringType => s"s${rnd.nextInt(100)}"
    case DoubleType => rnd.nextInt(1000) / 8.0
    case s: StructType => org.apache.spark.sql.Row(
      s.fields.map(f => randomValue(rnd, f.dataType)).toIndexedSeq: _*)
    case a: ArrayType =>
      Seq.fill(rnd.nextInt(3))(randomValue(rnd, a.elementType))
    case m: MapType =>
      (0 until rnd.nextInt(3)).map(i =>
        s"k$i" -> randomValue(rnd, m.valueType)).toMap
    case other => fail(s"unexpected type $other")
  }

  test("logicalRestore ∘ physicalRender is identity; schema matches toPhysicalSchema") {
    val rnd = new Random(41)
    for (trial <- 1 to 5) {
      val schema = randomSchema(rnd, depth = 2, {
        var c = 0; () => { c += 1; c }
      })
      val rows = (0 until 8).map(_ => org.apache.spark.sql.Row(
        schema.fields.map(f => randomValue(rnd, f.dataType)).toIndexedSeq: _*))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)

      val phys = DeltaImport.physicalRender(df, schema)
      // the rendered frame declares EXACTLY the recursive physical schema
      // (modulo nullability, which cast may widen) — what staged parquet
      // and the stats harvest must agree on
      def shape(dt: DataType): DataType = dt match {
        case s: StructType => StructType(s.fields.map(f =>
          StructField(f.name, shape(f.dataType))))
        case a: ArrayType => ArrayType(shape(a.elementType))
        case m: MapType => MapType(shape(m.keyType), shape(m.valueType))
        case o => o
      }
      assert(shape(phys.schema) ===
        shape(DeltaImport.toPhysicalSchema(schema)), s"trial $trial")

      val back = DeltaImport.logicalRestore(phys, schema)
      assert(shape(back.schema) === shape(StructType(schema.fields.map(f =>
        StructField(f.name, f.dataType)))), s"trial $trial restore schema")
      // value-level identity — a positionally-wrong cast would scramble
      val orig = df.collect().map(_.toString).sorted
      val round = back.collect().map(_.toString).sorted
      assert(round === orig, s"trial $trial values")
    }
  }
}
