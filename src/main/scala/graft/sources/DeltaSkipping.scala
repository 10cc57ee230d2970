package graft.sources

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

import DeltaImport.{AddFile, Snapshot}

/** File-level data skipping over Delta `add.stats` — the bridge analogue
  * of both Delta's stats-based skipping and this engine's own dir-level
  * pruning (`GraftTable.where`), but against the TYPED per-file statistics
  * JSON the Delta format records
  * (`{"numRecords":N,"minValues":{…},"maxValues":{…},"nullCount":{…}}`):
  *
  *  - partition columns prune EXACTLY: `partitionValues` carries the
  *    file's single value, so any supported comparison evaluates
  *    decisively per file;
  *  - data columns prune by [min, max] overlap and null counts, strict
  *    comparisons widened to closed intervals (a boundary file kept,
  *    never lost);
  *  - `And`/`Or` recurse; every shape the walker doesn't recognize — and
  *    every file without usable stats — is conservatively KEPT. The exact
  *    predicate always re-applies on top, so pruning can only remove
  *    provably-dead IO, never rows.
  *
  * String bounds compare in UTF-8 binary order (`UTF8String`), the order
  * Delta writers record min/max in; a writer-truncated max (Delta caps
  * string stats and pads the tail) is still a valid upper bound, so
  * pruning through it stays conservative.
  */
object DeltaSkipping {

  /** The files of `s` that MAY hold rows matching `predicate` —
    * superset semantics. */
  def prune(spark: SparkSession, s: Snapshot, predicate: Column): Seq[AddFile] = {
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    analyzedCondition(spark, s.schema, predicate) match {
      case Some(cond) => s.files.filter(f => fileMayMatch(cond, s, f, zone))
      case None => s.files
    }
  }

  /** Resolve the Column DSL tree against the table schema so comparisons
    * become typed Catalyst nodes (same trick as the graft-native path:
    * analyze a filter over an empty relation). Analysis failure degrades
    * to an unpruned scan — the caller's real filter will report it. */
  private def analyzedCondition(spark: SparkSession, schema: StructType,
      predicate: Column): Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    try {
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
        .filter(predicate).queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            normalize(f.condition)
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fold literal-side casts (the analyzer's coercions) into typed
    * literals and strip lossless numeric up-casts off attributes, exactly
    * the normalization the dir-level pruner applies. */
  private def normalize(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Literal}
    e.transformUp {
      case c: Cast if c.child.isInstanceOf[Literal] && c.foldable =>
        try Literal(c.eval(null), c.dataType)
        catch { case scala.util.control.NonFatal(_) => c }
      case c: Cast if c.child.isInstanceOf[Attribute] &&
          c.child.dataType.isInstanceOf[NumericType] &&
          c.dataType.isInstanceOf[NumericType] &&
          Cast.canUpCast(c.child.dataType, c.dataType) => c.child
    }
  }

  // ------------------------------------------------------------ stats view

  /** Parsed skipping-relevant slice of one file's stats JSON. */
  private final case class FileStats(
      numRecords: Option[Long],
      mins: Map[String, JValue],
      maxs: Map[String, JValue],
      nulls: Map[String, Long])

  private def parseStats(raw: String): Option[FileStats] =
    try {
      val j = JsonMethods.parse(raw)
      def obj(name: String): Map[String, JValue] = (j \ name) match {
        case JObject(fs) => fs.toMap
        case _ => Map.empty
      }
      val n = (j \ "numRecords") match {
        case JInt(v) => Some(v.toLong)
        case JLong(v) => Some(v)
        case _ => None
      }
      Some(FileStats(n, obj("minValues"), obj("maxValues"),
        obj("nullCount").collect {
          case (k, JInt(v)) => k -> v.toLong
          case (k, JLong(v)) => k -> v
        }))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------- value ordering

  /** A stats JSON value and a Catalyst literal, rendered into one ordered
    * domain per column type. Long-domain for integral/date/timestamp
    * (exact), BigDecimal for fractional/decimal, UTF8String binary order
    * for strings. None = not comparable → conservative. */
  private sealed trait Ordered0 {
    def <=(o: Ordered0): Boolean
  }
  private final case class OLong(v: Long) extends Ordered0 {
    def <=(o: Ordered0): Boolean = o match {
      case OLong(w) => v <= w
      case ODec(w) => BigDecimal(v) <= w
      case _ => true
    }
  }
  private final case class ODec(v: BigDecimal) extends Ordered0 {
    def <=(o: Ordered0): Boolean = o match {
      case OLong(w) => v <= BigDecimal(w)
      case ODec(w) => v <= w
      case _ => true
    }
  }
  private final case class OStr(v: UTF8String) extends Ordered0 {
    def <=(o: Ordered0): Boolean = o match {
      case OStr(w) => v.binaryCompare(w) <= 0
      case _ => true
    }
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isFractional(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Stats JSON value → ordered domain, per the column's declared type. */
  private def statValue(v: JValue, dt: DataType): Option[Ordered0] = (v, dt) match {
    case (JInt(x), t) if isIntegral(t) => Some(OLong(x.toLong))
    case (JLong(x), t) if isIntegral(t) => Some(OLong(x))
    case (JInt(x), t) if isFractional(t) => Some(ODec(BigDecimal(x)))
    case (JLong(x), t) if isFractional(t) => Some(ODec(BigDecimal(x)))
    case (JDouble(x), t) if isFractional(t) =>
      if (x.isNaN || x.isInfinite) None else Some(ODec(BigDecimal(x)))
    case (JDecimal(x), _: NumericType) => Some(ODec(x))
    case (JString(s), StringType) => Some(OStr(UTF8String.fromString(s)))
    case (JString(s), DateType) =>
      try Some(OLong(LocalDate.parse(s).toEpochDay)) catch { case _: Exception => None }
    case (JString(s), TimestampType | TimestampNTZType) =>
      try {
        val inst =
          if (s.endsWith("Z") || s.contains("+")) Instant.parse(s)
          else LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
        Some(OLong(Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
          inst.getNano / 1000L)))
      } catch { case _: Exception => None }
    case _ => None
  }

  /** Catalyst literal (internal form) → the same ordered domain. */
  private def litValue(v: Any, dt: DataType): Option[Ordered0] = (v, dt) match {
    case (null, _) => None
    case (x: java.lang.Number, t) if isIntegral(t) => Some(OLong(x.longValue))
    case (x: Int, DateType) => Some(OLong(x.toLong))
    case (x: java.lang.Number, TimestampType | TimestampNTZType) =>
      Some(OLong(x.longValue)) // epoch micros internally
    case (x: java.lang.Double, DoubleType) =>
      if (x.isNaN || x.isInfinite) None else Some(ODec(BigDecimal(x)))
    case (x: java.lang.Float, FloatType) =>
      if (x.isNaN || x.isInfinite) None else Some(ODec(BigDecimal(x.toDouble)))
    case (x: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
      Some(ODec(x.toBigDecimal))
    case (x: UTF8String, StringType) => Some(OStr(x))
    case _ => None
  }

  /** Partition value string → the ordered domain (Delta stores partition
    * values as their string rendering). */
  private def partValue(s: String, dt: DataType,
      zone: java.time.ZoneId): Option[Ordered0] = dt match {
    case t if isIntegral(t) => s.toLongOption.map(OLong)
    case t if isFractional(t) =>
      try Some(ODec(BigDecimal(s))) catch { case _: Exception => None }
    case StringType => Some(OStr(UTF8String.fromString(s)))
    case DateType =>
      try Some(OLong(LocalDate.parse(s).toEpochDay)) catch { case _: Exception => None }
    case TimestampType =>
      // Delta renders TimestampType partition values as zone-less wall
      // clock in the writing session's zone; reading in the CURRENT
      // session's zone is Delta's own convention. TimestampNTZ is
      // zone-free by definition.
      parseWallClock(s, zone)
    case TimestampNTZType => parseWallClock(s, ZoneOffset.UTC)
    case _ => None
  }

  private def parseWallClock(s: String, zone: java.time.ZoneId): Option[Ordered0] =
    try {
      val inst = LocalDateTime.parse(s.replace(' ', 'T')).atZone(zone).toInstant
      Some(OLong(Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
        inst.getNano / 1000L)))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------ the walker

  private def fileMayMatch(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      s: Snapshot, f: AddFile, zone: java.time.ZoneId): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._

    lazy val stats = f.stats.flatMap(parseStats)
    def fieldType(n: String): Option[DataType] =
      s.schema.fields.find(_.name == n).map(_.dataType)
    // Column-mapped tables key stats and partitionValues by PHYSICAL
    // names (the Delta contract); predicates speak logical names — the
    // lookup resolves through the schema's physicalName metadata, else a
    // renamed column's files would all conservatively survive.
    def physName(n: String): String =
      s.schema.fields.find(_.name == n)
        .filter(_.metadata.contains("delta.columnMapping.physicalName"))
        .map(_.metadata.getString("delta.columnMapping.physicalName"))
        .getOrElse(n)
    def attrName(a: Expression): Option[String] = a match {
      case att: Attribute => Some(att.name)
      case _ => None // nested stats objects: out of scope, keep the file
    }
    def isPartition(n: String): Boolean = s.partitionColumns.contains(n)

    /** The file's raw partition value: None = no entry recorded
      * (unknown), Some(None) = the Hive default (null) partition,
      * Some(Some(raw)) = a concrete value. The null/unparseable
      * distinction matters: a TYPE partValue can't order (timestamp,
      * boolean, …) must read as unknown, never as null — conflating them
      * would make IsNotNull prune every file of such a table. */
    def partRaw(n: String): Option[Option[String]] =
      f.partitionValues.get(physName(n)).map {
        case null | "__HIVE_DEFAULT_PARTITION__" => None
        case v => Some(v)
      }

    /** Column bounds: partition value collapses to a point; data columns
      * read minValues/maxValues. None = unknown, keep. */
    def bounds(n: String): Option[(Ordered0, Ordered0)] =
      if (isPartition(n))
        for {
          raw <- partRaw(n).flatten
          dt <- fieldType(n)
          v <- partValue(raw, dt, zone)
        } yield (v, v)
      else for {
        st <- stats
        dt <- fieldType(n)
        lo <- st.mins.get(physName(n)).flatMap(statValue(_, dt))
        hi <- st.maxs.get(physName(n)).flatMap(statValue(_, dt))
      } yield (lo, hi)

    /** Could a value of `n` land in [qlo, qhi] (open ends = None)?
      * An all-null column has no values: comparisons never pass. */
    def overlaps(n: String, qlo: Option[Ordered0], qhi: Option[Ordered0]): Boolean =
      !provablyAllNull(n) && bounds(n).forall { case (mn, mx) =>
        qlo.forall(_ <= mx) && qhi.forall(mn <= _)
      }

    def provablyAllNull(n: String): Boolean =
      if (isPartition(n)) partRaw(n).exists(_.isEmpty)
      else (for {
        st <- stats; total <- st.numRecords; nc <- st.nulls.get(physName(n))
      } yield total > 0 && nc == total).getOrElse(false)

    def provablyNoNull(n: String): Boolean =
      if (isPartition(n)) partRaw(n).exists(_.nonEmpty)
      else stats.exists(_.nulls.get(physName(n)).contains(0L))

    def cmp(a: Expression, v: Any, lo: Boolean): Boolean =
      attrName(a) match {
        case Some(n) =>
          val p = fieldType(n).flatMap(litValue(v, _))
          if (p.isEmpty) true
          else if (lo) overlaps(n, p, None) else overlaps(n, None, p)
        case None => true
      }
    def point(a: Expression, v: Any): Boolean =
      attrName(a) match {
        case Some(n) =>
          val p = fieldType(n).flatMap(litValue(v, _))
          p.forall(x => overlaps(n, Some(x), Some(x)))
        case None => true
      }

    def may(x: Expression): Boolean = x match {
      case And(l, r) => may(l) && may(r)
      case Or(l, r) => may(l) || may(r)
      case EqualTo(a, Literal(v, _)) => point(a, v)
      case EqualTo(Literal(v, _), a) => point(a, v)
      case EqualNullSafe(a, Literal(v, _)) if v != null => point(a, v)
      case EqualNullSafe(Literal(v, _), a) if v != null => point(a, v)
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.isEmpty || vs.exists { case Literal(v, _) => point(a, v) }
      case InSet(a, hs) if a.resolved =>
        hs.size > 10000 || hs.isEmpty || hs.exists(v => point(a, v))
      case GreaterThan(a, Literal(v, _)) => cmp(a, v, lo = true)
      case GreaterThanOrEqual(a, Literal(v, _)) => cmp(a, v, lo = true)
      case LessThan(a, Literal(v, _)) => cmp(a, v, lo = false)
      case LessThanOrEqual(a, Literal(v, _)) => cmp(a, v, lo = false)
      case GreaterThan(Literal(v, _), a) => cmp(a, v, lo = false)
      case GreaterThanOrEqual(Literal(v, _), a) => cmp(a, v, lo = false)
      case LessThan(Literal(v, _), a) => cmp(a, v, lo = true)
      case LessThanOrEqual(Literal(v, _), a) => cmp(a, v, lo = true)
      case StartsWith(a, Literal(p: UTF8String, _)) =>
        attrName(a).filter(n => fieldType(n).contains(StringType)).forall { n =>
          // prefix p bounds the matches in [p, p + maxChar...): compare the
          // truncated upper bound conservatively via the raw prefix — a
          // string starting with p is >= p, and its first
          // p.numBytes bytes are exactly p, so max >= p and
          // min <= p+0xFF... ; we check only the cheap lower side plus
          // the upper side against p with its last byte bumped.
          val lo = OStr(p)
          val bumped = {
            val b = p.getBytes.clone()
            var i = b.length - 1
            while (i >= 0 && b(i) == -1) { b(i) = 0; i -= 1 }
            if (i < 0) None
            else { b(i) = (b(i) + 1).toByte; Some(OStr(UTF8String.fromBytes(b.take(i + 1)))) }
          }
          overlaps(n, Some(lo), bumped)
        }
      case IsNull(a) =>
        attrName(a).forall(n => !provablyNoNull(n))
      case IsNotNull(a) =>
        attrName(a).forall(n => !provablyAllNull(n))
      case _ => true
    }
    may(e)
  }
}
