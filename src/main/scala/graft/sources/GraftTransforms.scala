package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Monotone partition transforms (the Iceberg `days`/`months`/`years`/
  * `truncate` family): a level whose dir value is a MONOTONE function
  * of the source column — the canonical time-series warehouse layout
  * (`PARTITIONED BY (days(ts))`) without one dir per distinct value.
  * Monotonicity is the property hashing lacks: RANGE predicates on the
  * source prune partitions (`ts >= X` skips every earlier day), and
  * `ORDER BY ts DESC LIMIT n` can keep just the newest days (the TopN
  * truncation path). Timestamps bucket by UTC day, matching the UTC
  * session the engine pins everywhere else.
  *
  * Encoding mirrors [[GraftBuckets]]: the synthetic level name is
  * `<col>_days` / `<col>_months` / `<col>_years` / `<col>_trunc<w>`,
  * opaque to every spec-agnostic component; dir values are
  * human-readable and canonical ("2020-01-02", "2020-01", "0190",
  * truncated number, string prefix). */
private[sources] object GraftTransforms {
  sealed trait Kind
  case object Hours extends Kind
  case object Days extends Kind
  case object Months extends Kind
  case object Years extends Kind
  final case class Trunc(width: Int) extends Kind

  final case class Level(src: String, kind: Kind)

  private val TruncPat = """^(.+)_trunc([0-9]+)$""".r
  def level(name: String): Option[Level] =
    if (name.endsWith("_hours")) Some(Level(name.dropRight(6), Hours))
    else if (name.endsWith("_days")) Some(Level(name.dropRight(5), Days))
    else if (name.endsWith("_months")) Some(Level(name.dropRight(7), Months))
    else if (name.endsWith("_years")) Some(Level(name.dropRight(6), Years))
    else name match {
      case TruncPat(src, w) => Some(Level(src, Trunc(w.toInt)))
      case _ => None
    }

  def levelName(src: String, kind: Kind): String = kind match {
    case Hours => s"${src}_hours"
    case Days => s"${src}_days"
    case Months => s"${src}_months"
    case Years => s"${src}_years"
    case Trunc(w) => s"${src}_trunc$w"
  }

  def kindName(kind: Kind): String = kind match {
    case Hours => "hours"
    case Days => "days"
    case Months => "months"
    case Years => "years"
    case Trunc(_) => "truncate"
  }

  def supportedType(kind: Kind, dt: DataType): Boolean = kind match {
    case Hours => dt match { // a DATE has no hour
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    case Days | Months | Years => dt match {
      case DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    case Trunc(_) => dt match {
      case LongType | IntegerType | ShortType | ByteType | StringType => true
      case _ => false
    }
  }

  private def utcDate(value: Any, dt: DataType): LocalDate = dt match {
    case DateType => LocalDate.ofEpochDay(
      value.asInstanceOf[Number].longValue())
    case TimestampType | TimestampNTZType =>
      // micros since epoch, UTC day boundary (NTZ carries no zone and
      // is treated as UTC, same as the rest of the engine)
      LocalDate.ofEpochDay(Math.floorDiv(
        value.asInstanceOf[Number].longValue(), 86400000000L))
    case other => throw new IllegalArgumentException(other.toString)
  }

  /** Canonical DIR VALUE of an INTERNAL (Catalyst) source value — the
    * one definition the writer, the pruner, and the V2 functions share.
    * Requires non-null (the identity-level contract). */
  def dirValue(value: Any, dt: DataType, kind: Kind): String = kind match {
    case Hours => // yyyy-MM-dd-HH, fixed width (lexicographic == time)
      val eh = Math.floorDiv(
        value.asInstanceOf[Number].longValue(), 3600000000L)
      val t = java.time.LocalDateTime.ofEpochSecond(
        eh * 3600L, 0, java.time.ZoneOffset.UTC)
      f"${t.getYear}%04d-${t.getMonthValue}%02d-" +
        f"${t.getDayOfMonth}%02d-${t.getHour}%02d"
    case Days => utcDate(value, dt).toString // ISO yyyy-MM-dd
    case Months =>
      val d = utcDate(value, dt)
      f"${d.getYear}%04d-${d.getMonthValue}%02d"
    case Years => f"${utcDate(value, dt).getYear}%04d"
    case Trunc(w) => dt match {
      case StringType => // prefix of w characters
        value.asInstanceOf[UTF8String].substring(0, w).toString
      case _ =>
        val v = value.asInstanceOf[Number].longValue()
        (v - Math.floorMod(v, w.toLong)).toString
    }
  }

  def dirValueExternal(value: Any, dt: DataType, kind: Kind): String =
    dirValue(CatalystTypeConverters.createToCatalystConverter(dt)(value),
      dt, kind)

  /** Order of two dir values in the TRANSFORM'S OUTPUT SPACE (monotone
    * in the source order by construction) — typed, never lexicographic
    * where that would lie ("0190" vs dates with signed years, numeric
    * widths). None when either side does not parse. */
  def dirOrder(kind: Kind, dt: DataType, a: String, b: String): Option[Int] = {
    import scala.util.Try
    kind match {
      case Hours =>
        def h(s: String): Long = {
          val p = s.split("-")
          java.time.LocalDateTime.of(p(0).toInt, p(1).toInt, p(2).toInt,
            p(3).toInt, 0).toEpochSecond(java.time.ZoneOffset.UTC)
        }
        Try(h(a).compare(h(b))).toOption
      case Days =>
        Try(LocalDate.parse(a).toEpochDay.compare(
          LocalDate.parse(b).toEpochDay)).toOption
      case Months =>
        def m(s: String): Int = {
          val Array(y, mo) = s.split("-", 2)
          y.toInt * 12 + (mo.toInt - 1)
        }
        Try(m(a).compare(m(b))).toOption
      case Years => Try(a.toInt.compare(b.toInt)).toOption
      case Trunc(_) => dt match {
        case StringType => Some(a.compareTo(b))
        case _ => Try(java.lang.Long.compare(a.toLong, b.toLong)).toOption
      }
    }
  }

  /** Dir value of a runtime-filter VALUE STRING (the dir-encoding
    * rendering GraftV2Predicates.litOf emits: ISO for dates, raw
    * internal numbers for timestamps/longs, text for strings). None
    * when it does not parse — the caller must not narrow. */
  def dirFromValueString(s: String, dt: DataType, kind: Kind)
      : Option[String] = {
    import scala.util.Try
    val v: Option[Any] = dt match {
      case DateType => Try(LocalDate.parse(s).toEpochDay.toInt: Any).toOption
      case TimestampType | TimestampNTZType => Try(s.toLong: Any).toOption
      case LongType => Try(s.toLong: Any).toOption
      case IntegerType => Try(s.toInt: Any).toOption
      case ShortType => Try(s.toShort: Any).toOption
      case ByteType => Try(s.toByte: Any).toOption
      case StringType => Some(UTF8String.fromString(s))
      case _ => None
    }
    v.flatMap(x => Try(dirValue(x, dt, kind)).toOption)
  }
}

/** The `days`/`months`/`years`/`truncate` V2 functions the catalog
  * serves so scan-reported transforms and write distributions resolve
  * (same contract as [[GraftBucketFunction]]). */
private[sources] final class GraftTimeFunction(
    kind: GraftTransforms.Kind) extends UnboundFunction {
  override def name(): String = GraftTransforms.kindName(kind)
  override def description(): String = s"graft ${name()} partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"${name()} takes one column, got ${inputType.catalogString}")
    val dt = inputType.fields(0).dataType
    require(GraftTransforms.supportedType(kind, dt),
      s"${name()} is not defined over ${dt.catalogString}")
    new GraftTimeBound(kind, dt)
  }
}

/** Result is the canonical DIR VALUE string — grouping equality in the
  * transform space, one definition end to end. */
private[sources] final class GraftTimeBound(kind: GraftTransforms.Kind,
    dt: DataType) extends ScalarFunction[UTF8String] {
  override def name(): String = GraftTransforms.kindName(kind)
  override def canonicalName(): String =
    s"graft.${name()}(${dt.catalogString})"
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = StringType
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): UTF8String =
    if (input.isNullAt(0)) null
    else UTF8String.fromString(
      GraftTransforms.dirValue(input.get(0, dt), dt, kind))
}

private[sources] final class GraftTruncateFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String = "graft truncate partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"truncate takes (width, col), got ${inputType.catalogString}")
    val dt = inputType.fields(1).dataType
    require(GraftTransforms.supportedType(GraftTransforms.Trunc(1), dt),
      s"truncate is not defined over ${dt.catalogString}")
    new GraftTruncateBound(dt)
  }
}

private[sources] final class GraftTruncateBound(dt: DataType)
    extends ScalarFunction[UTF8String] {
  override def name(): String = "truncate"
  override def canonicalName(): String =
    s"graft.truncate(${dt.catalogString})"
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = StringType
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): UTF8String =
    if (input.isNullAt(1)) null
    else UTF8String.fromString(GraftTransforms.dirValue(
      input.get(1, dt), dt, GraftTransforms.Trunc(input.getInt(0))))
}
