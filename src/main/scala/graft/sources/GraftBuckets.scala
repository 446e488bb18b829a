package graft.sources

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Hash-bucket partitioning (the Iceberg `bucket(N, col)` transform):
  * a partition LEVEL whose dir value is `murmur3(col) mod N` instead of
  * the column value. The join-key layout for fact-to-fact joins — two
  * tables bucketed the same way on the join column report compatible
  * `bucket` transforms through [[GraftCatalog]]'s FunctionCatalog, and
  * Spark's storage-partitioned join runs the join with ZERO exchanges
  * on either side: at 100 TB that is "join two facts on orderkey
  * without shuffling either" (identity-partitioning by a high-cardinality
  * key would need one dir per value; the bucket folds it to N dirs).
  *
  * Encoding: a bucket level appears everywhere (manifest keys, dir
  * names, the threaded partition-spec string) as the SYNTHETIC level
  * name `<col>_bucket<N>` — every spec-agnostic component (multi-level
  * keys, compaction, GC, time travel, vectors) treats it as an opaque
  * level; only the writer (computes the id), the scan (reports the
  * transform, prunes point lookups) and the catalog (parses the SQL
  * transform, serves the function) are bucket-aware. */
private[sources] object GraftBuckets {
  private val LevelPat = """^(.+)_bucket([0-9]+)$""".r

  /** `Some((sourceCol, numBuckets))` when `name` is a bucket level. */
  def level(name: String): Option[(String, Int)] = name match {
    case LevelPat(src, n) => Some((src, n.toInt))
    case _ => None
  }

  def levelName(src: String, n: Int): String = s"${src}_bucket$n"

  /** Types the bucket hash is defined over. Deliberately the dir-exact
    * subset (no timestamps — their rendering is session-zone-bound; no
    * floating point — NaN/-0.0 hashing is representation-dependent). */
  def supportedType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
         DateType => true
    case _ => false
  }

  /** The bucket id of an INTERNAL (Catalyst) value — the single
    * definition the writer, the pruner, and the V2 function all call:
    * murmur3 (Spark's `hash()` seed 42) mod N, null rows fold to
    * bucket 0 (a key filter never matches null, so the only cost is
    * bucket 0 occasionally reading a few null rows). */
  def bucketId(value: Any, dt: DataType, n: Int): Int =
    if (value == null) 0
    else {
      val h = Murmur3HashFunction.hash(value, dt, 42L).toInt
      val m = h % n
      if (m < 0) m + n else m
    }

  /** Bucket id of an EXTERNAL value (a pushed Filter literal). */
  def bucketIdExternal(value: Any, dt: DataType, n: Int): Int =
    bucketId(CatalystTypeConverters.createToCatalystConverter(dt)(value),
      dt, n)

  /** Bucket id of a runtime-filter VALUE STRING (the dir-encoding
    * rendering GraftV2Predicates.litOf emits) — None when the string
    * does not parse in the declared type, in which case the caller must
    * NOT narrow (skip-only semantics). */
  def idFromValueString(s: String, dt: DataType, n: Int): Option[Int] = {
    import scala.util.Try
    val v: Option[Any] = dt match {
      case LongType => Try(s.toLong).toOption
      case IntegerType => Try(s.toInt).toOption
      case ShortType => Try(s.toShort).toOption
      case ByteType => Try(s.toByte).toOption
      case StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case DateType =>
        Try(java.time.LocalDate.parse(s).toEpochDay.toInt).toOption
      case _ => None
    }
    v.map(bucketId(_, dt, n))
  }
}

/** The `bucket` V2 function [[GraftCatalog]] serves: Spark resolves a
  * scan-reported `bucket(N, col)` transform by loading this through the
  * table's FunctionCatalog and binding it to `(int, <colType>)` — two
  * scans whose bound functions share `canonicalName` (and argument
  * values) are storage-partition-compatible, which is exactly what
  * makes the zero-exchange join plan legal. */
private[sources] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): murmur3(col) mod numBuckets (seed 42)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got " +
        inputType.fields(0).dataType.catalogString)
    val dt = inputType.fields(1).dataType
    require(GraftBuckets.supportedType(dt),
      s"bucket is not defined over ${dt.catalogString}")
    new GraftBucketBound(dt)
  }
}

private[sources] final class GraftBucketBound(dt: DataType)
    extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    GraftBuckets.bucketId(
      if (input.isNullAt(1)) null else input.get(1, dt), dt, input.getInt(0))
}
