package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift guard (FIXTURES.md §B). Round 4 lost 15 queries
  * to a silent testdata regeneration that changed one column's parquet
  * encoding; this spec makes ANY such drift fail loudly in one place,
  * with the drifted column named, instead of surfacing as scattered
  * runtime crashes. Types asserted are the post-normalization engine
  * types (what `Tables.*` hand to every query). */
class FixturesSchemaSpec extends SparkSuite {

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  /** Timestamp columns the queries use encoding-agnostically: the harness
    * has regenerated these as both µs-UTC (TimestampType) and µs-naive
    * (TimestampNTZType), every query + oracle is green under either, and
    * normalizing on read would wrap the column in a cast that blocks
    * parquet filter pushdown — so the contract is "timestamp family",
    * while string/long/date drift still fails. (events.ts is different:
    * streaming needs one fixed type, so Tables.events normalizes it.) */
  private val AnyTimestamp: DataType = null

  private def check(name: String, df: org.apache.spark.sql.DataFrame,
      expected: (String, DataType)*): Unit = test(s"$name schema is stable") {
    val got = fields(df)
    expected.foreach { case (c, t) =>
      assert(got.contains(c), s"$name.$c missing; columns: ${got.keys.toSeq.sorted}")
      if (t == AnyTimestamp)
        assert(got(c) == TimestampType || got(c) == TimestampNTZType,
          s"$name.$c drifted: expected a timestamp type, got ${got(c)}")
      else assert(got(c) == t, s"$name.$c drifted: expected $t, got ${got(c)}")
    }
  }

  check("lineitem", Tables.lineitem(spark, sf0001),
    "l_orderkey" -> LongType, "l_partkey" -> LongType,
    "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
    "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
    "l_discount" -> DoubleType, "l_tax" -> DoubleType,
    "l_returnflag" -> StringType, "l_linestatus" -> StringType,
    "l_shipdate" -> AnyTimestamp)

  check("orders", Tables.orders(spark, sf0001),
    "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
    "o_orderdate" -> AnyTimestamp, "o_orderpriority" -> StringType)

  check("customer", Tables.customer(spark, sf0001),
    "c_custkey" -> LongType, "c_name" -> StringType,
    "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
    "c_mktsegment" -> StringType)

  check("nation", Tables.nation(spark, sf0001),
    "n_nationkey" -> IntegerType, "n_name" -> StringType,
    "n_regionkey" -> IntegerType)

  check("region", Tables.region(spark, sf0001),
    "r_regionkey" -> IntegerType, "r_name" -> StringType)

  check("supplier", Tables.supplier(spark, sf0001),
    "s_suppkey" -> LongType, "s_name" -> StringType,
    "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)

  check("part", Tables.part(spark, sf0001),
    "p_partkey" -> LongType, "p_name" -> StringType,
    "p_brand" -> StringType, "p_type" -> StringType,
    "p_size" -> IntegerType, "p_retailprice" -> DoubleType)

  // events.ts: the column that drifted in round 4 — post-normalization type
  check("events", Tables.events(spark, sf0001),
    "event_id" -> LongType, "ts" -> TimestampType,
    "user_id" -> LongType, "event_type" -> StringType,
    "value" -> DoubleType, "props" -> StringType)

  check("documents", Tables.documents(spark, sf0001),
    "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
    "source" -> StringType, "n_chars" -> LongType)

  // embedding element type feeds the codegen'd vector expressions: a
  // float->double regen now fails HERE by name, not as 500 analysis errors
  check("embeddings", Tables.embeddings(spark, sf0001),
    "vec_id" -> LongType,
    "embedding" -> ArrayType(FloatType, containsNull = true),
    "label" -> IntegerType)
}
