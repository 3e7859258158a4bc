package graft
// (sigstore layout + widen-behavior pins added r4 at the bottom)

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-pin suite (SURVEY §5): every table's Spark schema must equal the
  * FIXTURES.md declaration — catches silent testdata drift before it turns
  * into a confusing oracle mismatch. */
class SchemaPinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def fields(pairs: (String, DataType)*): StructType =
    StructType(pairs.map { case (n, t) => StructField(n, t) })

  private val expected: Map[String, StructType] = Map(
    "region" -> fields("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> fields("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "supplier" -> fields("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "customer" -> fields("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "part" -> fields("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> fields("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // parquet timestamp[ms] with isAdjustedToUTC=false → NTZ in Spark 4
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> fields("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> fields("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> fields("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  expected.foreach { case (name, schema) =>
    test(s"schema pin: $name") {
      val actual = StructType(Tables.t(spark, d, name).schema.map(f =>
        StructField(f.name, f.dataType)))
      assert(actual === schema)
    }
  }

  test("schema pin: events (after ns->us conversion)") {
    val actual = StructType(Tables.events(spark, d).schema.map(f =>
      StructField(f.name, f.dataType)))
    assert(actual === fields("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
  }

  test("fixture row counts at sf0.001") {
    assert(Tables.region(spark, d).count() === 5)
    assert(Tables.nation(spark, d).count() === 25)
    assert(Tables.customer(spark, d).count() === 150)
    assert(Tables.orders(spark, d).count() === 1500)
    assert(Tables.events(spark, d).count() === 1000)
    assert(Tables.documents(spark, d).count() === 500)
    assert(Tables.embeddings(spark, d).count() === 500)
  }

  test("schema pin: persisted signature store layout (cross-run contract)") {
    // llm_dedup_incremental's store outlives the job that wrote it — a
    // schema drift here silently breaks every older store a production
    // deployment still probes, so the layout is pinned like a fixture
    val store = graft.ops.LlmOps.sigStorePath(spark, d)
    val bands = StructType(spark.read.parquet(s"$store/bands").schema.map(f =>
      StructField(f.name, f.dataType)))
    assert(bands === fields("doc_id" -> LongType,
      "band" -> IntegerType, "bh" -> IntegerType))
    val sh = StructType(spark.read.parquet(s"$store/sh").schema.map(f =>
      StructField(f.name, f.dataType)))
    assert(sh === fields("doc_id" -> LongType, "sh" -> ArrayType(StringType)))
  }

  test("documentsWide widens a narrow scan to session parallelism") {
    val wide = Tables.documentsWide(spark, d)
    assert(wide.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    // and it must be a pure widen: same rows as the plain reader
    assert(wide.count() === Tables.documents(spark, d).count())
  }
}
