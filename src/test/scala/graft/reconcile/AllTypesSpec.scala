package graft.reconcile

import graft.SparkSpec
import graft.config.Settings
import graft.schema.TableSchema
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Per-type comparison matrix across the full CQL type surface
 * (reference: one match + one mismatch test per type,
 * MvSyncTest.java:2511-2953; type mapping SURVEY §1.2). For every
 * column: equal values ⇒ CONSISTENT, a perturbed MV value ⇒
 * INCONSISTENT with that column as the first (and only) mismatch;
 * sets and maps compare order-insensitively; lists are order-sensitive;
 * null×null is equal.
 */
class AllTypesSpec extends SparkSpec {

  // (cql type, spark type, base value, different mv value)
  private val cols: Seq[(String, String, DataType, Any, Any)] = Seq(
    ("c_ascii", "ASCII", StringType, "alpha", "beta"),
    ("c_bigint", "BIGINT", LongType, 1L, 2L),
    ("c_blob", "BLOB", BinaryType, "x1".getBytes("UTF-8"), "x2".getBytes("UTF-8")),
    ("c_boolean", "BOOLEAN", BooleanType, true, false),
    ("c_date", "DATE", DateType,
      java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-01-02")),
    ("c_decimal", "DECIMAL", DecimalType(38, 18),
      new java.math.BigDecimal("1.500000000000000000"),
      new java.math.BigDecimal("2.500000000000000000")),
    ("c_double", "DOUBLE", DoubleType, 1.5d, 2.5d),
    ("c_float", "FLOAT", FloatType, 1.5f, 2.5f),
    ("c_inet", "INET", StringType, "10.0.0.1", "10.0.0.2"),
    ("c_int", "INT", IntegerType, 7, 8),
    ("c_list", "LIST", ArrayType(IntegerType), Seq(1, 2), Seq(2, 1)),
    ("c_map", "MAP", MapType(StringType, IntegerType),
      Map("a" -> 1, "b" -> 2), Map("a" -> 1, "b" -> 3)),
    ("c_set", "SET", ArrayType(IntegerType), Seq(1, 2), Seq(1, 3)),
    ("c_smallint", "SMALLINT", ShortType, 1.toShort, 2.toShort),
    ("c_text", "TEXT", StringType, "hello", "world"),
    ("c_time", "TIME", LongType, 45296000000000L, 45297000000000L),
    ("c_timestamp", "TIMESTAMP", TimestampType,
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1704067200000L)),
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1704153600000L))),
    ("c_timeuuid", "TIMEUUID", StringType,
      "11111111-1111-1111-1111-111111111111",
      "22222222-2222-2222-2222-222222222222"),
    ("c_tinyint", "TINYINT", ByteType, 1.toByte, 2.toByte),
    ("c_uuid", "UUID", StringType,
      "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa",
      "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb"),
    ("c_varchar", "VARCHAR", StringType, "v1", "v2"),
    ("c_varint", "VARINT", DecimalType(38, 0),
      new java.math.BigDecimal("12345678901234567890"),
      new java.math.BigDecimal("12345678901234567891")))

  private val schema = TableSchema(
    pk = Seq("pk"),
    types = (("pk", "TEXT") +: cols.map(c => c._1 -> c._2)).toMap)

  private val Wt = 1704067200000000L

  private val struct = StructType(
    StructField("pk", StringType) +:
      schema.sortedRegular.flatMap { c =>
        val dt = cols.find(_._1 == c).get._3
        if (schema.isCollection(c)) Seq(StructField(c, dt))
        else Seq(StructField(c, dt),
          StructField(schema.writetimeCol(c), LongType),
          StructField(schema.ttlCol(c), IntegerType))
      })

  private def df(overrides: Map[String, Any]): DataFrame = {
    val vals: Seq[Any] = "k1" +: schema.sortedRegular.flatMap { c =>
      val v = overrides.getOrElse(c, cols.find(_._1 == c).get._4)
      if (schema.isCollection(c)) Seq(v) else Seq(v, Wt, null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row.fromSeq(vals)), 1), struct)
  }

  private def classify(base: DataFrame, mv: DataFrame): Row =
    MvReconciler.reconcile(base, mv, schema, schema, Settings())
      .select("problem", "mismatch_col").collect()(0)

  test("identical rows across all 22 types are CONSISTENT") {
    val r = classify(df(Map.empty), df(Map.empty))
    assert(r.getString(0) == "CONSISTENT" && r.isNullAt(1))
  }

  test("each type's perturbed value is detected as the first mismatch") {
    cols.foreach { case (name, _, _, _, mvVal) =>
      val r = classify(df(Map.empty), df(Map(name -> mvVal)))
      assert(r.getString(0) == "INCONSISTENT", s"$name not detected")
      assert(r.getString(1) == name, s"expected $name, got ${r.getString(1)}")
    }
  }

  test("set and map equality is order-insensitive; list is not") {
    // same elements, different order
    val r1 = classify(df(Map.empty), df(Map("c_set" -> Seq(2, 1))))
    assert(r1.getString(0) == "CONSISTENT")
    val r2 = classify(df(Map.empty), df(Map("c_map" -> Map("b" -> 2, "a" -> 1))))
    assert(r2.getString(0) == "CONSISTENT")
    val r3 = classify(df(Map.empty), df(Map("c_list" -> Seq(2, 1))))
    assert(r3.getString(0) == "INCONSISTENT" && r3.getString(1) == "c_list")
  }

  test("null×null equal per type; one-sided null mismatches") {
    val allNullOverrides = cols.map(c => c._1 -> null).toMap
    val r = classify(df(allNullOverrides), df(allNullOverrides))
    assert(r.getString(0) == "CONSISTENT")
    val r2 = classify(df(Map.empty), df(Map("c_blob" -> null)))
    assert(r2.getString(0) == "INCONSISTENT" && r2.getString(1) == "c_blob")
  }

  test("report rendering: timestamp as epoch millis, blob as UTF-8") {
    val out = MvReconciler.reconcile(
      df(Map.empty),
      df(Map("c_timestamp" ->
        java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1704153600000L)))),
      schema, schema, Settings())
    val r = out.select("mismatch_base", "mismatch_mv").collect()(0)
    assert(r.getString(0) == "1704067200000" && r.getString(1) == "1704153600000")
    val blobOut = MvReconciler.reconcile(
      df(Map.empty), df(Map("c_blob" -> "zz".getBytes("UTF-8"))),
      schema, schema, Settings())
    val rb = blobOut.select("mismatch_base", "mismatch_mv").collect()(0)
    assert(rb.getString(0) == "x1" && rb.getString(1) == "zz")
  }
}
