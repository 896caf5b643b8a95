package graft.sources

import graft.SparkSpec
import graft.operators.ReconQueries
import graft.schema.TableSchema
import org.apache.spark.sql.functions._

/**
 * Operator A's trait boundary: a second offline Source implementation
 * must be invisible to everything downstream of `load` — same
 * projection, same nulls, same classification.
 */
class CsvSourceSpec extends SparkSpec {
  import spark.implicits._

  test("CsvSource projects to the schema and round-trips nulls/types") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv-spec").toString + "/t"
    val df = Seq(
      (1L, Option("a"), Option(100L), Option(60)),
      (2L, None: Option[String], None: Option[Long], None: Option[Int]),
      (3L, Option(""), Option(300L), Option(30))) // EMPTY STRING ≠ NULL
      .toDF("id", "v", "writetime_v", "ttl_v")
      .withColumn("extra", lit("dropme")) // not in the schema → pruned
    // write keeps Spark's default emptyValue (quoted "") — only the
    // null marker changes, so "" and NULL occupy distinct encodings
    df.write.option("header", "true")
      .option("nullValue", CsvSource.NullMarker)
      .csv(tmp)
    val schema = TableSchema(pk = Seq("id"), types = Map("id" -> "BIGINT", "v" -> "TEXT"))
    val got = CsvSource(tmp, df.schema).load(spark, schema)
    assert(got.columns.toSeq == Seq("id", "v", "writetime_v", "ttl_v"))
    val rows = got.orderBy("id").collect()
    assert(rows(0).toSeq == Seq(1L, "a", 100L, 60))
    assert(rows(1).toSeq == Seq(2L, null, null, null))
    // the r9 advice case: an empty-string cell must come back as "",
    // not null — the NullMarker convention disambiguates the two
    assert(rows(2).toSeq == Seq(3L, "", 300L, 30))
  }

  test("CSV-sourced reconciliation matches the parquet-sourced classification") {
    val dir = "/root/testdata/sf0.001"
    val viaParquet = ReconQueries.reconClassify(spark, dir)
    val viaCsv = ReconQueries.reconClassifyCsv(spark, dir)
    assert(viaCsv.schema == viaParquet.schema)
    assert(viaCsv.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(viaCsv).isEmpty)
  }

  test("JsonSource round-trips native null vs empty string without a marker") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-json-spec").toString + "/t"
    val df = Seq(
      (1L, Option("a"), Option(100L), Option(60)),
      (2L, None: Option[String], None: Option[Long], None: Option[Int]),
      (3L, Option(""), Option(300L), Option(30)))
      .toDF("id", "v", "writetime_v", "ttl_v")
      .withColumn("extra", lit("dropme"))
    df.write.json(tmp)
    val schema = TableSchema(pk = Seq("id"), types = Map("id" -> "BIGINT", "v" -> "TEXT"))
    val got = JsonSource(tmp, df.schema).load(spark, schema)
    assert(got.columns.toSeq == Seq("id", "v", "writetime_v", "ttl_v"))
    val rows = got.orderBy("id").collect()
    assert(rows(0).toSeq == Seq(1L, "a", 100L, 60))
    assert(rows(1).toSeq == Seq(2L, null, null, null))
    assert(rows(2).toSeq == Seq(3L, "", 300L, 30))
  }

  test("JSON-sourced reconciliation matches the parquet-sourced classification") {
    val dir = "/root/testdata/sf0.001"
    val viaParquet = ReconQueries.reconClassify(spark, dir)
    val viaJson = ReconQueries.reconClassifyJson(spark, dir)
    assert(viaJson.schema == viaParquet.schema)
    assert(viaJson.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(viaJson).isEmpty)
  }
}
