package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LIST (array) columns through the DSv2 provider — the collection
 * shape a live connector must carry (CQL list/set). Read parity vs
 * the builtin source, write round-trip through both readers, and the
 * null/empty edge cases. */
class Dsv2ListSpec extends SparkSpec {
  import spark.implicits._

  private def fmt = classOf[GraftParquetProvider].getName

  private def withTmp[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2-list").toString
    try f(tmp)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  private def fixture: DataFrame =
    spark.range(60).select(
      col("id").as("k"),
      when(col("id") % 7 === 0, lit(null))           // null array
        .when(col("id") % 5 === 0, array())          // empty array
        .otherwise(sequence(lit(0), col("id") % 4)
          .cast("array<float>")).as("vf"),
      array(concat(lit("a"), col("id").cast("string")),
        lit("b")).as("vs"),
      sequence(lit(1L), lit(1L) + col("id") % 3).as("vl"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s.toList
      case x => x
    }).toSet

  test("reads builtin-written arrays exactly (floats, strings, longs)") {
    withTmp { tmp =>
      fixture.write.parquet(s"$tmp/t")
      val got = spark.read.format(fmt).load(s"$tmp/t")
      assert(got.schema == spark.read.parquet(s"$tmp/t").schema)
      assert(rows(got) == rows(fixture))
    }
  }

  test("writes arrays that both readers round-trip exactly") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      fixture.write.format(fmt)
        .option(Dsv2Parquet.SchemaOption, fixture.schema.toDDL)
        .mode("append").save(p)
      assert(rows(spark.read.parquet(p)) == rows(fixture))
      assert(rows(spark.read.format(fmt).load(p)) == rows(fixture))
    }
  }

  test("array columns prune like any other column") {
    withTmp { tmp =>
      fixture.write.parquet(s"$tmp/t")
      val q = spark.read.format(fmt).load(s"$tmp/t").select("k", "vf")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("ReadSchema: struct<k:bigint,vf:array<float>>"), plan)
      assert(q.count() == 60)
    }
  }

  test("heterogeneous directories null-fill missing columns (evolution)") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      // narrow writer first (k only), wider writer later (k, extra) —
      // the schema-evolution layout a long-lived table accumulates
      spark.range(10).select(col("id").as("k"))
        .write.format(fmt).option(Dsv2Parquet.SchemaOption, "k BIGINT")
        .mode("append").save(p)
      spark.range(10, 20).select(col("id").as("k"),
          concat(lit("x"), col("id").cast("string")).as("extra"))
        .write.format(fmt)
        .option(Dsv2Parquet.SchemaOption, "k BIGINT, extra STRING")
        .mode("append").save(p)
      val wide = spark.read.format(fmt)
        .option(Dsv2Parquet.SchemaOption, "k BIGINT, extra STRING").load(p)
      val got = wide.collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.size == 20)
      assert((0L until 10L).forall(k => got(k).isEmpty))
      assert((10L until 20L).forall(k => got(k).contains(s"x$k")))
      // predicate on the evolved column: record filters must not be
      // attached to the narrow file, and Spark's residual re-check
      // keeps the answer exact
      assert(wide.filter(col("extra") === "x15").count() == 1L)
      // projecting ONLY the evolved column still counts every row
      assert(wide.select("extra").count() == 20L)
    }
  }

  test("predicates on scalar columns stay exact beside array reads") {
    withTmp { tmp =>
      fixture.write.parquet(s"$tmp/t")
      val got = spark.read.format(fmt).load(s"$tmp/t")
        .filter(col("k") >= 50).select("k", "vl")
      assert(rows(got) == rows(fixture.filter(col("k") >= 50).select("k", "vl")))
    }
  }
}
