package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema-evolution boundary: MISSING columns null-fill per file, but
 * a column whose physical TYPE drifted between files must fail with
 * the column named — the decoders are requested-type-driven and would
 * otherwise surface an opaque parquet internal error (or garbage). */
class SchemaDriftSpec extends SparkSpec {
  private def fmt = classOf[GraftParquetProvider].getName

  test("type drift between files fails loudly with the column named") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val p = s"$tmp/t"
    try {
      spark.range(100).select(col("id").as("k"), (col("id") * 1.5).as("d"))
        .coalesce(1).write.format(fmt)
        .option(Dsv2Parquet.SchemaOption, "k BIGINT, d DOUBLE")
        .mode("append").save(p)
      spark.range(100, 200).select(col("id").as("k"),
        col("id").cast("decimal(12,2)").as("d"))
        .coalesce(1).write.format(fmt)
        .option(Dsv2Parquet.SchemaOption, "k BIGINT, d DECIMAL(12,2)")
        .mode("append").save(p)
      // vectorized: the drift guard names the column
      val e = intercept[Throwable] {
        spark.read.format(fmt)
          .option(Dsv2Parquet.SchemaOption, "k BIGINT, d DECIMAL(12,2)")
          .load(p).collect()
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .flatMap(c => Option(c.getMessage)).mkString(" | ")
      assert(msgs.contains("TYPE drift") && msgs.contains("'d'"), msgs)
      // row reader: the same named error (not a bare ClassCastException
      // from deep inside record conversion)
      val e2 = intercept[Throwable] {
        spark.read.format(fmt)
          .option(Dsv2Parquet.SchemaOption, "k BIGINT, d DECIMAL(12,2)")
          .option(Dsv2Columnar.VectorizedOption, "false")
          .load(p).collect()
      }
      val msgs2 = Iterator.iterate(e2)(_.getCause).takeWhile(_ != null)
        .flatMap(c => Option(c.getMessage)).mkString(" | ")
      assert(msgs2.contains("TYPE drift") && msgs2.contains("'d'"), msgs2)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("decimal column read as BIGINT is drift, never unscaled longs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift2").toString
    val p = s"$tmp/t"
    try {
      // int64-backed decimal: physically INT64, but its raw values are
      // UNSCALED — serving them as BIGINT would be silent ×100 garbage
      spark.range(100).select(col("id").as("k"),
        col("id").cast("decimal(12,2)").as("d"))
        .coalesce(1).write.format(fmt)
        .option(Dsv2Parquet.SchemaOption, "k BIGINT, d DECIMAL(12,2)")
        .mode("append").save(p)
      val e = intercept[Throwable] {
        spark.read.format(fmt)
          .option(Dsv2Parquet.SchemaOption, "k BIGINT, d BIGINT")
          .load(p).collect()
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .flatMap(c => Option(c.getMessage)).mkString(" | ")
      assert(msgs.contains("TYPE drift") && msgs.contains("'d'"), msgs)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }
}
