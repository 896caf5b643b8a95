package graft.operators
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fmt = classOf[graft.sources.GraftParquetProvider].getName
    val tmp = java.nio.file.Files.createTempDirectory("graft-fc").toString
    val damaged = graft.MvSyncDemo.mvDf(spark, dir)
    println(s"mvDf partitions: ${damaged.rdd.getNumPartitions}")
    damaged.write.format(fmt)
      .option(graft.sources.Dsv2Parquet.SchemaOption, damaged.schema.toDDL)
      .mode("append").save(s"$tmp/mv")
    val files = new java.io.File(s"$tmp/mv").listFiles()
    println(s"files written: ${files.count(_.getName.endsWith(".parquet"))}; sizes: ${files.filter(_.getName.endsWith(".parquet")).map(_.length()).sorted.reverse.take(5).mkString(",")}")
    spark.stop()
  }
}
