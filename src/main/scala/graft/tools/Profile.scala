package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      noop(df)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-44s median=${ts(2)}%6.2fs  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val tiles = graft.operators.Dedup.tileHashTable(spark, dir)
    time("spans OLD (min struct, sort agg)") {
      val repeated = tiles.groupBy("h")
        .agg(count(lit(1)).as("n_occ"), min(struct(col("doc_id"), col("pos"))).as("keep"))
        .filter(col("n_occ") >= 2)
      tiles.join(repeated, Seq("h"))
        .filter(!(col("doc_id") === col("keep.doc_id") && col("pos") === col("keep.pos")))
        .select(col("doc_id"), col("pos"), col("keep.doc_id").as("keep_doc_id"),
          col("keep.pos").as("keep_pos"), col("n_occ"))
    }
    time("spans NEW (stacked hash aggs)") {
      val perDoc = tiles.groupBy("h", "doc_id").agg(count(lit(1)).as("c"), min(col("pos")).as("mpos"))
      val repeated = perDoc.groupBy("h")
        .agg(sum(col("c")).as("n_occ"), min(col("doc_id")).as("keep_doc_id"),
          min_by(col("mpos"), col("doc_id")).as("keep_pos"))
        .filter(col("n_occ") >= 2)
      tiles.join(repeated, Seq("h"))
        .filter(!(col("doc_id") === col("keep_doc_id") && col("pos") === col("keep_pos")))
        .select(col("doc_id"), col("pos"), col("keep_doc_id"), col("keep_pos"), col("n_occ"))
    }
    spark.stop()
  }
}
