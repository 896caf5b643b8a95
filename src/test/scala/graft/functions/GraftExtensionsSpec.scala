package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.registerAll(spark)

  test("SQL forms equal the Column-API forms") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT rolling_hash(text) AS rh,
            simhash64(split(text, '\\s+')) AS sh,
            shingle_hashes(text, 3) AS sgl,
            minhash_bands(shingle_hashes(text, 3), 4, 4) AS mb
         FROM ext_docs""").head()
    val api = df.select(
      TextFunctions.rolling_hash(col("text")),
      TextFunctions.simhash64(split(col("text"), "\\s+")),
      ShingleFunctions.shingle_hashes(col("text"), 3),
      ShingleFunctions.minhash_bands(
        ShingleFunctions.shingle_hashes(col("text"), 3), 4, 4)).head()
    assert(sql.getLong(0) == api.getLong(0))
    assert(sql.getLong(1) == api.getLong(1))
    assert(sql.getSeq[Long](2) == api.getSeq[Long](2))
    assert(sql.getSeq[Long](3) == api.getSeq[Long](3))
  }

  test("vector functions via SQL") {
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("ext_vecs")
    val cos = spark.sql("SELECT cosine_sim(a, b) FROM ext_vecs").head().getDouble(0)
    assert(math.abs(cos - 1.0 / math.sqrt(2)) < 1e-12)
    val bucket = spark.sql("SELECT hyperplane_bucket(a, 6) FROM ext_vecs").head().getLong(0)
    assert(bucket >= 0 && bucket < 64)
  }
}
