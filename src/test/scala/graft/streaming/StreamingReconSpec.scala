package graft.streaming

import graft.SparkSpec
import graft.operators.ReconQueries
import graft.reconcile.AllTypesFixture
import org.apache.spark.sql.functions._

/**
 * The streaming monitor must agree with the batch reconciler — the
 * batch all-types classification is DuckDB-oracle-checked
 * (recon_classify_alltypes), so replay equivalence transitively
 * oracle-checks the stateful streaming path, including the per-type
 * canonicalization it shares with the batch expressions.
 */
class StreamingReconSpec extends SparkSpec {

  private type KeyFacts = (String, Option[String], Option[String], Option[String])

  test("streaming monitor converges to the oracle-green batch classification") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-recon-stream").toString
    val baseDir = s"$tmp/base"
    val mvDir = s"$tmp/mv"
    val baseDf = AllTypesFixture.base(spark)
    val mvDf = AllTypesFixture.mv(spark)
    baseDf.coalesce(1).write.parquet(baseDir)
    mvDf.coalesce(1).write.parquet(mvDir)

    val updates = StreamingReconciler.monitor(
      spark.readStream.schema(baseDf.schema).parquet(baseDir),
      spark.readStream.schema(mvDf.schema).parquet(mvDir),
      AllTypesFixture.schema, AllTypesFixture.schema).toDF()

    val q = updates.writeStream.outputMode("update")
      .format("memory").queryName("recon_updates").start()
    try {
      q.processAllAvailable()

      // current state = max-seq update per key
      def current(): Map[String, KeyFacts] =
        spark.table("recon_updates").collect()
          .groupBy(_.getAs[String]("key"))
          .map { case (k, rows) =>
            val last = rows.maxBy(_.getAs[Long]("seq"))
            k -> ((last.getAs[String]("problem"),
              Option(last.getAs[String]("mismatch_col")),
              Option(last.getAs[String]("mismatch_base")),
              Option(last.getAs[String]("mismatch_mv"))))
          }

      val got = current()
      val want: Map[String, KeyFacts] =
        ReconQueries.reconClassifyAllTypes(spark, "").collect()
          .map(r => r.getAs[Long]("id").toString ->
            ((r.getAs[String]("problem"),
              Option(r.getAs[String]("mismatch_col")),
              Option(r.getAs[String]("mismatch_base")),
              Option(r.getAs[String]("mismatch_mv"))))).toMap
      assert(got == want)

      // incremental batch: the MV image of key 11 (a c_map INCONSISTENT)
      // is corrected to the base image — only that key re-classifies
      AllTypesFixture.base(spark).filter(col("id") === 11)
        .coalesce(1).write.mode("append").parquet(mvDir)
      q.processAllAvailable()
      val after = current()
      assert(after("11")._1 == graft.reconcile.MvReconciler.Consistent)
      assert((after - "11") == (got - "11"))
    } finally q.stop()
  }
}
