package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pushed-limit behavior: row-group truncation from footer row counts
 * when no predicate is in play, no truncation (but reader early-stop)
 * under predicates, and exact results either way. */
class Dsv2LimitSpec extends SparkSpec {

  private def fmt = classOf[GraftParquetProvider].getName

  private def withTmp[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2-limit").toString
    try f(tmp)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  // 8 files → 8 row groups of 25 rows each
  private def write(tmp: String): String = {
    val p = s"$tmp/t"
    spark.range(200).select(col("id").as("k"),
      (col("id") % 4).cast("int").as("i")).repartition(8).write.parquet(p)
    p
  }

  test("limit plans only enough row groups to cover it") {
    withTmp { tmp =>
      val p = write(tmp)
      val q = spark.read.format(fmt).load(p).limit(30)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedLimit: LIMIT 30"), plan)
      assert(q.collect().length == 30)
      assert(Dsv2RuntimeProbe.forPath(p).lastPlanned.get() == 8)
      assert(Dsv2RuntimeProbe.forPath(p).lastKept.get() == 2,
        s"kept ${Dsv2RuntimeProbe.forPath(p).lastKept.get()}")
    }
  }

  test("limit beyond the table keeps every row group and all rows") {
    withTmp { tmp =>
      val p = write(tmp)
      val q = spark.read.format(fmt).load(p).limit(5000)
      assert(q.collect().length == 200)
      assert(Dsv2RuntimeProbe.forPath(p).lastKept.get() == 8)
    }
  }

  test("a predicate disables row-group truncation but results stay exact") {
    withTmp { tmp =>
      val p = write(tmp)
      val q = spark.read.format(fmt).load(p).filter(col("i") === 1).limit(10)
      val rows = q.collect()
      assert(rows.length == 10)
      assert(rows.forall(_.getInt(1) == 1))
      // footer row counts cannot predict post-filter yield: all groups stay
      assert(Dsv2RuntimeProbe.forPath(p).lastKept.get() == 8)
    }
  }
}
