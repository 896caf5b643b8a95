package graft.sources

import graft.SparkSpec

class ThrottleSpec extends SparkSpec {
  import spark.implicits._

  test("per-partition token bucket paces rows without dropping any") {
    val df = (1 to 40).toDF("v").repartition(2)
    val t0 = System.nanoTime()
    val out = Throttle.perPartitionRows(df, rowsPerSec = 100).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.map(_.getInt(0)).sorted.toSeq == (1 to 40))
    // 40 rows over 2 partitions at 100 rows/s/partition ≈ 0.2s floor
    assert(secs >= 0.15, s"ran in ${secs}s — throttle not applied")
  }

  test("non-positive limit is a no-op passthrough") {
    val df = (1 to 10).toDF("v")
    assert(Throttle.perPartitionRows(df, 0).count() == 10)
  }
}
