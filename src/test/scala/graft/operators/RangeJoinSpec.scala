package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 10L, 100L, 200L), // key 1: [100, 200]
    (1L, 11L, 150L, 450L), // key 1: [150, 450] spans several buckets
    (2L, 20L, 100L, 200L)  // other key
  ).toDF("k", "iid", "s", "e")

  private def points(rows: (Long, Long, Long)*) =
    rows.toDF("k", "pid", "ts")

  private def join(p: org.apache.spark.sql.DataFrame, width: Long = 100L) =
    RangeJoin.pointsInIntervals(p, intervals, Seq("k"), "ts", "s", "e", width)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("containment is inclusive on both bounds and key-scoped") {
    assert(join(points((1L, 1L, 100L))) == Set((1L, 10L)))        // = start
    assert(join(points((1L, 2L, 200L))) == Set((2L, 10L), (2L, 11L))) // = end
    assert(join(points((1L, 3L, 99L))) == Set.empty)              // before
    assert(join(points((2L, 4L, 150L))) == Set((4L, 20L)))        // other key
  }

  test("an interval spanning many buckets matches each point exactly once") {
    for (width <- Seq(10L, 100L, 1000L)) {
      val out = RangeJoin.pointsInIntervals(
        points((1L, 1L, 300L)), intervals, Seq("k"), "ts", "s", "e", width)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(out.toSeq == Seq((1L, 11L)), s"width=$width")
    }
  }
}
