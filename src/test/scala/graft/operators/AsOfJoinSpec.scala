package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def L(rows: (Long, Long, String)*) =
    rows.toDF("k", "us", "tag")
  private def R(rows: (Long, Long, Double)*) =
    rows.toDF("k", "us", "v")

  test("backward picks the latest right row at-or-before each left ts") {
    val left = L((1L, 100L, "a"), (1L, 250L, "b"))
    val right = R((1L, 50L, 1.0), (1L, 200L, 2.0), (1L, 300L, 3.0))
    val out = AsOfJoin.backward(left, right, Seq("k"), "us", Seq("v"))
      .orderBy("us").collect()
    assert(out.map(_.getAs[Double]("r_v")).toSeq == Seq(1.0, 2.0))
  }

  test("equal timestamps match (>= semantics, like DuckDB ASOF)") {
    val out = AsOfJoin.backward(
      L((1L, 200L, "a")), R((1L, 200L, 9.0)), Seq("k"), "us", Seq("v"))
      .collect()
    assert(out.length == 1 && out(0).getAs[Double]("r_v") == 9.0)
  }

  test("inner drops unmatched; left keeps them with nulls") {
    val left = L((1L, 10L, "early"), (2L, 10L, "other-key"))
    val right = R((1L, 50L, 1.0))
    assert(AsOfJoin.backward(left, right, Seq("k"), "us", Seq("v")).count() == 0)
    val kept = AsOfJoin.backward(left, right, Seq("k"), "us", Seq("v"),
      inner = false).collect()
    assert(kept.length == 2)
    assert(kept.forall(r => r.isNullAt(r.fieldIndex("r_v"))))
  }

  test("a null value inside a newer right row does not fall back to older rows") {
    val right = Seq((1L, 50L, Some(1.0)), (1L, 200L, None))
      .toDF("k", "us", "v")
    val out = AsOfJoin.backward(L((1L, 300L, "a")), right, Seq("k"), "us", Seq("v"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("r_v")))
  }
}
