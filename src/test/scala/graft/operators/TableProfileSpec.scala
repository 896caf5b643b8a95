package graft.operators

import graft.SparkSpec
import graft.operators.TableProfile.{Cents, Verbatim}

/** Generic single-pass profiler on a planted frame with nulls. */
class TableProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows/nulls/distincts and renders cents bounds") {
    val df = Seq(
      (1L, Some("a"), Some(1.25)),
      (2L, None, Some(3.10)),
      (3L, Some("a"), None),
      (4L, Some("b"), Some(-0.05))).toDF("id", "tag", "price")
    val p = TableProfile.profile(df,
        Seq("id" -> Verbatim, "tag" -> Verbatim, "price" -> Cents))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p("id").getAs[Long]("n_rows") == 4L)
    assert(p("id").getAs[Long]("n_nulls") == 0L)
    assert(p("id").getAs[Long]("n_distinct") == 4L)
    assert(p("id").getAs[String]("min_value") == "1")
    assert(p("tag").getAs[Long]("n_nulls") == 1L)
    assert(p("tag").getAs[Long]("n_distinct") == 2L)
    assert(p("tag").getAs[String]("max_value") == "b")
    assert(p("price").getAs[Long]("n_nulls") == 1L)
    // cents rendering: exact integers, sign preserved
    assert(p("price").getAs[String]("min_value") == "-5")
    assert(p("price").getAs[String]("max_value") == "310")
  }
}
