package graft.operators

import graft.SparkSpec
import graft.operators.TableProfile.{Cents, Verbatim}
import org.apache.spark.sql.functions.lit

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

  test("empty table still emits one all-zero profile row per column") {
    val df = Seq((1L, Some("a"), Some(1.0))).toDF("id", "tag", "price").filter(lit(false))
    val p = TableProfile.profile(df,
        Seq("id" -> Verbatim, "tag" -> Verbatim, "price" -> Cents))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet == Set("id", "tag", "price"))
    p.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 0L)
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Long]("n_distinct") == 0L)
      assert(r.getAs[String]("min_value") == null)
    }
  }

  test("negative zero doubles count as one distinct value (numeric semantics)") {
    val df = Seq((1L, 0.0), (2L, -0.0), (3L, 2.5)).toDF("id", "price")
    val p = TableProfile.profile(df, Seq("price" -> Cents))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    // DISTINCT on raw doubles treats ±0.0 as equal; the string-rendered
    // pass must agree (the +0.0 normalization), not report 3
    assert(p("price").getAs[Long]("n_distinct") == 2L)
  }
}
