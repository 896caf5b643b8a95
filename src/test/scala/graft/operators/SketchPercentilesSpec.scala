package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Query-level behavior of the sketch-guided exact percentile path —
 * the oracle layer checks it against DuckDB on testdata; these pin the
 * edges the testdata can't reach. */
class SketchPercentilesSpec extends SparkSpec {
  import spark.implicits._

  private def exact(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.75))").as("pct"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

  private def sketched(df: org.apache.spark.sql.DataFrame) =
    RelationalQueries.sketchPercentiles(df, "g", "v", Seq(0.25, 0.5, 0.75))
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getDouble(1)).map(_.getDouble(2)).toSeq
      }

  test("matches percentile() on mixed-size skewed groups") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(30000)(i => ("big", math.exp(rnd.nextGaussian()))) ++
      Seq.tabulate(100)(i => ("small", rnd.nextDouble())) ++
      Seq(("one", 42.0)) // n = 1: every quantile is the single value
    val df = rows.toDF("g", "v")
    val e = exact(df)
    val s = sketched(df)
    for (g <- e.keys) {
      e(g).zip(s(g)).foreach { case (ev, sv) =>
        assert(math.abs(ev - sv) < 1e-9, s"group $g: $ev vs $sv")
      }
    }
  }

  test("giant tie classes resolve from edge counts — and stay exact") {
    // the 100 TB tie hazards: a fully-constant group; a group whose
    // quantiles all land INSIDE one giant tie class; and a group where
    // a quantile falls exactly BETWEEN two adjacent giant classes (both
    // boundary stats pinned from counts, zero interior rows). A naive
    // in-window selection would funnel whole tie classes through one
    // window partition; boundary pinning must keep every one of these
    // off pass 3.
    val rows = Seq.tabulate(5000)(_ => ("const", 7.5)) ++
      (Seq.tabulate(2000)(i => ("mid", 10.0)) ++
        Seq.tabulate(10)(i => ("mid", i.toDouble)) ++
        Seq.tabulate(10)(i => ("mid", 100.0 + i))) ++
      (Seq.tabulate(3000)(_ => ("twocls", 1.0)) ++
        Seq.tabulate(3000)(_ => ("twocls", 2.0)))
    val df = rows.toDF("g", "v")
    val e = exact(df)
    val s = sketched(df)
    for (g <- e.keys) {
      e(g).zip(s(g)).foreach { case (ev, sv) =>
        assert(math.abs(ev - sv) < 1e-9, s"group $g: $ev vs $sv")
      }
    }
    assert(s("const") == Seq(7.5, 7.5, 7.5))
    assert(s("twocls") == Seq(1.0, 1.5, 2.0)) // median interpolates across the class border
  }
}
