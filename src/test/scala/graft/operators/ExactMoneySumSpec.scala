package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The exact fixed-point money aggregation (RelationalQueries
 * .exactMoneySum) against ground-truth BigDecimal arithmetic: the
 * rendered result must equal the EXACT decimal sum — independent of
 * partitioning/order — for both the 2-digit (cents pass through) and
 * 4-digit (integer-space half-up to cents) paths. This is the guard
 * the oracle rows imply but state only for the specific bench data.
 */
class ExactMoneySumSpec extends SparkSpec {

  private def df(values: Seq[Double], partitions: Int) = {
    val spark0 = spark
    import spark0.implicits._
    spark.createDataset(values).toDF("x").repartition(partitions)
  }

  test("digits=2: equals the exact BigDecimal sum, any partitioning") {
    val rnd = new scala.util.Random(7)
    val cents = Seq.fill(20000)(rnd.nextInt(100000000).toLong) // ≤ $1M, 2dp
    val want = (BigDecimal(cents.sum) / 100).setScale(2).toDouble
    for (parts <- Seq(1, 7, 32)) {
      val got = df(cents.map(_ / 100.0), parts)
        .agg(round(RelationalQueries.exactMoneySum(col("x"), 2), 2).as("s"))
        .collect()(0).getDouble(0)
      assert(got == want, s"partitions=$parts")
    }
  }

  test("digits=4: integer-space half-up to cents equals BigDecimal HALF_UP") {
    val rnd = new scala.util.Random(11)
    // 4-decimal-digit values, including exact .xx5 midpoints (k ending 50)
    val bps = Seq.fill(20000)(rnd.nextInt(1000000000).toLong) ++
      Seq(50L, 150L, 250L, 1050L) // forced midpoint tail
    val want = (BigDecimal(bps.sum) / 10000)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = df(bps.map(_ / 10000.0), 13)
      .agg(round(RelationalQueries.exactMoneySum(col("x"), 4), 2).as("s"))
      .collect()(0).getDouble(0)
    assert(got == want)
  }

  test("digits=4: negative sums round half-away-from-zero like HALF_UP") {
    // credits/refunds: mixed-sign money with forced negative midpoints —
    // floor-based rounding would be off by a cent here (half toward +inf),
    // and a truncating oracle `//` without the sign mirror likewise
    for (bps <- Seq(Seq(-151L), Seq(-150L), Seq(-50L), Seq(-49L),
        Seq(-1000000007L, 999999957L))) {
      val want = (BigDecimal(bps.sum) / 10000)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = df(bps.map(_ / 10000.0), 2)
        .agg(round(RelationalQueries.exactMoneySum(col("x"), 4), 2).as("s"))
        .collect()(0).getDouble(0)
      assert(got == want, s"bps=$bps")
    }
  }

  test("empty and single-row groups behave") {
    val e = df(Seq.empty[Double], 2)
      .agg(RelationalQueries.exactMoneySum(col("x"), 2).as("s")).collect()(0)
    assert(e.isNullAt(0)) // sum of nothing is null, like sum()
    val one = df(Seq(12.34), 1)
      .agg(round(RelationalQueries.exactMoneySum(col("x"), 2), 2).as("s"))
      .collect()(0).getDouble(0)
    assert(one == 12.34)
  }
}
