package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private def checked(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val genStream: Gen[List[Long]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.choose(0L, 5L), // hot head -> heavy collisions
      3 -> Gen.choose(0L, 50L),
      2 -> Gen.long))

  test("property: estimate >= true count, exact when no collisions") {
    checked(Prop.forAll(genStream) { xs =>
      val (d, w) = (3, 16)
      val cells = new Array[Long](d * w)
      xs.foreach(CountMin.insert(cells, _, 1L, d, w))
      val truth = xs.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
      truth.forall { case (h, c) =>
        CountMin.estimate(cells, h, d, w) >= c
      }
    })
  }

  test("property: linearity — weighted insert equals occurrence stream") {
    checked(Prop.forAll(genStream) { xs =>
      val (d, w) = (4, 8)
      val byOcc = new Array[Long](d * w)
      xs.foreach(CountMin.insert(byOcc, _, 1L, d, w))
      val byWeight = new Array[Long](d * w)
      xs.groupBy(identity).foreach { case (h, g) =>
        CountMin.insert(byWeight, h, g.size.toLong, d, w)
      }
      byOcc.sameElements(byWeight)
    })
  }

  test("property: merge (elementwise sum) equals single sketch over the union") {
    checked(Prop.forAll(genStream, genStream) { (xs, ys) =>
      val (d, w) = (3, 8)
      val a = new Array[Long](d * w)
      val b = new Array[Long](d * w)
      val ab = new Array[Long](d * w)
      xs.foreach(CountMin.insert(a, _, 1L, d, w))
      ys.foreach(CountMin.insert(b, _, 1L, d, w))
      (xs ++ ys).foreach(CountMin.insert(ab, _, 1L, d, w))
      a.zip(b).map { case (x, y) => x + y }.sameElements(ab)
    })
  }

  test("CmsAgg through Spark equals direct kernel inserts, any partitioning") {
    val pairs = (1 to 2000).map(i => (i.toLong % 37L * 2654435761L, (i % 5 + 1).toLong))
    val direct = new Array[Long](4 * 32)
    pairs.foreach { case (h, c) => CountMin.insert(direct, h, c, 4, 32) }
    val agg = new CmsAgg(4, 32)
    for (parts <- Seq(1, 8)) {
      val buf = pairs.toDF("h", "c").repartition(parts).as[(Long, Long)]
        .select(agg.toColumn)
        .head()
      assert(buf.cells.sameElements(direct), s"parts=$parts")
    }
  }

  test("cms_estimate expression and hash64 column match the kernels under codegen") {
    val cells = new Array[Long](3 * 8)
    val terms = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val hs = terms.map(t => SimHash64.hash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    hs.foreach(CountMin.insert(cells, _, 2L, 3, 8))
    val got = terms.toDF("term")
      .select(col("term"), CmsFunctions.hash64(col("term")).as("h"))
      .withColumn("est", CmsFunctions.cms_estimate(col("h"), cells, 3, 8))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (t, h, est) =>
      val i = terms.indexOf(t)
      assert(h == hs(i), s"hash64 mismatch for $t")
      assert(est == CountMin.estimate(cells, h, 3, 8), s"estimate mismatch for $t")
      assert(est >= 2L)
    }
  }
}
