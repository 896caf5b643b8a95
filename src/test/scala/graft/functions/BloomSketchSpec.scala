package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private def checked(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: no false negatives — every inserted hash probes positive") {
    checked(Prop.forAll(Gen.listOf(Gen.long)) { xs =>
      val words = new Array[Long](1 << 6) // 4096 bits
      xs.foreach(BloomFilter.insert(words, _, 7))
      xs.forall(BloomFilter.mightContain(words, _, 7))
    })
  }

  test("property: merge (bitwise OR) equals insert-all") {
    checked(Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      val a = new Array[Long](1 << 5)
      val b = new Array[Long](1 << 5)
      val ab = new Array[Long](1 << 5)
      xs.foreach(BloomFilter.insert(a, _, 5))
      ys.foreach(BloomFilter.insert(b, _, 5))
      (xs ++ ys).foreach(BloomFilter.insert(ab, _, 5))
      a.zip(b).map { case (x, y) => x | y }.sameElements(ab)
    })
  }

  test("false-positive rate near theory at 10 bits/element") {
    val m = 1 << 17
    val k = 7
    val words = new Array[Long](m >>> 6)
    val n = m / 10 // ~13k elements -> theoretical FP ~0.8%
    (0 until n).foreach(i => BloomFilter.insert(words, i.toLong, k))
    val probes = 20000
    val fps = (1 to probes).count(i =>
      BloomFilter.mightContain(words, -i.toLong, k))
    assert(fps.toDouble / probes < 0.03, s"fp rate ${fps.toDouble / probes}")
  }

  test("BloomAgg through Spark equals direct kernel inserts, any partitioning") {
    val hashes = (1 to 3000).map(i => i.toLong * 2654435761L)
    val direct = new Array[Long](1 << 6)
    hashes.foreach(BloomFilter.insert(direct, _, 7))
    val agg = new BloomAgg(1 << 12, 7)
    for (parts <- Seq(1, 8)) {
      val buf = hashes.toDF("h").repartition(parts).as[Long]
        .select(agg.toColumn)
        .head()
      assert(buf.words.sameElements(direct))
    }
  }

  test("bloom_might_contain expression matches the kernel under codegen") {
    val words = new Array[Long](1 << 5)
    val ins = (1 to 500).map(i => ShingleHash.avalanche(i.toLong) * 31L)
    ins.foreach(BloomFilter.insert(words, _, 7))
    val probe = (ins.take(100) ++ (1 to 100).map(i => -i.toLong * 7919L)).toDF("h")
    val got = probe
      .withColumn("m", BloomFunctions.bloom_might_contain(col("h"), words, 7))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    got.foreach { case (h, m) =>
      assert(m == BloomFilter.mightContain(words, h, 7), s"hash $h")
    }
    // and the inserted prefix is all-positive through the expression too
    assert(ins.take(100).forall(got(_)))
  }
}
