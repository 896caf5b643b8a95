package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the KLL rank sketch: the ±err certificate must
 * hold for every value under any reduce/merge order — that certificate
 * is what the exact-percentile query stakes its correctness on. */
class KllSketchSpec extends AnyFunSuite {

  private def sketchOf(k: Int, data: Seq[Double]): (KllRankSketch, KllSummary) = {
    val agg = new KllRankSketch(k)
    val buf = data.foldLeft(agg.zero)(agg.reduce)
    (agg, agg.finish(buf))
  }

  private def trueRank(data: Seq[Double], v: Double): Long =
    data.count(_ < v).toLong

  private def assertCertified(data: Seq[Double], s: KllSummary): Unit = {
    assert(s.n == data.length)
    s.values.zip(s.ranks).foreach { case (v, r) =>
      val t = trueRank(data, v)
      assert(math.abs(r - t) <= s.err,
        s"rank certificate violated at $v: sketch $r, true $t, err ${s.err}")
    }
    // ranks are a nondecreasing prefix-sum reaching n
    assert(s.ranks.sameElements(s.ranks.sorted))
  }

  test("below capacity the sketch is exact: err = 0, every rank true") {
    val data = new scala.util.Random(7).shuffle((1 to 2000).map(_.toDouble)).toSeq
    val (_, s) = sketchOf(1024, data) // cap = 2048 >= n: no compaction
    assert(s.err == 0)
    assert(s.values.length == data.length)
    assertCertified(data, s)
  }

  test("rank certificate holds under compaction, err stays sketch-sized") {
    val rnd = new scala.util.Random(11)
    // lognormal-ish skew: the regime where naive samples misrank tails
    val data = Seq.fill(60000)(math.exp(rnd.nextGaussian() * 2))
    val (_, s) = sketchOf(256, data)
    assert(s.err > 0) // compactions definitely happened
    assertCertified(data, s)
    // bounded state: the flattened sketch is a small fraction of n
    assert(s.values.length < data.length / 10,
      s"sketch kept ${s.values.length} of ${data.length}")
    // and err is far below n (the window the percentile query scans)
    assert(s.err < data.length / 10)
  }

  test("merge: certificate survives any split and merge order") {
    val rnd = new scala.util.Random(13)
    val data = Seq.fill(40000)(rnd.nextDouble() * 1e6)
    val agg = new KllRankSketch(128)
    val parts = data.grouped(7001).toSeq // uneven parts
    def partBuf(p: Seq[Double]): KllBuf = p.foldLeft(agg.zero)(agg.reduce)
    // left fold and right-skewed fold: different merge trees
    val leftFold = parts.map(partBuf).reduceLeft(agg.merge)
    val rightFold = parts.map(partBuf).reduceRight(agg.merge)
    for (merged <- Seq(leftFold, rightFold)) {
      val s = agg.finish(merged)
      assert(s.n == data.length) // n exact under any order
      assertCertified(data, s)
    }
  }

  test("certified window bounds bracket the true order statistics") {
    val rnd = new scala.util.Random(17)
    val data = Seq.fill(50000)(rnd.nextGaussian() * 100)
    val sorted = data.sorted
    val (_, s) = sketchOf(256, data)
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val k0 = math.floor((data.length - 1) * q).toLong
      val lo = KllRankSketch.lowerBound(s, k0, sorted.head)
      val hi = KllRankSketch.upperBound(s, k0, sorted.last)
      assert(lo <= sorted(k0.toInt), s"lo=$lo above x_k0=${sorted(k0.toInt)} at q=$q")
      assert(hi >= sorted(k0.toInt + 1), s"hi=$hi below x_k0+1 at q=$q")
      // and the window is narrow: a small multiple of err ranks wide
      val inWindow = data.count(v => v >= lo && v <= hi)
      assert(inWindow <= 6 * s.err + 2,
        s"window holds $inWindow rows against err ${s.err} at q=$q")
    }
  }
}
