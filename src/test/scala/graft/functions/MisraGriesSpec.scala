package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries guarantees on a skewed synthetic stream, including the
 * mergeable form (the map-side-combine path). */
class MisraGriesSpec extends AnyFunSuite {

  // 1000×hot1 + 600×hot2 + 400 singletons → N=2000; k=4 → bound N/(k+1)=400
  private val stream: Seq[String] =
    Seq.fill(1000)("hot1") ++ Seq.fill(600)("hot2") ++
      (1 to 400).map(i => s"rare$i")
  private val mg = new MisraGries(4)

  test("items above N/(k+1) survive; counts undercount by at most N/(k+1)") {
    // deterministic interleave so hot items face eviction pressure
    val shuffled = new scala.util.Random(7).shuffle(stream)
    val sketch = mg.finish(shuffled.foldLeft(mg.zero)(mg.reduce))
    assert(sketch.contains("hot1") && sketch.contains("hot2"))
    assert(sketch.size <= 4)
    assert(sketch("hot1") <= 1000 && sketch("hot1") >= 1000 - 400)
    assert(sketch("hot2") <= 600 && sketch("hot2") >= 600 - 400)
  }

  test("merging partition sketches preserves the guarantee") {
    val shuffled = new scala.util.Random(11).shuffle(stream)
    val parts = shuffled.grouped(500).toSeq
      .map(_.foldLeft(mg.zero)(mg.reduce))
    val sketch = mg.finish(parts.reduce(mg.merge))
    assert(sketch.contains("hot1") && sketch.contains("hot2"))
    assert(sketch.size <= 4)
    assert(sketch("hot1") >= 1000 - 400 && sketch("hot2") >= 600 - 400)
  }

  test("property: the mergeable guarantee holds on random streams and partitionings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // Misra & Gries 1982 / Agarwal et al. PODS'12: after ANY partition
    // of the stream into chunks, sketch-per-chunk then pairwise merge:
    //  - at most k counters survive,
    //  - no counter overcounts,
    //  - every counter undercounts by at most N/(k+1),
    //  - hence every item with true count > N/(k+1) is present.
    val genCase = for {
      k <- Gen.choose(2, 8)
      n <- Gen.choose(1, 400)
      // skewed domain: few hot candidates + a rare tail
      items <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.oneOf("a", "b"),
        3 -> Gen.oneOf("c", "d", "e"),
        2 -> Gen.choose(0, 50).map("r" + _)))
      seed <- Gen.choose(0L, Long.MaxValue)
      chunk <- Gen.choose(1, 100)
    } yield (k, items, seed, chunk)
    val prop = Prop.forAll(genCase) { case (k, items, seed, chunk) =>
      val mg = new MisraGries(k)
      val shuffled = new scala.util.Random(seed).shuffle(items)
      val sketch = mg.finish(shuffled.grouped(chunk).toSeq
        .map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge))
      val trueCounts = items.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val bound = items.size.toDouble / (k + 1)
      sketch.size <= k &&
        sketch.forall { case (t, c) =>
          c <= trueCounts(t) && c >= trueCounts(t) - bound } &&
        trueCounts.forall { case (t, c) => c <= bound || sketch.contains(t) }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
