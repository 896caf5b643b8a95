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
}
