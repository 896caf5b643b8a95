package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Aho–Corasick kernel behind exact-substring decontamination:
 * fail-link traversal (overlapping/nested patterns), repeat dedup, and
 * agreement with a brute-force `String.contains` sweep on random-ish
 * inputs. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def matches(ac: AhoCorasick, text: String): Seq[Int] =
    ac.findAllDistinct(text.getBytes("UTF-8")).toSeq

  test("finds nested and overlapping patterns via fail links") {
    // 'he' ends inside 'she'; 'hers' continues past 'he' — the classic
    // AC textbook case: scanning "ushers" must report she, he, hers
    val pats = Array("he", "she", "his", "hers")
    val ac = AhoCorasick.build(pats.map(_.getBytes("UTF-8")))
    assert(matches(ac, "ushers") === Seq(0, 1, 3))
    assert(matches(ac, "this") === Seq(2))
    assert(matches(ac, "xyz") === Seq())
  }

  test("repeated occurrences of one pattern dedupe to a single index") {
    val ac = AhoCorasick.build(Array("ab").map(_.getBytes("UTF-8")))
    assert(matches(ac, "ab ab ab ab") === Seq(0))
  }

  test("nested suffix patterns all fire through the output-link chain") {
    val ac = AhoCorasick.build(Array("a", "aa", "aaa").map(_.getBytes("UTF-8")))
    assert(matches(ac, "aaa") === Seq(0, 1, 2))
    assert(matches(ac, "ba") === Seq(0))
    assert(matches(ac, "baab") === Seq(0, 1))
  }

  test("property: agrees with brute-force contains on random 3-letter-alphabet inputs") {
    // a tiny alphabet maximizes pattern overlap, nesting, and repeated
    // occurrences — the adversarial regime for fail/output links that
    // structured fixtures undersample
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val abc = Gen.oneOf('a', 'b', 'c')
    val pat = Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, abc))
    val cases = for {
      pats <- Gen.choose(1, 30).flatMap(k => Gen.listOfN(k, pat)).map(_.distinct)
      text <- Gen.choose(0, 200).flatMap(n => Gen.stringOfN(n, abc))
    } yield (pats, text)
    val prop = Prop.forAll(cases) { case (pats, text) =>
      val ac = AhoCorasick.build(pats.map(_.getBytes("UTF-8")).toArray)
      val expected = pats.indices.filter(i => text.contains(pats(i)))
      matches(ac, text) == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("agrees with a brute-force contains sweep") {
    val pats = (0 until 300).map(i => s"pat${i}x${i % 7}").toArray
    val ac = AhoCorasick.build(pats.map(_.getBytes("UTF-8")))
    val texts = (0 until 100).map { i =>
      (0 until 5).map(j => s"pat${(i * 13 + j * 29) % 300}x${(i * 13 + j * 29) % 300 % 7}")
        .mkString(s" filler$i ")
    }
    texts.foreach { t =>
      val expected = pats.indices.filter(p => t.contains(pats(p)))
      assert(matches(ac, t) === expected, s"text: $t")
    }
  }

  test("ac_find_all expression evaluates through codegen and handles null") {
    val ac = spark.sparkContext.broadcast(
      AhoCorasick.build(Array("fox", "dog").map(_.getBytes("UTF-8"))))
    val out = Seq(
      (1L, "the quick brown fox"),
      (2L, "lazy dog and a fox"),
      (3L, "neither"),
      (4L, null)).toDF("id", "text")
      .select(col("id"), AcFunctions.ac_find_all(col("text"), ac).as("m"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Int](1) === Seq(0))
    assert(out(1).getSeq[Int](1) === Seq(0, 1))
    assert(out(2).getSeq[Int](1) === Seq())
    assert(out(3).isNullAt(1))
  }

  test("multi-byte UTF-8 patterns match only on character boundaries") {
    val pats = Array("héllo", "wörld")
    val ac = AhoCorasick.build(pats.map(_.getBytes("UTF-8")))
    assert(matches(ac, "say héllo to the wörld") === Seq(0, 1))
    assert(matches(ac, "hello world") === Seq())
  }
}
