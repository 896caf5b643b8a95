package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(m: BpeMerges, w: String): Seq[String] = {
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    m.encodeWord(w, out)
    (0 until out.size()).map(i => out.get(i).toString)
  }

  test("hand-checked training: argmax per round, re-count between rounds") {
    // {abab ×2, abc ×1}: round 1 counts (a,b)=5, (b,a)=2, (b,c)=1 →
    // merge (a,b); round 2 re-counts OVER THE NEW SEGMENTATION:
    // (ab,ab)=2, (ab,c)=1 → merge (ab,ab) — a pair that did not even
    // exist before round 1, which is what makes the fit iterative;
    // round 3 merges (ab,c); then pairs are exhausted and training
    // stops early.
    val merges = BpeKernels.train(Seq(("abab", 2L), ("abc", 1L)), 10)
    assert(merges == Seq(("a", "b"), ("ab", "ab"), ("ab", "c")))
    val m = new BpeMerges(merges.toArray)
    assert(enc(m, "abab") == Seq("abab"))
    assert(enc(m, "abc") == Seq("abc"))
    // partial application on unseen words: (a,b) fires, later merges don't
    assert(enc(m, "aba") == Seq("ab", "a"))
    assert(enc(m, "bab") == Seq("b", "ab"))
    assert(enc(m, "xyz") == Seq("x", "y", "z"))
  }

  test("runs merge canonically left-to-right (aaaa -> [aa, aa], not [aa, a, a])") {
    // the space-wrapped representation gives every symbol its own
    // delimiters, so non-overlapping replace = canonical BPE merging
    val m = new BpeMerges(Array(("a", "a")))
    assert(enc(m, "aaaa") == Seq("aa", "aa"))
    assert(enc(m, "aaaaa") == Seq("aa", "aa", "a"))
    assert(enc(m, "aaa") == Seq("aa", "a"))
  }

  test("supplementary-plane characters enter as one symbol, not two surrogates") {
    // 🚀 is U+1F680, two UTF-16 units — the wrap must walk code points
    // (r15 review: same class of bug the Subword kernel fixed) or the
    // fit diverges from the oracle's code-point indexing and lone
    // surrogates corrupt the UTF8String output
    val m0 = new BpeMerges(Array.empty)
    assert(enc(m0, "🚀x") == Seq("🚀", "x"))
    val merges = BpeKernels.train(Seq(("🚀x", 3L)), 2)
    assert(merges == Seq(("🚀", "x")))
    val m = new BpeMerges(merges.toArray)
    assert(enc(m, "🚀x") == Seq("🚀x"))
    assert(enc(m, "🚀🚀x") == Seq("🚀", "🚀x"))
  }

  test("tie-break is lexicographic on the pair at equal counts") {
    // both (x,y) and (y,x) occur once; (x,y) < (y,x)
    val merges = BpeKernels.train(Seq(("xyx", 1L)), 1)
    assert(merges == Seq(("x", "y")))
  }

  test("tie-break collates UTF-8 bytes, not UTF-16 code units") {
    // U+E000 (EE 80 80) precedes U+1F680 (F0 9F 9A 80) in UTF-8 byte
    // order but FOLLOWS it in UTF-16 String order (0xE000 > the high
    // surrogate 0xD83D) — the r15 advice: a tied argmax must pick the
    // same merge as the DuckDB oracle's binary collation
    val merges = BpeKernels.train(Seq(("x", 1L), ("🚀x", 1L)), 1)
    assert(merges == Seq(("", "x")))
  }

  test("fit bounds: min-frequency threshold, top-N cap, byte budget") {
    import graft.operators.TextAnalysis
    val docs = Seq("aa aa aa bb bb cc").toDF("text")
    // minFreq=2 drops the hapax cc; maxWords=1 keeps only aa (freq 3) —
    // the only learnable merge is (a,a), and training on the capped
    // dict must NOT see bb's (b,b)
    val m1 = TextAnalysis.fitBpeMergesFrom(docs, 2L, 1, 8)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    assert(m1.toSeq == Seq(("a", "a")))
    // out-of-dict words still encode under the fitted merges
    val m = new BpeMerges(m1)
    assert(enc(m, "cc") == Seq("c", "c"))
    assert(enc(m, "aaa") == Seq("aa", "a"))
    // uncapped: bb enters the dict and (b,b) is learned second
    val m2 = TextAnalysis.fitBpeMergesFrom(docs, 1L, 1000, 8)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    assert(m2.take(2).toSeq == Seq(("a", "a"), ("b", "b")))
    // the byte guard fails loudly BEFORE collecting an over-budget dict
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.fitBpeMergesFrom(docs, 1L, 1000, 8, byteBudget = 10L)
    }
    assert(e.getMessage.contains("driver bytes"))
  }

  test("property: symbols concatenate back to the word") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val alpha = Gen.oneOf("a", "b", "c")
    val genCase = for {
      nWords <- Gen.choose(1, 6)
      ws <- Gen.listOfN(nWords,
        Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, alpha).map(_.mkString)))
      nm <- Gen.choose(0, 12)
      probe <- Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    } yield (ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq,
      nm, probe)
    val prop = Prop.forAll(genCase) { case (wf, nm, probe) =>
      val m = new BpeMerges(BpeKernels.train(wf, nm).toArray)
      // round-trip holds for trained words AND unseen probes
      (wf.map(_._1) :+ probe).forall { w =>
        val syms = enc(m, w)
        syms.mkString == w && syms.forall(_.nonEmpty)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("bpe_encode runs inside whole-stage codegen") {
    val m = new BpeMerges(Array(("a", "b"), ("ab", "c")))
    val df = spark.range(20)
      .select(array(lit("abc"), concat(lit("ab"), col("id").cast("string"))).as("t0"))
      .select(col("t0"), BpeFunctions.bpe_encode(col("t0"), m).as("bp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("bpe_encode")))
    df.collect().foreach { r =>
      assert(r.getSeq[String](1).head == "abc") // (a,b) then (ab,c)
    }
  }
}
