package graft.functions

import graft.SparkSpec
import graft.functions.SubwordFunctions._
import org.apache.spark.sql.functions._

class SubwordSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built vocab: start pieces {"ab","abc"}, continuation {"cd"}. */
  private val vocab = new SubwordVocab(Array(
    ("ab", false), ("abc", false), ("cd", true)))

  private def enc(words: Seq[String]): Seq[String] = {
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    words.foreach(w => vocab.encodeWord(w, out))
    (0 until out.size()).map(i => out.get(i).toString)
  }

  test("greedy longest-match: the LONGEST start piece wins at position 0") {
    // "abcd": greedy takes "abc" (len 3) over "ab" (len 2), leaving "d"
    // as a single-char continuation fallback — NOT ["ab", "##cd"], which
    // a shortest-match or optimal-split encoder would produce.
    assert(enc(Seq("abcd")) == Seq("abc", "##d"))
  }

  test("continuation pieces only match past position 0; fallback is one char") {
    // "xabcd": no start piece at 0 → "x"; at 1 "ab"/"abc" are START-class
    // so they cannot match → "##a", "##b"; then "cd" (continuation) hits.
    assert(enc(Seq("xabcd")) == Seq("x", "##a", "##b", "##cd"))
    // every position falls back: unknown word
    assert(enc(Seq("zzz")) == Seq("z", "##z", "##z"))
  }

  test("round-trip: stripping ## and concatenating pieces rebuilds each word") {
    val words = Seq("abcd", "xabcd", "zzz", "a", "ababab", "cdcd")
    words.foreach { w =>
      val pieces = enc(Seq(w))
      assert(pieces.map(_.stripPrefix("##")).mkString == w, s"word $w")
      assert(pieces.forall(_.stripPrefix("##").nonEmpty))
    }
  }

  test("subword_encode expression runs inside whole-stage codegen") {
    val df = spark.range(50)
      .select(array(concat(lit("ab"), col("id").cast("string")),
        lit("abcd")).as("toks"))
      .select(col("toks"), subword_encode(col("toks"), vocab).as("sw"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("subword_encode")))
    df.collect().foreach { r =>
      val sw = r.getSeq[String](1)
      // last word "abcd" always encodes greedily to abc ##d
      assert(sw.takeRight(2) == Seq("abc", "##d"))
    }
  }

  test("corpus-fit vocab round-trips the corpus") {
    val dir = "/root/testdata/sf0.001"
    val model = graft.operators.TextAnalysis.subwordModel(spark, dir)
    val out = graft.operators.TextAnalysis.textTokensSubword(spark, dir)
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        array_join(graft.functions.TextFunctions.tokens(col("text")), "")
          .as("squashed"))
    // reconstruction: subword_text minus "##" marks and spaces == the
    // doc's whitespace tokens concatenated — encode loses nothing
    val joined = out.join(base, "doc_id")
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("subword_text"), "##", ""), " ", "")
          .as("rebuilt"), col("squashed"))
    assert(joined.filter(col("rebuilt") =!= col("squashed")).count() == 0)
    assert(out.agg(sum("n_subword_tokens")).head().getLong(0) > 0)
  }

  test("vocabulary FIT is partitioning-invariant (cache bypassed)") {
    // r14 advice: the old check re-called subwordModel, which takes the
    // ModelCache HIT path — it only tested the cache round-trip. Run
    // the raw fit twice, once over the scan as-read and once over the
    // input explicitly repartitioned, and compare the vocab TABLES.
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def fitted(df: org.apache.spark.sql.DataFrame): Seq[(String, Boolean, Long, Long)] =
      graft.operators.TextAnalysis.fitSubwordVocab(df).collect().toSeq
        .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    val v1 = fitted(d)
    val v2 = fitted(d.repartition(7))
    val v3 = fitted(d.repartition(1))
    assert(v1.nonEmpty)
    assert(v1 == v2)
    assert(v1 == v3)
  }

  test("property: greedy encode invariants over random vocabs and words") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small alphabet forces dense piece collisions; supplementary-plane
    // rocket (U+1F680, two UTF-16 units) exercises the code-point walk
    val alpha = Gen.oneOf("a", "b", "c", "🚀")
    val genPiece = for {
      n <- Gen.choose(2, 4)
      cs <- Gen.listOfN(n, alpha)
      cont <- Gen.oneOf(true, false)
    } yield (cs.mkString, cont)
    val genCase = for {
      vocab <- Gen.listOf(genPiece).map(_.distinct)
      wlen <- Gen.choose(0, 12)
      w <- Gen.listOfN(wlen, alpha).map(_.mkString)
    } yield (vocab, w)
    def cp(s: String): Int = s.codePointCount(0, s.length)
    val prop = Prop.forAll(genCase) { case (entries, w) =>
      val v = new SubwordVocab(entries.toArray)
      val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
      v.encodeWord(w, out)
      val pieces = (0 until out.size()).map(i => out.get(i).toString)
      val stripped = pieces.zipWithIndex.map { case (p, i) =>
        if (i > 0) { assert(p.startsWith("##")); p.drop(2) } else p
      }
      val starts = entries.filter(!_._2).map(_._1).toSet
      val conts = entries.filter(_._2).map(_._1).toSet
      // 1. pieces concatenate back to the word (nothing lost/invented)
      val roundTrip = stripped.mkString == w
      // 2. every multi-char piece is in the right position-class set
      val inVocab = stripped.zipWithIndex.forall { case (p, i) =>
        cp(p) == 1 || (if (i == 0) starts(p) else conts(p))
      }
      // 3. single-char fallback ONLY when no >=2-cp piece matches there
      var pos = 0
      val fallbackMinimal = stripped.zipWithIndex.forall { case (p, i) =>
        val set = if (i == 0) starts else conts
        val rest = cp(w) - pos
        val start16 = w.offsetByCodePoints(0, pos)
        val ok = cp(p) > 1 || !(2 to math.min(v.maxLen, rest)).exists { l =>
          set(w.substring(start16, w.offsetByCodePoints(start16, l)))
        }
        pos += cp(p)
        ok
      }
      roundTrip && inVocab && fallbackMinimal && pieces.forall(_.nonEmpty)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
