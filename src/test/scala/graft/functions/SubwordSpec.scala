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

  test("corpus-fit vocab round-trips the corpus and is partitioning-invariant") {
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
    // the fitted vocab is a deterministic function of the corpus: the
    // fit re-run over a repartitioned word relation through the cache
    // (HIT path) and a direct kernel pass agree on every word's encode
    val m2 = graft.operators.TextAnalysis.subwordModel(spark, dir)
    val words = Seq("customer", "window", "filter", "aggregate", "zzqx")
    val o1 = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    val o2 = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    words.foreach { w => model.encodeWord(w, o1); m2.encodeWord(w, o2) }
    assert(o1 == o2)
  }
}
