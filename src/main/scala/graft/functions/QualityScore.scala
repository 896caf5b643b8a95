package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Trained linear quality classifier over hashed n-gram features — the
 * CCNet/fastText-style filter (Wenzek et al. 2020; Joulin et al. 2017)
 * that scores documents "reference-like vs not" with LEARNED weights,
 * where `TextAnalysis.textQuality` applies fixed heuristics. The model
 * is a `buckets`-sized weight vector plus a bias: features are word
 * unigrams and bigrams feature-hashed into `w.length` buckets
 * (Weinberger et al. 2009 — collisions are part of the model, exactly
 * like fastText's `-bucket` table), and the score is the dot product
 * of the document's bucket counts with the weights.
 *
 * The weight vector is a MODEL in the `graft.sources.ModelCache` sense:
 * fitted once per corpus snapshot (naive-Bayes log-count-ratio weights
 * — the NBSVM recipe of Wang & Manning 2012, a closed-form fit both
 * engines can state as relational algebra, which is what makes the
 * DuckDB oracle value-level over fit AND inference), persisted, then
 * shipped into the scan as ONE `ctx.addReferenceObj` slot (the
 * centroid/CMS/subword-vocab pattern). Scoring is a zero-exchange
 * row-local projection: at 100 TB, classifying a corpus is exactly one
 * scan with a few hundred flops per document, no joins, no shuffles —
 * the property that makes quality filtering the FIRST stage of real
 * pipelines (cut before anything expensive runs).
 */
final class QualityWeights(val w: Array[Double], val bias: Double)
    extends Serializable {
  require(w.length >= 2 && (w.length & (w.length - 1)) == 0,
    s"bucket count must be a power of two: ${w.length}")
}

object QualityKernels extends Serializable {
  private val Space = UTF8String.fromString(" ")

  /** Σ_buckets cnt_b · w_b + bias, with bucket counts accumulated from
   * unigram and bigram hashes and the dot product folded from 0.0 in
   * ASCENDING BUCKET ORDER with the bias added LAST — a canonical
   * summation sequence the oracle replays term-for-term
   * (`list_reduce(list(... ORDER BY bkt))` then `+ bias`), so the
   * float fold is bit-reproducible independent of token order and of
   * either engine's aggregate ordering (the textLmScore discipline;
   * r15 review hardened this from an unordered SQL sum). O(tokens)
   * hash probes + O(buckets) fold per row. */
  def score(toks: ArrayData, m: QualityWeights): Double = {
    val d = m.w.length
    val mask = d - 1
    val cnt = new Array[Long](d)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      cnt((SimHash64.hash64(t) & mask).toInt) += 1
      if (i + 1 < n) {
        val bg = UTF8String.concat(t, Space, toks.getUTF8String(i + 1))
        cnt((SimHash64.hash64(bg) & mask).toInt) += 1
      }
      i += 1
    }
    var s = 0.0
    var j = 0
    while (j < d) {
      if (cnt(j) != 0) s += cnt(j) * m.w(j)
      j += 1
    }
    s + m.bias
  }
}

/** `quality_score(toks)`: raw linear score (pre-sigmoid) of a
 * whitespace-token array under the fitted hashed-n-gram model. The
 * sigmoid stays a built-in Column expression on top — transparent to
 * Catalyst and identical SQL on the oracle side. */
case class QualityScore(child: Expression, model: QualityWeights)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override protected def nullSafeEval(input: Any): Any =
    QualityKernels.score(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = QualityKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val m = ctx.addReferenceObj("qualityWeights", model,
      classOf[QualityWeights].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.score($c, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

object QualityScoreFunctions {
  def quality_score(toks: Column, model: QualityWeights): Column =
    GraftSqlBridge.column(QualityScore(GraftSqlBridge.expression(toks), model))
}
