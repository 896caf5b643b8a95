package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
 * frequent-items counterpart of [[KmvDistinct]]: at most `k` (term,
 * count) pairs of state per group, mergeable across partitions
 * (map-side partial aggregation applies), one pass.
 *
 * Guarantees (Misra & Gries 1982; merge form Agarwal et al., "Mergeable
 * Summaries", PODS'12): every item with true frequency > N/(k+1)
 * survives in the sketch, and each kept counter undercounts its true
 * frequency by at most N/(k+1). Counts are merge-order-dependent, so
 * the sketch is a CANDIDATE FILTER, not a final answer — the wired
 * query ([[graft.operators.TextAnalysis.textHeavyHitters]]) recounts
 * the candidate set exactly, which restores determinism and lets the
 * result face a plain DuckDB oracle. Pick k so the query threshold
 * stays above N/(k+1) — at a larger corpus, scale k with N/threshold.
 */
final case class MgBuf(terms: Array[String], counts: Array[Long])

class MisraGries(k: Int) extends Aggregator[String, MgBuf, Map[String, Long]] {
  require(k >= 2, "k >= 2")

  override def zero: MgBuf = MgBuf(Array.empty, Array.empty)

  override def reduce(b: MgBuf, term: String): MgBuf = {
    val i = b.terms.indexOf(term)
    if (i >= 0) {
      val c = b.counts.clone(); c(i) += 1
      MgBuf(b.terms, c)
    } else if (b.terms.length < k) {
      MgBuf(b.terms :+ term, b.counts :+ 1L)
    } else {
      // MG step: decrement every counter, drop the zeroed ones
      val keep = b.counts.indices.filter(j => b.counts(j) > 1)
      MgBuf(keep.map(b.terms).toArray, keep.map(j => b.counts(j) - 1).toArray)
    }
  }

  override def merge(b1: MgBuf, b2: MgBuf): MgBuf = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    b1.terms.indices.foreach(i => m(b1.terms(i)) = m.getOrElse(b1.terms(i), 0L) + b1.counts(i))
    b2.terms.indices.foreach(i => m(b2.terms(i)) = m.getOrElse(b2.terms(i), 0L) + b2.counts(i))
    if (m.size <= k) MgBuf(m.keys.toArray, m.values.toArray)
    else {
      // subtract the (k+1)-th largest count from all, keep positives
      val cut = m.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val kept = m.iterator.map { case (t, c) => (t, c - cut) }
        .filter(_._2 > 0).toArray
      MgBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  override def finish(b: MgBuf): Map[String, Long] =
    b.terms.indices.map(i => b.terms(i) -> b.counts(i)).toMap

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
