package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
 * frequent-items counterpart of [[KmvDistinct]]: at most `k` (term,
 * count) pairs of state per group, mergeable across partitions
 * (map-side partial aggregation applies), one pass.
 *
 * The buffer is a hash map (immutable HAMT — effectively O(1)
 * lookup/update per token), so `reduce` costs O(1) amortized: the
 * only O(k) step is the decrement-all eviction, which classic MG
 * analysis bounds at N/(k+1) triggers over N tokens — total work
 * stays O(N) regardless of how large a corpus-derived k grows.
 * (The previous array-backed buffer paid an O(k) `indexOf` plus a
 * counts-array clone on EVERY token — per-token cost grew linearly
 * with k, at odds with corpus-proportional sizing.)
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
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, s"k >= 2 (got $k)")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    b.get(term) match {
      case Some(c) => b.updated(term, c + 1L)
      case None if b.size < k => b.updated(term, 1L)
      case None =>
        // MG step: decrement every counter, drop the zeroed ones (the
        // incoming term is implicitly discarded with them)
        b.iterator.map { case (t, c) => (t, c - 1L) }.filter(_._2 > 0L).toMap
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val m = b1.foldLeft(b2) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count from all, keep positives
      val cut = m.valuesIterator.toArray.sorted(Ordering.Long.reverse).apply(k)
      m.iterator.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
