package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Mergeable rank/quantile sketch as a typed [[Aggregator]] — the third
 * member of this repo's bounded-state sketch trio ([[KmvDistinct]]:
 * cardinality, [[MisraGries]]: heavy hitters, this: ranks/quantiles),
 * the profiling aggregate a 100 TB ANALYZE pass needs where the exact
 * `percentile()` buffers every group value in memory.
 *
 * The compactor ladder of KLL (Karnin, Lang, Liberty, "Optimal Quantile
 * Approximation in Streams", FOCS'16) in its deterministic MRL-style
 * form (Manku, Rajagopalan, Lindsay, SIGMOD'98): level l holds a sorted
 * buffer of items each standing for 2^l input rows; an over-full level
 * sort-compacts to every other item at doubled weight, cascading up.
 * Two deliberate deviations from randomized KLL:
 *
 *  - compaction keeps items by a deterministic alternating parity, not
 *    a random coin. The coin buys a better EXPECTED-error constant; it
 *    does not improve the worst-case bound, and a reproducible sketch
 *    is what an oracle-checked engine wants.
 *  - the buffer carries `err`: the exact sum, over every compaction
 *    performed so far, of the weight compacted at. One compaction at
 *    weight w moves any value's weighted rank by at most w, and the
 *    shifts are additive across compactions and merges — in WHATEVER
 *    order Spark merges partition partials — so for every value v,
 *    |sketchRank(v) − trueRank(v)| ≤ err, unconditionally. That hard
 *    certificate is what lets the percentile query turn the sketch
 *    into EXACT answers (sketch → certified value window → in-window
 *    exact selection), with the certificate re-verified against exact
 *    counts at runtime.
 *
 * State: one unsorted weight-1 append buffer + sorted levels, all of
 * capacity 2k → O(k·log(n/k)) doubles per group. err grows ≈ n·L/(2k)
 * over L ≈ log2(n/(2k)) levels (k=1024, n=2M: ~0.6% of n). With n ≤ 2k
 * the sketch never compacts: err = 0 and every rank is exact.
 */
final case class KllBuf(
    var n0: Int,                      // fill of buf0
    var buf0: Array[Double],          // unsorted, weight 1, capacity 2k
    var levels: Array[Array[Double]], // levels(i): sorted, weight 2^(i+1)
    var err: Long,                    // exact accumulated compaction weight
    var n: Long,                      // total rows folded in
    var parity: Int)                  // alternating compaction offset

/** Flattened sketch: `values` sorted ascending with `ranks(i)` = total
 * weight of sketch items before item i (the rank ESTIMATE of values(i),
 * certified within ±err of the true rank among the n inputs). */
final case class KllSummary(
    values: Array[Double], ranks: Array[Long], err: Long, n: Long)

class KllRankSketch(k: Int) extends Aggregator[Double, KllBuf, KllSummary] {
  require(k >= 8, s"k >= 8, got $k")
  private val cap = 2 * k

  override def zero: KllBuf =
    KllBuf(0, new Array[Double](cap), Array.empty, 0L, 0L, 0)

  override def reduce(b: KllBuf, a: Double): KllBuf = {
    if (b.n0 == cap) compact0(b)
    b.buf0(b.n0) = a
    b.n0 += 1
    b.n += 1
    b
  }

  /** Keep every other item of an EVEN-length sorted run, alternating the
   * start offset between compactions (the deterministic stand-in for
   * KLL's coin — consecutive compactions cancel rather than compound
   * their one-sided drift; the err certificate never relies on it). */
  private def alternate(b: KllBuf, sorted: Array[Double], from: Int): Array[Double] = {
    val start = from + (b.parity & 1)
    b.parity += 1
    val out = new Array[Double]((sorted.length - from) / 2)
    var i = start
    var j = 0
    while (j < out.length) { out(j) = sorted(i); j += 1; i += 2 }
    out
  }

  /** Sort-compact the full weight-1 buffer into the level ladder. */
  private def compact0(b: KllBuf): Unit = {
    val arr = java.util.Arrays.copyOf(b.buf0, b.n0)
    java.util.Arrays.sort(arr)
    b.err += 1L // one compaction at weight 1 (cap is even, no remainder)
    push(b, alternate(b, arr, 0), 0)
    b.n0 = 0
  }

  /** Merge the sorted `incoming` into levels(li), compacting upward
   * while over capacity. A level compaction keeps an odd remainder
   * in place (only an even count may halve) and adds its weight,
   * 2^(li+1), to the err certificate. */
  private def push(b: KllBuf, incoming: Array[Double], li: Int): Unit = {
    var arr = incoming
    var l = li
    while (arr.length > 0) {
      // extend PAST the current top when merging a taller sketch's
      // level directly into a shorter ladder
      if (l >= b.levels.length)
        b.levels = java.util.Arrays.copyOf(b.levels, l + 1)
      val merged =
        if (b.levels(l) == null || b.levels(l).isEmpty) arr
        else mergeSorted(b.levels(l), arr)
      if (merged.length <= cap) {
        b.levels(l) = merged
        arr = Array.empty
      } else {
        val r = merged.length & 1
        b.levels(l) = java.util.Arrays.copyOfRange(merged, 0, r)
        b.err += (1L << (l + 1))
        arr = alternate(b, merged, r)
        l += 1
      }
    }
  }

  private def mergeSorted(a: Array[Double], c: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length + c.length)
    var i = 0; var j = 0; var o = 0
    while (i < a.length && j < c.length) {
      if (a(i) <= c(j)) { out(o) = a(i); i += 1 } else { out(o) = c(j); j += 1 }
      o += 1
    }
    while (i < a.length) { out(o) = a(i); i += 1; o += 1 }
    while (j < c.length) { out(o) = c(j); j += 1; o += 1 }
    out
  }

  override def merge(b1: KllBuf, b2: KllBuf): KllBuf = {
    // fold b2's raw buffer through reduce's path without re-counting n
    var i = 0
    while (i < b2.n0) {
      if (b1.n0 == cap) compact0(b1)
      b1.buf0(b1.n0) = b2.buf0(i)
      b1.n0 += 1
      i += 1
    }
    var l = 0
    while (l < b2.levels.length) {
      if (b2.levels(l) != null && b2.levels(l).nonEmpty)
        push(b1, b2.levels(l), l)
      l += 1
    }
    b1.n += b2.n
    b1.err += b2.err
    b1
  }

  override def finish(b: KllBuf): KllSummary = {
    // flatten to (value, weight), sort by value, prefix-sum the weights
    val total = b.n0 + b.levels.iterator.map(a => if (a == null) 0 else a.length).sum
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    var o = 0
    var i = 0
    while (i < b.n0) { vs(o) = b.buf0(i); ws(o) = 1L; o += 1; i += 1 }
    var l = 0
    while (l < b.levels.length) {
      val arr = b.levels(l)
      if (arr != null) {
        var j = 0
        while (j < arr.length) { vs(o) = arr(j); ws(o) = 1L << (l + 1); o += 1; j += 1 }
      }
      l += 1
    }
    // index sort by value (stable order irrelevant: ranks only prefix-sum)
    val idx = (0 until total).sortBy(vs(_))(Ordering.Double.TotalOrdering).toArray
    val values = new Array[Double](total)
    val ranks = new Array[Long](total)
    var acc = 0L
    var p = 0
    while (p < total) {
      values(p) = vs(idx(p))
      ranks(p) = acc
      acc += ws(idx(p))
      p += 1
    }
    KllSummary(values, ranks, b.err, b.n)
  }

  override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  override def outputEncoder: Encoder[KllSummary] = Encoders.product[KllSummary]
}

object KllRankSketch {

  /** Largest sketch value CERTIFIED ≤ the k0-th order statistic
   * (0-indexed): sketchRank + err ≤ k0 ⇒ trueRank(v) ≤ k0 ⇒ at most k0
   * inputs are < v ⇒ v ≤ x₍k0₎. Falls back to the group minimum (always
   * a sound lower edge). */
  def lowerBound(s: KllSummary, k0: Long, mn: Double): Double = {
    var best = mn
    var i = 0
    while (i < s.values.length) {
      if (s.ranks(i) + s.err <= k0) best = s.values(i) // ascending: keep last
      i += 1
    }
    best
  }

  /** Smallest sketch value CERTIFIED ≥ the (k0+1)-th order statistic:
   * sketchRank − err ≥ k0 + 2 ⇒ at least k0+2 inputs are < v ⇒
   * x₍k0+1₎ < v. Falls back to the group maximum.
   *
   * Tie discipline: only the FIRST occurrence of each distinct value
   * may certify. A duplicated sketch value's later entries carry
   * cumulative ranks that include the tie class ITSELF, so their
   * `rank − err` exceeds the true below-count by up to the class
   * weight — on a heavily-tied column that mis-certified the tied
   * value as an upper bound (caught by the percentile query's exact
   * runtime certificate check, which exists for exactly this class of
   * bug). [[lowerBound]] needs no such guard: later duplicates only
   * RAISE rank + err, making its condition strictly harder — any
   * qualifying occurrence is sound. */
  def upperBound(s: KllSummary, k0: Long, mx: Double): Double = {
    var i = 0
    while (i < s.values.length) {
      if ((i == 0 || s.values(i) != s.values(i - 1)) &&
        s.ranks(i) - s.err >= k0 + 2)
        return s.values(i) // ascending first-occurrence scan: smallest wins
      i += 1
    }
    mx
  }
}
