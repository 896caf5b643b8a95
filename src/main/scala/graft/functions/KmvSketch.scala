package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * K-Minimum-Values distinct-count sketch as a typed [[Aggregator]] — the
 * custom-aggregate extension path (SURVEY §7.3) for cardinality at scale:
 * fixed k·8-byte state per group regardless of input size, mergeable
 * across partitions (map-side partial aggregation applies), one pass.
 *
 * Estimator: keep the k smallest distinct 64-bit hashes (unsigned
 * order). With fewer than k distinct hashes the count is EXACT; beyond
 * that, if the k-th smallest maps to fraction u ∈ (0,1) of the hash
 * space, the density estimate is (k-1)/u, with relative error
 * ~ 1/√(k-2) (Beyer et al., "On Synopses for Distinct-Value Estimation
 * Under Multiset Operations", SIGMOD'07).
 *
 * Input values are avalanche-hashed here, so callers aggregate raw
 * Long keys (hash strings upstream with xxhash64).
 */
final case class KmvBuf(hs: Array[Long])

class KmvDistinct(k: Int) extends Aggregator[Long, KmvBuf, Long] {
  require(k >= 4, "k >= 4")

  override def zero: KmvBuf = KmvBuf(Array.empty)

  private def insert(sorted: Array[Long], h: Long): Array[Long] = {
    // unsigned-order sorted ascending; keep k smallest, no duplicates
    val key = h ^ Long.MinValue // flip sign bit: signed order == unsigned
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < key) lo = mid + 1 else hi = mid
    }
    if (lo < sorted.length && sorted(lo) == key) sorted
    else if (sorted.length >= k && lo >= k) sorted
    else {
      val n = math.min(sorted.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(sorted, 0, out, 0, lo)
      out(lo) = key
      System.arraycopy(sorted, lo, out, lo + 1, n - lo - 1)
      out
    }
  }

  override def reduce(b: KmvBuf, a: Long): KmvBuf =
    KmvBuf(insert(b.hs, ShingleHash.avalanche(a)))

  override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = {
    var acc = b1.hs
    var i = 0
    while (i < b2.hs.length) {
      acc = insert(acc, b2.hs(i) ^ Long.MinValue) // undo key-flip for insert
      i += 1
    }
    KmvBuf(acc)
  }

  override def finish(b: KmvBuf): Long =
    if (b.hs.length < k) b.hs.length.toLong
    else {
      // k-th smallest back to unsigned fraction of the hash space
      val kth = b.hs(k - 1) ^ Long.MinValue
      val u = ((kth >>> 11).toDouble + 0.5) / (1L << 53).toDouble
      math.round((k - 1).toDouble / u)
    }

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
