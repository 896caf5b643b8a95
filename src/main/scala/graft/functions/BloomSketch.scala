package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.types.{BooleanType, DataType}

/**
 * Bloom membership sketch as a typed [[Aggregator]] plus a codegen'd
 * probe expression — the third custom-aggregate extension alongside
 * [[KmvDistinct]] (cardinality) and [[MisraGries]] (frequency): a
 * fixed-size, mergeable SET-MEMBERSHIP summary.
 *
 * The 100 TB use is incremental dedup (see
 * [[graft.operators.Dedup.dedupIncremental]]): a historical corpus of
 * N fingerprints is summarized ONCE into m bits (mergeable across
 * partitions — map-side partial aggregation applies, the shuffle
 * carries m/64-long word arrays, never fingerprints), and each new
 * batch probes the summary row-locally instead of joining the full
 * history. The filter is one-sided: `mightContain` can err positive
 * (rate ~ (1-e^{-kn/m})^k, ~0.8% at 10 bits/element with k=7) but
 * NEVER negative, so a bloom-negative is proof of novelty and only
 * the positives need the exact confirm join — correctness cannot
 * depend on the FP rate, only the confirm-join size does.
 *
 * Bit positions use Kirsch–Mitzenmacher double hashing
 * (g_j = h1 + j·h2) over the avalanche-widened input, with h2 forced
 * odd so it generates all of the power-of-two bit space; build and
 * probe share [[BloomFilter.insert]]/[[BloomFilter.mightContain]], so
 * no-false-negatives holds by construction (property-tested anyway).
 *
 * Reference behavior target: the reconcile job summarizes "rows I
 * have seen" only via exact joins (MvSync.java:268-295); this is the
 * sub-linear summary form of that membership question for the LLM
 * dedup layer the brief adds.
 */
object BloomFilter extends Serializable {

  /** Set the k double-hashed bits of raw hash `a` in `words`
   * (mutates). numBits = words.length * 64 must be a power of two. */
  def insert(words: Array[Long], a: Long, k: Int): Unit = {
    val mask = (words.length << 6) - 1
    val h1 = ShingleHash.avalanche(a)
    val h2 = ShingleHash.avalanche(h1) | 1L
    var j = 0
    while (j < k) {
      val pos = ((h1 + j * h2) & Long.MaxValue).toInt & mask
      words(pos >>> 6) |= 1L << (pos & 63)
      j += 1
    }
  }

  /** True iff every double-hashed bit of raw hash `a` is set — may
   * false-positive, never false-negative for inserted values. */
  def mightContain(words: Array[Long], a: Long, k: Int): Boolean = {
    val mask = (words.length << 6) - 1
    val h1 = ShingleHash.avalanche(a)
    val h2 = ShingleHash.avalanche(h1) | 1L
    var j = 0
    while (j < k) {
      val pos = ((h1 + j * h2) & Long.MaxValue).toInt & mask
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      j += 1
    }
    true
  }
}

/** Aggregation buffer: the bloom's bit words (product-encodable, like
 * [[KmvBuf]]). */
final case class BloomBuf(words: Array[Long])

/**
 * `BloomAgg(numBits, numHashes)`: aggregate raw 64-bit hashes (callers
 * hash strings upstream with xxhash64, the [[KmvDistinct]] convention)
 * into a [[BloomBuf]]. State is a FIXED m/64-long array regardless of
 * input size; merge is bitwise OR (associative + commutative +
 * idempotent, so map-side partial aggregation and re-aggregation of
 * overlapping shards are both safe).
 */
class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, BloomBuf, BloomBuf] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    "numBits must be a power of two >= 64 (bit positions mask, not mod)")
  require(numHashes >= 1, "numHashes >= 1")

  override def zero: BloomBuf = BloomBuf(new Array[Long](numBits >>> 6))

  override def reduce(b: BloomBuf, a: Long): BloomBuf = {
    BloomFilter.insert(b.words, a, numHashes)
    b
  }

  override def merge(b1: BloomBuf, b2: BloomBuf): BloomBuf = {
    val w1 = b1.words
    val w2 = b2.words
    var i = 0
    while (i < w1.length) { w1(i) |= w2(i); i += 1 }
    b1
  }

  override def finish(r: BloomBuf): BloomBuf = r
  override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
  override def outputEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
}

/**
 * `bloom_might_contain(hash)`: row-local bloom probe. The bit words
 * are a MODEL PARAMETER riding into generated code as one
 * `ctx.addReferenceObj` slot (the [[CentroidAssign]] pattern): code
 * size is O(1) in m, the array is shared per task-binary — at the
 * demo m = 2¹⁷ bits that is 16 KB; histories past ~10⁹ fingerprints
 * outgrow one driver array and take the same hash-shard recipe as the
 * decon automaton ([[graft.operators.Curation]]): K blooms sharded by
 * fingerprint hash, the probe side partitioned by the same shard key.
 */
case class BloomMightContain(child: Expression, words: Array[Long],
    numHashes: Int) extends UnaryExpression {
  require(words.nonEmpty && numHashes >= 1,
    "bloom_might_contain needs a non-empty bloom model")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    BloomFilter.mightContain(words, input.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BloomFilter.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.mightContain($w, $c, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  def bloom_might_contain(c: Column, words: Array[Long], k: Int): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(c), words, k))
}
