package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{column => _, _}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the text-analysis operators — scalar
 * hot-path functions implemented as `Expression`s (whole-stage-codegen
 * capable) rather than Scala UDFs, per the extension preference order
 * (custom Expression > UDF).
 */

/**
 * Polynomial rolling hash (Karp–Rabin) of a string's UTF-8 bytes:
 * `h = (h * 257 + byte) mod (2^31 - 1)` — the document-fingerprinting
 * primitive. Base/mod chosen so the accumulator stays < 2^40 (no
 * overflow, no BigInt). Full codegen via doGenCode: the generated loop
 * lives inside the WholeStageCodegen stage like a built-in.
 */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 257L + (bytes(i) & 0xffL)) % 2147483647L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 257L + ($bytes[$i] & 0xffL)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/**
 * 64-bit SimHash over an array of tokens: per token a 64-bit hash
 * (xxHash64-style avalanche of the rolling hash) votes ±1 on each bit;
 * the sign of each bit's tally forms the signature. Documents within a
 * small Hamming distance are near-duplicates.
 *
 * Single-pass per row, no shuffle, no per-bit aggregation columns — the
 * natural Expression shape for a 100 TB scan.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private def tokenHash(s: UTF8String): Long = SimHash64.hash64(s)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i))
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $cls.hash64($c.getUTF8String($i));
         |    for (int $k = 0; $k < 64; $k++) {
         |      if ((($h >>> $k) & 1L) == 1L) $votes[$k]++; else $votes[$k]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($votes[$k] > 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** 64-bit token hash: rolling hash widened through an xxHash64-style
   * avalanche (public-domain finalizer constants). */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L // FNV offset basis seed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L // FNV-1a step
      i += 1
    }
    // avalanche (xxHash64 finalizer)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
}

object TextFunctions {
  /** Column wrappers for the native expressions (Spark 4 Column ↔
   * Expression bridge). */
  def rolling_hash(c: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c)))
  def simhash64(c: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(c)))

  /** Whitespace tokenization (empty tokens dropped) — shared definition
   * across all text operators so Spark and oracle agree. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles as space-joined strings; empty when the doc has
   * fewer than n tokens.
   *
   * IMPORTANT: pass a *materialized* token column (an attribute from a
   * prior select), not a raw `tokens(...)` expression. `toks` appears
   * inside the transform lambda, and an inlined expression subtree there
   * is re-evaluated per output element — for a raw tokenizer that means
   * re-running the regex split once per shingle (measured 50× slowdown). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
