package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SQL registration of the graft native expressions, so
 * `spark.sql("SELECT simhash64(...)")` works anywhere DataFrame code
 * does. Two activation paths over one table of builders:
 *
 *  - `spark.sql.extensions=graft.functions.GraftExtensions` (or
 *    `builder.withExtensions(new GraftExtensions)`) for new sessions —
 *    the standard SparkSessionExtensions hook;
 *  - `GraftExtensions.registerAll(spark)` for an existing session.
 *
 * Only function injection is needed — the operators deliberately require
 * no custom Rule/SparkStrategy (SURVEY §4): every plan is built from
 * Catalyst primitives, and these scalar kernels are the one place the
 * built-ins can't express the semantics efficiently.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq[(String, Seq[Expression] => Expression)](
      "rolling_hash" -> (args => RollingHash(args.head)),
      "simhash64" -> (args => SimHash64(args.head)),
      "shingle_hashes" ->
        (args => ShingleHashes(args.head, intArg(args(1), "shingle_hashes(n)"))),
      "minhash_bands" ->
        (args => MinHashBands(args.head,
          intArg(args(1), "minhash_bands(bands)"),
          intArg(args(2), "minhash_bands(rows)"))),
      "cosine_sim" -> (args => CosineSim(args.head, args(1))),
      "morton2" -> (args => Morton2(args.head, args(1))),
      "hyperplane_bucket" ->
        (args => HyperplaneBucket(args.head,
          intArg(args(1), "hyperplane_bucket(planes)")))
    ).map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder)
    }

  /** Register into an already-created session. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
