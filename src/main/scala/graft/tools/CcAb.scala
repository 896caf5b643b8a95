package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch in-session A/B (r22, VERDICT #6): the OLD connected-components
 * round shape (per step: edge⋈label join + min aggregate + LEFT join
 * back + checkpoint + changed-count action) against the new one
 * (self-loop edges fold the left join into the aggregate; two
 * propagation steps per checkpoint + one decimal label-sum probe).
 * Both run over the SAME materialized LSH pair frame, interleaved;
 * results asserted identical.
 *
 * Usage: runMain graft.tools.CcAb [sfDir] [reps]
 */
object CcAb {

  /** The pre-r22 loop, verbatim shape. */
  def oldCc(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val a = col("a"); val b = col("b")
    val e0 = edges.toDF("a", "b").localCheckpoint()
    val sym = e0
      .union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(eager = false)
    var labels = sym.select(a.as("id")).distinct()
      .withColumn("label", col("id"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = sym.join(labels, sym("b") === labels("id"))
        .groupBy(a.as("nid")).agg(min("label").as("nlabel"))
      val merged = labels.join(prop, labels("id") === prop("nid"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("next"))
        .localCheckpoint(eager = false)
      changed = merged.filter(col("next") < col("label")).count()
      labels = merged.select(col("id"), col("next").as("label"))
      i += 1
    }
    require(changed == 0, s"oldCc did not converge in $maxIter rounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Variant lab: self-loop propagation with a configurable number of
   * steps per checkpoint+probe round (1 isolates the left-join removal;
   * 2 is the wired shape; 3 tests deeper batching). */
  def loopCc(edges: DataFrame, stepsPerRound: Int, maxIter: Int = 50): DataFrame = {
    val a = col("a"); val b = col("b")
    val e0 = edges.toDF("a", "b").localCheckpoint()
    val sym = e0
      .union(e0.select(b.as("a"), a.as("b")))
      .union(e0.select(a, a.as("b")))
      .union(e0.select(b.as("a"), b))
      .distinct().localCheckpoint(eager = false)
    var labels = sym.select(a.as("id")).distinct()
      .withColumn("label", col("id"))
    def step(lbl: DataFrame): DataFrame =
      sym.join(lbl, sym("b") === lbl("id"))
        .groupBy(a.as("id")).agg(min("label").as("label"))
    def labelSum(lbl: DataFrame): java.math.BigDecimal = {
      val r = lbl.agg(sum(col("label").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var steps = 0
    while (!converged && steps < maxIter) {
      val merged = (1 to stepsPerRound).foldLeft(labels)((l, _) => step(l))
        .localCheckpoint(eager = false)
      val newSum = labelSum(merged)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      labels = merged
      steps += stepsPerRound
    }
    require(converged, s"loopCc($stepsPerRound) did not converge")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    // pairs materialized once: the A/B times the PROPAGATION, the part
    // the r22 change touches (pair generation is dedup_minhash_lsh's
    // own bench line)
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    val n = pairs.count()
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "old" -> (() => oldCc(pairs)),
      "wired" -> (() => Dedup.connectedComponents(pairs)),
      "sl1" -> (() => loopCc(pairs, 1)),
      "sl3" -> (() => loopCc(pairs, 3)))
    def run(f: () => DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val k = f().select("cluster_id").distinct().count()
      (k, (System.nanoTime() - t0) / 1e9)
    }
    // results must be identical before anything is timed
    val expect = oldCc(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    variants.foreach { case (v, f) =>
      val got = f().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      require(got == expect, s"$v labeling differs: ${got.size} vs ${expect.size}")
    }
    variants.foreach { case (_, f) => run(f) } // warm untimed
    val results = (1 to reps).flatMap(_ => variants.map {
      case (v, f) => v -> run(f)
    })
    variants.foreach { case (v, _) =>
      val ts = results.collect { case (`v`, (_, t)) => t }.sorted
      println(f"[cc-ab] $v%-5s pairs=$n propagation+count median=${
        ts(ts.size / 2)}%.3fs (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
