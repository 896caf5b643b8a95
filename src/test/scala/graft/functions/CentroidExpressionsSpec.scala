package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The centroid-assign/top-k kernels (reference-object centroid matrix —
 * the scale replacement for the r9 literal-centroid expression tree).
 * Checked against an independently-computed cosine argmax, including the
 * oracle's tie-break (cos desc, cid asc) and the zero-vector NaN case.
 */
class CentroidExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val matrix: Array[Array[Float]] = Array(
    Array(1f, 0f, 0f),
    Array(0f, 1f, 0f),
    Array(2f, 0f, 0f)) // colinear with centroid 0 → exact cosine tie
  private val cids: Array[Int] = Array(3, 7, 9) // non-contiguous on purpose

  test("centroid_assign picks the highest-cosine centroid") {
    val df = Seq(
      (1L, Array(0.1f, 0.9f, 0f)), // closest to (0,1,0) → cid 7
      (2L, Array(0.9f, 0.1f, 0f))) // closest to x-axis → tie 3 vs 9 → 3
      .toDF("id", "v")
    val out = df.select(col("id"),
        VectorFunctions.centroid_assign(col("v"), matrix, cids).as("cid"))
      .orderBy("id").as[(Long, Int)].collect()
    assert(out === Array((1L, 7), (2L, 3)))
  }

  test("tie between colinear centroids goes to the lowest cid") {
    // v colinear with centroids 0 and 2 (cids 3 and 9): cosine is exactly
    // 1.0 for both, so the winner must be the lower cid
    val out = Seq(Tuple1(Array(5f, 0f, 0f))).toDF("v")
      .select(VectorFunctions.centroid_assign(col("v"), matrix, cids))
      .as[Int].head()
    assert(out === 3)
  }

  test("zero vector (all-NaN cosines) falls back to the lowest cid") {
    // matches the r9 literal form: a NaN score sorts greatest in Spark's
    // total order, so an all-NaN row lands on the first (lowest) cid
    val out = Seq(Tuple1(Array(0f, 0f, 0f))).toDF("v")
      .select(VectorFunctions.centroid_assign(col("v"), matrix, cids))
      .as[Int].head()
    assert(out === 3)
  }

  test("an index with more than 63 planes is rejected (bucket shifts would wrap)") {
    val m = Array(Array(1f, 0f), Array(0f, 1f))
    val e = intercept[IllegalArgumentException] {
      graft.functions.CentroidIndex.build(m, Array(1, 2), numPlanes = 64)
    }
    assert(e.getMessage.contains("[0, 63]"))
    // 63 itself is the legal ceiling
    graft.functions.CentroidIndex.build(m, Array(1, 2), numPlanes = 63): Unit
  }

  test("an empty centroid model is rejected at construction") {
    // the r9 literal form silently yielded null cids on an empty model;
    // the kernel fails fast with a diagnosable message instead
    val e = intercept[IllegalArgumentException] {
      VectorFunctions.centroid_assign(col("v"),
        Array.empty[Array[Float]], Array.empty[Int])
    }
    assert(e.getMessage.contains("non-empty centroid model"))
  }

  test("null embedding yields null cid") {
    val out = Seq(Tuple1(Option.empty[Array[Float]])).toDF("v")
      .select(VectorFunctions.centroid_assign(col("v"), matrix, cids))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("centroid_topk orders by (cosine desc, cid asc) and clamps k") {
    val v = Array(0.9f, 0.1f, 0f)
    // cosines: cid 3 and 9 tie at the top (colinear), cid 7 last
    val top2 = Seq(Tuple1(v)).toDF("v")
      .select(VectorFunctions.centroid_topk(col("v"), matrix, cids, 2))
      .as[Seq[Int]].head()
    assert(top2 === Seq(3, 9))
    val topAll = Seq(Tuple1(v)).toDF("v")
      .select(VectorFunctions.centroid_topk(col("v"), matrix, cids, 10))
      .as[Seq[Int]].head()
    assert(topAll === Seq(3, 9, 7)) // k clamped to C
  }

  test("indexed assign with full bucket coverage equals the exact argmax") {
    // numPlanes = 0 → every centroid lands in bucket 0 and the single
    // probe covers the whole set, so the pruned path must reproduce the
    // exact kernel bit-for-bit (incl. tie + NaN ordering)
    val cents: Array[Array[Float]] = Array.tabulate(8) { c =>
      Array.tabulate(16)(d => VectorKernels.planeComponent(c, d).toFloat)
    }
    val ids = Array.tabulate(8)(_ + 1)
    val index = CentroidIndex.build(cents, ids, numPlanes = 0)
    val vecs = (0 until 200).map { id =>
      (id.toLong, Array.tabulate(16)(d => ((id * 31 + d * 17) % 11 - 5).toFloat))
    } :+ ((200L, Array.fill(16)(0f))) // zero vector: NaN fallback path
    val df = vecs.toDF("id", "v")
    val mismatches = df.select(col("id"),
        VectorFunctions.centroid_assign(col("v"), cents, ids).as("exact"),
        CentroidIndexFunctions.centroid_assign_indexed(col("v"), index).as("pruned"))
      .filter(col("exact") =!= col("pruned")).count()
    assert(mismatches === 0)
  }

  test("indexed assign maps a centroid's own vector to its own cid") {
    val cents: Array[Array[Float]] = Array.tabulate(8) { c =>
      Array.tabulate(16)(d => VectorKernels.planeComponent(c + 3, d).toFloat)
    }
    val ids = Array.tabulate(8)(_ + 1)
    val index = CentroidIndex.build(cents, ids, numPlanes = 6)
    val df = cents.zip(ids).map { case (v, cid) => (cid, v) }.toSeq.toDF("cid", "v")
    val wrong = df.select(col("cid"),
        CentroidIndexFunctions.centroid_assign_indexed(col("v"), index).as("got"))
      .filter(col("cid") =!= col("got")).count()
    assert(wrong === 0)
  }

  test("kernel argmax agrees with a per-centroid cosine_sim argmax") {
    // 200 hash-derived vectors vs an 8-centroid matrix: the kernel must
    // equal an argmax computed through the independent CosineSim kernel
    // with explicit (cos desc, cid asc) struct ordering
    val cents: Array[Array[Float]] = Array.tabulate(8) { c =>
      Array.tabulate(16)(d =>
        VectorKernels.planeComponent(c, d).toFloat)
    }
    val ids = Array.tabulate(8)(_ + 1)
    val vecs = (0 until 200).map { id =>
      (id.toLong, Array.tabulate(16)(d => ((id * 31 + d * 17) % 11 - 5).toFloat))
    }.toDF("id", "v")
    val viaStructs = vecs.select(col("id"), array_min(array(
      cents.zip(ids).map { case (cv, cid) =>
        struct((-VectorFunctions.cosine_sim(col("v"),
          typedlit(cv.toSeq))).as("ns"), lit(cid).as("cid"))
      }: _*)).getField("cid").as("expected"))
    val viaKernel = vecs.select(col("id"),
      VectorFunctions.centroid_assign(col("v"), cents, ids).as("got"))
    val joined = viaStructs.join(viaKernel, "id")
      .filter(col("expected") =!= col("got")).count()
    assert(joined === 0)
  }
}
