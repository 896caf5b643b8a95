package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k, ~1/sqrt(k) accuracy above") {
    val kmv = udaf(new KmvDistinct(256))
    spark.udf.register("kmv_distinct", kmv)
    // 150 distinct < k: exact
    val small = (1 to 10000).map(i => (i % 150).toLong).toDF("v")
    assert(small.agg(kmv(col("v"))).head().getLong(0) == 150L)
    // 20k distinct > k: within 3 standard errors (~6.3% at k=256 — one
    // fixed hash draw, not a distribution over runs)
    val big = (1 to 60000).map(i => (i % 20000).toLong * 2654435761L).toDF("v")
    val est = big.agg(kmv(col("v"))).head().getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.19, s"estimate $est")
  }

  test("duplicate-insensitive: kmv(multiset) == kmv(distinct set)") {
    // the property q_kmv_distinct's r21 rewrite rests on: pre-deduping
    // the keys before the aggregate cannot change the sketch, because
    // insert() keeps a SET of k-min hashes. Skewed duplication (value i
    // appears i times) + beyond-k cardinality so the estimate path runs.
    val kmv = udaf(new KmvDistinct(64))
    val multi = (1 to 400).flatMap(i => Seq.fill(i)(i.toLong * 2654435761L)).toDF("v")
    val dedup = (1 to 400).map(i => i.toLong * 2654435761L).toDF("v")
    assert(multi.agg(kmv(col("v"))).head().getLong(0) ==
      dedup.agg(kmv(col("v"))).head().getLong(0))
  }

  test("mergeability: partitioned aggregation equals single-partition") {
    val kmv = udaf(new KmvDistinct(64))
    val df = (1 to 5000).map(i => (i % 1000).toLong).toDF("v")
    val p1 = df.repartition(1).agg(kmv(col("v"))).head().getLong(0)
    val p32 = df.repartition(32).agg(kmv(col("v"))).head().getLong(0)
    assert(p1 == p32) // same k-min set regardless of partitioning
  }

  test("group-by usage over events") {
    val kmv = udaf(new KmvDistinct(128))
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = events.groupBy("event_type")
      .agg(kmv(col("user_id")).as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .collect()
    out.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      // exact mode whenever distinct users < k
      if (exact < 128) assert(est == exact)
      else assert(math.abs(est - exact.toDouble) / exact < 0.3)
    }
  }
}
