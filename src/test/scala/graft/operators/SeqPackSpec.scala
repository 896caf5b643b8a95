package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed prefix sum must equal the single-window definition
 * under ANY input partitioning (the partition-boundary offsets cancel),
 * and contiguous packing must assign each doc the bin of its first
 * token. */
class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  test("runningTotal matches the sequential definition under any partitioning") {
    val rows = (1L to 1000L).map(i => (i, i % 17 + 1))
    val expected = rows.scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
      .drop(1).toMap
    for (parts <- Seq(1, 3, 16); blockSize <- Seq(7L, 64L, 1L << 16)) {
      val df = rows.toDF("doc_id", "n").repartition(parts)
      val got = SeqPack.runningTotal(df, "doc_id", "n", "running", blockSize)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("running")).toMap
      assert(got == expected, s"mismatch at parts=$parts blockSize=$blockSize")
    }
  }

  test("packContiguous assigns the bin of the first token; straddlers keep their start bin") {
    // capacity 10; docs of 4 tokens each: doc 3 starts at token 8 (bin 0)
    // and straddles into bin 1 — it must report bin 0
    val d = (1L to 5L).map(i => (i, Seq.fill(4)("t").mkString(" "))).toDF("doc_id", "text")
    val out = SeqPack.packContiguous(d, 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      1L -> ((4L, 0L)), 2L -> ((8L, 0L)), 3L -> ((12L, 0L)),
      4L -> ((16L, 1L)), 5L -> ((20L, 1L))))
  }
}
