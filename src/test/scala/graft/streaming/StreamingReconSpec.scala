package graft.streaming

import graft.SparkSpec
import graft.operators.ReconQueries
import graft.reconcile.AllTypesFixture
import org.apache.spark.sql.functions._

/**
 * The streaming monitor must agree with the batch reconciler — the
 * batch all-types classification is DuckDB-oracle-checked
 * (recon_classify_alltypes), so replay equivalence transitively
 * oracle-checks the stateful streaming path, including the per-type
 * canonicalization it shares with the batch expressions.
 */
class StreamingReconSpec extends SparkSpec {

  private type KeyFacts = (String, Option[String], Option[String], Option[String])

  test("streaming monitor converges to the oracle-green batch classification") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-recon-stream").toString
    val baseDir = s"$tmp/base"
    val mvDir = s"$tmp/mv"
    val baseDf = AllTypesFixture.base(spark)
    val mvDf = AllTypesFixture.mv(spark)
    baseDf.coalesce(1).write.parquet(baseDir)
    mvDf.coalesce(1).write.parquet(mvDir)

    val updates = StreamingReconciler.monitor(
      spark.readStream.schema(baseDf.schema).parquet(baseDir),
      spark.readStream.schema(mvDf.schema).parquet(mvDir),
      AllTypesFixture.schema, AllTypesFixture.schema).toDF()

    val q = updates.writeStream.outputMode("update")
      .format("memory").queryName("recon_updates").start()
    try {
      q.processAllAvailable()

      // current state = max-seq update per key
      def current(): Map[String, KeyFacts] =
        spark.table("recon_updates").collect()
          .groupBy(_.getAs[String]("key"))
          .map { case (k, rows) =>
            val last = rows.maxBy(_.getAs[Long]("seq"))
            k -> ((last.getAs[String]("problem"),
              Option(last.getAs[String]("mismatch_col")),
              Option(last.getAs[String]("mismatch_base")),
              Option(last.getAs[String]("mismatch_mv"))))
          }

      val got = current()
      val want: Map[String, KeyFacts] =
        ReconQueries.reconClassifyAllTypes(spark, "").collect()
          .map(r => r.getAs[Long]("id").toString ->
            ((r.getAs[String]("problem"),
              Option(r.getAs[String]("mismatch_col")),
              Option(r.getAs[String]("mismatch_base")),
              Option(r.getAs[String]("mismatch_mv"))))).toMap
      assert(got == want)

      // incremental batch: the MV image of key 11 (a c_map INCONSISTENT)
      // is corrected to the base image — only that key re-classifies
      AllTypesFixture.base(spark).filter(col("id") === 11)
        .coalesce(1).write.mode("append").parquet(mvDir)
      q.processAllAvailable()
      val after = current()
      assert(after("11")._1 == graft.reconcile.MvReconciler.Consistent)
      assert((after - "11") == (got - "11"))
    } finally q.stop()
  }

  test("CDC contract: versions order out-of-order updates, tombstones orphan") {
    import graft.reconcile.MvReconciler._
    val schema = AllTypesFixture.schema
    val two = AllTypesFixture.base(spark).filter(col("id").isin(1, 2))
    // base feed delivers, in REVERSED order: v2 (the true image for id=1,
    // a tombstone for id=2) before a stale v1 image with corrupted text —
    // version wins over arrival order, and the tombstone must not be
    // resurrected by the late v1 image
    val v1 = two.withColumn("c_text", lit("stale"))
      .withColumn("_version", lit(1L)).withColumn("_deleted", lit(false))
    val v2 = two.withColumn("_version", lit(2L))
      .withColumn("_deleted", col("id") === 2)
    val baseFeed = v2.unionByName(v1)
    val mvFeed = AllTypesFixture.mv(spark).filter(col("id").isin(1, 2)) // no _version → 0
    val out = StreamingReconciler.monitor(baseFeed, mvFeed, schema, schema)
      .collect().map(u => u.key -> u.problem).toMap
    // id=1: the v2 true image wins → consistent despite the stale v1
    assert(out("1") == Consistent)
    // id=2: base tombstoned at v2 → its MV row is an orphan
    assert(out("2") == MissingInBase)
  }

  test("equal-version records in one batch resolve independent of arrival order") {
    import graft.reconcile.MvReconciler._
    val schema = AllTypesFixture.schema
    val one = AllTypesFixture.base(spark).filter(col("id") === 1)
    // two base images for the SAME key at the SAME version, differing in
    // c_text — a writetime tie. Cassandra breaks write ties by value
    // (lexically larger wins), so 'zzz' must win in BOTH delivery orders.
    val aaa = one.withColumn("c_text", lit("aaa")).withColumn("_version", lit(5L))
    val zzz = one.withColumn("c_text", lit("zzz")).withColumn("_version", lit(5L))
    val mvFeed = one // MV holds the original image → mismatch on c_text
    def run(baseFeed: org.apache.spark.sql.DataFrame) =
      StreamingReconciler.monitor(baseFeed, mvFeed, schema, schema)
        .collect().map(u => (u.problem, u.mismatch_base)).head
    val fwd = run(aaa.unionByName(zzz))
    val rev = run(zzz.unionByName(aaa))
    assert(fwd == rev)
    assert(fwd == ((Inconsistent, Some("zzz"))))

    // a tombstone at the same version beats the write, either order
    val dead = one.withColumn("_version", lit(5L)).withColumn("_deleted", lit(true))
    val live = one.withColumn("_version", lit(5L)).withColumn("_deleted", lit(false))
    def runDel(baseFeed: org.apache.spark.sql.DataFrame) =
      StreamingReconciler.monitor(baseFeed, mvFeed, schema, schema)
        .collect().map(_.problem).head
    assert(runDel(dead.unionByName(live)) == MissingInBase)
    assert(runDel(live.unionByName(dead)) == MissingInBase)
  }

  test("cross-batch version ties apply the same tombstone/value rules") {
    import StreamingReconciler._
    def rec(v: String, version: Long, deleted: Boolean) =
      ChangeRecord("1", "base", Map("v" -> v), Map("v" -> v), version, deleted, null)
    def held(st: KeyState) = st.base.get
    val s0 = KeyState(None, None, 0L)
    // a tombstone and a write at the SAME version, split across two
    // micro-batches: the tombstone must win in BOTH splits, exactly as
    // it does when both land in one batch — batch partitioning must not
    // resurrect the delete
    val tomb = rec("x", 5L, deleted = true)
    val write = rec("x", 5L, deleted = false)
    assert(!held(mergeBatch(mergeBatch(s0, Seq(tomb)), Seq(write))).present)
    assert(!held(mergeBatch(mergeBatch(s0, Seq(write)), Seq(tomb))).present)
    // the lexical write-tie rule likewise holds across batches
    val a = mergeBatch(mergeBatch(s0, Seq(rec("zzz", 5L, false))), Seq(rec("aaa", 5L, false)))
    val b = mergeBatch(mergeBatch(s0, Seq(rec("aaa", 5L, false))), Seq(rec("zzz", 5L, false)))
    assert(held(a).canon("v") == "zzz" && held(b).canon("v") == "zzz")
    // versionless snapshot replay (all versions 0) keeps newest-batch-wins
    val snap = mergeBatch(mergeBatch(s0, Seq(rec("old", 0L, false))), Seq(rec("new", 0L, false)))
    assert(held(snap).canon("v") == "new")
  }

  test("ANY micro-batch partitioning of a versioned feed converges to the single-batch state") {
    import StreamingReconciler._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the delivery-order-independence claim (mergeBatch scaladoc): for
    // VERSIONED records (version >= 1), the settled per-key images must
    // not depend on how the feed is permuted or cut into micro-batches.
    // Small domains force frequent version ties, tombstone-vs-write ties
    // and duplicate records — the cases the r8 cross-batch fix covers.
    def rec(side: String, v: Long, value: String, deleted: Boolean) =
      ChangeRecord("k", side, Map("c" -> value), Map("c" -> value), v, deleted, null)
    val genRec = for {
      side <- Gen.oneOf("base", "mv")
      v <- Gen.choose(1L, 3L)
      value <- Gen.oneOf("a", "b", "c")
      deleted <- Gen.frequency(3 -> false, 1 -> true)
    } yield rec(side, v, value, deleted)
    def settle(batches: Seq[Seq[ChangeRecord]]): (Option[SideImage], Option[SideImage]) = {
      val st = batches.filter(_.nonEmpty)
        .foldLeft(KeyState(None, None, 0L))(mergeBatch)
      // seq counts batches; the images are the delivery-independent part
      (st.base, st.mv)
    }
    val genCase = for {
      recs <- Gen.nonEmptyListOf(genRec)
      seed <- Gen.choose(0L, Long.MaxValue)
      cuts <- Gen.listOfN(math.max(recs.size - 1, 0), Gen.oneOf(true, false))
    } yield (recs, seed, cuts)
    val prop = Prop.forAll(genCase) { case (recs, seed, cuts) =>
      val want = settle(Seq(recs))
      val shuffled = new scala.util.Random(seed).shuffle(recs)
      // cut the permuted feed into micro-batches at the generated points
      val batches = shuffled.tail.zip(cuts).foldLeft(List(List(shuffled.head))) {
        case (acc, (r, cut)) =>
          if (cut) List(r) :: acc else (r :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      settle(batches) == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("evicting monitor drops settled keys once the watermark passes retention") {
    import graft.reconcile.MvReconciler._
    import graft.schema.TableSchema
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val schema = TableSchema(pk = Seq("id"), types = Map("id" -> "BIGINT", "v" -> "TEXT"))
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val t0 = 1600000000000L
    val baseIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    val mvIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    def feed(s: MemoryStream[(Long, String, java.sql.Timestamp)]) =
      s.toDF().toDF("id", "v", "_event_ts").withWatermark("_event_ts", "0 seconds")

    val updates = StreamingReconciler.monitorEvicting(
      feed(baseIn), feed(mvIn), schema, schema, idleRetentionMs = 600000L).toDF()
    val q = updates.writeStream.outputMode("update")
      .format("memory").queryName("recon_evict").start()
    try {
      def rowsFor(key: String) =
        spark.table("recon_evict").filter(col("key") === key)
          .orderBy("seq").collect().map(_.getAs[String]("problem")).toSeq

      // batch 1: both keys present and consistent on both sides. The
      // two MemoryStreams are independent sources, so the engine MAY
      // split their offsets across micro-batches (observed under
      // parallel-suite load) — update mode then legitimately emits a
      // transient MISSING_IN_MV_TABLE before settling. Assert the
      // settled state, not the exact emission sequence.
      baseIn.addData((1L, "a", ts(t0)), (2L, "b", ts(t0)))
      mvIn.addData((1L, "a", ts(t0)), (2L, "b", ts(t0)))
      q.processAllAvailable()
      assert(rowsFor("1").last == Consistent && rowsFor("2").last == Consistent)

      // key 2 keeps changing on BOTH feeds (both watermarks advance);
      // key 1 goes idle. Timeouts fire against the PREVIOUS batch's
      // watermark, so the eviction lands one batch after the watermark
      // passes t0 + retention.
      baseIn.addData((2L, "b2", ts(t0 + 3600000L)))
      mvIn.addData((2L, "b", ts(t0 + 3600000L)))
      q.processAllAvailable()
      baseIn.addData((2L, "b3", ts(t0 + 7200000L)))
      mvIn.addData((2L, "b2", ts(t0 + 7200000L)))
      q.processAllAvailable()

      // key 1: settled consistent, then evicted exactly once, at the end
      val k1 = rowsFor("1")
      assert(k1.last == StreamingReconciler.Evicted)
      assert(k1.count(_ == StreamingReconciler.Evicted) == 1)
      assert(k1.dropRight(1).last == Consistent)
      // key 2 was never evicted and its last update reflects live state
      val k2 = rowsFor("2")
      assert(!k2.contains(StreamingReconciler.Evicted) && k2.last == Inconsistent)

      // re-activation: a FRESH record for the evicted key re-creates its
      // state, and its event-time-anchored seq out-ranks the terminal
      // EVICTED row — downstream max-seq compaction sees the new
      // classification, not the stale eviction marker
      baseIn.addData((1L, "a9", ts(t0 + 10800000L)))
      mvIn.addData((2L, "b3", ts(t0 + 10800000L)))
      q.processAllAvailable()
      val k1b = rowsFor("1") // ordered by seq — last is the compaction winner
      assert(k1b.last == MissingInMv)
      assert(k1b.contains(StreamingReconciler.Evicted))
    } finally q.stop()
  }

  test("evicting monitor state tracks the ACTIVE key set, not total keys seen") {
    import graft.schema.TableSchema
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The 100 TB claim quantified: 6 waves x 10 fresh keys each, waves
    // 120s apart in event time, retention 30s — a sliding active window.
    // Event-time timeouts fire against the PREVIOUS batch's watermark,
    // so a wave's keys evict two waves later; bounded-state means the
    // store holds O(active window + eviction lag), never all keys seen.
    val schema = TableSchema(pk = Seq("id"), types = Map("id" -> "BIGINT", "v" -> "TEXT"))
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val t0 = 1600000000000L
    val waveGapMs = 120000L
    val baseIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    val mvIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    def feed(s: MemoryStream[(Long, String, java.sql.Timestamp)]) =
      s.toDF().toDF("id", "v", "_event_ts").withWatermark("_event_ts", "0 seconds")
    val updates = StreamingReconciler.monitorEvicting(
      feed(baseIn), feed(mvIn), schema, schema, idleRetentionMs = 30000L).toDF()
    val q = updates.writeStream.outputMode("update")
      .format("memory").queryName("recon_state_bound").start()
    try {
      def stateRows(): Long =
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).lastOption.getOrElse(-1L)
      val perWave = Seq.newBuilder[Long]
      for (wave <- 0 until 6) {
        val t = ts(t0 + wave * waveGapMs)
        val keys = (wave * 10) until (wave * 10 + 10)
        keys.foreach { k => baseIn.addData((k.toLong, s"v$wave", t)) }
        mvIn.addData((keys.head.toLong, s"v$wave", t)) // advance BOTH watermarks
        q.processAllAvailable()
        perWave += stateRows()
      }
      // two watermark-only flush batches so the tail waves' timeouts fire
      for (flush <- 0 until 2) {
        val t = ts(t0 + (6 + flush) * waveGapMs)
        baseIn.addData((1000L + flush, "flush", t))
        mvIn.addData((1000L + flush, "flush", t))
        q.processAllAvailable()
        perWave += stateRows()
      }
      val evicted = spark.table("recon_state_bound")
        .filter(col("problem") === StreamingReconciler.Evicted)
        .select("key").distinct().count()
      // 62 distinct keys flowed through; state never approached that —
      // it is bounded by active window (10) + two-wave eviction lag
      val maxState = perWave.result().max
      assert(maxState > 0 && maxState <= 30, s"state rows peaked at $maxState")
      assert(evicted >= 40, s"only $evicted keys evicted")
    } finally q.stop()
  }
}
