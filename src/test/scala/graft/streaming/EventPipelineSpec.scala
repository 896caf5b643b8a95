package graft.streaming

import graft.SparkSpec
import graft.operators.RelationalQueries
import org.apache.spark.sql.functions._

/** Streaming pipelines must agree with their batch counterparts — the
 * batch queries are DuckDB-oracle-checked, so transitively the streaming
 * path is too. */
class EventPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly aggregation equals the batch query") {
    val streaming = EventPipeline.runToMemory(
      EventPipeline.hourlyAgg(EventPipeline.eventsStream(spark, dir)), "hourly_out")
    val batch = RelationalQueries.qEventsHourly(spark, dir)
    assert(streaming.count() == batch.count())
    assert(streaming.except(batch).isEmpty && batch.except(streaming).isEmpty)
  }

  test("streaming session windows equal the batch lag-based sessionization") {
    val sessions = EventPipeline.runToMemory(
      EventPipeline.sessionAgg(EventPipeline.eventsStream(spark, dir)), "sessions_out")
    val perUser = EventPipeline.sessionsPerUser(sessions)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    val batch = RelationalQueries.qEventsSessions(spark, dir)
      .select(col("user_id"), col("n_sessions").cast("bigint").as("n_sessions"),
        col("n_events"))
    assert(perUser.except(batch).isEmpty && batch.except(perUser).isEmpty)
  }

  test("stream-stream interval join settles to the batch range join") {
    val streamed = EventPipeline.qEventsStreamJoin(spark, dir)
    val batch = RelationalQueries.queries("q_range_join")(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("dropDuplicatesWithinWatermark settles to first (ts, event_id) per key") {
    import org.apache.spark.sql.expressions.Window
    val streamed = EventPipeline.qEventsDedupWmStream(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = graft.operators.EventTs.canonical(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id").as("dedup_key"), col("event_id"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming sliding windows equal the batch hopping aggregation") {
    val streaming = EventPipeline.runToMemory(
      EventPipeline.slidingAgg(EventPipeline.eventsStream(spark, dir)), "sliding_out")
    val batch = RelationalQueries.queries("q_events_sliding")(spark, dir)
    assert(streaming.count() == batch.count())
    assert(streaming.except(batch).isEmpty && batch.except(streaming).isEmpty)
  }

  test("left-outer stream-stream join settles to the batch left join") {
    val streamed = EventPipeline.qEventsStreamJoinLeft(spark, dir)
    // batch form: errors left-joined to same-user clicks within 6h
    val ev = graft.operators.EventTs.canonical(
        spark.read.parquet(s"$dir/events.parquet"))
      .selectExpr("user_id", "event_id", "event_type", "ts DIV 1000 AS us")
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_event_id"),
        col("us").as("e_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_event_id"), col("us").as("c_us"))
    val batch = errs.join(clicks,
        col("user_id") === col("c_user") && col("c_us") >= col("e_us") &&
          col("c_us") <= col("e_us") + 21600000000L, "left_outer")
      .select(col("user_id"), col("err_event_id"), col("click_event_id"),
        (col("c_us") - col("e_us")).as("delta_us"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming dedup (mapGroupsWithState) equals the batch groupBy form") {
    val streamed = EventPipeline.runToMemory(
      EventPipeline.streamingDedup(EventPipeline.eventsStream(spark, dir)).toDF(),
      "dedup_out", outputMode = "update")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id").as("dedup_key"))
      .agg(min("event_id").as("event_id"),
        (count(lit(1)) - 1).as("n_dupes"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }
}
