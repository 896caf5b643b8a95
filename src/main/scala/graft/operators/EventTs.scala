package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Canonicalizes the events table's `ts` column to an exact
 * epoch-NANOSECOND LongType regardless of how the parquet writer encoded
 * it. The test-data generator has produced events.parquet two ways across
 * rounds: TIMESTAMP(NANOS) (which Spark 4 reads as an exact LongType under
 * spark.sql.legacy.parquet.nanosAsLong — the config every entry point
 * sets) and timestamp[us] with no timezone (which Spark reads as
 * TIMESTAMP_NTZ). All downstream event-time math assumes exact nanos
 * (`ts DIV 1000` → µs), matching the DuckDB oracle's `epoch_us(ts)` under
 * the UTC sessions every entry point pins. Normalizing at the source —
 * instead of per-query — keeps one schema contract for the batch queries,
 * the streaming replay feed, and the direct file stream alike.
 */
object EventTs {
  def canonical(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df // already exact nanos
    case TimestampNTZType | TimestampType =>
      // NTZ wall-clock == UTC epoch under the pinned UTC session. Integer
      // math only — 1.7e18 ns exceeds a double's 53-bit mantissa.
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other =>
      throw new IllegalStateException(s"unsupported events.ts type: $other")
  }
}
