package graft.sources

import graft.config.Settings
import graft.schema.TableSchema
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Table source abstraction (reference operator A: the connector scan,
 * MvSync.java:232-258).
 *
 * The reference reads via the Spark Cassandra connector
 * (`javaFunctions(jsc).cassandraTable(ks, table).select(cols)`,
 * MvSync.java:245-247) with token-range parallelism. This offline repo has
 * no Cassandra, so the production implementation here is Parquet; the
 * trait keeps the engine source-agnostic — a `CassandraSource` is
 * `spark.read.format("org.apache.spark.sql.cassandra")` with the same
 * projection, and nothing downstream changes.
 *
 * Projection (operator B, MvSync.java:216-230) happens via `select` so
 * Catalyst pushes column pruning into the scan (parquet ReadSchema /
 * connector-side projection).
 */
trait Source extends Serializable {
  def load(spark: SparkSession, schema: TableSchema): DataFrame
}

/** Parquet-backed table: path + projection to the schema's columns
 * (PK + regular + writetime_/ttl_ siblings where present in the file). */
final case class ParquetSource(path: String) extends Source {
  override def load(spark: SparkSession, schema: TableSchema): DataFrame = {
    val df = spark.read.parquet(path)
    val want = schema.pk ++ schema.sortedRegular ++
      schema.timestampedRegular.flatMap(c =>
        Seq(schema.writetimeCol(c), schema.ttlCol(c)))
    val present = want.filter(df.columns.contains)
    df.select(present.map(org.apache.spark.sql.functions.col): _*)
  }
}

/**
 * Scan-rate throttle (reference operator D: a guava `RateLimiter.acquire()`
 * per row per executor, default 10 rows/s, MvSync.java:38,250-255;
 * MVSyncSettings.java:86-88).
 *
 * For the Cassandra connector the idiomatic knob is
 * `spark.cassandra.input.readsPerSec`; for generic sources this utility
 * wraps a DataFrame with a per-partition token bucket. Kept OUT of the
 * default pipeline: on a 1000-executor cluster per-worker limits multiply
 * (documented reference behavior, README.md:34), and for benchmarking the
 * throttle is disabled exactly as BASELINE.md prescribes.
 */
object Throttle {
  def perPartitionRows(df: DataFrame, rowsPerSec: Int): DataFrame = {
    if (rowsPerSec <= 0) df
    else {
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(df.schema)
      df.mapPartitions { it =>
        val nanosPerRow = 1000000000L / rowsPerSec
        var next = System.nanoTime()
        it.map { row =>
          val now = System.nanoTime()
          if (now < next) {
            val ms = (next - now) / 1000000L
            if (ms > 0) Thread.sleep(ms)
          }
          next = math.max(next, now) + nanosPerRow
          row
        }
      }(enc)
    }
  }
}
