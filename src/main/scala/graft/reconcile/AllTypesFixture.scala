package graft.reconcile

import graft.schema.TableSchema
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic all-types base/MV fixture for the oracle-checked
 * per-type diff matrix — the DataFrame analogue of the reference's
 * all-types test table (MvSyncRDDTest.java:681-824, exercised per type
 * in MvSyncTest.java:2511-2953). Generated from `spark.range` with pure
 * arithmetic so the DuckDB oracle can restate the exact same rows from
 * `range()` — no parquet fixture file needed and both engines derive
 * the data independently.
 *
 * 13 columns spanning the CQL type matrix (SURVEY §1.2): bigint, blob,
 * boolean, date, decimal, double, int, list<int>, map<text,int>,
 * set<text>, text, timestamp.
 *
 * Damage (by `id` residue, overlaps resolved by sorted-name
 * first-mismatch order c_blob < c_map < c_text < c_ts):
 *   - id % 23 == 0 → missing from base (orphan MV row)
 *   - id % 19 == 0 → missing from MV
 *   - id % 13 == 0 → blob content differs  (BinaryType deep-equals)
 *   - id % 11 == 0 → map value differs     (value-level map diff)
 *   - id % 31 == 0 → MV text is null       (one-sided-null mismatch)
 *   - id % 17 == 0 → timestamp differs     (epoch-millis rendering)
 *
 * Canonicalization is additionally exercised in the NEGATIVE direction
 * on every common row: the MV stores the set reversed and the map with
 * entries in the opposite order — java Set/Map equality is
 * order-insensitive (`Objects.deepEquals`, MvSync.java:491), so these
 * rows MUST classify CONSISTENT; a broken sort-canonicalization
 * (MvReconciler.canonical) would flip thousands of rows to
 * INCONSISTENT and turn the oracle hash red.
 */
object AllTypesFixture {

  val Rows = 2000L

  /** 1995-01-01T00:00:00Z — writetime/date epoch anchor. */
  val EpochAnchorSec = 788918400L

  val schema: TableSchema = TableSchema(
    pk = Seq("id"),
    types = Map(
      "id" -> "BIGINT",
      "c_bigint" -> "BIGINT",
      "c_blob" -> "BLOB",
      "c_bool" -> "BOOLEAN",
      "c_date" -> "DATE",
      "c_decimal" -> "DECIMAL",
      "c_double" -> "DOUBLE",
      "c_int" -> "INT",
      "c_list" -> "LIST<INT>",
      "c_map" -> "MAP<TEXT,INT>",
      "c_set" -> "SET<TEXT>",
      "c_text" -> "TEXT",
      "c_ts" -> "TIMESTAMP"))

  def base(spark: SparkSession): DataFrame = build(spark, mvSide = false)
  def mv(spark: SparkSession): DataFrame = build(spark, mvSide = true)

  private def build(spark: SparkSession, mvSide: Boolean): DataFrame = {
    val id = col("id")
    val d = spark.range(0, Rows).toDF("id")
      .filter(if (mvSide) id % 19 =!= 0 else id % 23 =!= 0)

    val blob: Column =
      if (mvSide)
        when(id % 13 === 0, concat(lit("BLOB-"), id))
          .otherwise(concat(lit("blob-"), id)).cast("binary")
      else concat(lit("blob-"), id).cast("binary")

    // base stores (a, b); MV stores (b, a) — order-insensitive equality —
    // with b's VALUE bumped on the damaged residue
    val mapped: Column =
      if (mvSide)
        map(lit("b"),
          (id % 6 + when(id % 11 === 0, 1).otherwise(0)).cast("int"),
          lit("a"), (id % 10).cast("int"))
      else
        map(lit("a"), (id % 10).cast("int"), lit("b"), (id % 6).cast("int"))

    val set: Column =
      if (mvSide) array(concat(lit("t"), id % 5), concat(lit("s"), id % 3))
      else array(concat(lit("s"), id % 3), concat(lit("t"), id % 5))

    val text: Column =
      if (mvSide)
        when(id % 31 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("txt-"), id))
      else concat(lit("txt-"), id)

    val ts: Column = timestamp_seconds(lit(EpochAnchorSec) + id +
      (if (mvSide) when(id % 17 === 0, 3600L).otherwise(0L) else lit(0L)))

    d.select(
      id,
      (id * 1000003L).as("c_bigint"),
      blob.as("c_blob"),
      (id % 2 === 0).as("c_bool"),
      date_add(lit("1995-01-01").cast("date"), (id % 1000).cast("int")).as("c_date"),
      id.cast("decimal(9,2)").as("c_decimal"),
      (id * 0.25).as("c_double"),
      (id * 3 % 101).cast("int").as("c_int"),
      array((id % 5).cast("int"), (id % 7).cast("int")).as("c_list"),
      mapped.as("c_map"),
      set.as("c_set"),
      text.as("c_text"),
      ts.as("c_ts"))
  }

  /** Shared DuckDB CTE chain restating the classification: the same
   * residue arithmetic over `range()`, rendered mismatch strings
   * (epoch-millis timestamps, UTF-8 blobs, JSON maps in each side's
   * entry order) written out explicitly — ends in
   * `c(id, in_base, in_mv, problem, mismatch_col, mismatch_base,
   * mismatch_mv)`. */
  private val classifyCtes: String =
    s"""WITH j AS (
       |  SELECT range AS id, range % 23 <> 0 AS in_base, range % 19 <> 0 AS in_mv
       |  FROM range(0, $Rows)
       |  WHERE range % 23 <> 0 OR range % 19 <> 0),
       |c0 AS (
       |  SELECT id, in_base, in_mv,
       |    CASE WHEN NOT in_base THEN 'MISSING_IN_BASE_TABLE'
       |         WHEN NOT in_mv THEN 'MISSING_IN_MV_TABLE'
       |         WHEN id % 13 = 0 OR id % 11 = 0 OR id % 31 = 0 OR id % 17 = 0
       |           THEN 'INCONSISTENT'
       |         ELSE 'CONSISTENT' END AS problem,
       |    CASE WHEN in_base AND in_mv THEN
       |      CASE WHEN id % 13 = 0 THEN 'c_blob'
       |           WHEN id % 11 = 0 THEN 'c_map'
       |           WHEN id % 31 = 0 THEN 'c_text'
       |           WHEN id % 17 = 0 THEN 'c_ts' END END AS mismatch_col
       |  FROM j),
       |c AS (
       |  SELECT id, in_base, in_mv, problem, mismatch_col,
       |    CASE mismatch_col
       |      WHEN 'c_blob' THEN 'blob-' || CAST(id AS VARCHAR)
       |      WHEN 'c_map' THEN '{"a":' || CAST(id % 10 AS VARCHAR) ||
       |                        ',"b":' || CAST(id % 6 AS VARCHAR) || '}'
       |      WHEN 'c_text' THEN 'txt-' || CAST(id AS VARCHAR)
       |      WHEN 'c_ts' THEN CAST(${EpochAnchorSec}000 + id * 1000 AS VARCHAR)
       |    END AS mismatch_base,
       |    CASE mismatch_col
       |      WHEN 'c_blob' THEN 'BLOB-' || CAST(id AS VARCHAR)
       |      WHEN 'c_map' THEN '{"b":' || CAST(id % 6 + 1 AS VARCHAR) ||
       |                        ',"a":' || CAST(id % 10 AS VARCHAR) || '}'
       |      WHEN 'c_text' THEN NULL
       |      WHEN 'c_ts' THEN CAST(${EpochAnchorSec}000 + (id + 3600) * 1000 AS VARCHAR)
       |    END AS mismatch_mv
       |  FROM c0)
       |""".stripMargin

  /** Independent DuckDB statement of the expected classification. */
  val oracleSql: String = classifyCtes +
    "SELECT id, problem, mismatch_col, mismatch_base, mismatch_mv FROM c"

  /** DuckDB restatement of the FULL report string (ReportFormatter
   * layout: MVInconsistentRow.java:31-52 golden format) — every
   * CassandraRow entry field rendered per type, in sorted-name order,
   * for the three reported categories. Doubles are exact quarters
   * (id·0.25) so both engines' shortest-roundtrip rendering agrees. */
  val reportOracleSql: String = {
    val anchor = s"${EpochAnchorSec}000"
    // common (undamaged) per-type field renderings, base entry order
    def fields(mvSide: Boolean): String = {
      val blob =
        if (mvSide) "CASE WHEN id % 13 = 0 THEN 'BLOB-' ELSE 'blob-' END || CAST(id AS VARCHAR)"
        else "'blob-' || CAST(id AS VARCHAR)"
      val mapped =
        if (mvSide)
          """'{"b":' || CAST(id % 6 + CASE WHEN id % 11 = 0 THEN 1 ELSE 0 END AS VARCHAR) ||
            |     ',"a":' || CAST(id % 10 AS VARCHAR) || '}'""".stripMargin
        else """'{"a":' || CAST(id % 10 AS VARCHAR) || ',"b":' || CAST(id % 6 AS VARCHAR) || '}'"""
      val set =
        if (mvSide) """'["t' || CAST(id % 5 AS VARCHAR) || '","s' || CAST(id % 3 AS VARCHAR) || '"]'"""
        else """'["s' || CAST(id % 3 AS VARCHAR) || '","t' || CAST(id % 5 AS VARCHAR) || '"]'"""
      val text =
        if (mvSide) "CASE WHEN id % 31 = 0 THEN 'null' ELSE 'txt-' || CAST(id AS VARCHAR) END"
        else "'txt-' || CAST(id AS VARCHAR)"
      val ts =
        if (mvSide) s"CAST($anchor + (id + CASE WHEN id % 17 = 0 THEN 3600 ELSE 0 END) * 1000 AS VARCHAR)"
        else s"CAST($anchor + id * 1000 AS VARCHAR)"
      s"""'CassandraRow{c_bigint: ' || CAST(id * 1000003 AS VARCHAR) ||
         |   ', c_blob: ' || $blob ||
         |   ', c_bool: ' || CAST(id % 2 = 0 AS VARCHAR) ||
         |   ', c_date: ' || CAST(DATE '1995-01-01' + CAST(id % 1000 AS INTEGER) AS VARCHAR) ||
         |   ', c_decimal: ' || CAST(CAST(id AS DECIMAL(9,2)) AS VARCHAR) ||
         |   ', c_double: ' || CAST(CAST(id AS DOUBLE) * CAST(0.25 AS DOUBLE) AS VARCHAR) ||
         |   ', c_int: ' || CAST(id * 3 % 101 AS VARCHAR) ||
         |   ', c_list: [' || CAST(id % 5 AS VARCHAR) || ',' || CAST(id % 7 AS VARCHAR) || ']' ||
         |   ', c_map: ' || $mapped ||
         |   ', c_set: ' || $set ||
         |   ', c_text: ' || $text ||
         |   ', c_ts: ' || $ts ||
         |   ', id: ' || CAST(id AS VARCHAR) || '}'""".stripMargin
    }
    classifyCtes +
      s""", be AS (SELECT id, ${fields(mvSide = false)} AS entry FROM c),
         |me AS (SELECT id, ${fields(mvSide = true)} AS entry FROM c),
         |mt AS (SELECT id, CASE mismatch_col
         |    WHEN 'c_blob' THEN 'BLOB' WHEN 'c_map' THEN 'MAP<TEXT,INT>'
         |    WHEN 'c_text' THEN 'TEXT' WHEN 'c_ts' THEN 'TIMESTAMP' END AS mctype
         |  FROM c)
         |SELECT c.id, problem,
         |  'Problem: ' || problem || chr(10) ||
         |  'RowKey: id:BIGINT:' || CAST(c.id AS VARCHAR) || chr(10) ||
         |  'MainTableEntry: ' || CASE WHEN in_base THEN be.entry ELSE 'null' END || chr(10) ||
         |  'MVTableEntry: ' || CASE WHEN in_mv THEN me.entry ELSE 'null' END ||
         |  CASE WHEN problem = 'INCONSISTENT' THEN
         |    chr(10) || 'BaseColumn: ' || mismatch_col || ':' || mt.mctype || ':' || mismatch_base ||
         |    chr(10) || 'MvColumn: ' || mismatch_col || ':' || mt.mctype ||
         |      CASE WHEN mismatch_mv IS NOT NULL THEN ':' || mismatch_mv ELSE '' END
         |  ELSE '' END AS report
         |FROM c JOIN be ON be.id = c.id JOIN me ON me.id = c.id
         |  JOIN mt ON mt.id = c.id
         |WHERE problem IN ('MISSING_IN_BASE_TABLE', 'MISSING_IN_MV_TABLE', 'INCONSISTENT')""".stripMargin
  }
}
