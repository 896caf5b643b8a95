package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._

/**
 * Direct [[WriteSupport]] over Spark [[InternalRow]]s — the write-side
 * twin of the vectorized read (r18): the first writer materialized a
 * parquet-example `SimpleGroup` object tree per row (one Group + boxed
 * add per field), which at 100 TB is pure allocation tax. This streams
 * each field straight into parquet's [[RecordConsumer]] with ONE
 * pre-bound writer lambda per column — no intermediate representation
 * at all.
 *
 * Encodings are byte-identical to [[Dsv2Parquet.parquetMessageType]]'s
 * declarations (timestamps incl. NTZ as MICROS int64, dates as days
 * int32, decimals as unscaled int32 / int64 / sign-extended
 * two's-complement FLBA, strings as UTF8 BINARY, 3-level LIST / MAP) —
 * pinned by the alltypes DSv2 write round-trip oracle and specs.
 *
 * Binary copies: the dictionary values writer RETAINS Binary refs (the
 * dictionary map), and the row's backing buffer is reused by the
 * caller — so string/binary/decimal bytes are copied exactly as the
 * Group path copied them.
 */
private[sources] class GraftInternalRowWriteSupport(schema: StructType)
    extends WriteSupport[InternalRow] {

  private val msgType: MessageType = Dsv2Parquet.parquetMessageType(schema)
  private var rc: RecordConsumer = _

  override def init(conf: Configuration): WriteSupport.WriteContext =
    new WriteSupport.WriteContext(msgType,
      java.util.Collections.emptyMap[String, String]())

  override def prepareForWrite(consumer: RecordConsumer): Unit =
    rc = consumer

  /** One primitive value from any row/array getter, encoded exactly as
   * the message type declares its column. */
  private def addValue(g: SpecializedGetters, j: Int, dt: DataType): Unit =
    dt match {
      case LongType | TimestampType | TimestampNTZType => rc.addLong(g.getLong(j))
      case IntegerType | DateType => rc.addInteger(g.getInt(j))
      case ShortType => rc.addInteger(g.getShort(j).toInt)
      case ByteType => rc.addInteger(g.getByte(j).toInt)
      case DoubleType => rc.addDouble(g.getDouble(j))
      case FloatType => rc.addFloat(g.getFloat(j))
      case BooleanType => rc.addBoolean(g.getBoolean(j))
      case StringType =>
        val b = g.getUTF8String(j).getBytes
        rc.addBinary(Binary.fromConstantByteArray(
          java.util.Arrays.copyOf(b, b.length)))
      case BinaryType =>
        val b = g.getBinary(j)
        rc.addBinary(Binary.fromConstantByteArray(
          java.util.Arrays.copyOf(b, b.length)))
      case d: DecimalType if d.precision <= 9 =>
        rc.addInteger(g.getDecimal(j, d.precision, d.scale)
          .toUnscaledLong.toInt)
      case d: DecimalType if d.precision <= 18 =>
        rc.addLong(g.getDecimal(j, d.precision, d.scale).toUnscaledLong)
      case d: DecimalType =>
        val len = Dsv2Parquet.decimalFlbaBytes(d.precision)
        val big = g.getDecimal(j, d.precision, d.scale)
          .toJavaBigDecimal.unscaledValue()
        val raw = big.toByteArray
        val out = new Array[Byte](len)
        if (big.signum < 0) java.util.Arrays.fill(out, 0xFF.toByte)
        System.arraycopy(raw, 0, out, len - raw.length, raw.length)
        rc.addBinary(Binary.fromConstantByteArray(out))
      case other => throw new UnsupportedOperationException(
        s"graft-parquet: unsupported write type $other")
    }

  /** Pre-bound per-column writers: field name/index/type resolved once,
   * one lambda call per non-null value. */
  private val fieldWriters: Array[(InternalRow, Int) => Unit] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val name = f.name
      f.dataType match {
        case ArrayType(elem, _) => (row: InternalRow, _: Int) => {
          // the 3-level LIST shape: outer group → repeated `list`
          // entries → optional `element`; an EMPTY array is the outer
          // group with no repeated entries
          val arr = row.getArray(i)
          rc.startField(name, i)
          rc.startGroup()
          if (arr.numElements() > 0) {
            rc.startField("list", 0)
            var j = 0
            while (j < arr.numElements()) {
              rc.startGroup()
              if (!arr.isNullAt(j)) {
                rc.startField("element", 0)
                addValue(arr, j, elem)
                rc.endField("element", 0)
              }
              rc.endGroup()
              j += 1
            }
            rc.endField("list", 0)
          }
          rc.endGroup()
          rc.endField(name, i)
        }
        case MapType(kt, vt, _) => (row: InternalRow, _: Int) => {
          // the 3-level MAP shape: required key, optional value
          val m = row.getMap(i)
          val ka = m.keyArray()
          val va = m.valueArray()
          rc.startField(name, i)
          rc.startGroup()
          if (m.numElements() > 0) {
            rc.startField("key_value", 0)
            var j = 0
            while (j < m.numElements()) {
              rc.startGroup()
              rc.startField("key", 0)
              addValue(ka, j, kt)
              rc.endField("key", 0)
              if (!va.isNullAt(j)) {
                rc.startField("value", 1)
                addValue(va, j, vt)
                rc.endField("value", 1)
              }
              rc.endGroup()
              j += 1
            }
            rc.endField("key_value", 0)
          }
          rc.endGroup()
          rc.endField(name, i)
        }
        case dt => (row: InternalRow, _: Int) => {
          rc.startField(name, i)
          addValue(row, i, dt)
          rc.endField(name, i)
        }
      }
    }

  override def write(row: InternalRow): Unit = {
    rc.startMessage()
    var i = 0
    while (i < fieldWriters.length) {
      if (!row.isNullAt(i)) fieldWriters(i)(row, i)
      i += 1
    }
    rc.endMessage()
  }
}

/** Builder pairing the write support with parquet's standard writer
 * machinery (compression, dictionary, bloom, column indexes). */
private[sources] class GraftRowParquetWriterBuilder(
    file: org.apache.parquet.io.OutputFile, schema: StructType)
    extends ParquetWriter.Builder[InternalRow, GraftRowParquetWriterBuilder](
      file) {
  override def self(): GraftRowParquetWriterBuilder = this
  override def getWriteSupport(conf: Configuration)
      : WriteSupport[InternalRow] = new GraftInternalRowWriteSupport(schema)
}
