package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Test => SCTest, Prop}

/** Property: for every schema the writer accepts, the parquet
 * MessageType it declares maps back to the SAME Spark schema through
 * the reader's inference — the two sides of the provider cannot
 * drift. (Nullability is always relaxed to nullable on read, the
 * file-source posture, so the generator emits nullable fields.) */
class Dsv2SchemaPropSpec extends SparkSpec {

  private val primGen: Gen[DataType] = Gen.oneOf(
    Gen.const(LongType), Gen.const(IntegerType), Gen.const(DoubleType),
    Gen.const(FloatType), Gen.const(BooleanType), Gen.const(StringType),
    Gen.const(BinaryType), Gen.const(DateType), Gen.const(TimestampType),
    Gen.const(ShortType), Gen.const(ByteType),
    for {
      p <- Gen.choose(1, 38)
      s <- Gen.choose(0, p)
    } yield DecimalType(p, s))

  private val fieldGen: Gen[DataType] = Gen.frequency(
    6 -> primGen,
    2 -> primGen.map(ArrayType(_, containsNull = true)),
    2 -> (for { k <- primGen; v <- primGen }
      yield MapType(k, v, valueContainsNull = true)))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 12)
    dts <- Gen.listOfN(n, fieldGen)
  } yield StructType(dts.zipWithIndex.map { case (dt, i) =>
    StructField(s"c$i", dt, nullable = true)
  })

  test("parquetMessageType and sparkSchema are mutual inverses") {
    val prop = Prop.forAll(schemaGen) { schema =>
      Dsv2Parquet.sparkSchema(Dsv2Parquet.parquetMessageType(schema)) == schema
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
