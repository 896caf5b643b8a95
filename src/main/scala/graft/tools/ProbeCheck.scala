package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col}

/** Machine-state probe (builder-side tool, r21): re-runs the two Bench
 * calibration probes in isolation, several times, so a hot reading in a
 * full bench artifact can be attributed — persistent machine
 * degradation vs transient load. The r21 opening sweep read cpu 4.514 /
 * shuffle 24.176 against a ~1.2/1.2 calm band; this tool answers
 * whether that is the box or the session. */
object ProbeCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cpuProbe(): Unit =
      spark.range(0, 1L << 33, 1, cpus.toInt)
        .selectExpr("xxhash64(id) AS h")
        .agg(bit_xor(col("h"))).collect(): Unit
    def shuffleProbe(): Unit =
      spark.range(0, 30L << 20, 1, cpus.toInt)
        .selectExpr("id", "xxhash64(id) AS h")
        .repartition(64, col("h"))
        .agg(bit_xor(col("h"))).collect(): Unit
    cpuProbe(); shuffleProbe() // codegen warmup, untimed
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime(); cpuProbe()
      val t1 = System.nanoTime(); shuffleProbe()
      val t2 = System.nanoTime()
      println(f"[probe $i] cpu=${(t1 - t0) / 1e9}%.3fs shuffle=${(t2 - t1) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
