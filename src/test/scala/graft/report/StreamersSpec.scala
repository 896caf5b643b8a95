package graft.report

import graft.SparkSpec
import graft.config.Settings
import graft.reconcile.{Fixtures, MvReconciler}
import java.nio.file.{Files, Paths}

/** Collecting streamer shared across executor threads (local mode, one
 * JVM) — the analogue of the reference's mocked streamers
 * (MvSyncRDDTest.java:98-106). */
object CapturedStreams {
  val lines = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
}

/** The override pattern of MVJobOutputStreamFactoryTest.java: subclass
 * the factory, return a non-file streamer, run the job unchanged. */
class CapturingStreamFactory extends OutputStreamFactory {
  override def getStream(path: String): BlobStreamer = new BlobStreamer {
    override def append(data: String): Unit =
      CapturedStreams.lines.add(path -> data)
    override def commit(): Unit = ()
  }
}

class StreamersSpec extends SparkSpec {
  import Fixtures._

  test("FileStreamer recreates the file on first append (FileStreamerTest parity)") {
    val dir = Files.createTempDirectory("graft-streamer").toString
    val path = s"$dir/sub/out.txt"
    Files.createDirectories(Paths.get(s"$dir/sub"))
    Files.writeString(Paths.get(path), "stale from a previous run\n")
    val s = new FileStreamer(path)
    s.append("fresh line")
    s.commit()
    assert(Files.readString(Paths.get(path)) == "fresh line\n")
    // a NEW streamer instance recreates again (per-run semantics)
    val s2 = new FileStreamer(path)
    s2.append("second run")
    s2.commit()
    assert(Files.readString(Paths.get(path)) == "second run\n")
  }

  test("ConsoleStreamer prints the line and commit is a no-op") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true)) {
      val s = new ConsoleStreamer
      s.append("Problem: INCONSISTENT")
      s.commit()
    }
    assert(buf.toString.startsWith("Problem: INCONSISTENT"))
  }

  test("swapping the factory redirects the whole report job (factory-override parity)") {
    CapturedStreams.lines.clear()
    val outDir = Files.createTempDirectory("graft-factory").toString
    val settings = Settings(outputDir = outDir)
    val classified = MvReconciler.reconcile(
      baseBoth(spark), mvMismatchRow2(spark), baseSchema, mvSchema, settings)
    val stats = ReportWriter.write(classified, baseSchema, mvSchema, settings,
      new CapturingStreamFactory)
    assert(stats.inConsistentRecords == 1)
    // no category files were written — the factory routed every stream
    assert(!Files.exists(Paths.get(s"$outDir/INCONSISTENT")))
    // ... but stats.txt is driver-side, outside the streamer boundary,
    // like the reference (MvSync.java:148-154 writes it directly)
    assert(Files.exists(Paths.get(s"$outDir/stats.txt")))
    val captured = scala.jdk.CollectionConverters
      .CollectionHasAsScala(CapturedStreams.lines).asScala.toSeq
    assert(captured.exists { case (path, data) =>
      path.contains("/INCONSISTENT/") && data.startsWith("Problem: INCONSISTENT") })
    assert(captured.exists(_._2 == ReportFormatter.Separator))
  }
}
