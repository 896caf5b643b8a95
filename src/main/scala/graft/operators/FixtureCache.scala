package graft.operators

/**
 * Cross-JVM-safe cache for MATERIALIZED bench/correctness fixtures
 * (the packedVideoTable / reconClassifyDsv2 amortization pattern): a
 * fixture is built once per content-stamped key and read back by every
 * later pass, so timed bench lines measure the operator, not the
 * fixture build.
 *
 * The publish protocol fixes two races the old synchronized-overwrite
 * scheme had (r17 advice): two JVMs (bench + correctness harness)
 * could interleave an `overwrite` into the shared path and one could
 * read a half-written fixture, and a regenerated SOURCE dir at the
 * same path would keep serving the stale derivation. Here a build
 * lands in a private temp dir and ONE atomic rename publishes it — a
 * published dir is complete by construction — and the cache key
 * carries a digest of the source files' (path, size, mtime), so a
 * source regeneration changes the key instead of silently reusing the
 * old bytes.
 */
object FixtureCache {

  /** Content stamp of a source directory: digest over every file's
   * (relative path, length, mtime), recursive, order-canonical. Cheap
   * — metadata only, never reads data bytes. */
  def dirStamp(dir: String): String = {
    val root = new java.io.File(dir)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def walk(f: java.io.File): Unit =
      if (f.isFile)
        md.update((f.getPath.stripPrefix(root.getPath) + ":" + f.length +
          ":" + f.lastModified + "\n").getBytes("UTF-8"))
      else Option(f.listFiles()).foreach(_.sortBy(_.getName).foreach(walk))
    walk(root)
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  /** Materialize `build`'s output under `<java.io.tmpdir>/<name>`
   * exactly once: build into a private temp sibling, publish with one
   * atomic rename. The loser of a concurrent-publish race discards its
   * own build and reads the winner's — which is complete, because only
   * finished builds are ever renamed in. */
  def materialize(name: String)(build: java.io.File => Unit): java.io.File = {
    val base = new java.io.File(sys.props("java.io.tmpdir"))
    val target = new java.io.File(base, name)
    if (target.isDirectory) return target
    val tmp = new java.io.File(base,
      s"$name.build-${java.util.UUID.randomUUID()}")
    try {
      build(tmp)
      if (!tmp.renameTo(target)) {
        require(target.isDirectory,
          s"fixture cache $name: publish rename failed with no concurrent winner")
      }
    } finally deleteRecursively(tmp)
    target
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
