package graft.sources

import graft.SparkSpec

/** The shared fitted-model cache (IVF quantizer, LM vocabulary): a hit
 * must skip the fit, hit and miss must serve identical artifacts, and
 * regenerated data must invalidate the key. */
class ModelCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshData(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-mc-$tag").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/data.parquet")
    s"$dir/data.parquet"
  }

  test("second load is a HIT: the fit runs once and artifacts are identical") {
    val data = freshData("hit")
    val root = java.nio.file.Files.createTempDirectory("graft-mc-root").toString
    var fits = 0
    def load() = ModelCache.loadOrFit(spark, data, "v1", root, "graft-test") {
      fits += 1
      Seq(("x", 1L), ("y", 2L)).toDF("term", "cnt")
    }
    val first = load().collect().toSet
    val second = load().collect().toSet
    assert(fits === 1)
    assert(first === second)
  }

  test("regenerating the data file misses the old key") {
    val data = freshData("inv")
    val root = java.nio.file.Files.createTempDirectory("graft-mc-root").toString
    val before = ModelCache.cachePath(data, "v1", root)
    // rewrite the dataset: part names/length/mtime change
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(data)
    val after = ModelCache.cachePath(data, "v1", root)
    assert(before !== after)
  }

  test("a stale orphaned tmp dir is swept on the next fit; a fresh one is spared") {
    val data = freshData("sweep")
    val root = java.nio.file.Files.createTempDirectory("graft-mc-root").toString
    val target = new java.io.File(ModelCache.cachePath(data, "v1", root))
    target.getParentFile.mkdirs()
    val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    // a crashed fit's leftover: EVERY file old enough to be
    // unambiguously dead (staleness = newest mtime under the tree)
    val stale = new java.io.File(target.getPath + ".tmp-999-1")
    stale.mkdirs()
    val staleJunk = new java.io.File(stale, "part-junk")
    staleJunk.createNewFile()
    staleJunk.setLastModified(old)
    stale.setLastModified(old)
    // a concurrent live fit's tmp dir: recent mtime, must survive
    val fresh = new java.io.File(target.getPath + ".tmp-999-2")
    fresh.mkdirs()
    // a long-running live fit: the tmp dir's OWN mtime went stale while
    // Spark keeps writing parts under _temporary/ — must survive (the
    // r11 ADVICE scenario: top-level-mtime sweeping killed this writer)
    val longFit = new java.io.File(target.getPath + ".tmp-999-3")
    val tempPart = new java.io.File(longFit, "_temporary/0/part-0")
    tempPart.getParentFile.mkdirs()
    tempPart.createNewFile() // fresh mtime: the fit is mid-write
    longFit.setLastModified(old)
    ModelCache.loadOrFit(spark, data, "v1", root, "graft-test") {
      Seq(("x", 1L)).toDF("term", "cnt")
    }.collect()
    assert(!stale.exists(), "stale tmp dir should have been swept")
    assert(fresh.exists(), "recent tmp dir must be spared")
    assert(tempPart.exists(),
      "live long-running fit (stale top-level mtime, fresh inner write) must be spared")
  }

  test("variant (hyperparameter) changes key; identical params share it") {
    val data = freshData("var")
    val root = "/tmp/graft-mc-any"
    assert(ModelCache.cachePath(data, "c16-i2", root)
      !== ModelCache.cachePath(data, "c32-i2", root))
    assert(ModelCache.cachePath(data, "c16-i2", root)
      === ModelCache.cachePath(data, "c16-i2", root))
  }
}
