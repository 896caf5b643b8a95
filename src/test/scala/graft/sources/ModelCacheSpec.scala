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
    // a crashed fit's leftover: old enough to be unambiguously dead
    val stale = new java.io.File(target.getPath + ".tmp-999-1")
    stale.mkdirs()
    new java.io.File(stale, "part-junk").createNewFile()
    stale.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
    // a concurrent live fit's tmp dir: recent mtime, must survive
    val fresh = new java.io.File(target.getPath + ".tmp-999-2")
    fresh.mkdirs()
    ModelCache.loadOrFit(spark, data, "v1", root, "graft-test") {
      Seq(("x", 1L)).toDF("term", "cnt")
    }.collect()
    assert(!stale.exists(), "stale tmp dir should have been swept")
    assert(fresh.exists(), "recent tmp dir must be spared")
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
