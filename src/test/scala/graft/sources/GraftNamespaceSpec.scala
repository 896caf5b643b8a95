package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Namespace + RENAME surfaces of the catalog: keyspace-style
 * single-level namespaces as plain SQL, and ALTER TABLE RENAME as one
 * directory move carrying the full table state. */
class GraftNamespaceSpec extends SparkSpec {
  import spark.implicits._

  private def withCat[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ns").toString
    val cat = s"gns_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", tmp)
    try f(cat)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("CREATE / SHOW / DROP NAMESPACE round-trip as SQL") {
    withCat { cat =>
      spark.sql(s"CREATE NAMESPACE $cat.ks1")
      spark.sql(s"CREATE NAMESPACE $cat.ks2")
      val shown = spark.sql(s"SHOW NAMESPACES IN $cat").collect()
        .map(_.getString(0)).sorted
      assert(shown.sameElements(Array("ks1", "ks2")))
      // non-cascade drop of a non-empty namespace refuses
      spark.sql(s"CREATE TABLE $cat.ks1.t (k BIGINT)")
      intercept[Exception] { spark.sql(s"DROP NAMESPACE $cat.ks1") }
      spark.sql(s"DROP NAMESPACE $cat.ks1 CASCADE")
      spark.sql(s"DROP NAMESPACE $cat.ks2")
      assert(spark.sql(s"SHOW NAMESPACES IN $cat").count() == 0L)
    }
  }

  test("ALTER TABLE RENAME moves the whole table state") {
    withCat { cat =>
      spark.sql(s"CREATE NAMESPACE $cat.a")
      spark.sql(s"CREATE NAMESPACE $cat.b")
      spark.range(25).select(col("id").as("k"))
        .writeTo(s"$cat.a.src").create()
      spark.sql(s"ALTER TABLE $cat.a.src RENAME TO b.dst")
      assert(spark.table(s"$cat.b.dst").count() == 25L)
      intercept[Exception] { spark.table(s"$cat.a.src").count() }
      // renaming onto an existing table refuses
      spark.range(1).select(col("id").as("k"))
        .writeTo(s"$cat.a.src2").create()
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.a.src2 RENAME TO b.dst")
      }
      assert(spark.table(s"$cat.b.dst").count() == 25L)
    }
  }
}
