package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Minimal DataSource V2 `TableCatalog` over a directory root — the
 * CATALOG surface of the connector seam: a live Cassandra connector
 * registers exactly this plugin (`spark.sql.catalog.<name>=...`) and
 * resolves keyspace.table identifiers against cluster metadata, so
 * `SELECT … FROM cass.ks.t` and `DELETE FROM …` work as plain SQL.
 * Here an identifier `ns….t` maps to `<root>/ns…/t`; schema comes
 * from parquet footers when data exists, else from the `_schema.ddl`
 * file `createTable` writes (the cluster-metadata stand-in — same
 * fallback discipline as the provider's `graft.schema` option).
 *
 * Register with:
 *   spark.sql.catalog.graft       = graft.sources.GraftCatalog
 *   spark.sql.catalog.graft.root  = /path/to/root
 */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _
  private val conf = new Configuration()

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog $name requires spark.sql.catalog.$name.root")
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (root +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  private def schemaFile(p: String) = new Path(p, Dsv2Parquet.SchemaFileName)

  private def hasData(p: String): Boolean =
    try Dsv2Parquet.dataFiles(p, conf).nonEmpty
    catch { case _: java.io.FileNotFoundException => false }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((root +: namespace.toSeq).mkString("/"))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    val fs = new Path(p).getFileSystem(conf)
    fs.exists(new Path(p)) &&
      (hasData(p) || fs.exists(schemaFile(p)))
  }

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    val fs = new Path(p).getFileSystem(conf)
    if (hasData(p))
      GraftParquetTable(p, Dsv2Parquet.sparkSchema(Dsv2Parquet.footerSchema(p)))
    else if (fs.exists(schemaFile(p))) {
      val in = fs.open(schemaFile(p))
      val ddl = try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
        bos.toString("UTF-8")
      } finally in.close()
      GraftParquetTable(p, StructType.fromDDL(ddl))
    } else throw new NoSuchTableException(ident)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog: partition transforms not supported")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val p = pathOf(ident)
    val fs = new Path(p).getFileSystem(conf)
    fs.mkdirs(new Path(p))
    val out = fs.create(schemaFile(p), true)
    try out.write(schema.toDDL.getBytes("UTF-8")) finally out.close()
    GraftParquetTable(p, schema)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog: ALTER not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(pathOf(ident))
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog: RENAME not supported")
}

/** Observability for the metadata-delete path (spec + driver-row
 * require() surface only). */
object Dsv2DeleteProbe {
  final class PathProbe {
    val lastDropped = new java.util.concurrent.atomic.AtomicInteger
    val lastKept = new java.util.concurrent.atomic.AtomicInteger
  }
  private val byPath =
    new java.util.concurrent.ConcurrentHashMap[String, PathProbe]()
  /** Keyed by table path — parallel deletes cannot clobber readings. */
  def forPath(p: String): PathProbe =
    byPath.computeIfAbsent(p.stripSuffix("/"), _ => new PathProbe)
}
