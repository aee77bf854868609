package graft.catalog

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Parquet-on-a-path V2 `TableCatalog` — the piece the session catalog
  * lacks for the reference's `CREATE OR REPLACE TABLE … USING DELTA AS …`
  * (Gold Layer.py:261,276): REPLACE TABLE [AS SELECT] only resolves
  * against a v2 catalog, and Spark's built-in session catalog rejects it
  * for file-source tables. Registering this catalog
  * (`spark.sql.catalog.graft=graft.catalog.PathCatalog`,
  * `spark.sql.catalog.graft.warehouse=<dir>`) makes the OR REPLACE form
  * parse and execute verbatim (modulo USING parquet for USING DELTA —
  * no Delta jars ship in this environment).
  *
  * Layout: `warehouse/<namespace…>/<table>/` holding parquet files plus a
  * `_graft_schema.json` sidecar (underscore-prefixed ⇒ invisible to file
  * listings) so an empty just-created CTAS target has a schema before its
  * first file lands. Reads/writes delegate to Spark's own
  * [[ParquetTable]] (FileTable), so scans get the full parquet
  * pushdown/pruning machinery — this class is only metadata.
  *
  * Scope: unpartitioned tables (the reference's CTAS aggregates are
  * unpartitioned; partitioned facts use the path sinks in
  * [[graft.io.Tables]]).
  */
class PathCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = new Path(Option(options.get("warehouse"))
      .getOrElse(s"spark-warehouse/graft-$name"))
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): Path =
    (ident.namespace() :+ ident.name()).foldLeft(warehouse)(new Path(_, _))

  private def schemaFile(dir: Path): Path = new Path(dir, "_graft_schema.json")

  private def readSchema(dir: Path): Option[StructType] = {
    val f = schemaFile(dir)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(org.apache.spark.sql.types.DataType.fromJson(
        new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[StructType])
      finally in.close()
    }
  }

  /** A directory readable as a table without a sidecar: a
    * [[graft.io.Tables.overwrite]]-managed versioned dir (has a `_current`
    * manifest) or a plain/partitioned parquet dir (part files directly, or
    * `col=value` partition subdirs — the [[graft.io.Scd2History]] layout).
    */
  private def snapshotDir(dir: Path): Option[Path] = {
    val manifest = new Path(dir, "_current")
    if (fs.exists(manifest)) {
      val in = fs.open(manifest)
      val v = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      Some(new Path(dir, v))
    } else if (fs.exists(dir) && fs.listStatus(dir).exists { st =>
      val n = st.getPath.getName
      // Hidden-prefix guard on the partition probe: Spark's own discovery
      // skips '.'/'_' children, so a dir holding ONLY crash leftovers like
      // `.end_date=….staging` must not list as a table whose scan is empty.
      n.endsWith(".parquet") ||
        (st.isDirectory && n.contains("=") && !n.startsWith(".") && !n.startsWith("_"))
    }) Some(dir)
    else None
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(new Path(_, _))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(st => st.isDirectory &&
        (fs.exists(schemaFile(st.getPath)) || snapshotDir(st.getPath).isDefined))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  private def parquetTable(ident: Identifier, paths: Seq[Path], schema: Option[StructType]): ParquetTable =
    ParquetTable(
      s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}",
      spark,
      new CaseInsensitiveStringMap(Map("path" -> paths.head.toString).asJava),
      paths.map(_.toString),
      schema,
      classOf[ParquetFileFormat])

  /** Sidecar tables (this catalog's own CTAS targets) load read-write; a
    * dir managed by the path sinks ([[graft.io.Tables]] versioned
    * snapshots, partitioned facts, [[graft.io.Scd2History]]) loads
    * READ-ONLY at its live snapshot — the write path for those layouts is
    * their sink, not SQL DML, but `spark.table("catalog.ns.t")` resolves
    * everywhere (gold + silver included) for the read side.
    */
  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!fs.exists(dir)) throw new NoSuchTableException(ident)
    readSchema(dir) match {
      case Some(schema) =>
        new PathCatalog.PathTable(parquetTable(ident, Seq(dir), Some(schema)), dir, () => fs)
      case None =>
        // SCD2 history dirs (generation-pointer layout) scan ONLY the live
        // generation leaves — a raw scan of the root would double-count
        // reader-grace generations — with the schema-of-record sidecar
        // (shared helper in Tables: single filename constant, no drift).
        val historyLeaves = graft.io.Scd2History.liveLeafPaths(spark, dir.toString)
        if (historyLeaves.nonEmpty) {
          val sidecar = graft.io.Tables.readSchemaSidecar(spark, dir.toString)
          new PathCatalog.ReadOnlyTable(
            parquetTable(ident, historyLeaves.map(new Path(_)), sidecar))
        } else snapshotDir(dir) match {
          case Some(snap) =>
            // other sink layouts: live snapshot or plain dir, schema from
            // sidecar when present, else inferred from parquet
            val sidecar = graft.io.Tables.readSchemaSidecar(spark, dir.toString)
            new PathCatalog.ReadOnlyTable(parquetTable(ident, Seq(snap), sidecar))
          case None => throw new NoSuchTableException(ident)
        }
    }
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        s"$catalogName catalog: partitioned tables go through graft.io.Tables.overwritePartitioned")
    val dir = tableDir(ident)
    if (fs.exists(schemaFile(dir))) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(dir)
    val out = fs.create(schemaFile(dir), true)
    try out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(s"$catalogName catalog: ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    fs.exists(dir) && fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!fs.exists(tableDir(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (fs.exists(tableDir(newIdent))) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(tableDir(newIdent).getParent)
    fs.rename(tableDir(oldIdent), tableDir(newIdent))
    ()
  }

  // --- namespaces: directories under the warehouse ---

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(warehouse)) Array.empty
    else fs.listStatus(warehouse)
      .filter(st => st.isDirectory && !fs.exists(schemaFile(st.getPath)))
      .map(st => Array(st.getPath.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(namespace.foldLeft(warehouse)(new Path(_, _)))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(namespace.foldLeft(warehouse)(new Path(_, _)))
    ()
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"$catalogName catalog: ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = namespace.foldLeft(warehouse)(new Path(_, _))
    if (!cascade && fs.exists(dir) && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    fs.exists(dir) && fs.delete(dir, true)
  }
}

object PathCatalog {

  import org.apache.spark.sql.connector.read.ScanBuilder
  import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}

  /** Read-only projection of a sink-managed directory: scans delegate to
    * [[ParquetTable]] (full pushdown/pruning), writes are not offered —
    * BATCH_WRITE is absent from the capabilities, so DML against these
    * tables fails at analysis instead of corrupting a sink-managed layout.
    */
  private final class ReadOnlyTable(delegate: ParquetTable)
      extends Table with SupportsRead {
    override def name(): String = delegate.name
    override def schema(): StructType = delegate.schema
    override def columns(): Array[Column] = delegate.columns()
    override def partitioning(): Array[Transform] = delegate.partitioning()
    override def properties(): util.Map[String, String] = delegate.properties()
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
      delegate.newScanBuilder(options)
  }

  /** [[ParquetTable]] plus TRUNCATE: REPLACE/overwrite plans require the
    * write builder to support truncation, which Spark's FileWriteBuilder
    * does not advertise. Truncation is stage-and-swap, not
    * delete-then-write: `toBatch` MOVES the previous data files into a
    * dot-prefixed `.replaced` dir (hidden from NEW listings only — an
    * already-planned scan holds the old absolute paths and will fail on
    * them, same as a delete; the guarantee bought here is abort/failed-job
    * RESTORE under the single-writer/regenerable contract, not
    * concurrent-reader safety); commit deletes them, abort restores them —
    * a failed or killed REPLACE/INSERT OVERWRITE leaves the previous
    * contents, not an empty table. Deferred to `toBatch` so planning stays
    * side-effect-free.
    * Hard-crash caveat (documented contract): a crash between toBatch and
    * commit leaves the new files partial with the old ones parked in
    * `.replaced` — these tables are regenerable CTAS aggregates; rerunning
    * the CTAS (whose toBatch clears the leftover park dir) repairs them.
    */
  private final class PathTable(delegate: ParquetTable, dir: Path, fs: () => FileSystem)
      extends Table with SupportsRead with SupportsWrite {

    override def name(): String = delegate.name
    override def schema(): StructType = delegate.schema
    override def columns(): Array[Column] = delegate.columns()
    override def partitioning(): Array[Transform] = delegate.partitioning()
    override def properties(): util.Map[String, String] = delegate.properties()
    override def capabilities(): util.Set[TableCapability] = {
      val caps = util.EnumSet.copyOf(delegate.capabilities())
      caps.add(TableCapability.TRUNCATE)
      caps
    }

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      delegate.newScanBuilder(options)

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        private var doTruncate = false
        override def truncate(): WriteBuilder = { doTruncate = true; this }
        override def build(): Write = {
          val underlying = delegate.newWriteBuilder(info).build()
          if (!doTruncate) underlying
          else new Write {
            override def toBatch: BatchWrite = {
              val f = fs()
              val park = new Path(dir, ".replaced")
              // Leftover park dir = a predecessor hard-crashed mid-replace;
              // its contents are stale relative to whatever the dir now
              // holds, clear them before parking the current files.
              if (f.exists(park)) f.delete(park, true)
              f.mkdirs(park)
              f.listStatus(dir).filterNot { st =>
                val n = st.getPath.getName
                n.startsWith("_") || n.startsWith(".")
              }.foreach(st => f.rename(st.getPath, new Path(park, st.getPath.getName)))
              val inner = underlying.toBatch
              new BatchWrite {
                override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DataWriterFactory =
                  inner.createBatchWriterFactory(pInfo)
                override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()
                override def onDataWriterCommit(message: WriterCommitMessage): Unit =
                  inner.onDataWriterCommit(message)
                override def commit(messages: Array[WriterCommitMessage]): Unit = {
                  inner.commit(messages)
                  f.delete(park, true)
                }
                override def abort(messages: Array[WriterCommitMessage]): Unit = {
                  inner.abort(messages)
                  // Restore the previous contents: the new files (if any
                  // landed) were cleaned by the inner abort; part-file
                  // names are unique so renames cannot collide.
                  f.listStatus(park).foreach(st =>
                    f.rename(st.getPath, new Path(dir, st.getPath.getName)))
                  f.delete(park, true)
                }
              }
            }
            override def description(): String = s"truncate-then-${underlying.description()}"
          }
        }
      }
  }
}
