package graft.sources.v2

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog over a topic root: `graft.tenant.ns.topic` addresses the
  * topic directory `<root>/tenant/ns/topic`, so the whole surface — scans
  * with pruning/pushdown, batch INSERT (producer semantics incl. the
  * monotone reveal), tiered hot/cold reads — is reachable from plain
  * `spark.sql`. This is the Spark-native stand-in for Pulsar SQL's
  * `pulsar."tenant/namespace".topic` addressing (the Presto connector is
  * archived upstream; SURVEY maps the SQL surface onto Spark SQL):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.v2.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/topics")
  *   spark.sql("SELECT key, count(*) FROM graft.prod.clicks GROUP BY key")
  *   spark.sql("INSERT INTO graft.prod.clicks SELECT ...")
  * }}}
  *
  * Directory = namespace, topic = leaf directory; the envelope schema is
  * fixed, so CREATE TABLE validates columns against it rather than storing
  * a schema of its own (the broker, not the producer, owns the envelope).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: File = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null,
      s"catalog $name needs spark.sql.catalog.$name.root=<topics dir>")
    root = new File(r)
  }

  override def name(): String = catalogName

  private def dirFor(namespace: Array[String]): File =
    namespace.foldLeft(root)(new File(_, _))

  private def dirFor(ident: Identifier): File =
    new File(dirFor(ident.namespace), ident.name)

  /** A topic is any leaf directory that is not itself topic-internal
    * bookkeeping (`partition-NNN`, `offloaded`, KV buckets, …). The
    * reference's flat metadata-store listing has the same shape: topics
    * under a namespace path. */
  private def childDirs(ns: File): Array[File] =
    Option(ns.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith(".") &&
        !f.getName.startsWith("partition-") &&
        f.getName != TopicTable.OffloadTier)

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = dirFor(namespace)
    if (!ns.isDirectory) throw new NoSuchNamespaceException(namespace)
    childDirs(ns).map(f => Identifier.of(namespace, f.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident)
    if (!dir.isDirectory) throw new NoSuchTableException(ident)
    new TopicTable(dir.getAbsolutePath)
  }

  /** SQL time travel (`SELECT … FROM graft.ns.topic TIMESTAMP AS OF t`):
    * the topic as a consumer reading at instant t had seen it — rows whose
    * publish time is known and ≤ t, compared in the envelope's millisecond
    * domain. Segments wholly newer than t prune on metadata; a row with no
    * publish stamp cannot be proven published by t and is excluded. This is
    * the batch face of seek-by-timestamp (PersistentMessageFinder); the
    * streaming face is the source's `startingTime` option. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirFor(ident)
    if (!dir.isDirectory) throw new NoSuchTableException(ident)
    new TopicTable(dir.getAbsolutePath,
      asOfMs = Some(Math.floorDiv(timestampMicros, 1000L)))
  }

  override def tableExists(ident: Identifier): Boolean =
    dirFor(ident).isDirectory

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // the envelope is broker-owned: any columns the DDL does declare must
    // BE envelope columns (same rule as the write path's name resolution)
    val env = TopicTable.schema.fields.map(f => f.name -> f.dataType).toMap
    val bad = schema.fields.filter(f => !env.get(f.name).contains(f.dataType))
    require(bad.isEmpty,
      s"non-envelope columns in CREATE TABLE: ${bad.map(_.name).mkString(", ")}")
    val dir = dirFor(ident)
    require(dir.mkdirs() || dir.isDirectory,
      s"cannot create topic dir $dir")
    new TopicTable(dir.getAbsolutePath)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft topics have a fixed envelope schema")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!dir.isDirectory) return false
    graft.ops.Fs.deleteRecursively(dir)
    true
  }

  override def renameTable(old: Identifier, to: Identifier): Unit = {
    if (!tableExists(old)) throw new NoSuchTableException(old)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    dirFor(to).getParentFile.mkdirs()
    require(dirFor(old).renameTo(dirFor(to)),
      s"rename $old -> $to failed")
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    childDirs(root).map(f => Array(f.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val ns = dirFor(namespace)
    if (!ns.isDirectory) throw new NoSuchNamespaceException(namespace)
    childDirs(ns).map(f => namespace :+ f.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || dirFor(namespace).isDirectory

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val dir = dirFor(namespace)
    require(dir.mkdirs() || dir.isDirectory, s"cannot create namespace $dir")
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = dirFor(namespace)
    if (!dir.isDirectory) return false
    // emptiness means NO children at all — childDirs would hide topic
    // internals (partition-NNN/, offloaded/, flat segment files), and a
    // topic misaddressed as a namespace must not silently drop data
    if (!cascade &&
        Option(dir.listFiles()).getOrElse(Array.empty).nonEmpty)
      throw new IllegalStateException(s"namespace $dir is not empty")
    graft.ops.Fs.deleteRecursively(dir)
    true
  }
}
