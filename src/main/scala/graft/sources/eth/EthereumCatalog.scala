package graft.sources.eth

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 `TableCatalog` exposing the three ethereum tables — the analogue of
  * the reference's connector metadata (`EthereumMetadata.java:78-147`:
  * one fixed namespace, fixed table list, fixed schemas). Mounted as
  *
  * {{{
  * spark.sql.catalog.ethereum = graft.sources.eth.EthereumCatalog
  * spark.sql.catalog.ethereum.chain = <fixture dir | http(s) endpoint>
  * }}}
  *
  * after which `SHOW TABLES IN ethereum` / `DESCRIBE ethereum.default.block`
  * / `SELECT ... FROM ethereum.default.block` work like the reference's
  * `show tables` / `describe` surface (`README.md:129-186`).
  *
  * Tables loaded through the catalog carry the reference's *bounded
  * varchar* column types (18/42/66/514, `EthereumMetadata.java:48-51`), so
  * `DESCRIBE` prints `varchar(n)` exactly; at scan time Spark replaces
  * char/varchar with string (`DataSourceV2Relation.create`), keeping
  * runtime semantics identical to the `format("ethereum")` path. Read-only
  * like the reference — DDL operations are rejected.
  */
class EthereumCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var options: CaseInsensitiveStringMap = _

  override def initialize(name: String, opts: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    options = opts
  }
  override def name(): String = catalogName

  private def chain: String =
    Option(options.get("chain")).getOrElse(EthFixtures.DefaultDir)
  private def blocksPerPartition: Int =
    Option(options.get("blocksPerPartition")).map(_.toInt).getOrElse(512)
  private def weiDecimal: Boolean =
    Option(options.get("weiDecimal")).exists(_.toBoolean)

  override def defaultNamespace(): Array[String] = Array("default")

  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))
  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    if (ns.isEmpty) listNamespaces()
    else if (isDefault(ns)) Array.empty
    else throw new NoSuchNamespaceException(ns)
  override def namespaceExists(ns: Array[String]): Boolean = isDefault(ns)
  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] =
    if (isDefault(ns)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(ns)

  private def isDefault(ns: Array[String]): Boolean =
    ns.length == 1 && ns(0) == "default"

  override def listTables(ns: Array[String]): Array[Identifier] =
    if (isDefault(ns) || ns.isEmpty)
      EthSchemas.allTables.map(t => Identifier.of(Array("default"), t)).toArray
    else throw new NoSuchNamespaceException(ns)

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace.isEmpty || isDefault(ident.namespace)) &&
      EthSchemas.allTables.contains(ident.name.toLowerCase)

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new EthereumTable(EthSchemas.kindOf(ident.name), chain, blocksPerPartition,
      weiDecimal = weiDecimal, rawVarchar = !weiDecimal)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("ethereum catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ethereum catalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("ethereum catalog is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("ethereum catalog is read-only")
  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("ethereum catalog is read-only")
  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ethereum catalog is read-only")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("ethereum catalog is read-only")
}
