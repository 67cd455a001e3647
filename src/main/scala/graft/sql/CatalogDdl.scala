package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog statement surface — the reference's catalog DDL and SHOW forms
  * (flink-sql-parser Parser.tdd:36-62: SqlCreateCatalog / SqlDropCatalog /
  * SqlUseCatalog / SqlShowCatalogs / SqlShowCurrentCatalog;
  * TableEnvironmentImpl.executeOperation:1002-1014, CatalogManager.java:
  * 182-212 register/unregister, 422 listCatalogs, setCurrentCatalog).
  *
  * Spark-first mapping: Spark's multi-catalog surface (SET CATALOG /
  * current_catalog() / SHOW CATALOGS) carries the native catalogs; catalogs
  * created by DDL land in a session-keyed registry (a name + its
  * properties — the analogue of the reference's GenericInMemoryCatalog, the
  * only catalog factory loadable without extra jars, type
  * 'generic_in_memory' per GenericInMemoryCatalogValidator.java:25).
  * A registered catalog is a NAMESPACE: USE CATALOG switches to it (and to
  * its default database, CatalogManager.setCurrentCatalog:618-627), SHOW
  * CURRENT CATALOG/DATABASE, SHOW CATALOGS/DATABASES and USE <db> reflect
  * it. Documented divergence: connector tables and temp views stay
  * SESSION-GLOBAL (SHOW TABLES lists them under any current catalog) —
  * the reference scopes object identifiers per catalog.database; scoping
  * the whole registry per catalog buys little for a single-session
  * library and is out of surface.
  *
  * `DESCRIBE CATALOG` PARSES in the reference's grammar
  * (parserImpls.ftl:76-103) but the 1.12 blink planner's converter never
  * produces an operation for it, so executeSql throws
  * `Unsupported query: <statement>` (ParserImpl.java:79) — reproduced
  * verbatim, not silently swallowed. `DESCRIBE DATABASE` is in the same
  * unconverted bucket in the reference, but it is a NATIVE Spark statement
  * here and passes through untouched (spec-pinned) — strictly more capable
  * than the reference, never less.
  *
  * Error texts match the reference: duplicate CREATE → "Catalog %s already
  * exists." (CatalogManager.registerCatalog:188), DROP of an unknown name →
  * "Catalog %s does not exist." (unregisterCatalog:209), USE of an unknown
  * name → "A catalog with name [%s] does not exist." (setCurrentCatalog).
  */
object CatalogDdl {

  private[sql] case class Cat(props: Map[String, String]) {
    def defaultDatabase: String = props.getOrElse("default-database", "default")
  }

  /** (session identity, catalog name) → catalog; session-keyed like
    * [[ConnectorTables]]. */
  private val catalogs =
    scala.collection.concurrent.TrieMap.empty[String, Cat]
  /** session identity → current catalog name, set only while a
    * DDL-registered catalog is current ("override"); absent = Spark's
    * native current catalog is authoritative. */
  private val current = scala.collection.concurrent.TrieMap.empty[String, String]

  private def skey(s: SparkSession) = System.identityHashCode(s).toString
  private def key(s: SparkSession, name: String) = s"${skey(s)}:${name.toLowerCase}"

  /** The DDL-registered catalog that is current for this session, if any. */
  private[sql] def currentOverride(spark: SparkSession): Option[Cat] =
    current.get(skey(spark)).flatMap(n => catalogs.get(key(spark, n)))

  private[sql] def currentOverrideName(spark: SparkSession): Option[String] =
    current.get(skey(spark))

  private val createRe =
    """(?is)^\s*CREATE\s+CATALOG\s+(\w+)\s*(?:WITH\s*\((.*)\)\s*)?;?\s*$""".r
  private val dropRe =
    """(?is)^\s*DROP\s+CATALOG\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*$""".r
  private val useRe = """(?is)^\s*USE\s+CATALOG\s+(\w+)\s*;?\s*$""".r
  // `USE <db>` while a DDL-registered catalog is current: resolves against
  // THAT catalog's databases (its default database only), not Spark's —
  // CatalogManager.setCurrentDatabase:648-667 incl. the unknown-db error
  private val useDbRe = """(?is)^\s*USE\s+(?!CATALOG\b)(\w+)\s*;?\s*$""".r
  private val showRe = """(?is)^\s*SHOW\s+CATALOGS\s*;?\s*$""".r
  private val showCurrentCatRe = """(?is)^\s*SHOW\s+CURRENT\s+CATALOG\s*;?\s*$""".r
  private val showCurrentDbRe = """(?is)^\s*SHOW\s+CURRENT\s+DATABASE\s*;?\s*$""".r
  private val descCatRe = """(?is)^\s*DESCRIBE\s+CATALOG\s+\w+\s*;?\s*$""".r
  private val propRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  def matches(spark: SparkSession, probe: String): Boolean =
    createRe.findFirstIn(probe).isDefined || dropRe.findFirstIn(probe).isDefined ||
      useRe.findFirstIn(probe).isDefined || showRe.findFirstIn(probe).isDefined ||
      showCurrentCatRe.findFirstIn(probe).isDefined ||
      showCurrentDbRe.findFirstIn(probe).isDefined ||
      descCatRe.findFirstIn(probe).isDefined ||
      (useDbRe.findFirstIn(probe).isDefined && currentOverrideName(spark).isDefined)

  /** `native` runs a statement through the DELEGATE parser (same contract
    * as [[DatabaseDdl.run]] — spark.sql would re-enter this dispatch). */
  def run(spark: SparkSession, sql: String, native: String => DataFrame): DataFrame = {
    import spark.implicits._
    sql match {
      case createRe(name, propsBody) =>
        val props = Option(propsBody).map(b =>
          propRe.findAllMatchIn(b).map(m => m.group(1).toLowerCase -> m.group(2)).toMap)
          .getOrElse(Map.empty)
        // the reference discovers the catalog factory from the required
        // 'type' property (CatalogFactory descriptor validation); only the
        // in-memory factory is loadable in this surface
        val tpe = props.getOrElse("type", throw new IllegalArgumentException(
          s"CREATE CATALOG $name: the 'type' property is required to discover a catalog factory"))
        if (!tpe.equalsIgnoreCase("generic_in_memory"))
          throw new IllegalArgumentException(
            s"CREATE CATALOG $name: unsupported catalog type '$tpe' " +
              "(only 'generic_in_memory' is available without extra jars)")
        if (catalogs.contains(key(spark, name)))
          throw new IllegalArgumentException(s"Catalog $name already exists.")
        catalogs.put(key(spark, name), Cat(props)): Unit
        spark.emptyDataFrame
      case dropRe(ifExists, name) =>
        if (catalogs.remove(key(spark, name)).isEmpty && ifExists == null)
          throw new IllegalArgumentException(s"Catalog $name does not exist.")
        spark.emptyDataFrame
      case useDbRe(db) if currentOverride(spark).isDefined =>
        val cat = currentOverride(spark).get
        if (!db.equalsIgnoreCase(cat.defaultDatabase))
          throw new IllegalArgumentException(
            s"A database with name [$db] does not exist in the catalog: " +
              s"[${currentOverrideName(spark).get}].")
        spark.emptyDataFrame // already the current database
      case useRe(name) =>
        if (catalogs.contains(key(spark, name))) {
          current(skey(spark)) = name
          spark.emptyDataFrame
        } else {
          current.remove(skey(spark))
          try native(s"SET CATALOG $name")
          catch { case _: Exception =>
            throw new IllegalArgumentException(
              s"A catalog with name [$name] does not exist.")
          }
        }
      case _ if showRe.findFirstIn(sql).isDefined =>
        // native catalogs ∪ DDL-registered ones, sorted — the reference's
        // listCatalogs() (TableEnvironmentImpl.java:513-518 .sorted())
        val nativeNames = native("SHOW CATALOGS").collect().map(_.getString(0)).toSeq
        val prefix = s"${skey(spark)}:"
        val ddlNames = catalogs.keys.filter(_.startsWith(prefix))
          .map(_.stripPrefix(prefix)).toSeq
        (nativeNames ++ ddlNames :+ "spark_catalog").distinct.sorted
          .toDF("catalog name")
      case _ if showCurrentCatRe.findFirstIn(sql).isDefined =>
        currentOverrideName(spark).map(Seq(_).toDF("current catalog name"))
          .getOrElse(native("SELECT current_catalog() AS `current catalog name`"))
      case _ if showCurrentDbRe.findFirstIn(sql).isDefined =>
        currentOverride(spark).map(c => Seq(c.defaultDatabase).toDF("current database name"))
          .getOrElse(native("SELECT current_database() AS `current database name`"))
      case _ =>
        // DESCRIBE CATALOG — parsed, never converted (no operation in the
        // 1.12 blink planner); ParserImpl.java:79
        throw new UnsupportedOperationException(s"Unsupported query: ${sql.trim}")
    }
  }
}
