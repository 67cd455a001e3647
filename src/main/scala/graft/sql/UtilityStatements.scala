package graft.sql

/** Utility-statement dialect — the reference's TableEnvironment.executeSql
  * admits a handful of statements Spark spells differently
  * (TableEnvironmentImpl.executeOperation, TableEnvironmentImpl.java:658+;
  * parser forms in flink-sql-parser parserImpls.ftl):
  *
  *   EXPLAIN PLAN FOR <stmt>   → EXPLAIN <stmt>       (SqlRichExplain)
  *   SHOW CURRENT CATALOG      → SELECT current_catalog()  AS `current catalog name`
  *   SHOW CURRENT DATABASE     → SELECT current_database() AS `current database name`
  *   USE CATALOG <name>        → SET CATALOG <name>
  *
  * (column names match the reference's ShowCurrentCatalogOperation /
  * ShowCurrentDatabaseOperation result headers). Bare SHOW TABLES / VIEWS /
  * FUNCTIONS / DATABASES are built with the reference's one-column result
  * headers in [[DatabaseDdl]]; DESCRIBE / USE <db> and the qualified or
  * pattern SHOW variants are native Spark statements and pass through
  * untouched — spec-pinned in SqlUtilitySpec rather than rewritten. */
object UtilityStatements {

  def rewrite(sqlText: String): String = {
    val t = sqlText.trim
    val explainRe = """(?is)^\s*EXPLAIN\s+PLAN\s+FOR\s+(.*)$""".r
    val useCatalogRe = """(?is)^\s*USE\s+CATALOG\s+(\w+)\s*;?\s*$""".r
    t match {
      case explainRe(stmt) => s"EXPLAIN $stmt"
      case useCatalogRe(cat) => s"SET CATALOG $cat"
      case _ if t.matches("(?is)^SHOW\\s+CURRENT\\s+CATALOG\\s*;?\\s*$") =>
        "SELECT current_catalog() AS `current catalog name`"
      case _ if t.matches("(?is)^SHOW\\s+CURRENT\\s+DATABASE\\s*;?\\s*$") =>
        "SELECT current_database() AS `current database name`"
      case _ => sqlText
    }
  }
}
