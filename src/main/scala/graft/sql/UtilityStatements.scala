package graft.sql

/** Utility-statement dialect — the reference's TableEnvironment.executeSql
  * admits a handful of statements Spark spells differently
  * (TableEnvironmentImpl.executeOperation, TableEnvironmentImpl.java:658+;
  * parser forms in flink-sql-parser parserImpls.ftl):
  *
  *   EXPLAIN PLAN FOR <stmt>   → EXPLAIN <stmt>       (SqlRichExplain)
  *
  * USE CATALOG / SHOW CURRENT CATALOG / SHOW CURRENT DATABASE / SHOW
  * CATALOGS / CREATE+DROP CATALOG live in [[CatalogDdl]] (they must consult
  * the DDL-registered catalog set, not just rewrite text). Bare SHOW TABLES
  * / VIEWS / FUNCTIONS / DATABASES are built with the reference's
  * one-column result headers in [[DatabaseDdl]]; DESCRIBE <db-things> /
  * USE <db> and the qualified or pattern SHOW variants are native Spark
  * statements and pass through untouched — spec-pinned in SqlUtilitySpec
  * rather than rewritten. */
object UtilityStatements {

  def rewrite(sqlText: String): String = {
    val explainRe = """(?is)^\s*EXPLAIN\s+PLAN\s+FOR\s+(.*)$""".r
    sqlText.trim match {
      case explainRe(stmt) => s"EXPLAIN $stmt"
      case _ => sqlText
    }
  }
}
