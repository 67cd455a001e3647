package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Database DDL — the reference's catalog-database statement surface
  * (flink-sql-parser Parser.tdd:36-62: SqlCreateDatabase / SqlDropDatabase /
  * SqlAlterDatabase / SqlUseDatabase / SqlShowDatabases;
  * TableEnvironmentImpl.executeOperation, TableEnvironmentImpl.java:1015).
  *
  * Spark-first mapping — Spark's session catalog already implements the
  * semantics; only the spellings and result column names differ:
  *
  *   CREATE DATABASE [IF NOT EXISTS] db [COMMENT 'c'] [WITH (props)]
  *     → CREATE DATABASE ... [WITH DBPROPERTIES (props)]
  *   ALTER DATABASE db SET (props)
  *     → ALTER DATABASE db SET DBPROPERTIES (props)
  *   DROP DATABASE [IF EXISTS] db [RESTRICT | CASCADE] → native pass-through
  *   USE db                                            → native pass-through
  *   SHOW DATABASES → native result with the reference's column name
  *     (`database name` — TableEnvironmentImpl.java:1016 buildShowResult)
  *
  * Connector tables can live inside a non-default database by registering
  * under a QUALIFIED name (`CREATE TABLE db.t ... WITH (...)`); see
  * [[ConnectorTables.resolveQualified]] for how qualified references reach
  * the flat readable view.
  */
object DatabaseDdl {

  private val createRe =
    """(?is)^(\s*CREATE\s+DATABASE\s+(?:IF\s+NOT\s+EXISTS\s+)?\w+\s*(?:COMMENT\s+'[^']*'\s*)?)WITH\s*\((.*)\)\s*;?\s*$""".r
  private val alterRe =
    """(?is)^(\s*ALTER\s+DATABASE\s+\w+\s+SET\s*)\((.*)\)\s*;?\s*$""".r
  private val showRe = """(?is)^\s*SHOW\s+DATABASES\s*;?\s*$""".r

  /** Text rewrite of the Flink property-clause spellings into Spark's —
    * `WITH (...)` → `WITH DBPROPERTIES (...)`, `SET (...)` →
    * `SET DBPROPERTIES (...)`. The rewritten (and any natively-spelled)
    * statement no longer matches, so the parser's preprocess chain cannot
    * loop. CREATE DATABASE without WITH, DROP DATABASE [RESTRICT|CASCADE]
    * and USE are already native Spark spellings and pass through untouched. */
  def rewrite(sqlText: String): String = sqlText match {
    case createRe(head, props) => s"${head}WITH DBPROPERTIES ($props)"
    case alterRe(head, props) => s"${head}DBPROPERTIES ($props)"
    case _ => sqlText
  }

  /** Dispatch test for the one form that needs a built result — caller
    * passes literal/comment-blanked text. */
  def matches(probe: String): Boolean = showRe.findFirstIn(probe).isDefined

  /** SHOW DATABASES with the reference's result column name, built from the
    * catalog API (not spark.sql — that would re-enter this dispatch). */
  def run(spark: SparkSession, sql: String): DataFrame =
    spark.catalog.listDatabases().select(col("name").as("database name"))
}
