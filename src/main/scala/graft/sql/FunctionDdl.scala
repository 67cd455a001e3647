package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A SQL-registrable function — the analogue of the reference's
  * UserDefinedFunction subclasses that CREATE FUNCTION DDL instantiates by
  * class name (flink-sql-parser function DDL → FunctionCatalog
  * .registerTempCatalogFunction → UserDefinedFunctionHelper
  * .instantiateFunction). Implementations self-register their Spark UDF
  * under the DDL-given name. */
trait GraftSqlFunction {
  def register(spark: SparkSession, name: String): Unit
}

/** `CREATE [OR REPLACE] [TEMPORARY] [SYSTEM] FUNCTION [IF NOT EXISTS]
  * <name> AS '<className>'` — the reference's function DDL
  * (flink-sql-parser parserImpls.ftl SqlCreateFunction, executed in
  * TableEnvironmentImpl.createCatalogFunction). The class is resolved
  * reflectively and must implement [[GraftSqlFunction]]; statements whose
  * class does not (e.g. Spark's own Hive-style CREATE FUNCTION ... USING
  * JAR) fall through to the stock parser untouched. */
object FunctionDdl {

  private val re =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+'([\w.$]+)'\s*(?:LANGUAGE\s+\w+\s*)?""".r

  def matches(probe: String): Boolean =
    """(?i)^\s*CREATE\b""".r.findFirstIn(probe).isDefined &&
      """(?i)\bFUNCTION\b""".r.findFirstIn(probe).isDefined &&
      """(?i)\bUSING\s+JAR\b""".r.findFirstIn(probe).isEmpty

  /** Some(empty DF) if handled; None → not a graft function class, let the
    * stock parser have the statement. */
  def tryRun(spark: SparkSession, sql: String): Option[DataFrame] = sql match {
    case re(name, className) =>
      val inst =
        try Class.forName(className).getDeclaredConstructor().newInstance()
        catch { case _: Throwable => return None }
      inst match {
        case f: GraftSqlFunction =>
          f.register(spark, name)
          Some(spark.emptyDataFrame)
        case _ => None
      }
    case _ => None
  }
}
