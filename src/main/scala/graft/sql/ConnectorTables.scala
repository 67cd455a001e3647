package graft.sql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filesystem connector SINK tables + INSERT INTO — the write half of the
  * reference's connector DDL (FileSystemTableSink via
  * `CREATE TABLE ... WITH ('connector'='filesystem', ...)` and
  * StreamExecSink / BatchExecSink planning of `INSERT INTO`).
  *
  * `CREATE TABLE s (...) WITH ('connector'='filesystem','path'=p,
  * 'format'=f)` with NO watermark clause registers a sink; `INSERT INTO s
  * SELECT ...` plans the query with the stock parser and writes it to the
  * table's path in the declared format (append — the filesystem sink's
  * default). After the first insert the table also resolves as a SOURCE
  * (temp view over the written files), mirroring the reference where the
  * same connector table is readable and writable.
  *
  * Statements whose target is NOT a registered connector sink fall through
  * untouched, so Spark-native INSERT INTO on catalog tables keeps working.
  */
object ConnectorTables {

  private case class Sink(path: String, format: String)

  /** (session identity, table name) → sink; session-keyed so tests with
    * multiple sessions cannot see each other's registrations. */
  private val sinks = new ConcurrentHashMap[String, Sink]()

  private def key(s: SparkSession, name: String) =
    s"${System.identityHashCode(s)}:${name.toLowerCase}"

  private val createRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*""".r
  private val insertRe =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s+(SELECT\s+.*|VALUES\s*\(.*)""".r
  private val propRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  def matchesCreate(probe: String): Boolean =
    """(?i)^\s*CREATE\s+TABLE\b""".r.findFirstIn(probe).isDefined &&
      """(?i)\bWITH\s*\(""".r.findFirstIn(probe).isDefined &&
      """(?i)\bWATERMARK\s+FOR\b""".r.findFirstIn(probe).isEmpty

  def matchesInsert(probe: String): Boolean =
    """(?i)^\s*INSERT\s+INTO\b""".r.findFirstIn(probe).isDefined

  def runCreate(spark: SparkSession, sql: String): DataFrame = sql match {
    case createRe(name, _, propsBody) =>
      val props = propRe.findAllMatchIn(propsBody)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      require(props.get("connector").forall(_ == "filesystem"),
        s"CREATE TABLE $name: only the filesystem connector is supported, " +
          s"got ${props.get("connector")}")
      val path = props.getOrElse("path",
        throw new IllegalArgumentException(s"CREATE TABLE $name: 'path' property required"))
      val fmt = props.getOrElse("format", "parquet")
      sinks.put(key(spark, name), Sink(path, fmt))
      // pre-existing data → the table is immediately readable too
      if (new java.io.File(path).exists())
        spark.read.format(fmt).load(path).createOrReplaceTempView(name)
      spark.emptyDataFrame
    case _ => throw new IllegalArgumentException("unsupported connector CREATE TABLE shape")
  }

  /** Some(empty DF) if the target is a registered connector sink; None →
    * not ours, let the stock parser plan the INSERT. */
  def tryInsert(spark: SparkSession, sql: String): Option[DataFrame] = sql match {
    case insertRe(name, query) =>
      Option(sinks.get(key(spark, name))).map { sink =>
        val df = spark.sql(query)
        df.write.format(sink.format).mode("append").save(sink.path)
        // refresh the readable view over the now-written files
        spark.read.format(sink.format).load(sink.path).createOrReplaceTempView(name)
        spark.emptyDataFrame
      }
    case _ => None
  }
}
