package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** File-format connectors (SURVEY.md §2.1): CSV, JSON, ORC (and Parquet as
  * the resident format) — the reference's flink-csv / flink-json / flink-orc
  * / flink-parquet row (de)serializers re-expressed as Spark's built-in
  * DataSource formats, which add schema inference, predicate pushdown
  * (ORC/Parquet), and vectorized reading on top.
  *
  * Avro (flink-formats/flink-avro) is exercised through [[AvroCodec]] — a
  * native record-level codec on the core avro library (the spark-avro
  * DataSource jar is not in this environment's /opt/spark/jars, but the
  * format itself is fully provable without it): `fmt_avro_roundtrip` pushes
  * every row through Avro binary encode → decode before aggregating.
  * Kafka (flink-connector-kafka) needs spark-sql-kafka — the mapping is
  * `readStream/writeStream.format("kafka")`, documented in SURVEY §2.1;
  * AvroCodec's binary `value` column is exactly that sink's input contract.
  *
  * Each query round-trips a table through the format under test (write to
  * the build dir, read back, aggregate) and must hash-match the oracle run
  * against the ORIGINAL parquet — proving the (de)serialization is
  * lossless for the exercised types. Timestamps ride through CSV as
  * ISO-8601 strings (Flink's CsvRowDataSerializationSchema does the same).
  */
object Formats {
  type QFn = (SparkSession, String) => DataFrame

  private def cacheDir(fmt: String, dir: String): String =
    s"target/format_cache/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/$fmt"

  /** Write `nation` + a lineitem slice through the format, read back. */
  private def roundTrip(s: SparkSession, dir: String, fmt: String,
                        options: Map[String, String] = Map.empty): DataFrame = {
    val path = cacheDir(fmt, dir)
    val src = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_shipdate").cast("string").as("l_shipdate"))
    src.write.mode("overwrite").options(options).format(fmt).save(path)
    s.read.options(options).format(fmt)
      .schema(src.schema) // fixed schema — no inference drift
      .load(path)
  }

  private def agged(df: DataFrame): DataFrame =
    df.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy(col("l_returnflag"))

  private val aggOracle =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
              CAST(max(l_shipdate) AS VARCHAR) AS max_ship
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Avro round-trip without any file: every row → Avro binary record →
    * back, in-pipeline (the Kafka value-bytes shape). */
  private def avroRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_shipdate").cast("string").as("l_shipdate"))
    AvroCodec.decodeRows(AvroCodec.encodeRows(src), src.schema)
  }

  def queries: Map[String, QFn] = Map(
    "fmt_csv_roundtrip" -> ((s, d) =>
      agged(roundTrip(s, d, "csv", Map("header" -> "true")))),
    "fmt_json_roundtrip" -> ((s, d) => agged(roundTrip(s, d, "json"))),
    "fmt_orc_roundtrip" -> ((s, d) => agged(roundTrip(s, d, "orc"))),
    "fmt_avro_roundtrip" -> ((s, d) => agged(avroRoundTrip(s, d)))
  )

  def oracles: Map[String, String] = Map(
    "fmt_csv_roundtrip" -> aggOracle,
    "fmt_json_roundtrip" -> aggOracle,
    "fmt_orc_roundtrip" -> aggOracle,
    "fmt_avro_roundtrip" -> aggOracle
  )
}
