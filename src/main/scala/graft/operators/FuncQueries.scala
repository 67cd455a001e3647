package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** Scalar-function coverage (SURVEY.md §2.8) — one query per function
  * family, each a single codegen'd projection (the reference's Calc node,
  * StreamExecCalc.scala:39 / CalcCodeGenerator.scala).
  *
  * Every expression here is a Spark built-in (or a composition from
  * graft.functions.GraftFunctions) — no UDFs, so the whole projection stays
  * inside one WholeStageCodegen span and columns prune down to what the
  * parquet scan actually needs. Transcendental outputs are rounded to 9
  * decimals: JVM and C libm differ in the last ulp for log/exp/trig.
  */
object FuncQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** String functions (BuiltInFunctionDefinitions.java:317-571). */
  private def funcString(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_name")).as("up"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 2, 3).as("sub"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        lpad(col("p_brand"), 10, "*").as("lp"),
        rpad(col("p_brand"), 10, "*").as("rp"),
        trim(lit("  x  ")).as("tr"),
        ltrim(lit("  x  ")).as("ltr"),
        rtrim(lit("  x  ")).as("rtr"),
        regexp_replace(col("p_name"), " ", "_").as("repl"),
        substring_index(col("p_name"), " ", 1).as("first_word"),
        instr(col("p_name"), "widget").as("pos"),
        ascii(col("p_brand")).as("asc"),
        chr(lit(65) + (col("p_partkey") % 26)).as("chr_c"),
        repeat(col("p_type"), 2).as("rep"),
        reverse(col("p_name")).as("rev"),
        split_index(col("p_name"), " ", 1).as("tok1"),
        left(col("p_name"), lit(4)).as("l4"),
        right(col("p_name"), lit(4)).as("r4"))
      .orderBy(col("p_partkey"))

  /** Math functions (BuiltInFunctionDefinitions.java:588-984). */
  private def funcMath(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_v"),
        ceil(col("c_acctbal")).as("ceil_v"),
        floor(col("c_acctbal")).as("floor_v"),
        round(col("c_acctbal"), 1).as("round_v"),
        (col("c_custkey") % 7).as("mod_v"),
        pow(col("c_custkey") + 1, 2).as("pow_v"),
        round(sqrt(abs(col("c_acctbal"))), 9).as("sqrt_v"),
        round(log(abs(col("c_acctbal")) + 1), 9).as("ln_v"),
        round(log10(abs(col("c_acctbal")) + 1), 9).as("log10_v"),
        round(log2(col("c_custkey") + 1), 9).as("log2_v"),
        round(exp(col("c_custkey") % 5), 9).as("exp_v"),
        signum(col("c_acctbal")).cast("int").as("sign_v"),
        greatest(col("c_custkey"), col("c_nationkey").cast("long")).as("gr"),
        least(col("c_custkey"), col("c_nationkey").cast("long")).as("le"),
        hex(col("c_custkey")).as("hex_v"),
        conv(col("c_custkey").cast("string"), 10, 2).as("bin_v"),
        round(lit(Math.PI), 9).as("pi_v"))
      .orderBy(col("c_custkey"))

  /** Temporal functions (BuiltInFunctionDefinitions.java:984-1032). */
  private def funcTemporal(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        weekofyear(col("o_orderdate")).as("woy"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("mon_start"),
        col("o_orderdate").cast("date").as("as_date"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        last_day(col("o_orderdate").cast("date")).as("eom"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to"),
        unix_timestamp(col("o_orderdate").cast("timestamp")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  /** Conditional / comparison (CASE, BETWEEN, IN, IS NULL, COALESCE, NULLIF). */
  private def funcConditional(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("band"),
        col("c_acctbal").between(1000, 2000).as("in_band"),
        col("c_mktsegment").isin("BUILDING", "MACHINERY").as("seg_in"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(b)")).as("nf"),
        (col("c_nationkey") <=> lit(3)).as("ndis"),
        isnull(nullif(col("c_mktsegment"), col("c_mktsegment"))).as("always_true"))
      .orderBy(col("c_custkey"))

  /** JSON access on events.props (Spark's get_json_object exceeds the
    * reference's IS JSON predicates — SURVEY §2.8). */
  private def funcJson(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        is_json_object(col("props")).as("is_obj"),
        is_json_value(col("props")).as("is_val"))
      .orderBy(col("event_id"))

  /** Crypto/hash (BuiltInFunctionDefinitions.java:1139-1187). */
  private def funcCrypto(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "nation")
      .select(
        col("n_nationkey"),
        md5(col("n_name").cast("binary")).as("md5_v"),
        sha2(col("n_name").cast("binary"), 256).as("sha256_v"),
        to_base64(col("n_name")).as("b64"),
        from_base64_str(to_base64(col("n_name"))).as("roundtrip"))
      .orderBy(col("n_nationkey"))

  /** Collection constructors/accessors (§2.8: ARRAY/MAP/ITEM/CARDINALITY). */
  private def funcCollection(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("tokens", split(rtrim(col("text")), " "))
      .select(
        col("doc_id"),
        size(col("tokens")).as("n_tokens"),
        element_at(col("tokens"), 1).as("tok1"),
        element_at(col("tokens"), -1).as("tok_last"),
        array_contains(col("tokens"), "data").as("has_data"),
        // Arrays joined to strings: the driver's compare harness sorts and
        // hashes cell values, which arrays break (unhashable) — semantics of
        // the array ops are still exercised, the *comparison* is string-typed.
        array_join(array_sort(array_distinct(col("tokens"))), " ").as("vocab"),
        array_join(slice(col("tokens"), 1, 3), " ").as("first3"),
        array_join(map_keys(map(lit("lang"), col("lang"), lit("source"), col("source"))), " ").as("mkeys"),
        element_at(map(lit("lang"), col("lang")), "lang").as("mval"))
      .orderBy(col("doc_id"))

  /** Regular expressions (REGEXP_EXTRACT / REGEXP_REPLACE / SIMILAR TO). */
  private def funcRegexp(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        regexp_replace(col("p_brand"), "[0-9]", "#").as("masked"),
        col("p_type").rlike("^(ECONOMY|PROMO)$").as("is_cheap"),
        is_digit(regexp_extract(col("p_brand"), "([0-9]+)", 1)).as("num_ok"),
        is_alpha(col("p_type")).as("type_alpha"),
        is_decimal(col("p_retailprice").cast("string")).as("price_dec"))
      .orderBy(col("p_partkey"))

  /** PARSE_URL (FlinkSqlOperatorTable PARSE_URL) over constructed URLs. */
  private def funcUrl(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
               col("doc_id"), lit("?q="), col("lang")))
      .select(
        col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("q")).as("qparam"))
      .orderBy(col("doc_id"))

  def queries: Map[String, QFn] = Map(
    "func_string" -> (funcString _),
    "func_math" -> (funcMath _),
    "func_temporal" -> (funcTemporal _),
    "func_conditional" -> (funcConditional _),
    "func_json" -> (funcJson _),
    "func_crypto" -> (funcCrypto _),
    "func_collection" -> (funcCollection _),
    "func_regexp" -> (funcRegexp _),
    "func_url" -> (funcUrl _)
  )

  def oracles: Map[String, String] = Map(
    "func_string" ->
      """SELECT p_partkey,
         lower(p_name) AS lo, upper(p_name) AS up, length(p_name) AS len,
         substring(p_name, 2, 3) AS sub,
         concat_ws('|', p_brand, p_type) AS cw,
         lpad(p_brand, 10, '*') AS lp, rpad(p_brand, 10, '*') AS rp,
         trim('  x  ') AS tr, ltrim('  x  ') AS ltr, rtrim('  x  ') AS rtr,
         replace(p_name, ' ', '_') AS repl,
         string_split(p_name, ' ')[1] AS first_word,
         strpos(p_name, 'widget') AS pos,
         ascii(p_brand) AS asc,
         chr(CAST(65 + p_partkey % 26 AS INT)) AS chr_c,
         repeat(p_type, 2) AS rep, reverse(p_name) AS rev,
         string_split(p_name, ' ')[2] AS tok1,
         left(p_name, 4) AS l4, right(p_name, 4) AS r4
         FROM part ORDER BY p_partkey""",
    "func_math" ->
      """SELECT c_custkey,
         abs(c_acctbal) AS abs_v,
         CAST(ceil(c_acctbal) AS BIGINT) AS ceil_v,
         CAST(floor(c_acctbal) AS BIGINT) AS floor_v,
         round(c_acctbal, 1) AS round_v,
         c_custkey % 7 AS mod_v,
         pow(c_custkey + 1, 2) AS pow_v,
         round(sqrt(abs(c_acctbal)), 9) AS sqrt_v,
         round(ln(abs(c_acctbal) + 1), 9) AS ln_v,
         round(log10(abs(c_acctbal) + 1), 9) AS log10_v,
         round(log2(c_custkey + 1), 9) AS log2_v,
         round(exp(c_custkey % 5), 9) AS exp_v,
         CAST(sign(c_acctbal) AS INT) AS sign_v,
         greatest(c_custkey, CAST(c_nationkey AS BIGINT)) AS gr,
         least(c_custkey, CAST(c_nationkey AS BIGINT)) AS le,
         to_base(c_custkey, 16) AS hex_v,
         to_base(c_custkey, 2) AS bin_v,
         round(pi(), 9) AS pi_v
         FROM customer ORDER BY c_custkey""",
    "func_temporal" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INT) AS y,
         CAST(quarter(o_orderdate) AS INT) AS q,
         CAST(month(o_orderdate) AS INT) AS m,
         CAST(day(o_orderdate) AS INT) AS d,
         CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
         CAST(dayofyear(o_orderdate) AS INT) AS doy,
         CAST(weekofyear(o_orderdate) AS INT) AS woy,
         date_trunc('month', o_orderdate) AS mon_start,
         CAST(o_orderdate AS DATE) AS as_date,
         CAST(o_orderdate AS DATE) + 30 AS plus30,
         last_day(CAST(o_orderdate AS DATE)) AS eom,
         datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to,
         CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
         FROM orders ORDER BY o_orderkey""",
    "func_conditional" ->
      """SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band,
         c_acctbal BETWEEN 1000 AND 2000 AS in_band,
         c_mktsegment IN ('BUILDING', 'MACHINERY') AS seg_in,
         coalesce(nullif(c_mktsegment, 'BUILDING'), '(b)') AS nf,
         c_nationkey IS NOT DISTINCT FROM 3 AS ndis,
         TRUE AS always_true
         FROM customer ORDER BY c_custkey""",
    "func_json" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
         json_valid(props) AND regexp_matches(props, '^\s*\{') AS is_obj,
         json_valid(props) AS is_val
         FROM events ORDER BY event_id""",
    "func_crypto" ->
      """SELECT n_nationkey,
         md5(n_name) AS md5_v,
         sha256(n_name) AS sha256_v,
         base64(CAST(n_name AS BLOB)) AS b64,
         n_name AS roundtrip
         FROM nation ORDER BY n_nationkey""",
    "func_collection" ->
      """SELECT doc_id,
         CAST(len(string_split(rtrim(text), ' ')) AS INT) AS n_tokens,
         string_split(rtrim(text), ' ')[1] AS tok1,
         string_split(rtrim(text), ' ')[-1] AS tok_last,
         list_contains(string_split(rtrim(text), ' '), 'data') AS has_data,
         array_to_string(list_sort(list_distinct(string_split(rtrim(text), ' '))), ' ') AS vocab,
         array_to_string(string_split(rtrim(text), ' ')[1:3], ' ') AS first3,
         'lang source' AS mkeys,
         lang AS mval
         FROM documents ORDER BY doc_id""",
    "func_regexp" ->
      """SELECT p_partkey,
         regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
         regexp_replace(p_brand, '[0-9]', '#', 'g') AS masked,
         regexp_matches(p_type, '^(ECONOMY|PROMO)$') AS is_cheap,
         regexp_matches(regexp_extract(p_brand, '([0-9]+)', 1), '^[0-9]+$') AS num_ok,
         regexp_matches(p_type, '^[a-zA-Z]+$') AS type_alpha,
         regexp_matches(CAST(p_retailprice AS VARCHAR),
           '^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$') AS price_dec
         FROM part ORDER BY p_partkey""",
    "func_url" ->
      """SELECT doc_id,
         source || '.example.com' AS host,
         '/docs/' || doc_id AS path,
         lang AS qparam
         FROM documents ORDER BY doc_id"""
  )
}
