package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function gap-fillers: the reference SQL surface functions that have
  * no same-named Spark built-in (SURVEY.md §2.8; reference list in
  * flink-table-common BuiltInFunctionDefinitions.java and
  * flink-table-planner-blink FlinkSqlOperatorTable.java).
  *
  * Each is a pure composition of codegen'd Spark `functions._` Columns — no
  * UDFs, so whole-stage codegen and pushdown stay intact (a Scala UDF here
  * would black-box the expression and break constant folding / pruning).
  */
object GraftFunctions {

  /** SPLIT_INDEX(str, sep, index) — 0-based, null when out of range
    * (FlinkSqlOperatorTable SPLIT_INDEX). */
  def split_index(str: Column, sep: String, index: Int): Column =
    element_at(split(str, java.util.regex.Pattern.quote(sep)), index + 1)

  /** IS_ALPHA(s): true iff all chars are letters (FlinkSqlOperatorTable). */
  def is_alpha(c: Column): Column =
    c.isNotNull && c.rlike("^[a-zA-Z]+$")

  /** IS_DIGIT(s): true iff all chars are decimal digits. */
  def is_digit(c: Column): Column =
    c.isNotNull && c.rlike("^[0-9]+$")

  /** IS_DECIMAL(s): true iff the string parses as a number. */
  def is_decimal(c: Column): Column =
    c.isNotNull && c.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")

  /** HASH_CODE(s) — deterministic 32-bit hash of a string. The reference
    * uses Java String.hashCode (HashCodeCallGen); we reproduce it exactly
    * with an aggregate fold so it stays a Catalyst expression. */
  def hash_code(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch)),
      lit(0),
      (acc, x) => acc * lit(31) + x)

  /** Flink TO_BASE64 / FROM_BASE64. */
  def to_base64(c: Column): Column = base64(c.cast("binary"))
  def from_base64_str(c: Column): Column = unbase64(c).cast("string")

  /** Flink STR_TO_MAP(str, listDelim, kvDelim). Spark has str_to_map too;
    * re-exported for the Flink argument order/defaults. */
  def str_to_map_compat(c: Column, listDelim: String = ",", kvDelim: String = "="): Column =
    str_to_map(c, lit(java.util.regex.Pattern.quote(listDelim)),
               lit(java.util.regex.Pattern.quote(kvDelim)))

  /** Flink IS JSON predicate family (Flink 1.12 exposes IS JSON_VALUE etc.).
    * True iff the string is parseable JSON of the given kind. */
  def is_json_object(c: Column): Column =
    try_parse_json(c).isNotNull && c.rlike("^\\s*\\{")
  def is_json_array(c: Column): Column =
    try_parse_json(c).isNotNull && c.rlike("^\\s*\\[")
  def is_json_value(c: Column): Column =
    try_parse_json(c).isNotNull

  /** MULTISET value→count map (Flink COLLECT agg result shape,
    * CollectAggFunction): built from a collected list. */
  def multiset_from_list(c: Column): Column =
    map_from_entries(
      transform(
        array_distinct(c),
        v => struct(v.as("key"),
          aggregate(c, lit(0), (acc, x) => when(x === v, acc + 1).otherwise(acc)).as("value"))))
}
