package graft.functions

import org.apache.spark.sql.SparkSession
import graft.sql.GraftSqlFunction

/** Example [[GraftSqlFunction]] implementations — what CREATE FUNCTION DDL
  * instantiates by class name (the reference ships ScalarFunction
  * subclasses the same way; UserDefinedFunctionHelper.instantiateFunction
  * requires exactly this public zero-arg-constructor shape). */

/** Vowel count of a string — a deterministic scalar with a clean SQL
  * oracle (`length(s) - length(regexp_replace(s,'[aeiou]',''))`). */
class VowelCountFn extends GraftSqlFunction {
  override def register(spark: SparkSession, name: String): Unit =
    spark.udf.register(name, (s: String) =>
      if (s == null) null.asInstanceOf[Integer]
      else Integer.valueOf(s.toLowerCase.count("aeiou".contains(_))))
}

/** Letter count (a–z, case-insensitive) — the ALTER FUNCTION target: same
  * signature as [[VowelCountFn]], visibly different results, so a query
  * after `ALTER FUNCTION f AS '...LetterCountFn'` proves the
  * re-registration actually switched implementations. */
class LetterCountFn extends GraftSqlFunction {
  override def register(spark: SparkSession, name: String): Unit =
    spark.udf.register(name, (s: String) =>
      if (s == null) null.asInstanceOf[Integer]
      else Integer.valueOf(s.count(_.isLetter)))
}
