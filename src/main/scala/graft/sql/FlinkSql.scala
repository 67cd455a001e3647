package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParameterContext}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Flink-SQL group-window syntax front-end (SURVEY.md §7.2 M4).
  *
  * The reference parses `TUMBLE/HOP/SESSION(ts, INTERVAL ...)` group-window
  * functions and their `_START/_END` auxiliary accessors with a Calcite
  * grammar extension (flink-sql-parser parserImpls.ftl; operators declared in
  * FlinkSqlOperatorTable.java), then `WindowPropertiesRule.scala` /
  * `StreamLogicalWindowAggregateRule.scala` rewrite them onto its window
  * operators. Spark-first equivalent: a `ParserInterface` delegate —
  * registered via `SparkSessionExtensions.injectParser` — that rewrites the
  * Flink spelling onto Spark's native `window()` / `session_window()`
  * table-valued-ish grouping expressions, which Catalyst plans with its
  * built-in (and codegen'd) time-window machinery. Everything downstream
  * (planning, state, pushdown) is stock Spark — only the dialect is custom.
  *
  * Rewrites (case-insensitive):
  *   TUMBLE(ts, INTERVAL '10' MINUTE)        → window(ts, '10 minute')
  *   TUMBLE_START(args) / TUMBLE_END(args)   → window.start / window.end
  *   HOP(ts, INTERVAL slide, INTERVAL size)  → window(ts, 'size', 'slide')
  *   HOP_START / HOP_END                     → window.start / window.end
  *   SESSION(ts, INTERVAL gap)               → session_window(ts, 'gap')
  *   SESSION_START / SESSION_END             → session_window.start / .end
  *
  * Note HOP's argument order flips: Flink is (time, slide, size), Spark's
  * window() is (time, size, slide).
  */
object FlinkSql {

  private val interval = """INTERVAL\s+'([^']+)'\s+(\w+)""".r

  /** `INTERVAL '10' MINUTE` → the string literal `'10 minute'`. */
  private def intervalToDuration(expr: String): String = expr match {
    case interval(n, unit) => s"'$n ${unit.toLowerCase}'"
    case other => other // already a string literal like '10 minutes'
  }

  /** Split a top-level comma-separated argument list (respects nesting). */
  private def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var inStr = false
    s.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '\'' => inStr = !inStr
        case '(' | '[' if !inStr => depth += 1
        case ')' | ']' if !inStr => depth -= 1
        case ',' if depth == 0 && !inStr =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
    }
    out += s.substring(start).trim
    out.result()
  }

  /** Replace every `name(args)` call (case-insensitive, nesting-aware) using
    * `f(args)` to produce the replacement text. Matches are located on
    * literal/comment-BLANKED text (offset-preserving), so a group-window
    * keyword inside a string literal or comment — `SELECT 'TUMBLE(...)'` —
    * is never rewritten (found by fuzz family 29). */
  private[sql] def rewriteCalls(sql: String, name: String, f: Seq[String] => String): String = {
    val pat = ("""(?i)\b""" + name + """\s*\(""").r
    val sb = new StringBuilder
    var rest = sql
    var m = pat.findFirstMatchIn(blankLiteralsAndComments(rest))
    while (m.isDefined) {
      val mm = m.get
      sb.append(rest.substring(0, mm.start))
      // find the matching close paren
      var depth = 1; var i = mm.end; var inStr = false
      while (depth > 0 && i < rest.length) {
        rest.charAt(i) match {
          case '\'' => inStr = !inStr
          case '(' if !inStr => depth += 1
          case ')' if !inStr => depth -= 1
          case _ =>
        }
        i += 1
      }
      val args = splitArgs(rest.substring(mm.end, i - 1))
      sb.append(f(args))
      rest = rest.substring(i)
      m = pat.findFirstMatchIn(blankLiteralsAndComments(rest))
    }
    sb.append(rest)
    sb.toString
  }

  /** Rewrite the Flink group-window dialect onto Spark SQL. */
  def rewrite(sql: String): String = {
    var s = sql
    // auxiliary accessors first (TUMBLE_START would otherwise match TUMBLE)
    s = rewriteCalls(s, "TUMBLE_START", _ => "window.start")
    s = rewriteCalls(s, "TUMBLE_END", _ => "window.end")
    s = rewriteCalls(s, "HOP_START", _ => "window.start")
    s = rewriteCalls(s, "HOP_END", _ => "window.end")
    s = rewriteCalls(s, "SESSION_START", _ => "session_window.start")
    s = rewriteCalls(s, "SESSION_END", _ => "session_window.end")
    // rowtime accessors: the reference returns end − 1 ms as the window's
    // event-time attribute (TimeWindow.maxTimestamp) so windows can cascade
    // — a 10-minute window's rowtime falls inside the covering hour
    s = rewriteCalls(s, "TUMBLE_ROWTIME", _ => "(window.end - interval 1 millisecond)")
    s = rewriteCalls(s, "HOP_ROWTIME", _ => "(window.end - interval 1 millisecond)")
    s = rewriteCalls(s, "SESSION_ROWTIME", _ => "(session_window.end - interval 1 millisecond)")
    s = rewriteCalls(s, "TUMBLE", {
      case Seq(ts, size) => s"window($ts, ${intervalToDuration(size)})"
      case args => s"TUMBLE(${args.mkString(", ")})"
    })
    s = rewriteCalls(s, "HOP", {
      case Seq(ts, slide, size) =>
        s"window($ts, ${intervalToDuration(size)}, ${intervalToDuration(slide)})"
      case args => s"HOP(${args.mkString(", ")})"
    })
    s = rewriteCalls(s, "SESSION", {
      case Seq(ts, gap) => s"session_window($ts, ${intervalToDuration(gap)})"
      case args => s"SESSION(${args.mkString(", ")})"
    })
    s
  }

  /** Blank out single-quoted string literals and SQL comments (`--` and
    * `/* */`) so keyword dispatch can't be fooled by a literal or comment
    * containing MATCH_RECOGNIZE / FOR SYSTEM_TIME. Replacement preserves
    * offsets (chars become spaces) — only used for the dispatch *test*; the
    * original text is what gets parsed. */
  private[sql] def blankLiteralsAndComments(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    def blank(from: Int, until: Int): Unit = {
      var k = from
      while (k < until) { if (!out(k).isWhitespace) out(k) = ' '; k += 1 }
    }
    while (i < out.length) {
      out(i) match {
        case '\'' =>
          // honor the lexer's escapes: backslash escapes the next char and
          // a doubled '' is an escaped quote — neither closes the literal
          var j = i + 1
          var closed = false
          while (j < out.length && !closed) {
            out(j) match {
              case '\\' => j += 2
              case '\'' if j + 1 < out.length && out(j + 1) == '\'' => j += 2
              case '\'' => closed = true
              case _ => j += 1
            }
          }
          blank(i + 1, math.min(j, out.length)); i = j + 1
        case '-' if i + 1 < out.length && out(i + 1) == '-' =>
          var j = i
          while (j < out.length && out(j) != '\n') j += 1
          blank(i, j); i = j
        case '/' if i + 1 < out.length && out(i + 1) == '*' =>
          var j = i + 2
          while (j + 1 < out.length && !(out(j) == '*' && out(j + 1) == '/')) j += 1
          blank(i, math.min(j + 2, out.length)); i = j + 2
        case _ => i += 1
      }
    }
    new String(out)
  }

  /** Match `re` against the literal/comment-BLANKED text but slice every
    * capture group from the ORIGINAL (blanking preserves offsets). The
    * structural anchors of a front-end shape regex then can NOT be
    * satisfied by keywords inside string literals or comments — e.g. a
    * SELECT-list literal containing " FROM t GROUP BY TUMBLE(" no longer
    * steals the FROM clause — while captured fragments (select lists,
    * predicates) keep their literals intact for re-emission. The
    * dispatch-safety discipline fuzz family 30 enforces on every
    * text rewriter. Unanchored (findFirstMatchIn semantics). */
  private[sql] def blankedMatch(re: scala.util.matching.Regex, sql: String)
      : Option[IndexedSeq[String]] =
    re.findFirstMatchIn(blankLiteralsAndComments(sql)).map { m =>
      (1 to m.groupCount).map(i =>
        if (m.start(i) < 0) null else sql.substring(m.start(i), m.end(i)))
    }

  /** [[blankedMatch]] packaged as an extractor, so a front-end shape regex
    * keeps its `sql match { case shapeRe(groups...) => }` style while
    * locating structure on blanked text and slicing groups from the
    * original. FULL-match semantics, exactly like Scala's own
    * Regex.unapplySeq. */
  private[sql] class Blanked(re: scala.util.matching.Regex) {
    def matches(sql: String): Boolean = unapplySeq(sql).isDefined
    def unapplySeq(sql: String): Option[List[String]] = {
      val m = re.pattern.matcher(blankLiteralsAndComments(sql))
      if (!m.matches()) None
      else Some((1 to m.groupCount()).toList.map(i =>
        if (m.start(i) < 0) null else sql.substring(m.start(i), m.end(i))))
    }
  }

  /** Parser delegate: MATCH_RECOGNIZE routes to the CEP front-end;
    * everything else is dialect-rewritten and handed to Spark's parser. */
  class Parser(session: SparkSession, delegate: ParserInterface) extends ParserInterface {
    /** front-end dispatch: MATCH_RECOGNIZE / FOR SYSTEM_TIME AS OF clauses
      * build their plan through the custom operators; None = plain dialect.
      * The keyword test runs on literal/comment-stripped text so e.g. a
      * query selecting the string 'MATCH_RECOGNIZE(' parses normally. */
    private def frontEnd(sqlText: String): Option[LogicalPlan] = {
      val probe = blankLiteralsAndComments(sqlText)
      // lineage registry for view-chained temporal joins: a plain CREATE
      // VIEW still parses through the stock path below; only its
      // view → base-table edge is recorded here
      SystemTimeJoin.maybeRecordView(probe)
      // DROP FUNCTION stays native but evicts the CREATE FUNCTION
      // bookkeeping, so ALTER FUNCTION on a dropped name refuses
      FunctionDdl.noteDrop(session, probe)
      if (FunctionDdl.matches(probe))
        // CREATE FUNCTION <name> AS '<GraftSqlFunction class>'; non-graft
        // classes (Hive-style DDL) fall through to the stock parser
        FunctionDdl.tryRun(session, sqlText)
          .map(org.apache.spark.sql.GraftSqlBridge.logicalPlan)
          .orElse(Some(delegate.parsePlan(sqlText)))
      // ALTER FUNCTION <name> AS '<class>' — re-registration with the
      // reference's temporary-function refusal ladder
      else if (FunctionDdl.matchesAlter(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          FunctionDdl.runAlter(session, sqlText)))
      else if (WatermarkDdl.matches(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          WatermarkDdl.run(session, sqlText)))
      // filesystem connector sink tables (CREATE TABLE ... WITH, no
      // watermark) + INSERT INTO them; unregistered INSERT targets fall
      // through so Spark-native inserts keep working
      else if (ConnectorTables.matchesCreate(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          ConnectorTables.runCreate(session, sqlText)))
      else if (ConnectorTables.matchesInsert(probe))
        ConnectorTables.tryInsert(session, sqlText)
          .map(org.apache.spark.sql.GraftSqlBridge.logicalPlan)
          .orElse(Some(delegate.parsePlan(rewrite(sqlText))))
      // ALTER TABLE SET/RENAME + DROP TABLE on registered connector tables;
      // statements naming other tables fall through to Spark's own DDL
      else if (ConnectorTables.matchesAlterOrDrop(probe))
        ConnectorTables.tryAlterOrDrop(session, sqlText)
          .map(org.apache.spark.sql.GraftSqlBridge.logicalPlan)
          .orElse(Some(delegate.parsePlan(rewrite(sqlText))))
      // SHOW PARTITIONS on registered partitioned connector tables — the
      // reference's `partition name` k=v/k2=v2 result; other tables fall
      // through to Spark's native statement
      else if (ConnectorTables.matchesShowPartitions(probe))
        ConnectorTables.tryShowPartitions(session, sqlText)
          .map(org.apache.spark.sql.GraftSqlBridge.logicalPlan)
          .orElse(Some(delegate.parsePlan(rewrite(sqlText))))
      // SHOW DATABASES/TABLES/VIEWS/FUNCTIONS with the reference's result
      // column names, built over the DELEGATE parser so the dispatch can't
      // loop (CREATE/ALTER DATABASE property clauses are text rewrites in
      // preprocess; DROP DATABASE / USE are native spellings)
      else if (DatabaseDdl.matches(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          DatabaseDdl.run(session, sqlText, stmt =>
            org.apache.spark.sql.GraftSqlBridge.ofRows(session, delegate.parsePlan(stmt)))))
      // catalog statements: CREATE/DROP CATALOG, USE CATALOG, SHOW
      // CATALOGS, SHOW CURRENT CATALOG/DATABASE (+ the reference's
      // unsupported DESCRIBE CATALOG error) — built over the DELEGATE
      // parser like DatabaseDdl so the dispatch can't loop
      else if (CatalogDdl.matches(session, probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          CatalogDdl.run(session, sqlText, stmt =>
            org.apache.spark.sql.GraftSqlBridge.ofRows(session, delegate.parsePlan(stmt)))))
      // DESCRIBE <registered connector table> — the reference's six-column
      // result; DESCRIBE on anything else stays native Spark
      else if (DescribeTable.matches(session, probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          DescribeTable.run(session, sqlText)))
      else if (MatchRecognize.matches(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          MatchRecognize.run(session, sqlText)))
      else if (SystemTimeJoin.matches(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          SystemTimeJoin.run(session, sqlText)))
      // temporal TABLE FUNCTION laterals — the pre-FOR SYSTEM_TIME idiom
      // (LATERAL TABLE (Rates(o.rowtime))); only registered function names
      // dispatch, so Spark's LATERAL VIEW and stock laterals fall through
      else if (TemporalTableFunctions.matches(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          TemporalTableFunctions.run(session, sqlText)))
      // early-fire / late-fire emit strategies: config-gated, exactly like
      // the reference's TABLE_EXEC_EMIT_EARLY_FIRE_ENABLED / _LATE_FIRE_
      // ENABLED — with both confs unset, TUMBLE queries take the plain
      // window() rewrite below
      else if ((EmitStrategy.enabled(session).isDefined
          || EmitStrategy.lateEnabled(session)) && EmitStrategy.matches(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          EmitStrategy.run(session, sqlText)))
      // plain cumulative windows (no emit confs): one row per closed pane —
      // CUMULATE has no native window() counterpart, so it cannot take the
      // TUMBLE/HOP string rewrite below
      else if (CumulateSql.matches(probe))
        Some(org.apache.spark.sql.GraftSqlBridge.logicalPlan(
          CumulateSql.run(session, sqlText)))
      else None
    }

    /** Text-level pre-passes that run before dispatch: utility-statement
      * spellings (EXPLAIN PLAN FOR) and the
      * OPTIONS dynamic-table-options hint comment (resolved to a
      * per-query view — Spark's grammar only admits hints after SELECT, so
      * the table-attached spelling must leave the text before parsing). */
    private def preprocess(sqlText: String): String =
      ConnectorTables.resolveQualified(session,
        OptionsHint.rewrite(session,
          DatabaseDdl.rewrite(UtilityStatements.rewrite(sqlText))))

    override def parsePlan(sqlText: String): LogicalPlan = {
      val t = preprocess(sqlText)
      frontEnd(t).getOrElse(delegate.parsePlan(rewrite(t)))
    }
    override def parseQuery(sqlText: String): LogicalPlan = {
      val t = preprocess(sqlText)
      frontEnd(t).getOrElse(delegate.parseQuery(rewrite(t)))
    }
    override def parsePlanWithParameters(sqlText: String, ctx: ParameterContext): LogicalPlan = {
      val t = preprocess(sqlText)
      frontEnd(t).getOrElse(delegate.parsePlanWithParameters(rewrite(t), ctx))
    }
    override def parseExpression(sqlText: String): Expression =
      delegate.parseExpression(rewrite(sqlText))
    override def parseTableIdentifier(sqlText: String): TableIdentifier =
      delegate.parseTableIdentifier(sqlText)
    override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
      delegate.parseFunctionIdentifier(sqlText)
    override def parseMultipartIdentifier(sqlText: String): Seq[String] =
      delegate.parseMultipartIdentifier(sqlText)
    override def parseTableSchema(sqlText: String): StructType =
      delegate.parseTableSchema(sqlText)
    override def parseDataType(sqlText: String): DataType =
      delegate.parseDataType(sqlText)
    override def parseRoutineParam(sqlText: String): StructType =
      delegate.parseRoutineParam(sqlText)
  }

  /** Install via `SparkSession.builder.withExtensions(FlinkSql.extensions)`. */
  val extensions: SparkSessionExtensions => Unit =
    ext => ext.injectParser((session, delegate) => new Parser(session, delegate))
}
