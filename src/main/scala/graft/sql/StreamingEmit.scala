package graft.sql

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming execution of the early-fire TUMBLE emission log — the actual
  * streaming half of the reference's WindowEmitStrategy
  * (flink-table-planner `plan/utils/WindowEmitStrategy.scala:143-159`:
  * ContinuousEventTimeTrigger every `delay` plus the terminal fire when the
  * watermark closes the window, wired by StreamExecGroupWindowAggregate).
  *
  * The batch formulation in [[EmitStrategy]] defines the log declaratively;
  * this operator produces the SAME rows from an unbounded source, one
  * micro-batch at a time, so `spark.sql("... GROUP BY TUMBLE(...)")` over a
  * streaming temp view returns a streaming DataFrame the caller can
  * `writeStream` — the SQL dialect drives Structured Streaming end to end.
  *
  * Spark-first shape: `flatMapGroupsWithState` keyed on
  * (window start, group columns) with event-time timeout at window end.
  *  - early fires: a row whose delay-bucket index exceeds the previous
  *    row's buffers a fire of the running aggregate INCLUDING that row at
  *    `(bucket+1)·delay` (exactly the batch `__early`/`__fire0` columns);
  *    the buffer is flushed by the NEXT row of the window — so the window's
  *    last row never double-fires (the batch `CASE WHEN __last` absorb).
  *  - terminal fire: the event-time timeout when the watermark passes
  *    window end emits the full aggregate with `fire_time` = window end and
  *    `is_final` = true, then drops the state — bounded state, exactly one
  *    (small) accumulator per open (group, window), no per-row buffering.
  *
  * At 100 TB this is the right plan: one shuffle on (group, window-less
  * group key — Spark hashes the grouping key), per-key state is O(#aggs),
  * and emission is driven by the engine's own watermark, not a driver loop.
  *
  * Scope (matches the batch dialect subset): single TUMBLE window,
  * COUNT(*)/COUNT(x)/SUM/MIN/MAX/AVG over numeric columns (COUNT emits
  * long, the rest double), event-time order within a micro-batch restored
  * by a per-group sort (ties broken by the numeric tiebreak conf column
  * when set).
  */
object StreamingEmit {

  /** Per-(group, window) accumulator. `pend*` buffer the one not-yet-proven
    * early fire (flushed by the next row, absorbed by the terminal fire);
    * `terminalFired` marks a window past its is_final emission kept alive
    * only for allowed-lateness late fires. */
  case class Accum(
      hasPrev: Boolean, prevBidx: Long,
      n: Long, cnt: Array[Long], sum: Array[Double],
      mn: Array[Double], mx: Array[Double],
      hasPending: Boolean, pendFireUs: Long, pendN: Long,
      pendCnt: Array[Long], pendSum: Array[Double],
      pendMn: Array[Double], pendMx: Array[Double],
      terminalFired: Boolean = false)

  /** Timestamp from epoch micros WITHOUT millisecond truncation — session
    * starts/ends are raw event times with sub-ms precision (the batch log's
    * make_timestamp/timestamp_micros keep it; Timestamp(ms) would not). */
  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def zero(k: Int) = Accum(
    hasPrev = false, prevBidx = 0L, n = 0L,
    Array.fill(k)(0L), Array.fill(k)(0.0),
    Array.fill(k)(Double.PositiveInfinity), Array.fill(k)(Double.NegativeInfinity),
    hasPending = false, 0L, 0L,
    Array.fill(k)(0L), Array.fill(k)(0.0), Array.fill(k)(0.0), Array.fill(k)(0.0))

  /** @param aggs (FN, arg, alias) triples from EmitStrategy.parseSelect
    * @param latenessUs allowed lateness (the reference's late-fire emit,
    *   `withLateFirings(ElementTriggers.every())`): after the terminal fire
    *   the window's state survives for this long past window end, and each
    *   late row inside it joins the accumulate and re-fires immediately
    *   (is_final = false, fire_time = the watermark that admitted it);
    *   0 = terminal fire drops state at once (plain early-fire mode). */
  def tumble(session: SparkSession, src: DataFrame, tsCol: String,
             widthUs: Long, delayUs: Long, groupCols: Seq[String],
             aggs: Seq[(String, String, String)], wsAlias: String,
             tiebreak: Option[String], latenessUs: Long = 0L): DataFrame =
    windowed(session, src, tsCol, widthUs, None, delayUs, groupCols, aggs,
      wsAlias, tiebreak, latenessUs)

  /** Early-fire HOP on a stream: each row explodes into its size/slide
    * covering panes BEFORE the keyed stateful operator — exactly the shape
    * the batch log uses (the reference's per-pane assignment in
    * SliceAssigners) — and each (pane, group) then runs the identical
    * tumbling state machine with its own terminal timeout at pane end. The
    * explode is a narrow projection: the fan-out (size/slide panes per row)
    * happens before the one shuffle, and per-pane state stays O(#aggs). */
  def hop(session: SparkSession, src: DataFrame, tsCol: String,
          widthUs: Long, slideUs: Long, delayUs: Long, groupCols: Seq[String],
          aggs: Seq[(String, String, String)], wsAlias: String,
          tiebreak: Option[String], latenessUs: Long = 0L): DataFrame =
    windowed(session, src, tsCol, widthUs, Some(slideUs), delayUs, groupCols,
      aggs, wsAlias, tiebreak, latenessUs)

  /** Early-fire CUMULATE on a stream (expanding windows: panes share the
    * max-size-aligned start but end at successive step boundaries — the
    * per-slice shape of the reference's cumulative windows). Same machinery
    * as HOP — the pane end just joins the state key, because cumulate panes
    * are NOT distinguished by their start — and the pane end is surfaced as
    * an output column (`weAlias`) since the emission log would otherwise be
    * ambiguous across a window's panes. A row explodes into the panes whose
    * end exceeds its event time: (max/step − covered) panes per row. */
  def cumulate(session: SparkSession, src: DataFrame, tsCol: String,
               stepUs: Long, maxUs: Long, delayUs: Long, groupCols: Seq[String],
               aggs: Seq[(String, String, String)], wsAlias: String,
               weAlias: String, tiebreak: Option[String],
               latenessUs: Long = 0L): DataFrame =
    windowed(session, src, tsCol, maxUs, None, delayUs, groupCols,
      aggs, wsAlias, tiebreak, latenessUs, cumStepUs = Some(stepUs),
      weAliasOpt = Some(weAlias))

  private def windowed(session: SparkSession, src: DataFrame, tsCol: String,
                       widthUs: Long, slideUs: Option[Long], delayUs: Long,
                       groupCols: Seq[String],
                       aggs: Seq[(String, String, String)], wsAlias: String,
                       tiebreak: Option[String], latenessUs: Long,
                       cumStepUs: Option[Long] = None,
                       weAliasOpt: Option[String] = None): DataFrame = {
    require(src.isStreaming, "StreamingEmit.windowed expects a streaming source")
    val k = aggs.size
    val fns = aggs.map(_._1).toArray

    val uts = s"unix_micros(cast($tsCol as timestamp))"
    val vals = array(aggs.map { case (_, arg, _) =>
      if (arg == "*") lit(1.0) else col(arg).cast("double")
    }: _*)
    // per-agg null mask: SQL aggregates skip NULL inputs, and getSeq[Double]
    // on the values array would silently unbox a NULL element to 0.0 —
    // without the mask COUNT(x) would count nulls and SUM/MIN/MAX/AVG would
    // fold in 0.0, diverging from the batch EmitStrategy's real aggregates
    val nulls = array(aggs.map { case (_, arg, _) =>
      if (arg == "*") lit(false) else col(arg).isNull
    }: _*)
    // window assignment mirrors the batch build: tumble = the one covering
    // window, hop = explode into the size/slide covering set (starts
    // aligned to the slide), cumulate = one max-size-aligned start with the
    // pane ends exploded below — __bidx is per-row, identical across panes
    val wsExpr = slideUs match {
      case None => expr(s"($uts div ${widthUs}L) * ${widthUs}L")
      case Some(l) => expr(
        s"explode(sequence(($uts div ${l}L) * ${l}L - ${widthUs}L + ${l}L, " +
          s"($uts div ${l}L) * ${l}L, ${l}L))")
    }
    require(slideUs.isEmpty || cumStepUs.isEmpty, "hop and cumulate are exclusive")
    // Without lateness the original event-time attribute rides along
    // unrenamed: its watermark tag lets the engine's own late-row filter
    // drop behind-watermark input (cheap, correct — a late row could only
    // ever re-open a closed window). WITH lateness that filter would drop
    // every late row before the function saw it, and Spark rejects both a
    // second watermark downstream and an event-time timeout with no tagged
    // input column. So the source's watermark node is REMOVED from the plan
    // and replaced by one on a column shifted forward by lateness + width
    // with an equal delay: the global watermark still equals the true max
    // event time (shift and delay cancel), so getCurrentWatermarkMs and the
    // event-time timeouts keep true-watermark semantics, while the engine
    // filter now admits every row whose ts + lateness + width clears the
    // watermark — a superset of the reference's window-end rule
    // (wend ≤ ts + width), with the remainder dropped window-end-exactly by
    // the operator's beyond-lateness branch (WindowOperator.isWindowLate).
    val (srcForPrep, wmCol, wmDelay) =
      if (latenessUs <= 0) (src, col(tsCol), None)
      else {
        import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
        val shiftUs = latenessUs + widthUs
        val stripped = org.apache.spark.sql.GraftSqlBridge.ofRows(session,
          org.apache.spark.sql.GraftSqlBridge.logicalPlan(src).transformUp {
            case e: EventTimeWatermark => e.child
          })
        (stripped,
          expr(s"timestamp_micros($uts + ${shiftUs}L)").as("__wmguard"),
          Some(s"${shiftUs / 1000} milliseconds"))
      }
    val preparedBase = srcForPrep.select(
      wmCol,
      struct(groupCols.map(col): _*).as("__g"),
      wsExpr.as("__ws"),
      expr(uts).as("__uts"),
      expr(s"$uts div ${delayUs}L").as("__bidx"),
      tiebreak.map(c => col(c).cast("double")).getOrElse(lit(0.0)).as("__tb"),
      vals.as("__vals"),
      nulls.as("__nulls"))
    // the pane end joins the row (and the state key): tumble/hop panes are
    // start-determined, cumulate panes share a start and differ only in end
    val preparedWe = cumStepUs match {
      case None => preparedBase.withColumn("__we", col("__ws") + lit(widthUs))
      case Some(st) => preparedBase.withColumn("__we", explode(expr(
        s"sequence(__ws + ((__uts - __ws) div ${st}L + 1L) * ${st}L, " +
          s"__ws + ${widthUs}L, ${st}L)")))
    }
    val prepared = wmDelay match {
      case None => preparedWe
      case Some(d) => preparedWe.withWatermark("__wmguard", d)
    }

    val gStruct = prepared.schema("__g").dataType.asInstanceOf[StructType]
    val keySchema = StructType(Seq(
      StructField("ws", LongType, nullable = false),
      StructField("we", LongType, nullable = false),
      StructField("g", gStruct, nullable = false)))
    val aggFields = aggs.map { case (fn, _, alias) =>
      StructField(alias, if (fn == "COUNT") LongType else DoubleType)
    }
    val fullOut = StructType(
      (StructField(wsAlias, TimestampType) +:
        (weAliasOpt.map(a => StructField(a, TimestampType)).toSeq ++
          gStruct.fields.toSeq)) ++ aggFields ++ Seq(
        StructField("fire_time", TimestampType), StructField("is_final", BooleanType)))

    def outputs(a: Accum, useCnt: Array[Long], useSum: Array[Double],
                useMn: Array[Double], useMx: Array[Double], useN: Long): Seq[Any] =
      fns.zipWithIndex.map {
        case ("COUNT", i) => if (aggs(i)._2 == "*") useN else useCnt(i)
        case ("SUM", i) => if (useCnt(i) == 0) null else useSum(i)
        case ("AVG", i) => if (useCnt(i) == 0) null else useSum(i) / useCnt(i)
        case ("MIN", i) => if (useCnt(i) == 0) null else useMn(i)
        case ("MAX", i) => if (useCnt(i) == 0) null else useMx(i)
        case (other, _) => throw new IllegalArgumentException(s"agg $other")
      }.toSeq

    val func = (key: Row, it: Iterator[Row], state: GroupState[Accum]) => {
      val ws = key.getLong(0)
      val wEndUs = key.getLong(1)
      val gRow = key.getStruct(2)
      def row(fireUs: Long, isFinal: Boolean, vs: Seq[Any]): Row =
        Row.fromSeq(
          (tsOf(ws) +: (weAliasOpt.map(_ => tsOf(wEndUs)).toSeq ++ gRow.toSeq)) ++
            vs ++ Seq(tsOf(fireUs), isFinal))

      if (state.hasTimedOut) {
        val a = state.get
        if (a.terminalFired) {
          // allowed lateness expired: silent state cleanup
          state.remove()
          Iterator.empty
        } else {
          // terminal fire: watermark passed window end — the pending early
          // fire (if any) came from the window's last row and is absorbed.
          // With allowed lateness the state survives for late fires and a
          // second timeout reclaims it; without, it drops now.
          val out = row(wEndUs, isFinal = true,
            outputs(a, a.cnt, a.sum, a.mn, a.mx, a.n))
          if (latenessUs > 0) {
            state.update(a.copy(terminalFired = true, hasPending = false))
            state.setTimeoutTimestamp(math.max((wEndUs + latenessUs) / 1000 - 1,
              state.getCurrentWatermarkMs + 1))
          } else state.remove()
          Iterator.single(out)
        }
      } else if (wEndUs / 1000 <= state.getCurrentWatermarkMs) {
        // the watermark already closed this window. The terminal fires here
        // exactly once if its state survived (late data arrived in the very
        // batch the watermark crossed window end — a data invocation
        // suppresses the timeout invocation for the key). Then: rows inside
        // the allowed lateness each join the accumulate and re-fire
        // (the reference's delay-0 late trigger); rows beyond it drop — a
        // closed window never re-opens from zero, so no second is_final
        // with partial aggregates can ever appear.
        val wm = state.getCurrentWatermarkMs
        val fired = Seq.newBuilder[Row]
        var a = state.getOption.getOrElse(zero(k))
        if (state.exists && !a.terminalFired) {
          fired += row(wEndUs, isFinal = true,
            outputs(a, a.cnt, a.sum, a.mn, a.mx, a.n))
          a = a.copy(terminalFired = true, hasPending = false)
        }
        if (latenessUs > 0 && (wEndUs + latenessUs) / 1000 > wm) {
          // a window whose rows ALL arrive late never had a trigger at
          // close: no is_final, the first late element fires immediately
          // (zero-state path, terminalFired set without emission)
          a = a.copy(terminalFired = true)
          val sorted = it.toArray.sortBy(r => (r.getLong(3), r.getDouble(5)))
          sorted.foreach { r =>
            val vs = r.getSeq[Double](6)
            val nl = r.getSeq[Boolean](7)
            val cnt = a.cnt.clone(); val sum = a.sum.clone()
            val mn = a.mn.clone(); val mx = a.mx.clone()
            var i = 0
            while (i < k) {
              if (!nl(i)) {
                val v = vs(i)
                cnt(i) += 1; sum(i) += v
                if (v < mn(i)) mn(i) = v
                if (v > mx(i)) mx(i) = v
              }
              i += 1
            }
            a = a.copy(n = a.n + 1, cnt = cnt, sum = sum, mn = mn, mx = mx)
            fired += row(wm * 1000, isFinal = false,
              outputs(a, a.cnt, a.sum, a.mn, a.mx, a.n))
          }
          state.update(a)
          state.setTimeoutTimestamp(
            math.max((wEndUs + latenessUs) / 1000 - 1, wm + 1))
        } else {
          // beyond the allowed lateness (or none): drop the rows and any
          // surviving state
          if (state.exists) state.remove()
        }
        fired.result().iterator
      } else {
        var a = state.getOption.getOrElse(zero(k))
        val fired = Seq.newBuilder[Row]
        val sorted = it.toArray.sortBy(r => (r.getLong(3), r.getDouble(5)))
        sorted.foreach { r =>
          if (a.hasPending) { // next row proves the buffered fire wasn't last
            fired += row(a.pendFireUs, isFinal = false,
              outputs(a, a.pendCnt, a.pendSum, a.pendMn, a.pendMx, a.pendN))
            a = a.copy(hasPending = false)
          }
          val bidx = r.getLong(4)
          val vs = r.getSeq[Double](6)
          val nulls = r.getSeq[Boolean](7)
          val cnt = a.cnt.clone(); val sum = a.sum.clone()
          val mn = a.mn.clone(); val mx = a.mx.clone()
          var i = 0
          while (i < k) {
            if (!nulls(i)) { // SQL aggregates skip NULL inputs
              val v = vs(i)
              cnt(i) += 1; sum(i) += v
              if (v < mn(i)) mn(i) = v
              if (v > mx(i)) mx(i) = v
            }
            i += 1
          }
          val crossed = a.hasPrev && bidx > a.prevBidx
          a = a.copy(hasPrev = true, prevBidx = bidx, n = a.n + 1,
            cnt = cnt, sum = sum, mn = mn, mx = mx,
            hasPending = crossed,
            pendFireUs = if (crossed) (bidx + 1) * delayUs else a.pendFireUs,
            pendN = if (crossed) a.n + 1 else a.pendN,
            pendCnt = if (crossed) cnt.clone() else a.pendCnt,
            pendSum = if (crossed) sum.clone() else a.pendSum,
            pendMn = if (crossed) mn.clone() else a.pendMn,
            pendMx = if (crossed) mx.clone() else a.pendMx)
        }
        state.update(a)
        // fire the terminal when the watermark passes the window end (the
        // engine runs the timeout batch after the watermark advance)
        state.setTimeoutTimestamp(
          math.max(wEndUs / 1000 - 1, state.getCurrentWatermarkMs + 1))
        fired.result().iterator
      }
    }

    prepared
      .groupByKey(r => Row(r.getLong(2), r.getLong(8), r.getStruct(1)))(
        Encoders.row(keySchema))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        func)(Encoders.product[Accum], Encoders.row(fullOut))
      .toDF()
  }

  /** Open-session accumulator for [[session]]: the tumbling Accum plus the
    * session's own extent (start + last event time — the window is
    * data-defined, not key-defined). Always holds ≥1 row, so no hasPrev. */
  case class SessAccum(
      startUs: Long, lastUs: Long, prevBidx: Long,
      n: Long, cnt: Array[Long], sum: Array[Double],
      mn: Array[Double], mx: Array[Double],
      hasPending: Boolean, pendFireUs: Long, pendN: Long,
      pendCnt: Array[Long], pendSum: Array[Double],
      pendMn: Array[Double], pendMx: Array[Double])

  /** Early-fire SESSION on a stream — gap-merged windows in state
    * (the reference's SessionWindowAssigner under the same
    * WindowEmitStrategy). Keyed by the group columns alone (a session's
    * window is data-defined); state is the ONE open session per group:
    * a row within `gap` of the session's last event extends it (flushing /
    * buffering early fires exactly like the tumbling machine), a row beyond
    * the gap terminal-fires the old session and opens a new one, and the
    * event-time timeout at (last event + gap) terminal-fires the session
    * the data never closes. SESSION_START = the session's first event time;
    * terminal fire_time = last event + gap (the reference's merged-window
    * end), matching the batch gaps-and-islands log row for row.
    *
    * Ordering discipline: within a micro-batch rows sort by (ts, tiebreak);
    * ACROSS batches rows must arrive in event-time order per group — the
    * 0-delay max-event-time watermark enforces exactly that (anything
    * behind it is dropped as late, so a closed session can never re-open or
    * merge). That is the same total-order requirement the batch log's
    * deterministic formulation documents. */
  def session(spark: SparkSession, src: DataFrame, tsCol: String,
              gapUs: Long, delayUs: Long, groupCols: Seq[String],
              aggs: Seq[(String, String, String)], wsAlias: String,
              tiebreak: Option[String]): DataFrame = {
    require(src.isStreaming, "StreamingEmit.session expects a streaming source")
    val k = aggs.size
    val fns = aggs.map(_._1).toArray

    val uts = s"unix_micros(cast($tsCol as timestamp))"
    val vals = array(aggs.map { case (_, arg, _) =>
      if (arg == "*") lit(1.0) else col(arg).cast("double")
    }: _*)
    val nulls = array(aggs.map { case (_, arg, _) =>
      if (arg == "*") lit(false) else col(arg).isNull
    }: _*)
    val prepared = src.select(
      col(tsCol),
      struct(groupCols.map(col): _*).as("__g"),
      expr(uts).as("__uts"),
      expr(s"$uts div ${delayUs}L").as("__bidx"),
      tiebreak.map(c => col(c).cast("double")).getOrElse(lit(0.0)).as("__tb"),
      vals.as("__vals"),
      nulls.as("__nulls"))

    val gStruct = prepared.schema("__g").dataType.asInstanceOf[StructType]
    val aggFields = aggs.map { case (fn, _, alias) =>
      StructField(alias, if (fn == "COUNT") LongType else DoubleType)
    }
    val fullOut = StructType(
      (StructField(wsAlias, TimestampType) +: gStruct.fields.toSeq) ++ aggFields ++ Seq(
        StructField("fire_time", TimestampType), StructField("is_final", BooleanType)))

    def outputs(useCnt: Array[Long], useSum: Array[Double], useMn: Array[Double],
                useMx: Array[Double], useN: Long): Seq[Any] =
      fns.zipWithIndex.map {
        case ("COUNT", i) => if (aggs(i)._2 == "*") useN else useCnt(i)
        case ("SUM", i) => if (useCnt(i) == 0) null else useSum(i)
        case ("AVG", i) => if (useCnt(i) == 0) null else useSum(i) / useCnt(i)
        case ("MIN", i) => if (useCnt(i) == 0) null else useMn(i)
        case ("MAX", i) => if (useCnt(i) == 0) null else useMx(i)
        case (other, _) => throw new IllegalArgumentException(s"agg $other")
      }.toSeq

    def fresh(utsV: Long, bidx: Long, vs: Seq[Double], nl: Seq[Boolean]): SessAccum = {
      val cnt = Array.fill(k)(0L); val sum = Array.fill(k)(0.0)
      val mn = Array.fill(k)(Double.PositiveInfinity)
      val mx = Array.fill(k)(Double.NegativeInfinity)
      var i = 0
      while (i < k) {
        if (!nl(i)) { cnt(i) = 1L; sum(i) = vs(i); mn(i) = vs(i); mx(i) = vs(i) }
        i += 1
      }
      SessAccum(utsV, utsV, bidx, 1L, cnt, sum, mn, mx,
        hasPending = false, 0L, 0L,
        Array.fill(k)(0L), Array.fill(k)(0.0), Array.fill(k)(0.0), Array.fill(k)(0.0))
    }

    val func = (key: Row, it: Iterator[Row], state: GroupState[SessAccum]) => {
      def row(startUs: Long, fireUs: Long, isFinal: Boolean, vs: Seq[Any]): Row =
        Row.fromSeq(
          (tsOf(startUs) +: key.toSeq) ++ vs ++ Seq(tsOf(fireUs), isFinal))
      def terminal(a: SessAccum): Row =
        row(a.startUs, a.lastUs + gapUs, isFinal = true,
          outputs(a.cnt, a.sum, a.mn, a.mx, a.n))

      if (state.hasTimedOut) {
        val a = state.get
        state.remove()
        Iterator.single(terminal(a))
      } else {
        val wmMs = state.getCurrentWatermarkMs
        val fired = Seq.newBuilder[Row]
        var open: Option[SessAccum] = state.getOption
        // a session the watermark already closed (late data for the group
        // arrived in the closing batch, suppressing the timeout invocation)
        // terminal-fires before the new rows — exactly once
        open.foreach { a =>
          if ((a.lastUs + gapUs) / 1000 <= wmMs) { fired += terminal(a); open = None }
        }
        val sorted = it.toArray.sortBy(r => (r.getLong(2), r.getDouble(4)))
          .filter(r => r.getLong(2) / 1000 > wmMs) // drop late rows
        sorted.foreach { r =>
          val utsV = r.getLong(2); val bidx = r.getLong(3)
          val vs = r.getSeq[Double](5); val nl = r.getSeq[Boolean](6)
          open match {
            case Some(a) if utsV - a.lastUs > gapUs =>
              // gap exceeded: only late rows could still extend the old
              // session and they're dropped — terminal now, new one opens
              fired += terminal(a)
              open = Some(fresh(utsV, bidx, vs, nl))
            case Some(a0) =>
              var a = a0
              if (a.hasPending) { // next session row proves the fire wasn't last
                fired += row(a.startUs, a.pendFireUs, isFinal = false,
                  outputs(a.pendCnt, a.pendSum, a.pendMn, a.pendMx, a.pendN))
                a = a.copy(hasPending = false)
              }
              val cnt = a.cnt.clone(); val sum = a.sum.clone()
              val mn = a.mn.clone(); val mx = a.mx.clone()
              var i = 0
              while (i < k) {
                if (!nl(i)) { // SQL aggregates skip NULL inputs
                  val v = vs(i)
                  cnt(i) += 1; sum(i) += v
                  if (v < mn(i)) mn(i) = v
                  if (v > mx(i)) mx(i) = v
                }
                i += 1
              }
              val crossed = bidx > a.prevBidx
              open = Some(a.copy(lastUs = utsV, prevBidx = bidx, n = a.n + 1,
                cnt = cnt, sum = sum, mn = mn, mx = mx,
                hasPending = crossed,
                pendFireUs = if (crossed) (bidx + 1) * delayUs else a.pendFireUs,
                pendN = if (crossed) a.n + 1 else a.pendN,
                pendCnt = if (crossed) cnt.clone() else a.pendCnt,
                pendSum = if (crossed) sum.clone() else a.pendSum,
                pendMn = if (crossed) mn.clone() else a.pendMn,
                pendMx = if (crossed) mx.clone() else a.pendMx))
            case None =>
              open = Some(fresh(utsV, bidx, vs, nl))
          }
        }
        open match {
          case Some(a) =>
            state.update(a)
            state.setTimeoutTimestamp(
              math.max((a.lastUs + gapUs) / 1000 - 1, wmMs + 1))
          case None => if (state.exists) state.remove()
        }
        fired.result().iterator
      }
    }

    prepared
      .groupByKey(r => r.getStruct(1))(Encoders.row(gStruct))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        func)(Encoders.product[SessAccum], Encoders.row(fullOut))
      .toDF()
  }
}
