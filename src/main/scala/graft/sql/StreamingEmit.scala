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
    * early fire (flushed by the next row, absorbed by the terminal fire). */
  case class Accum(
      hasPrev: Boolean, prevBidx: Long,
      n: Long, cnt: Array[Long], sum: Array[Double],
      mn: Array[Double], mx: Array[Double],
      hasPending: Boolean, pendFireUs: Long, pendN: Long,
      pendCnt: Array[Long], pendSum: Array[Double],
      pendMn: Array[Double], pendMx: Array[Double])

  private def zero(k: Int) = Accum(
    hasPrev = false, prevBidx = 0L, n = 0L,
    Array.fill(k)(0L), Array.fill(k)(0.0),
    Array.fill(k)(Double.PositiveInfinity), Array.fill(k)(Double.NegativeInfinity),
    hasPending = false, 0L, 0L,
    Array.fill(k)(0L), Array.fill(k)(0.0), Array.fill(k)(0.0), Array.fill(k)(0.0))

  /** @param aggs (FN, arg, alias) triples from EmitStrategy.parseSelect */
  def tumble(session: SparkSession, src: DataFrame, tsCol: String,
             widthUs: Long, delayUs: Long, groupCols: Seq[String],
             aggs: Seq[(String, String, String)], wsAlias: String,
             tiebreak: Option[String]): DataFrame = {
    require(src.isStreaming, "StreamingEmit.tumble expects a streaming source")
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
    // the original event-time attribute rides along unrenamed: its metadata
    // carries the watermark tag the stateful operator's event-time timeout
    // requires (projecting it away would strip the watermark)
    val prepared = src.select(
      col(tsCol),
      struct(groupCols.map(col): _*).as("__g"),
      expr(s"($uts div ${widthUs}L) * ${widthUs}L").as("__ws"),
      expr(uts).as("__uts"),
      expr(s"$uts div ${delayUs}L").as("__bidx"),
      tiebreak.map(c => col(c).cast("double")).getOrElse(lit(0.0)).as("__tb"),
      vals.as("__vals"),
      nulls.as("__nulls"))

    val gStruct = prepared.schema("__g").dataType.asInstanceOf[StructType]
    val keySchema = StructType(Seq(
      StructField("ws", LongType, nullable = false),
      StructField("g", gStruct, nullable = false)))
    val aggFields = aggs.map { case (fn, _, alias) =>
      StructField(alias, if (fn == "COUNT") LongType else DoubleType)
    }
    val fullOut = StructType(
      (StructField(wsAlias, TimestampType) +: gStruct.fields.toSeq) ++ aggFields ++ Seq(
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
      val gRow = key.getStruct(1)
      val wEndUs = ws + widthUs
      def row(fireUs: Long, isFinal: Boolean, vs: Seq[Any]): Row =
        Row.fromSeq(
          (new Timestamp(ws / 1000) +: gRow.toSeq) ++ vs ++
            Seq(new Timestamp(fireUs / 1000), isFinal))

      if (state.hasTimedOut) {
        // terminal fire: watermark passed window end — the pending early
        // fire (if any) came from the window's last row and is absorbed
        val a = state.get
        val out = row(wEndUs, isFinal = true,
          outputs(a, a.cnt, a.sum, a.mn, a.mx, a.n))
        state.remove()
        Iterator.single(out)
      } else if (wEndUs / 1000 <= state.getCurrentWatermarkMs) {
        // late rows for a window the watermark already closed are dropped —
        // rebuilding state from zero would emit a SECOND is_final row with
        // partial aggregates; the reference drops late events instead. If
        // the open-window state survived to here (late data arrived in the
        // very batch the watermark crossed window end, and a data invocation
        // suppresses the timeout invocation for the key), the terminal fire
        // happens now, exactly once.
        if (state.exists) {
          val a = state.get
          state.remove()
          Iterator.single(row(wEndUs, isFinal = true,
            outputs(a, a.cnt, a.sum, a.mn, a.mx, a.n)))
        } else Iterator.empty
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
      .groupByKey(r => Row(r.getLong(2), r.getStruct(1)))(Encoders.row(keySchema))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        func)(Encoders.product[Accum], Encoders.row(fullOut))
      .toDF()
  }
}
