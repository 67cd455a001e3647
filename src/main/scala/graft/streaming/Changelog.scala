package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Changelog / RowKind adapter — SURVEY.md §1.1 and §4.4's hard part.
  *
  * The reference threads a per-row change flag through every Table-runtime
  * operator (RowKind.java:35-58 — +I insert, -U update-before, +U
  * update-after, -D delete; ChangelogNormalize, DropUpdateBefore). Spark has
  * no per-row flag; its contract is output modes + state. The adapter
  * surfaces the same information at the edges:
  *
  *  - `keyedChangelog`: per-key last-row tracking that EMITS the retract
  *    pairs (-U old, +U new) and +I first rows as tagged records — the
  *    `_change_kind` column of the sink contract. This is exactly what
  *    GroupAggFunction.java:141-169 emits around each accumulator update.
  *  - `dropUpdateBefore`: the reference's DropUpdateBeforeFunction — a
  *    filter on the tag.
  *  - upsert sinks: `foreachBatch` + merge keyed on the primary key;
  *    demonstrated in ChangelogSpec with an in-memory "table".
  */
object Changelog {

  case class Change(kind: String, key: Long, id: Long, ts: Long, value: Double)

  /** Update-mode keyed changelog: for every arriving row that becomes the
    * new "last row" of its key, emit (-U previous) then (+U new) — or (+I)
    * if the key is new. Late/stale rows emit nothing. */
  def keyedChangelog(rows: Dataset[KeyedRow]): Dataset[Change] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[LastRowEmit, Change](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state) =>
          val out = scala.collection.mutable.ListBuffer.empty[Change]
          var cur = state.getOption.orNull
          it.toArray.sortBy(r => (r.ts, r.id)).foreach { r =>
            if (cur == null) {
              cur = LastRowEmit(key, r.id, r.ts, r.value)
              out += Change("+I", key, r.id, r.ts, r.value)
            } else if (r.ts > cur.ts || (r.ts == cur.ts && r.id > cur.id)) {
              out += Change("-U", key, cur.id, cur.ts, cur.value)
              cur = LastRowEmit(key, r.id, r.ts, r.value)
              out += Change("+U", key, r.id, r.ts, r.value)
            } // stale row: no change
          }
          state.update(cur)
          out.iterator
      }
  }

  /** DropUpdateBefore (operators/misc/DropUpdateBeforeFunction.java):
    * retain only rows that add/overwrite (+I/+U), dropping -U retractions —
    * what a sink that upserts by key wants to consume. */
  def dropUpdateBefore(changes: Dataset[Change]): Dataset[Change] =
    changes.filter(col("kind") =!= "-U").as[Change](
      changes.sparkSession.implicits.newProductEncoder)

  /** Apply a changelog batch to a keyed store (the foreachBatch upsert
    * merge): +I/+U put, -D remove, -U ignored (always followed by +U). */
  def applyToStore(store: scala.collection.mutable.Map[Long, Change],
                   batch: Seq[Change]): Unit =
    batch.foreach { c =>
      c.kind match {
        case "+I" | "+U" => store(c.key) = c
        case "-D" => store.remove(c.key)
        case "-U" => // retraction of a value that +U will replace
      }
    }
}
