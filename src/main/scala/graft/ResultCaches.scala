package graft

/** Registry of RESULT caches the eager pipeline queries leave persisted
  * for their consumer (`Dedup.releasing`, CorpusOps' lshTopK result).
  *
  * Why it exists: `Bench`'s min-of-2 sampling re-invokes each query; a
  * plan-identical second construction finds the first run's
  * still-persisted result in the cache manager and completes in ~0 — the
  * recorded min is then the WARM cost, not the query's. The sf10 cold
  * re-run of `dedup_simhash` exposed this: minutes of real work against a
  * recorded 1.4 s. Bench now calls [[dropAll]] before every sample, so
  * each sample recomputes from the tables; shared INPUT fixtures
  * (TPC-DS session tables, the graph edge cache) are deliberately NOT
  * registered — amortizing inputs across a workload is a deployment
  * assumption, reusing a query's own result is not. */
object ResultCaches {
  private val refs =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.DataFrame]()

  def register(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    refs.add(df)
    df
  }

  /** Unpersist every registered result cache (lazy: blocks drop in the
    * background; the DataFrames recompute on their next action).
    *
    * Each unpersist is individually guarded and the queue is cleared in a
    * finally: after a fatal query error stops the SparkContext (the exact
    * scenario Bench.alive() rebuilds from), stale refs from the dead
    * session make unpersist throw (BlockManager RPC on a stopped env) —
    * an unguarded loop would then leave the queue poisoned and fail every
    * later sample, reintroducing the phantom-failure cascade. */
  def dropAll(): Unit =
    try {
      val it = refs.iterator()
      while (it.hasNext) {
        try it.next().unpersist(false)
        catch { case _: Throwable => } // dead session's ref: nothing to drop
      }
    } finally refs.clear()
}
