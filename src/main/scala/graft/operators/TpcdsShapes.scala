package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** TPC-DS composite query shapes, adapted to the resident TPC-H-style
  * tables.
  *
  * The reference proves its batch SQL surface on 103 TPC-DS variants
  * (flink-end-to-end-tests/.../tpcds/TpcdsTestProgram.java:59-70). The DS
  * schema itself isn't in this harness's testdata, but the queries' VALUE
  * is their composite plan shapes — multi-channel UNION ALL feeding ROLLUP,
  * period-over-period windows over aggregates, INTERSECT-chained distinct
  * sets, mixed EXISTS/NOT-EXISTS profiling, ranking over grouping sets —
  * each exercising optimizer paths (Expand + partial agg, window-after-agg,
  * set-op planning, semi/anti conversion) that the plain TPC-H set does
  * not. Each query cites the DS number whose shape it reproduces.
  *
  * Scale notes: every query aggregates early (partial agg before the
  * union/window), joins dims via broadcast, and carries no correlated
  * per-row subquery — the shapes survive a 1000-executor fact scan.
  */
object TpcdsShapes {
  type QFn = (SparkSession, String) => DataFrame

  private val one = lit(1).cast(DecimalType(18, 2))
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def rev: Column = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** q5/q77 shape: per-channel revenue (sales vs returns as the two
    * "channels") joined to a time dim, totalled with ROLLUP(channel, yr) —
    * UNION-of-channels feeding a grouping-sets aggregate. */
  private def channelRollup(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders").select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
    val sales = l.filter(col("l_returnflag") =!= "R")
      .withColumn("channel", lit("sales"))
    val returns = l.filter(col("l_returnflag") === "R")
      .withColumn("channel", lit("returns"))
    sales.unionByName(returns)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("channel"), col("yr"))
      .agg(sum(rev).as("r"), count(lit(1)).as("cnt"))
      // partial agg per (channel, yr) first, then the tiny rollup — the
      // Expand runs over |channels|×|years| rows, not the fact table
      .rollup(col("channel"), col("yr"))
      .agg(sum(col("r")).cast("double").as("revenue"), sum(col("cnt")).as("n"))
      .select(coalesce(col("channel"), lit("ALL")).as("channel"),
        coalesce(col("yr"), lit(-1)).as("yr"), col("revenue"), col("n"))
      .orderBy(col("channel"), col("yr"))
  }

  /** q47/q57 shape: monthly revenue per nation, then a period-over-period
    * window — report months deviating >20% from the prev/next-month mean.
    * The window runs over the AGGREGATE (nations × months), not the fact. */
  private def periodDeviation(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(sum(rev).cast("double").as("revenue"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("yr"), col("mo"))
    monthly
      .withColumn("prev_rev", lag(col("revenue"), 1).over(w))
      .withColumn("next_rev", lead(col("revenue"), 1).over(w))
      .filter(col("prev_rev").isNotNull && col("next_rev").isNotNull)
      .withColumn("mean_adj", (col("prev_rev") + col("next_rev")) / 2.0)
      .filter(col("revenue") > col("mean_adj") * 1.2 ||
        col("revenue") < col("mean_adj") * 0.8)
      // no round(): Spark rounds the double's decimal string (HALF_UP),
      // DuckDB the binary value — a .xx5 edge diverges. The raw doubles are
      // bit-identical (exact decimal sum → cast; +, /2.0 are exact IEEE).
      .select(col("n_name"), col("yr"), col("mo"), col("revenue"), col("mean_adj"))
      .orderBy(col("n_name"), col("yr"), col("mo"))
  }

  /** q38/q87 shape: customers active in ALL of three consecutive years —
    * INTERSECT-chained distinct sets, then a scalar count. */
  private def crossPeriodCustomers(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def active(yr: Int): DataFrame =
      o.filter(year(col("o_orderdate")) === yr).select(col("o_custkey")).distinct()
    active(1995).intersect(active(1996)).intersect(active(1997))
      .agg(count(lit(1)).as("n_loyal"))
  }

  /** q10/q35 shape: per-nation profile of customers that (a) ordered in
    * 1995 (EXISTS → semi join), (b) never placed an URGENT order
    * (NOT EXISTS → anti join), (c) hold positive balance. */
  private def customerProfile(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val active = o.filter(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("u_custkey"))
    c.filter(col("c_acctbal") > 0)
      .join(active, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(urgent, col("c_custkey") === col("u_custkey"), "left_anti")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("c_acctbal")), 2).as("avg_bal"))
      .orderBy(col("n_name"))
  }

  /** q67 shape: revenue ROLLUP over (nation, yr), then rank WITHIN each
    * grouping level, keeping the top 3 — window over grouping-sets output. */
  private def rollupTopN(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
      .agg(sum(rev).as("r"))
      .rollup(col("n_name"), col("yr"))
      .agg(sum(col("r")).cast("double").as("revenue"))
      .select(coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("yr"), lit(-1)).as("yr"), col("revenue"),
        (col("n_name").isNull.cast("int") * 2 + col("yr").isNull.cast("int")).as("lvl"))
    val w = Window.partitionBy(col("lvl"))
      .orderBy(col("revenue").desc, col("n_name"), col("yr"))
    g.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("lvl"), col("rk"), col("n_name"), col("yr"), col("revenue"))
      .orderBy(col("lvl"), col("rk"))
  }

  /** q74/q11 shape: year-over-year per-customer revenue growth — the
    * aggregate self-joined to itself one period later, ratio-filtered, top
    * movers. The self-join runs over the per-(customer, year) AGGREGATE
    * (one row per customer-year), never fact×fact. */
  private def yoyGrowth(s: SparkSession, dir: String): DataFrame = {
    val yearly = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(sum(rev).as("r"))
    val base = yearly.filter(col("yr") === 1995)
      .select(col("o_custkey").as("custkey"), col("r").as("r_base"))
    val next = yearly.filter(col("yr") === 1996)
      .select(col("o_custkey").as("n_custkey"), col("r").as("r_next"))
    base.join(next, col("custkey") === col("n_custkey"))
      .filter(col("r_base") > 0)
      .withColumn("growth",
        col("r_next").cast("double") / col("r_base").cast("double"))
      .select(col("custkey"), col("r_base").cast("double").as("rev_1995"),
        col("r_next").cast("double").as("rev_1996"), col("growth"))
      .orderBy(col("growth").desc, col("custkey"))
      .limit(20)
  }

  /** q34/q73 shape: order-size demographics — count items per order, bucket
    * by size, then a conditional-aggregation pivot of bucket counts per
    * order priority (CASE-pivot over the aggregate, one fact pass). */
  private def orderSizePivot(s: SparkSession, dir: String): DataFrame = {
    val sizes = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
    val bucket = when(col("n_items") <= 2, "small")
      .when(col("n_items") <= 5, "mid").otherwise("large")
    t(s, dir, "orders")
      .join(sizes, col("o_orderkey") === col("l_orderkey"))
      .withColumn("bucket", bucket)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("bucket") === "small", 1L).otherwise(0L)).as("n_small"),
        sum(when(col("bucket") === "mid", 1L).otherwise(0L)).as("n_mid"),
        sum(when(col("bucket") === "large", 1L).otherwise(0L)).as("n_large"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** q93 shape: effective sales net of returns — the returned quantity per
    * (order, part) subtracted from the sold quantity, rolled up per
    * customer, top 10. A fact-to-fact join, kept safe by pre-aggregating
    * the returns side to one row per join key before joining. */
  private def netAfterReturns(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val qty = dec(col("l_quantity"))
    val ret = l.filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("r_ok"), col("l_partkey").as("r_pk"))
      .agg(sum(qty).as("r_qty"))
    val net = l.filter(col("l_returnflag") =!= "R")
      .join(ret, col("l_orderkey") === col("r_ok") && col("l_partkey") === col("r_pk"), "left")
      .withColumn("net_qty", qty - coalesce(col("r_qty"), lit(0).cast(DecimalType(18, 2))))
    net.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("net_qty")).cast("double").as("net_quantity"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("net_quantity").desc, col("o_custkey"))
      .limit(10)
  }

  /** q88 shape: eight COUNT bands over the fact in ONE scan — each band a
    * conditional count, never eight scans (the reference plans q88 as a
    * single multi-aggregate). The whole query is a scan + one partial-
    * aggregated reduce to a single row: the cheapest possible plan at any
    * scale, and the shape AQE can never mis-plan. */
  private def multiBandCounts(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val q = col("l_quantity").cast("double")
    val d = col("l_discount").cast("double")
    def band(name: String, cond: Column) =
      sum(when(cond, 1L).otherwise(0L)).as(name)
    l.agg(
      band("b_q1_lowdisc", q <= 10 && d < 0.05),
      band("b_q1_highdisc", q <= 10 && d >= 0.05),
      band("b_q2_lowdisc", q > 10 && q <= 25 && d < 0.05),
      band("b_q2_highdisc", q > 10 && q <= 25 && d >= 0.05),
      band("b_q3_lowdisc", q > 25 && q <= 40 && d < 0.05),
      band("b_q3_highdisc", q > 25 && q <= 40 && d >= 0.05),
      band("b_q4_lowdisc", q > 40 && d < 0.05),
      band("b_q4_highdisc", q > 40 && d >= 0.05))
  }

  /** q23 shape: frequent-item revenue — parts ordered in ≥ 4 distinct
    * orders within a year form the frequent set (HAVING over an agg), and
    * the fact then SEMI-joins that set before the revenue rollup. The
    * frequent set is orders of magnitude smaller than the fact, so the
    * semi join broadcasts; the having-filter runs on the (part, yr)
    * aggregate, never the raw scan. */
  private def frequentParts(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders").select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
    val lo = l.join(o, col("l_orderkey") === col("o_orderkey"))
    val freq = lo.groupBy(col("l_partkey").as("f_pk"), col("yr").as("f_yr"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .filter(col("n_orders") >= 4)
      .select(col("f_pk"), col("f_yr"))
    lo.join(broadcast(freq),
        col("l_partkey") === col("f_pk") && col("yr") === col("f_yr"), "left_semi")
      .groupBy(col("yr"))
      .agg(sum(rev).cast("double").as("freq_revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("yr"))
  }

  /** q51 shape: two per-channel CUMULATIVE series (window over the monthly
    * aggregate, per part) FULL OUTER joined on (part, month), reporting
    * months where the returns cumulative overtakes the sales cumulative.
    * The windows run over the pre-aggregated (part, month) grid, never the
    * fact; the full join aligns two sparse series — the optimizer shape
    * TPC-DS q51 exists to exercise. */
  private def cumulativeCompare(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    def channel(flag: String, a: String): DataFrame = {
      val w = Window.partitionBy(col(s"${a}_pk")).orderBy(col(s"${a}_mo"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      l.filter(col("l_returnflag") === flag)
        .groupBy(col("l_partkey").as(s"${a}_pk"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as(s"${a}_mo"))
        .agg(sum(rev).as(s"${a}_rev"))
        .withColumn(s"${a}_cum", sum(col(s"${a}_rev")).over(w))
    }
    val r = channel("R", "r")
    val n = channel("N", "n")
    r.join(n, col("r_pk") === col("n_pk") && col("r_mo") === col("n_mo"), "full")
      .select(coalesce(col("r_pk"), col("n_pk")).as("pk"),
        coalesce(col("r_mo"), col("n_mo")).as("mo"),
        coalesce(col("r_cum"), lit(0).cast(DecimalType(18, 2))).as("rc"),
        coalesce(col("n_cum"), lit(0).cast(DecimalType(18, 2))).as("nc"))
      .filter(col("rc") > col("nc"))
      .groupBy(col("mo"))
      .agg(count(lit(1)).as("n_overtaken"),
        sum(col("rc") - col("nc")).cast("double").as("gap"))
      .orderBy(col("mo"))
  }

  def queries: Map[String, QFn] = Map(
    "dsq_cumulative_compare" -> (cumulativeCompare _),
    "dsq_multi_band_counts" -> (multiBandCounts _),
    "dsq_frequent_parts" -> (frequentParts _),
    "dsq_yoy_growth" -> (yoyGrowth _),
    "dsq_order_size_pivot" -> (orderSizePivot _),
    "dsq_net_after_returns" -> (netAfterReturns _),
    "dsq_channel_rollup" -> (channelRollup _),
    "dsq_period_deviation" -> (periodDeviation _),
    "dsq_cross_period_customers" -> (crossPeriodCustomers _),
    "dsq_customer_profile" -> (customerProfile _),
    "dsq_rollup_topn" -> (rollupTopN _)
  )

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  def oracles: Map[String, String] = Map(
    "dsq_cumulative_compare" ->
      s"""WITH r0 AS (
            SELECT l_partkey AS pk,
                   CAST(year(CAST(l_shipdate AS DATE)) * 100
                        + month(CAST(l_shipdate AS DATE)) AS INT) AS mo,
                   sum($revSql) AS rev
            FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2),
          rc AS (SELECT pk, mo, sum(rev) OVER (PARTITION BY pk ORDER BY mo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM r0),
          n0 AS (
            SELECT l_partkey AS pk,
                   CAST(year(CAST(l_shipdate AS DATE)) * 100
                        + month(CAST(l_shipdate AS DATE)) AS INT) AS mo,
                   sum($revSql) AS rev
            FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1, 2),
          nc AS (SELECT pk, mo, sum(rev) OVER (PARTITION BY pk ORDER BY mo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM n0),
          j AS (SELECT coalesce(rc.pk, nc.pk) AS pk, coalesce(rc.mo, nc.mo) AS mo,
                  coalesce(rc.cum, 0) AS rcum, coalesce(nc.cum, 0) AS ncum
                FROM rc FULL JOIN nc ON rc.pk = nc.pk AND rc.mo = nc.mo)
          SELECT mo, count(*) AS n_overtaken,
                 CAST(sum(rcum - ncum) AS DOUBLE) AS gap
          FROM j WHERE rcum > ncum GROUP BY mo ORDER BY mo""",
    "dsq_multi_band_counts" ->
      """SELECT
           sum(CASE WHEN CAST(l_quantity AS DOUBLE) <= 10 AND CAST(l_discount AS DOUBLE) < 0.05 THEN 1 ELSE 0 END)::BIGINT AS b_q1_lowdisc,
           sum(CASE WHEN CAST(l_quantity AS DOUBLE) <= 10 AND CAST(l_discount AS DOUBLE) >= 0.05 THEN 1 ELSE 0 END)::BIGINT AS b_q1_highdisc,
           sum(CASE WHEN CAST(l_quantity AS DOUBLE) > 10 AND CAST(l_quantity AS DOUBLE) <= 25 AND CAST(l_discount AS DOUBLE) < 0.05 THEN 1 ELSE 0 END)::BIGINT AS b_q2_lowdisc,
           sum(CASE WHEN CAST(l_quantity AS DOUBLE) > 10 AND CAST(l_quantity AS DOUBLE) <= 25 AND CAST(l_discount AS DOUBLE) >= 0.05 THEN 1 ELSE 0 END)::BIGINT AS b_q2_highdisc,
           sum(CASE WHEN CAST(l_quantity AS DOUBLE) > 25 AND CAST(l_quantity AS DOUBLE) <= 40 AND CAST(l_discount AS DOUBLE) < 0.05 THEN 1 ELSE 0 END)::BIGINT AS b_q3_lowdisc,
           sum(CASE WHEN CAST(l_quantity AS DOUBLE) > 25 AND CAST(l_quantity AS DOUBLE) <= 40 AND CAST(l_discount AS DOUBLE) >= 0.05 THEN 1 ELSE 0 END)::BIGINT AS b_q3_highdisc,
           sum(CASE WHEN CAST(l_quantity AS DOUBLE) > 40 AND CAST(l_discount AS DOUBLE) < 0.05 THEN 1 ELSE 0 END)::BIGINT AS b_q4_lowdisc,
           sum(CASE WHEN CAST(l_quantity AS DOUBLE) > 40 AND CAST(l_discount AS DOUBLE) >= 0.05 THEN 1 ELSE 0 END)::BIGINT AS b_q4_highdisc
         FROM lineitem""",
    "dsq_frequent_parts" ->
      s"""WITH lo AS (
            SELECT l.*, year(CAST(o_orderdate AS DATE)) AS yr, o_orderkey AS ook
            FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey),
          freq AS (
            SELECT l_partkey AS f_pk, yr AS f_yr
            FROM lo GROUP BY 1, 2 HAVING count(DISTINCT l_orderkey) >= 4)
          SELECT yr, CAST(sum($revSql) AS DOUBLE) AS freq_revenue,
                 count(*) AS n_lines
          FROM lo
          WHERE EXISTS (SELECT 1 FROM freq
                        WHERE f_pk = lo.l_partkey AND f_yr = lo.yr)
          GROUP BY yr ORDER BY yr""",
    "dsq_yoy_growth" ->
      s"""WITH yearly AS (
            SELECT o_custkey, year(o_orderdate) AS yr, sum($revSql) AS r
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2)
          SELECT b.o_custkey AS custkey,
                 CAST(b.r AS DOUBLE) AS rev_1995,
                 CAST(n.r AS DOUBLE) AS rev_1996,
                 CAST(n.r AS DOUBLE) / CAST(b.r AS DOUBLE) AS growth
          FROM yearly b JOIN yearly n ON b.o_custkey = n.o_custkey
          WHERE b.yr = 1995 AND n.yr = 1996 AND b.r > 0
          ORDER BY growth DESC, custkey LIMIT 20""",
    "dsq_order_size_pivot" ->
      """WITH sizes AS (
           SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY 1),
         b AS (
           SELECT o_orderpriority,
                  CASE WHEN n_items <= 2 THEN 'small'
                       WHEN n_items <= 5 THEN 'mid' ELSE 'large' END AS bucket
           FROM orders JOIN sizes ON o_orderkey = l_orderkey)
         SELECT o_orderpriority,
                CAST(sum(CASE WHEN bucket = 'small' THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
                CAST(sum(CASE WHEN bucket = 'mid' THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
                CAST(sum(CASE WHEN bucket = 'large' THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
                count(*) AS n_orders
         FROM b GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "dsq_net_after_returns" ->
      """WITH ret AS (
           SELECT l_orderkey AS r_ok, l_partkey AS r_pk,
                  sum(CAST(l_quantity AS DECIMAL(18,2))) AS r_qty
           FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2),
         net AS (
           SELECT l.l_orderkey,
                  CAST(l.l_quantity AS DECIMAL(18,2))
                    - coalesce(r.r_qty, CAST(0 AS DECIMAL(18,2))) AS net_qty
           FROM lineitem l LEFT JOIN ret r
             ON l.l_orderkey = r.r_ok AND l.l_partkey = r.r_pk
           WHERE l.l_returnflag <> 'R')
         SELECT o_custkey,
                CAST(sum(net_qty) AS DOUBLE) AS net_quantity,
                count(*) AS n_lines
         FROM net JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_custkey
         ORDER BY net_quantity DESC, o_custkey LIMIT 10""",
    "dsq_channel_rollup" ->
      s"""WITH ch AS (
            SELECT CASE WHEN l_returnflag = 'R' THEN 'returns' ELSE 'sales' END AS channel,
                   year(o_orderdate) AS yr, sum($revSql) AS r, count(*) AS cnt
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2)
          SELECT coalesce(channel, 'ALL') AS channel, coalesce(yr, -1) AS yr,
                 CAST(sum(r) AS DOUBLE) AS revenue, CAST(sum(cnt) AS BIGINT) AS n
          FROM ch GROUP BY ROLLUP(channel, yr)
          ORDER BY channel, yr""",
    "dsq_period_deviation" ->
      s"""WITH monthly AS (
            SELECT n_name, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                   CAST(sum($revSql) AS DOUBLE) AS revenue
            FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2, 3),
          win AS (
            SELECT n_name, yr, mo, revenue,
                   lag(revenue) OVER w AS prev_rev,
                   lead(revenue) OVER w AS next_rev
            FROM monthly WINDOW w AS (PARTITION BY n_name ORDER BY yr, mo))
          SELECT n_name, yr, mo, revenue,
                 (prev_rev + next_rev) / 2.0 AS mean_adj
          FROM win
          WHERE prev_rev IS NOT NULL AND next_rev IS NOT NULL
            AND (revenue > (prev_rev + next_rev) / 2.0 * 1.2
              OR revenue < (prev_rev + next_rev) / 2.0 * 0.8)
          ORDER BY n_name, yr, mo""",
    "dsq_cross_period_customers" ->
      """SELECT count(*) AS n_loyal FROM (
           SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
           INTERSECT
           SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
           INTERSECT
           SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)""",
    "dsq_customer_profile" ->
      """SELECT n_name, count(*) AS n_customers, round(avg(c_acctbal), 2) AS avg_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE c_acctbal > 0
           AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                       AND year(o_orderdate) = 1995)
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderpriority = '1-URGENT')
         GROUP BY n_name ORDER BY n_name""",
    "dsq_rollup_topn" ->
      s"""WITH g AS (
            SELECT n_name, year(o_orderdate) AS yr, sum($revSql) AS r
            FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2),
          ru AS (
            SELECT coalesce(n_name, 'ALL') AS n_name, coalesce(yr, -1) AS yr,
                   CAST(sum(r) AS DOUBLE) AS revenue,
                   CASE WHEN n_name IS NULL THEN 2 ELSE 0 END
                     + CASE WHEN yr IS NULL THEN 1 ELSE 0 END AS lvl
            FROM g GROUP BY ROLLUP(n_name, yr)),
          rk AS (
            SELECT lvl, n_name, yr, revenue,
                   row_number() OVER (PARTITION BY lvl ORDER BY revenue DESC, n_name, yr) AS rk
            FROM ru)
          SELECT lvl, rk, n_name, yr, revenue FROM rk
          WHERE rk <= 3 ORDER BY lvl, rk"""
  )
}
