package graft.operators

import graft.GraftSession

/** Scale probe for the TPC-DS family: regenerate the FACT tables at
  * `mult`× row count (the `range(n)` in each generator — the modular key
  * arithmetic then revisits the same fixed dimensions, which is TPC-DS's
  * own scaling rule: dims grow sub-linearly, facts linearly) and run all
  * 103 queries against the scaled parquet.
  *
  * Purpose mirrors [[graft.ScaleUp]] (BASELINE.md sf1 probe): surface the
  * plan or skew bottleneck the fixed-size correctness fixture cannot see —
  * a star join that stops broadcasting, an accidental cartesian, a
  * driver-side collect — before claiming the 100 TB shape holds. The probe
  * is Spark-side only; the DuckDB oracle gate stays on the unscaled
  * fixture where both engines replay identical texts.
  *
  * Usage: runMain graft.operators.TpcdsScaleProbe [mult]   (default 10)
  */
object TpcdsScaleProbe {

  /** fact table -> base range(n) row count in [[TpcdsFixture.tableSql]]. */
  private val facts = Map(
    "store_sales" -> 80000L, "catalog_sales" -> 40000L, "web_sales" -> 30000L,
    "store_returns" -> 8000L, "catalog_returns" -> 4000L, "web_returns" -> 3000L,
    "inventory" -> 50000L)

  def main(args: Array[String]): Unit = {
    val mult = args.lift(0).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Content-addressed like Tpcds.root: a fixture-schema change must
    // invalidate pre-existing scale dirs instead of silently reusing a
    // stale schema (round-7 ADVICE — new catalog_returns columns would
    // otherwise mis-run q64/q91 against old parquet).
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(TpcdsFixture.tableSql.toSeq.sortBy(_._1).mkString.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    val root = s"target/tpcds_scale/$digest/x$mult"
    TpcdsFixture.tableSql.foreach { case (name, sql) =>
      val scaled = facts.get(name).fold(sql) { n =>
        val from = s"range($n)"
        require(sql.contains(from), s"$name generator lost its $from")
        sql.replace(from, s"range(${n * mult})")
      }
      val dir = new java.io.File(s"$root/$name")
      if (!dir.isDirectory || !new java.io.File(dir, "_SUCCESS").isFile)
        spark.sql(scaled).write.mode("overwrite").parquet(dir.getPath)
    }
    TpcdsFixture.tableSql.keys.foreach { n =>
      spark.read.parquet(s"$root/$n").createOrReplaceTempView(n)
    }
    val cartesians = scala.collection.mutable.ArrayBuffer.empty[String]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val times = TpcdsFixture.querySql.toSeq.sortBy(_._1).map { case (q, (_, sql)) =>
      val t = try {
        val df = spark.sql(sql)
        if (df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
          cartesians += q
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        errors(q) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
        0.0
      }
      q -> math.rint(t * 1000) / 1000
    }
    val total = math.rint(times.map(_._2).sum * 1000) / 1000
    val qjson = times.map { case (q, t) => s""""$q":$t""" }.mkString(",")
    println(s"""{"metric":"tpcds_scale_probe","mult":$mult,"total_sec":$total,""" +
      s""""n_queries":${times.size},"n_errors":${errors.size},""" +
      s""""cartesians":[${cartesians.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""queries":{$qjson}}""")
    GraftSession.shutdown(spark)
  }
}
