package graft

import org.apache.spark.sql.SparkSession

/** Fixed-cost probe for the optimization rounds (test scope): how much of a
  * bench query's time is (a) `spark.read.parquet` metadata work (file
  * listing + footer schema inference), (b) DataFrame construction
  * (analysis), (c) execution. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.LoadProbe"
  */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").limit(1).count()

    def t(n: Int)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { body; i += 1 }
      (System.nanoTime() - t0) / 1e9 / n
    }

    // (a) raw read.parquet resolution cost, per call, amortized over 50
    for (tbl <- Seq("lineitem", "orders", "documents", "nation")) {
      val per = t(50)(spark.read.parquet(s"$d/$tbl.parquet"))
      println(f"[probe] read.parquet($tbl%s): ${per * 1000}%.1f ms/call")
    }
    // (a') with explicit schema (skips inference; still lists files)
    val sch = spark.read.parquet(s"$d/lineitem.parquet").schema
    val perSchema = t(50)(spark.read.schema(sch).parquet(s"$d/lineitem.parquet"))
    println(f"[probe] read.schema(...).parquet(lineitem): ${perSchema * 1000}%.1f ms/call")

    // (b) full query build (analysis incl. loads) vs (c) execute, for a
    // representative cheap query and a mid one
    for (q <- Seq("q01_pricing_summary", "q11_sort_limit", "q21_scalars",
        "q122_mad_outliers")) {
      val fn = SparkEntry.queries(q)
      val build = t(10) { fn(spark, d); SparkEntry.releaseScopedCaches()
        spark.catalog.clearCache() }
      val full = t(5) {
        fn(spark, d).write.format("noop").mode("overwrite").save()
        SparkEntry.releaseScopedCaches(); spark.catalog.clearCache()
      }
      println(f"[probe] $q%s: build=${build * 1000}%.0f ms  " +
        f"build+exec=${full * 1000}%.0f ms")
    }
    spark.stop()
  }
}
