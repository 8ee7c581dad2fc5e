package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of a session conf over named declared queries (test
  * scope). Runs reps alternating conf=off/on in ONE JVM so box drift
  * cancels; prints per-arm times and medians.
  *
  *   sbt "Test/runMain graft.ABConf <confKey> <offVal> <onVal> <q1,q2> [reps]"
  */
object ABConf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ABConf <confKey> <offVal> <onVal> <q1,q2,...> [repsPerArm]")
    val key = args(0); val offV = args(1); val onV = args(2)
    val names = args(3).split(",").map(_.trim).toSeq
    val reps = if (args.length > 4) args(4).toInt else 4
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").limit(1).count()

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    for (q <- names) {
      val fn = SparkEntry.queries.getOrElse(q, sys.error(s"unknown $q"))
      // one unmeasured warm run per arm (codegen differs between plans)
      val times = Array.fill(2)(scala.collection.mutable.ArrayBuffer[Double]())
      for (r <- -1 until reps; arm <- 0 to 1) {
        spark.conf.set(key, if (arm == 0) offV else onV)
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (r >= 0) times(arm) += dt
        SparkEntry.releaseScopedCaches()
        spark.catalog.clearCache()
        System.gc()
      }
      println(f"[ab] $q%s off=${times(0).map(x => f"$x%.2f").mkString("/")}" +
        f" on=${times(1).map(x => f"$x%.2f").mkString("/")}" +
        f"  med off=${med(times(0).toSeq)}%.2f on=${med(times(1).toSeq)}%.2f")
    }
    spark.stop()
  }
}
