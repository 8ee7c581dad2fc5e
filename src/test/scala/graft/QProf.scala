package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-query job/stage profiler (test scope). Runs named declared queries
  * through the noop sink with a listener recording each stage's wall span,
  * task count and summed task time. Prints a per-stage table — the local
  * substitute for the Spark UI's stage page (UI is disabled in bench).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.QProf q122_mad_outliers[,q143_...]"
  */
object QProf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: QProf q1[,q2,...] [reps]")
    val names = args(0).split(",").map(_.trim).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
    val b1 = if (sys.env.get("QPROF_CACHEAQE").contains("1"))
      b0.config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    else b0
    val spark = b1.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$d/lineitem.parquet").limit(1).count()

    case class St(name: String, submitted: Long, var completed: Long = 0L,
                  var tasks: Int = 0, var taskTimeMs: Long = 0L,
                  var shufReadMB: Double = 0, var shufWriteMB: Double = 0)
    val stages = mutable.LinkedHashMap[Int, St]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages(s.stageInfo.stageId) =
          St(s.stageInfo.name.takeWhile(_ != '\n').take(90),
            System.nanoTime())
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.get(s.stageInfo.stageId).foreach { st =>
          st.completed = System.nanoTime()
          st.tasks = s.stageInfo.numTasks
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            st.taskTimeMs = m.executorRunTime
            st.shufReadMB = m.shuffleReadMetrics.totalBytesRead / 1e6
            st.shufWriteMB = m.shuffleWriteMetrics.bytesWritten / 1e6
          }
        }
    }

    for (q <- names) {
      val fn = SparkEntry.queries.getOrElse(q, sys.error(s"unknown $q"))
      // rep 0 warms codegen; later reps are measured
      for (r <- 0 until reps) {
        stages.clear(); jobs = 0
        if (r == reps - 1) spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        if (r == reps - 1) {
          Thread.sleep(800) // let the listener bus drain (private API)
          spark.sparkContext.removeSparkListener(listener)
          println(f"== $q%s rep$r: wall=$wall%.2f s  jobs=$jobs%d  " +
            f"stages=${stages.size}%d")
          val sorted = stages.values.toSeq
            .sortBy(st => -(st.completed - st.submitted))
          for (st <- sorted.take(25)) {
            val span = (st.completed - st.submitted) / 1e6
            println(f"   ${span}%8.0f ms span  ${st.taskTimeMs}%7d ms task  " +
              f"${st.tasks}%4d tk  r${st.shufReadMB}%6.1f w${st.shufWriteMB}%6.1f MB  ${st.name}%s")
          }
        } else {
          println(f"== $q%s rep$r (warm): wall=$wall%.2f s")
        }
        if (r == reps - 1 && sys.env.get("QPROF_NODES").contains("1")) {
          println(s"-- $q operator metrics (last execution):")
          org.apache.spark.sql.graft.TestBridge.lastExecMetrics(spark)
            .foreach(l => println("   " + l))
        }
        SparkEntry.releaseScopedCaches()
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
