package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump tool for the optimization rounds (test scope, like Scratch —
  * not part of the library surface). Writes `.explain("formatted")` of each
  * named declared query to `<outDir>/<query>_<tag>.txt`.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.ExplainQ <outDir> <tag> q122_mad_outliers,..."
  * With query list "all", dumps every declared query.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ExplainQ <outDir> <tag> <q1,q2|all>")
    val Array(outDir, tag, qlist) = args
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val names: Seq[String] =
      if (qlist == "all") SparkEntry.queries.keys.toSeq.sorted
      else qlist.split(",").map(_.trim).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      try {
        val plan = fn(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[explainq] wrote $outDir/${n}_$tag.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explainq] $n FAILED: ${e.getMessage}")
      } finally {
        SparkEntry.releaseScopedCaches()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
