package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/debug harness (not part of the library surface).
  * Currently: plan audit of the round-4 queries — joins, exchanges, and
  * scan column pruning at sf0.1. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    for (q <- Seq("q61_stratified_split", "q62_consistent_sample", "q66_lm_surprisal",
      "q63_tfidf_terms", "q64_mixture_sample", "q65_dedup_survivorship")) {
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      def count(p: String) = p.r.findAllIn(plan).length
      println(s"[scratch] $q: exchanges=${count("Exchange")} " +
        s"bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} " +
        s"shj=${count("ShuffledHashJoin")} cartesian=${count("Cartesian")} " +
        s"window=${count("Window")} scans=${count("FileScan")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
