package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-audit harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q02_filter_pushdown", "q03_join_agg", "q13_tokenflow",
        "q23_dedup_minhash_lsh")) {
      println(s"========== $q ==========")
      println(SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
