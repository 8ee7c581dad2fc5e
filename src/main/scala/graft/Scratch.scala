package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling/debug harness (not part of the library surface).
  * Currently: cluster-loop round counts on adversarial graphs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    GraftFunctions.register(spark)
    for (n <- Seq(200, 1000)) {
      val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
        .toDF("id_a", "id_b")
      val t0 = System.nanoTime()
      val (df, rounds) = operators.Dedup.dupClustersStats(pairs, "id_a", "id_b")
      val ok = df.collect().forall(_.getLong(1) == 0L)
      println(f"[scratch] chain n=$n rounds=$rounds ok=$ok " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f s")
      df.unpersist()
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
