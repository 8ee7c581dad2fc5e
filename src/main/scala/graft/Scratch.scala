package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Throwaway profiling/debug harness (not part of the library surface).
  * Currently: stage-level timing of the q52 dedup pipeline at sf0.1 —
  * where do the ~6 s go (shingling, candidates, verify, cluster loop)? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$d/documents.parquet").limit(1).count()
    for (_ <- 1 to 2) {
      val sets = operators.Dedup.hashedShingleSets(
        Tables.documents(spark, d), "text", "doc_id", shingleWords = 3)
        .persist(MEMORY_AND_DISK)
      t("sets materialize")(sets.count())
      val cands = t("candidates") {
        val c = operators.Dedup.rareShinglePairsFromSets(sets, maxDf = 10)
          .persist(MEMORY_AND_DISK)
        c.count(); c
      }
      val near = t("jaccard verify") {
        val n = operators.Dedup.jaccardFromSets(sets, cands)
          .filter(col("jaccard") >= 0.5)
          .select(col("id_a"), col("id_b")).persist(MEMORY_AND_DISK)
        n.count(); n
      }
      val (labels, rounds) =
        operators.Dedup.dupClustersStats(near, "id_a", "id_b")
      t(s"cluster loop (rounds=$rounds)")(labels.count())
      t("final agg") {
        labels.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("cluster_id")).collect()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
