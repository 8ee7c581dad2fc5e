package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = Tables.embeddings(spark, d)
    println("[scratch] emb=" + emb.count())
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    println("[scratch] centroids=" + centroids.count())
    val queries = emb.filter(col("vec_id") < 5)
    time("assign")(println(Similarity.assignCells(emb, "vec_id",
      "embedding", centroids, "cid", "cvec").count()))
    time("ivf_full")(println(Similarity.ivfTopK(emb, "vec_id", "embedding",
      centroids, "cid", "cvec", queries, "vec_id", "embedding",
      5, 3).count()))
    time("brute")(println(Similarity.bruteForceTopK(emb, "vec_id",
      "embedding", queries, "vec_id", "embedding", 5).count()))
    spark.stop()
  }
}
