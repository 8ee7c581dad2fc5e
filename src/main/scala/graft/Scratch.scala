package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling/debug harness (not part of the library surface).
  * Currently: q71 pair-graph structure — component count/sizes vs sim
  * threshold. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, d)
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val probed = operators.Similarity.assignCellsMulti(emb, "vec_id",
        "embedding", cents, "cell_id", "cvec", nprobe = 3)
      .persist()
    probed.count()
    for (thr <- Seq(0.4, 0.45, 0.5, 0.55)) {
      val pairs = operators.Similarity.blockedSelfJoin(
          probed.select(col("cell_id"), col("vec_id"), col("embedding")),
          "cell_id", "vec_id", "embedding", chunks = 4)
        .withColumn("sim", operators.Similarity.cosine(col("va"), col("vb")))
        .filter(col("sim") >= thr)
        .select(col("id_a"), col("id_b"))
        .distinct().persist()
      val np = pairs.count()
      val (labels, rounds) =
        operators.Dedup.dupClustersStats(pairs, "id_a", "id_b")
      val sizes = labels.groupBy(col("cluster_id")).count()
        .agg(count(lit(1)).as("ncl"), max(col("count")).as("maxsz"),
          sum(col("count")).as("nodes")).collect()(0)
      println(s"[scratch] thr=$thr pairs=$np rounds=$rounds " +
        s"clusters=${sizes.getLong(0)} max_size=${sizes.getLong(1)} " +
        s"nodes=${sizes.getLong(2)}")
      pairs.unpersist()
    }
    spark.stop()
  }
}
