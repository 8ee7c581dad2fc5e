package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling/debug harness (not part of the library surface).
  * Currently: dedup-pipeline scaling probe — the q52 chain at 1× and
  * 10× corpus size (10× = the sf0.1 documents unioned with shifted
  * ids; measurement only, no files written). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    def pipeline(mult: Int): Double = {
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val base = Tables.documents(spark, d)
      // the replica offset must exceed the id range or replicas collide
      // into spurious duplicate ids and corrupt the measured factor
      val maxId = base.agg(max(col("doc_id"))).collect()(0).getLong(0)
      require(maxId < 1000000L, s"replica offset too small for maxId=$maxId")
      val docs = (0 until mult).map { k =>
        base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          col("text"))
      }.reduce(_.unionByName(_))
      val t0 = System.nanoTime()
      val sets = operators.Dedup.hashedShingleSets(docs, "text", "doc_id",
        shingleWords = 3).persist(MEMORY_AND_DISK)
      val cands = operators.Dedup.rareShinglePairsFromSets(sets, maxDf = 10)
      val near = operators.Dedup.jaccardFromSets(sets, cands)
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      val n = operators.Dedup.dupClusters(near, "id_a", "id_b")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_docs")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
      println(f"[scratch] mult=$mult clusters=$n t=$dt%.2f s")
      dt
    }
    pipeline(1); pipeline(1)   // warm
    val t1 = pipeline(1)
    val t10 = pipeline(10)
    println(f"[scratch] 10x corpus => ${t10 / t1}%.1fx time")
    spark.stop()
  }
}
