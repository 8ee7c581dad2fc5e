package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway profiling/debug harness (not part of the library surface).
  * Currently: nondeterminism hunt for q56/prefixSum — runs tokenPacking
  * under many (partition-count × session-history) states and diffs each
  * against the window-form ground truth. RangePartitioner's sampling seed
  * derives from the RDD id, so boundaries shift with session history; a
  * boundary-dependent bug only shows under specific combinations.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val docs = Tables.documents(spark, d)
      .select($"lang", $"doc_id",
        operators.TextAnalysis.tokenCountWs($"text").as("n_tok"))
      .persist()
    docs.count()

    // ground truth: window form of the same packing stats
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val truth = docs
      .withColumn("cum", sum($"n_tok".cast("long")).over(w))
      .withColumn("pack_id", expr("(cum - n_tok) div 1000L"))
      .withColumn("spl", when($"n_tok" > 0 &&
        expr("(cum - 1L) div 1000L") > $"pack_id", 1L).otherwise(0L))
      .groupBy($"lang", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok".cast("long")).as("sum_tokens"),
        sum($"spl").as("n_split"))
      .orderBy($"lang", $"pack_id")
      .collect().map(_.toSeq).toVector

    var bad = 0
    for (np <- Seq(2, 3, 5, 7, 8, 13, 16, 27, 32, 40); trial <- 1 to 5) {
      spark.conf.set("spark.sql.shuffle.partitions", np.toString)
      // perturb the RDD id counter so RangePartitioner samples differently
      (1 to trial * 3).foreach(i => spark.sparkContext
        .parallelize(1 to 10, 2).map(_ + i).count())
      val got = operators.Packing
        .tokenPacking(docs, "lang", "doc_id", "n_tok", budget = 1000L)
        .orderBy($"lang", $"pack_id")
        .collect().map(_.toSeq).toVector
      spark.catalog.clearCache()
      docs.persist(); docs.count() // re-persist after clearCache
      if (got != truth) {
        bad += 1
        println(s"[scratch] MISMATCH np=$np trial=$trial: " +
          got.zip(truth).filter { case (a, b) => a != b }.take(3).mkString("; "))
      } else println(s"[scratch] ok np=$np trial=$trial (${got.size} rows)")
    }
    println(s"[scratch] done, mismatches=$bad")
    spark.stop()
  }
}
