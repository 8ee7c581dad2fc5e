package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{CosineSim, MinHashSig, SimHash64, WordShingles}

/** Throwaway codegen-audit harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // fail loudly instead of silently interpreting on codegen bugs
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val df = Seq("the quick brown fox", "jumps over the lazy dog")
      .toDF("t")
      .select(MinHashSig(WordShingles(col("t"), 2), 8).as("sig"),
        graft.functions.TextHashes.simhash64(split(col("t"), " ")).as("sh"),
        graft.functions.TextHashes.rollingFingerprint(col("t")).as("fp"))
    df.show(2, truncate = false)
    val v = Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
      .select(CosineSim($"a", $"b").as("c"))
    v.show()
    println("[scratch] codegen OK (no fallback)")
    spark.stop()
  }
}
