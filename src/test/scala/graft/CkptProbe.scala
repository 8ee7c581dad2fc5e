package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe (test scope): does a repartition(n, col) + localCheckpoint
  * preserve a join-usable partitioning, or does every consumer join
  * re-exchange the checkpointed side?  sbt "Test/runMain graft.CkptProbe"
  */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val big = spark.range(1000000).select(
      (col("id") % 50000).as("k"), col("id").as("v"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ck = big.repartition(8, col("k")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println("== checkpoint rdd partitions: " + ck.rdd.getNumPartitions)
    val small = spark.range(1000).select(col("id").as("k"),
      lit(1L).as("w"))
    val j = ck.join(small.hint("shuffle_hash"), Seq("k"))
    j.write.format("noop").mode("overwrite").save()
    val ex = spark.sql("select 1")
    println("== executed join plan ==")
    println(j.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
