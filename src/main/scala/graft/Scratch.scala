package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling/debug harness (not part of the library surface).
  * Currently: q81 profile variants — expand-based multi-distinct vs
  * per-column pruned-scan aggregates. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    for (_ <- 1 to 2) {
      t("expand multi-distinct") {
        val li = Tables.lineitem(spark, d)
        val aggs = cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
            countDistinct(col(c)).as(s"__nd_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
        }
        li.agg(count(lit(1)).as("__n"), aggs: _*).collect()
      }
      t("per-column pruned scans") {
        val li = Tables.lineitem(spark, d)
        val perCol = cols.map { c =>
          li.select(col(c)).agg(count(lit(1)).as(s"__n_$c"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
            countDistinct(col(c)).as(s"__nd_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
        }
        perCol.reduce(_.crossJoin(_)).collect()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
