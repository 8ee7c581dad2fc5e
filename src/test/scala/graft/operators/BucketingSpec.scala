package graft.operators



import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing: the co-located-join strategy for repeated big-big joins at
  * cluster scale — pre-shuffle both tables into the same bucket layout
  * once, then every subsequent equi-join on the bucket key runs with NO
  * shuffle on either side. This spec proves the plan shape (no
  * ShuffleExchange under the join), which is the property that matters at
  * 100 TB.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed equi-join plans without a shuffle exchange") {
    // managed tables land in ./spark-warehouse (gitignored); DROP TABLE
    // removes the files afterwards
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")

    val fact = (1L to 1000L).map(i => (i % 50, s"f$i")).toDF("k", "fv")
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "dv")
    fact.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_fact")
    dim.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_dim")

    // disable broadcast so the join would otherwise be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_fact")
        .join(spark.table("b_dim"), Seq("k"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, got:\n${joined.queryExecution}")
      assert(joined.count() === 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_fact")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }
}
