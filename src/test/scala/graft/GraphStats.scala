package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off shape probe for the co-purchase graph behind q131/q178/q307
  * (test scope): degree distributions and the cost statistics that pick
  * between the value-order intersect and wedge-join triangle plans.
  *   sbt "Test/runMain graft.GraphStats"
  */
object GraphStats {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    li.printSchema()
    val baskets = li.select($"l_orderkey", $"l_partkey")
      .groupBy($"l_orderkey")
      .agg(slice(sort_array(collect_set($"l_partkey")), 1, 5).as("__items"))
    val pairs = baskets.select(explode(flatten(transform($"__items", (x, i) =>
        transform(slice($"__items", i + 2, size($"__items")),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
    val eN = pairs.select(least($"a", $"b").as("a"),
        greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").distinct().persist()
    val m = eN.count()
    // value-order: lower-endpoint out-degree (deg_hi)
    val dh = eN.groupBy($"a").agg(count(lit(1)).as("dh"))
    val st1 = dh.agg(max($"dh"), sum($"dh" * $"dh"),
      sum($"dh" * ($"dh" - 1) / 2)).collect()(0)
    // raw degree
    val deg = eN.select($"a".as("n")).unionAll(eN.select($"b".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("dg"))
    val st2 = deg.agg(count(lit(1)), max($"dg"), sum($"dg" * $"dg")).collect()(0)
    // per-edge intersect payload: sum over edges of dh(a) + dh(b)
    val dhB = dh.withColumnRenamed("a", "n")
    val pay = eN.join(dhB.withColumnRenamed("n", "a")
        .withColumnRenamed("dh", "da"), Seq("a"))
      .join(dhB.withColumnRenamed("n", "b").withColumnRenamed("dh", "db"),
        Seq("b"), "left").na.fill(0, Seq("db"))
      .agg(sum($"da" + $"db")).collect()(0)
    // degree-oriented: out-deg after orienting to higher (deg, id)
    val or = eN
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("dg", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("dg", "db"), "b")
      .select(when(struct($"da", $"a") < struct($"db", $"b"), $"a")
        .otherwise($"b").as("src"))
      .groupBy($"src").agg(count(lit(1)).as("dout"))
    val st3 = or.agg(max($"dout"), sum($"dout" * $"dout"),
      sum($"dout" * ($"dout" - 1) / 2)).collect()(0)
    println(s"== edges m=$m  nodes=${st2.get(0)}  maxRawDeg=${st2.get(1)}  sumRawDeg2=${st2.get(2)}")
    println(s"== value-order: maxDh=${st1.get(0)}  sumDh2=${st1.get(1)}  wedgesLow=${st1.get(2)}")
    println(s"== intersect payload sum(dh(a)+dh(b)) over edges = ${pay.get(0)} longs")
    println(s"== degree-oriented: maxDout=${st3.get(0)}  sumDout2=${st3.get(1)}  wedgesOriented=${st3.get(2)}")
    spark.stop()
  }
}
