package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows with duplicate keys and tied values
  private def data = (1 to 2000).map { i =>
    (s"k${i % 7}", (i * 131) % 97, i.toLong)
  }.toDF("key", "value", "tie").repartition(8)

  test("TopKPerKey matches the row_number window form exactly") {
    val topk = TopKPerKey(data, Seq("key"),
      Seq($"value".desc, $"tie".asc), k = 5)
      .select($"key", $"value", $"tie")
    val w = Window.partitionBy($"key").orderBy($"value".desc, $"tie".asc)
    val viaWin = data.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select($"key", $"value", $"tie")
    assert(topk.except(viaWin).isEmpty && viaWin.except(topk).isEmpty)
    assert(topk.count() === 35) // 7 keys × 5
  }

  test("plans as partial + final heaps around one key exchange, no sort") {
    val df = TopKPerKey(data, Seq("key"), Seq($"value".desc, $"tie".asc), 3)
    df.collect()
    // AQE hides stage plans behind QueryStageExec leaves — flatten fully
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val execs = nodes.collect { case t: TopKPerKeyExec => t }
    assert(execs.map(_.partial).sorted === Seq(false, true))
    // exactly one key-hash exchange from the operator itself (the input
    // fixture's round-robin repartition(8) is a separate shuffle)
    val keyShuffles = nodes.collect {
      case s: ShuffleExchangeExec if s.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical
          .HashPartitioning] => s
    }
    assert(keyShuffles.length === 1)
    assert(nodes.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty)
  }

  test("null keys, null order values, and tiny groups match the window") {
    // nulls in the ORDER column exercise SortOrder null placement (desc
    // → nulls last in both forms); a null KEY is its own group for a
    // window and must be for the heaps too; groups smaller than k must
    // surface whole
    val messy = Seq[(Option[String], Option[Int], Long)](
      (Some("a"), Some(3), 1), (Some("a"), None, 2), (Some("a"), Some(9), 3),
      (Some("a"), Some(1), 4), (None, Some(5), 5), (None, None, 6),
      (Some("tiny"), Some(2), 7))
      .toDF("key", "value", "tie").repartition(5)
    val topk = TopKPerKey(messy, Seq("key"),
      Seq($"value".desc, $"tie".asc), k = 2)
      .select($"key", $"value", $"tie")
    val w = Window.partitionBy($"key").orderBy($"value".desc, $"tie".asc)
    val viaWin = messy.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).select($"key", $"value", $"tie")
    assert(topk.except(viaWin).isEmpty && viaWin.except(topk).isEmpty)
    assert(topk.count() === viaWin.count())
  }

  test("partial-stage flush at tiny partialMaxRows still exact") {
    // force many flushes: threshold far below k × keys-per-partition —
    // every flush emits a superset candidate set; the final stage must
    // still produce exactly the window form's survivors
    spark.conf.set("spark.graft.topk.partialMaxRows", "7")
    try {
      val topk = TopKPerKey(data, Seq("key"),
        Seq($"value".desc, $"tie".asc), k = 5)
        .select($"key", $"value", $"tie")
      val w = Window.partitionBy($"key").orderBy($"value".desc, $"tie".asc)
      val viaWin = data.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5).select($"key", $"value", $"tie")
      assert(topk.except(viaWin).isEmpty && viaWin.except(topk).isEmpty)
      assert(topk.count() === 35)
    } finally spark.conf.unset("spark.graft.topk.partialMaxRows")
  }

  test("key-only filters push below the operator; value filters do not") {
    val topk = TopKPerKey(data, Seq("key"), Seq($"value".desc, $"tie".asc), 3)
    val keyFiltered = topk.filter($"key" === "k1")
    val okey = keyFiltered.queryExecution.optimizedPlan
    // after pushdown the Filter is no longer the root above TopKPerKey
    assert(okey.collect {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(_,
        _: TopKPerKey) => true }.isEmpty, okey.toString)
    // and results agree with filtering first
    val direct = TopKPerKey(data.filter($"key" === "k1"), Seq("key"),
      Seq($"value".desc, $"tie".asc), 3)
    assert(keyFiltered.except(direct).isEmpty &&
      direct.except(keyFiltered).isEmpty)
    // a filter on the ORDER column must stay above (different semantics)
    val valFiltered = topk.filter($"value" > 50)
    assert(valFiltered.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(_,
        _: TopKPerKey) => true }.nonEmpty)
  }
}
