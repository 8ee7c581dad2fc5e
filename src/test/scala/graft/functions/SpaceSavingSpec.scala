package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Space-Saving no-false-negative guarantee under an ADVERSARIAL
  * vocabulary: distinct keys ≫ capacity, heavy items interleaved with
  * a long uniform tail, data spread over many partitions so the merge
  * path (with its top-m truncation) actually runs. The guarantee under
  * test is exactly what q214's oracle relies on: candidates ⊇ every
  * key with true count > N/m, so sketch+exact-recount ≡ GROUP BY +
  * HAVING.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  // 40k tail keys (1 occurrence each) + 8 heavy keys at ~2% each,
  // deterministically interleaved; N = 40k + 8*1000 = 48k, m = 256 →
  // guarantee floor N/m = 187.5, heavy count 1000 clears it 5×
  private lazy val rows: Seq[String] = {
    val heavy = (0 until 8).map(i => s"HEAVY_$i")
    val tail = (0 until 40000).map(i => s"tail_$i")
    tail.zipWithIndex.flatMap { case (t, i) =>
      if (i % 5 == 0) Seq(t, heavy(i / 5 % 8)) else Seq(t)
    } // each heavy key lands 1000 times; N = 48000
  }

  test("candidates contain every item above N/m across partition merges") {
    val ds = spark.createDataset(rows).repartition(16).toDF("w")
    val cand = ds.agg(SpaceSavingAgg(256)($"w").as("c"))
      .select(explode($"c").as("w")).as[String].collect().toSet
    assert(cand.size <= 256)
    val n = rows.size
    val exactHeavy = rows.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, c) => c > n / 256 }.keys.toSet
    assert(exactHeavy.nonEmpty && exactHeavy.size >= 8)
    val missed = exactHeavy -- cand
    assert(missed.isEmpty, s"guarantee violated, missed: $missed")
  }

  test("sketch + exact recount equals plain GROUP BY / HAVING") {
    val ds = spark.createDataset(rows).repartition(16).toDF("w")
    val cand = ds.agg(SpaceSavingAgg(256)($"w").as("c"))
      .select(explode($"c").as("w"))
    val total = ds.agg(count(lit(1)).as("__n"))
    val twoPass = ds.join(broadcast(cand), Seq("w"), "left_semi")
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter($"cnt" * 100 > $"__n")
      .select($"w", $"cnt")
      .as[(String, Long)].collect().toMap
    val n = rows.size
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 100 > n }.toMap
    assert(twoPass === exact)
  }

  test("eviction path: saturated buffer still promotes a late heavy key") {
    // single partition, vocabulary 4× capacity streamed BEFORE the
    // heavy key appears — the classic Space-Saving eviction scenario
    val burst = (0 until 128).map(i => s"pre_$i") ++
      Seq.fill(64)("LATE_HEAVY") ++ (0 until 64).map(i => s"post_$i")
    val ds = spark.createDataset(burst).coalesce(1).toDF("w")
    val cand = ds.agg(SpaceSavingAgg(32)($"w").as("c"))
      .select(explode($"c").as("w")).as[String].collect().toSet
    assert(cand.contains("LATE_HEAVY"))
  }
}
