package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling/codegen-audit harness (not part of the library
  * surface). Currently: phase-by-phase timing of q52_dup_clusters. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
    val sets = operators.Dedup.hashedShingleSets(docs, "text", "doc_id", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sets materialize")(println("  docs=" + sets.count()))
    val sh = sets.select($"id".as("__rid"), explode($"sh").as("__rg"))
    t("sh explode count")(println("  sh=" + sh.count()))
    val rare = sh.groupBy($"__rg").agg(count(lit(1)).as("__rdf"))
      .filter($"__rdf" <= 10).select($"__rg")
    t("rare agg")(println("  rare=" + rare.count()))
    val r = sh.join(rare, Seq("__rg"))
    t("rarity join")(println("  r=" + r.count()))
    val raw = r.select($"__rg", $"__rid".as("id_a"))
      .join(r.select($"__rg", $"__rid".as("id_b")), Seq("__rg"))
      .filter($"id_a" < $"id_b")
    t("self join raw")(println("  raw=" + raw.count()))
    val cands = operators.Dedup.rareShinglePairsFromSets(sets, maxDf = 10)
    t("cands count")(println("  cands=" + cands.count()))
    val near = operators.Dedup.jaccardFromSets(sets, cands)
      .filter($"jaccard" >= 0.5)
      .select($"id_a", $"id_b")
    t("near count")(println("  near=" + near.count()))
    val clusters = t("dupClusters total")(
      operators.Dedup.dupClusters(near, "id_a", "id_b"))
    t("final agg")(println("  clusters=" + clusters.groupBy($"cluster_id")
      .agg(count(lit(1))).count()))
    spark.stop()
  }
}
