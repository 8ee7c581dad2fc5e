package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("tolerantSelect keeps only existing columns, in order") {
    val df = Seq((1, "a")).toDF("x", "y")
    val r = Registry.tolerantSelect(df, Seq("y", "missing", "x"))
    assert(r.columns.toSeq === Seq("y", "x"))
  }

  test("upsert: updates beat current, idempotent on replay") {
    val current = Seq(("v1", 1.0, 1L), ("v2", 2.0, 1L))
      .toDF("vault", "price", "ts")
    val updates = Seq(("v2", 9.0, 2L), ("v3", 3.0, 2L))
      .toDF("vault", "price", "ts")
    val once = Registry.upsert(current, updates, Seq("vault"), "ts")
    val r = once.orderBy($"vault").collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(r === Seq(("v1", 1.0), ("v2", 9.0), ("v3", 3.0)))
    // replaying the same updates changes nothing (SADD/HSET idempotence)
    val twice = Registry.upsert(once, updates, Seq("vault"), "ts")
    assert(twice.orderBy($"vault").collect().map(
      x => (x.getString(0), x.getDouble(1))).toSeq === r)
  }

  test("snapshotUpserter maintains a parquet dim across micro-batches") {
    val dir = Files.createTempDirectory("graft-dim").toFile
    val snap = s"${dir.getAbsolutePath}/prices"
    val upserter = Registry.snapshotUpserter(snap, Seq("vault"), "ts")
    upserter(Seq(("v1", 1.0, 1L)).toDF("vault", "price", "ts"), 0L)
    upserter(Seq(("v1", 5.0, 2L), ("v2", 2.0, 2L))
      .toDF("vault", "price", "ts"), 1L)
    val r = spark.read.parquet(snap).orderBy($"vault").collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(r === Seq(("v1", 5.0), ("v2", 2.0)))
  }
}
