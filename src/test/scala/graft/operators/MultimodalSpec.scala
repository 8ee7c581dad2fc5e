package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1L, "hello world"), (2L, "binary payload x"))
    .toDF("id", "txt")
    .withColumn("payload", Multimodal.toPayload($"txt"))

  test("payload column is real binary with correct byte length") {
    val r = df.select($"id", octet_length($"payload").as("n")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toMap
    assert(r === Map(1L -> 11, 2L -> 16))
  }

  test("decodePartitions runs the injected codec per row, batch-local") {
    val metas = Multimodal.decodePartitions(df, "id", "payload")(
      Multimodal.stubCodec).collect().sortBy(_.id)
    assert(metas.length === 2)
    assert(metas.forall(m => m.width >= 1 && m.width <= 1920))
    assert(metas.forall(m => m.channels >= 1 && m.channels <= 3))
    assert(metas(0).n_bytes === 11)
    // deterministic: same payload → same fake header
    val again = Multimodal.decodePartitions(df, "id", "payload")(
      Multimodal.stubCodec).collect().sortBy(_.id)
    assert(metas.toSeq === again.toSeq)
  }

  test("expression-form fake decode matches its schema contract") {
    val m = df.select(Multimodal.fakeDecodeImageMeta($"payload").as("m"))
      .select($"m.width", $"m.height", $"m.channels", $"m.n_bytes")
    assert(m.schema.fieldNames.toSeq ===
      Seq("width", "height", "channels", "n_bytes"))
    assert(m.collect().forall(r => r.getInt(0) >= 1 && r.getInt(2) <= 3))
  }

  test("sampleFrames slices n fixed-size binary windows") {
    val frames = df.filter($"id" === 2)
      .select(Multimodal.sampleFrames($"payload", 4, 4).as("f"))
      .collect()(0).getAs[collection.Seq[Array[Byte]]]("f")
    assert(frames.length === 4)
    assert(frames(0).length === 4)
    assert(new String(frames.flatten.toArray, "UTF-8") ===
      "binary payload x")
  }

  test("fakeFeatures emits a dim-length float vector in [-1, 1]") {
    val v = df.select(Multimodal.fakeFeatures($"payload", 8).as("v"))
      .collect()(0).getAs[collection.Seq[Float]]("v")
    assert(v.length === 8)
    assert(v.forall(x => x >= -1.0f && x <= 1.0f))
  }

  test("decode → feature-extract → ANN composes end-to-end") {
    // the full multimodal retrieval pipeline shape: opaque payloads →
    // per-row features (stubbed model) → exact top-k search. Everything
    // but the feature fake is the real 100 TB plumbing; swapping the
    // codec swaps nothing else.
    val corpus = (1L to 40L).map(i => (i, s"payload number $i body"))
      .toDF("id", "txt")
      .withColumn("payload", Multimodal.toPayload($"txt"))
      .withColumn("vec", Multimodal.fakeFeatures($"payload", 8))
    val queries = corpus.filter($"id" <= 2)
    val top = Similarity.bruteForceTopK(corpus, "id", "vec",
      queries, "id", "vec", k = 3)
    val rows = top.collect()
    assert(rows.length === 6) // 2 queries × top-3
    // identical payload ⇒ identical features ⇒ every neighbor's sim ≤ 1
    // and the ranking is deterministic across runs
    val again = Similarity.bruteForceTopK(corpus, "id", "vec",
      queries, "id", "vec", k = 3).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
