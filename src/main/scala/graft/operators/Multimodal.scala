package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (clearly marked below): metadata and features are
  * derived from xxhash64 of the payload bytes. Everything around it — the
  * binary column representation, schemas, batch shapes, partition-local
  * execution — is the real Spark plumbing a codec-backed implementation
  * would drop into (swap `fakeDecode*` for a mapPartitions over a JNI/
  * Python codec and nothing else changes).
  */
object Multimodal {

  /** Pack a string column into the opaque binary payload representation
    * (stand-in for raw image/audio bytes at rest in parquet). */
  def toPayload(c: Column): Column = c.cast("binary")

  /** STUB — deterministic fake of an image-header decode. A real
    * implementation replaces the hash arithmetic with an actual codec
    * call per row (mapPartitions, batch-local); the output schema is the
    * contract. */
  def fakeDecodeImageMeta(payload: Column): Column =
    struct(
      (pmod(xxhash64(payload), lit(1920L)) + 1).cast("int").as("width"),
      (pmod(xxhash64(lit(1), payload), lit(1080L)) + 1).cast("int")
        .as("height"),
      (pmod(xxhash64(lit(2), payload), lit(3L)) + 1).cast("int")
        .as("channels"),
      octet_length(payload).as("n_bytes"))

  /** STUB — deterministic fake feature extraction: a `dim`-length float
    * vector derived from seeded hashes of the payload. Real impl: model
    * inference over payload batches; same schema, same partitioning. */
  def fakeFeatures(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(i, payload), lit(2000L)).cast("double") / 1000.0
        - 1.0).cast("float"))

  /** Frame sampling: slice `n` fixed-offset windows out of the payload —
    * the Spark-side shape of video frame extraction (array-of-binary per
    * row). Slicing is real; only the interpretation is fake. */
  def sampleFrames(payload: Column, n: Int, frameBytes: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => payload.substr(i * frameBytes + 1, lit(frameBytes)))
}
