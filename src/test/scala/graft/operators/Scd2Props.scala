package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based properties for [[Merge.applyScd2]] (q92's operator):
  * against randomly generated change streams applied batch-by-batch,
  * the produced dimension must equal a trivially-correct in-memory
  * model — which subsumes the interval invariants (per key: versions
  * chain contiguously, no overlaps, exactly one open row) — and
  * re-applying an already-applied batch must be a no-op.
  *
  * Small generated worlds (≤4 keys, ≤4 values) on purpose: SCD-2 bugs
  * are branch bugs (keep/close/insert routing), and tiny domains drive
  * all branches — including the identical-value no-op and the
  * brand-new-key insert — within a handful of cases.
  */
object Scd2Props extends Properties("graft.scd2") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session

  /** One batch: strictly-increasing ts, at most one change per key (the
    * contract applyScd2's scaladoc assigns to the caller). */
  private case class Batch(ts: Long, changes: Map[Int, Int])

  private val genBatches: Gen[List[Batch]] = for {
    nb <- Gen.choose(1, 5)
    maps <- Gen.listOfN(nb, for {
      ks <- Gen.someOf(1 to 4)
      vs <- Gen.listOfN(ks.size, Gen.choose(0, 3))
    } yield ks.zip(vs).toMap)
  } yield maps.zipWithIndex.map { case (m, i) => Batch(i + 1L, m) }

  /** The executable spec: replay batches over per-key version lists.
    * Returns (key, value, valid_from, valid_to) rows. */
  private def model(batches: List[Batch])
      : Seq[(Long, Long, Long, Option[Long])] = {
    // per key: list of (value, from, to)
    val hist = scala.collection.mutable.Map[Int,
      List[(Int, Long, Option[Long])]]().withDefaultValue(Nil)
    batches.foreach { b =>
      b.changes.foreach { case (k, v) =>
        hist(k) match {
          case (ov, of, None) :: rest =>
            if (ov != v) // identical change: no-op
              hist(k) = (v, b.ts, None) :: (ov, of, Some(b.ts)) :: rest
          case other => hist(k) = (v, b.ts, None) :: other
        }
      }
    }
    hist.toSeq.flatMap { case (k, vs) =>
      vs.map { case (v, f, t) => (k.toLong, v.toLong, f, t) }
    }
  }

  private def applyAll(batches: List[Batch])
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long, Option[Long])]
      .toDF("k", "val", "valid_from", "valid_to")
    batches.foldLeft(empty) { (tgt, b) =>
      val ch = b.changes.toSeq
        .map { case (k, v) => (k.toLong, v.toLong, b.ts) }
        .toDF("k", "val", "ts")
      Merge.applyScd2(tgt, ch, Seq("k"), Seq("val"), "ts",
        "valid_from", "valid_to")
    }
  }

  private def collectRows(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, Long, Option[Long])] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq

  property("replayed batches equal the model; intervals chain per key") =
    forAll(genBatches) { batches =>
      val got = collectRows(applyAll(batches)).sorted
      val want = model(batches).sorted
      // invariant checks directly on the produced rows (belt to the
      // model's braces): per key, sorted intervals are contiguous,
      // non-overlapping, and end in exactly one open version
      val byKey = got.groupBy(_._1)
      val chained = byKey.values.forall { vs =>
        val s = vs.sortBy(_._3)
        s.zip(s.tail).forall { case (a, b) => a._4.contains(b._3) } &&
          s.init.forall(_._4.isDefined) && s.last._4.isEmpty
      }
      val oneOpen = byKey.values.forall(_.count(_._4.isEmpty) == 1)
      got == want && chained && oneOpen
    }

  property("a change identical only AFTER the target-type cast is a no-op") =
    org.scalacheck.Prop.secure {
      // DOUBLE 1.234 into a DECIMAL(10,2) dimension holding 1.23: the
      // stored value would be unchanged, so the change must route to
      // `keep` (compare as-stored), not close+insert a zero-information
      // version on every replay
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val target = Seq((1L, "1.23", 10L))
        .toDF("k", "__v", "valid_from")
        .select($"k", $"__v".cast("decimal(10,2)").as("val"),
          $"valid_from", lit(null).cast("long").as("valid_to"))
      val changes = Seq((1L, 1.234, 20L)).toDF("k", "val", "ts")
      val out = Merge.applyScd2(target, changes, Seq("k"), Seq("val"),
        "ts", "valid_from", "valid_to")
      val rows = out.collect()
      rows.length == 1 && rows(0).isNullAt(3) &&
        rows(0).getLong(2) == 10L &&
        rows(0).getDecimal(1).toPlainString == "1.23"
    }

  property("re-applying the last batch is a no-op") =
    forAll(genBatches) { batches =>
      val once = applyAll(batches)
      val again = Merge.applyScd2(once,
        {
          import spark.implicits._
          batches.last.changes.toSeq
            .map { case (k, v) => (k.toLong, v.toLong, batches.last.ts) }
            .toDF("k", "val", "ts")
        },
        Seq("k"), Seq("val"), "ts", "valid_from", "valid_to")
      collectRows(once).sorted == collectRows(again).sorted
    }
}
