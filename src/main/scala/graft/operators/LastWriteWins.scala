package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed last-write-wins aggregator (SURVEY.md §7.4: the `Aggregator[IN,
  * BUF, OUT]` form of the reference's map-assignment merge, for
  * `Dataset` pipelines where compile-time types are preferred over the
  * conditional-`max_by` Column form in [[PrePostMerge]]).
  *
  * IN = (ord, value); the value with the greatest ord survives. Ties on
  * ord resolve to the later-reduced element, matching "last occurrence
  * wins" when ord is a within-partition sequence number.
  */
class LastWriteWins[V: TypeTag]
    extends Aggregator[(Long, V), (Long, Option[V]), Option[V]] {

  override def zero: (Long, Option[V]) = (Long.MinValue, None)

  override def reduce(b: (Long, Option[V]), a: (Long, V))
      : (Long, Option[V]) =
    if (a._1 >= b._1) (a._1, Some(a._2)) else b

  override def merge(x: (Long, Option[V]), y: (Long, Option[V]))
      : (Long, Option[V]) =
    if (y._1 >= x._1 && y._2.isDefined) y
    else if (x._2.isDefined) x
    else y

  override def finish(b: (Long, Option[V])): Option[V] = b._2

  override def bufferEncoder: Encoder[(Long, Option[V])] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Option[V]] = ExpressionEncoder()
}
