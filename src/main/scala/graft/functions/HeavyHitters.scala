package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * custom-aggregate surface of SURVEY §2.8 (TypedImperativeAggregate
  * family), applied to the A5 "most common" pattern at scales where a
  * full `groupBy(key)` is the dominant shuffle.
  *
  * Guarantee: any key with frequency > N/k survives the sketch, so the
  * sketch output is a superset of the true top-(anything) above that
  * threshold; an exact recount restricted to the ≤k candidates then
  * yields exact counts. Two narrow passes instead of a full-width
  * shuffle of every distinct key.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (b.contains(a)) b.updated(a, b(a) + 1)
    else if (b.size < k) b.updated(a, 1L)
    else b.view.mapValues(_ - 1).filter(_._2 > 0).toMap

  override def merge(b1: Map[String, Long],
      b2: Map[String, Long]): Map[String, Long] = {
    val sum = (b1.keySet ++ b2.keySet).iterator
      .map(key => key -> (b1.getOrElse(key, 0L) + b2.getOrElse(key, 0L)))
      .toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, drop non-positive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] =
    reduction

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoders.mapStringLong
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoders.mapStringLong
}

object ExpressionEncoders {
  implicit val mapStringLong: Encoder[Map[String, Long]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Map[String, Long]]()
  }
}
