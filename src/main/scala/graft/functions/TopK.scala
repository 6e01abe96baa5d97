package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: (score, id). Ordering is (score desc, id asc) —
  * identical to `ORDER BY score DESC, id ASC`, so a grouped top-k built
  * from this Aggregator returns exactly the rows a window `row_number
  * <= k` would, while shuffling at most k entries per key per map
  * partition instead of the key's whole candidate degree.
  */
final case class Scored(score: Double, id: Long)

/** Bounded per-key top-k as a typed [[Aggregator]] (SURVEY §2.8 UDAF
  * surface). The buffer is a best-first sorted Seq capped at k, so the
  * map-side partial aggregation already reduces each key to k entries —
  * the property that makes grouped top-k degree-independent at 100 TB
  * (a window rank must shuffle and sort every candidate row first).
  */
final class TopKAgg(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  // idempotent: re-inserting an element already held (multi-probe blocked
  // joins and streaming re-delivery both produce duplicates) neither
  // consumes a k-slot nor emits twice. NaN scores are rejected outright —
  // `better` is a strict order only over non-NaN values, and an undefined
  // similarity (e.g. a zero-norm vector's 0/0 cosine) has no defensible
  // rank, so admitting it would corrupt buffer ordering.
  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (x.score.isNaN) buf
    else if (buf.length >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      if (post.headOption.contains(x)) buf
      else (pre ++ (x +: post)).take(k)
    }

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    insert(buf, x)
  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[Scored]): Seq[Scored] = buf
  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
