package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs with
  * deterministic (score desc, id asc) ordering.
  *
  * The point at scale: as an [[Aggregator]] it participates in partial
  * aggregation — every map task reduces its slice to ≤ k pairs per
  * group BEFORE the exchange, so a top-10-of-a-billion query shuffles
  * tens of rows per group instead of a billion scored candidates (the
  * window/row_number formulation shuffles and sorts everything).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (score, id) => (-score, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)],
                      in: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}

/** [[TopKAgg]] for string-keyed items (terms, labels): the k largest
  * (score, key) pairs, (score desc, key asc) — binary/lexicographic key
  * order, which agrees with the oracle's ORDER BY on ASCII data. Same
  * partial-aggregation scale behavior.
  */
class TopKStrAgg(k: Int)
    extends Aggregator[(Double, String), Seq[(Double, String)], Seq[(Double, String)]] {

  private def trim(s: Seq[(Double, String)]): Seq[(Double, String)] =
    s.sortBy { case (score, id) => (-score, id) }.take(k)

  override def zero: Seq[(Double, String)] = Nil

  override def reduce(buf: Seq[(Double, String)],
                      in: (Double, String)): Seq[(Double, String)] =
    trim(buf :+ in)

  override def merge(a: Seq[(Double, String)],
                     b: Seq[(Double, String)]): Seq[(Double, String)] =
    trim(a ++ b)

  override def finish(r: Seq[(Double, String)]): Seq[(Double, String)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, String)]]()

  override def outputEncoder: Encoder[Seq[(Double, String)]] =
    bufferEncoder
}
