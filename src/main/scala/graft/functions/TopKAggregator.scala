package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.B "UDF/UDAF/UDTF extension"):
  * a bounded top-k accumulator as an `Aggregator[IN, BUF, OUT]`.
  *
  * Per-group top-k with a size-k buffer: partial aggregation keeps at
  * most k (score, id) pairs per group PER MAP TASK, so the shuffle for
  * "top k of billions of rows per key" carries O(groups·k) — the typed
  * counterpart of the WindowGroupLimit plan Catalyst derives for
  * row_number()<=k (PLANS.md), usable where the windowed form doesn't
  * compose (e.g. inside other typed aggregations).
  *
  * Ties break toward the smaller id — total order, deterministic output.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)
  final case class Buf(items: List[Scored])

  def topK(k: Int): Aggregator[Scored, Buf, Seq[Scored]] =
    new Aggregator[Scored, Buf, Seq[Scored]] {
      private def better(a: Scored, b: Scored): Boolean =
        a.score > b.score || (a.score == b.score && a.id < b.id)

      private def insert(items: List[Scored], x: Scored): List[Scored] = {
        val (front, back) = items.span(better(_, x))
        val merged = front ::: x :: back
        if (merged.length > k) merged.take(k) else merged
      }

      override def zero: Buf = Buf(Nil)
      override def reduce(b: Buf, a: Scored): Buf = Buf(insert(b.items, a))
      override def merge(b1: Buf, b2: Buf): Buf =
        Buf(b2.items.foldLeft(b1.items)(insert))
      override def finish(b: Buf): Seq[Scored] = b.items
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
