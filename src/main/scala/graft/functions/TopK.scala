package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate (SURVEY.md §4 ANN scale path).
  *
  * The window-function formulation of top-k (`row_number() OVER
  * (PARTITION BY q ORDER BY score)`) shuffles EVERY scored candidate
  * row to the key's partition before ranking — at 100 TB that shuffle
  * is the job. This aggregator keeps a k-bounded buffer per key with
  * map-side partial aggregation: each task emits at most k rows per
  * key, so the shuffle carries k·keys rows regardless of corpus size.
  *
  * Ordering: (sortKey DESC, id ASC) — callers pass a rounded sort key
  * (round(cos, 9)) so cross-engine float noise cannot flip ranks, and
  * the id tiebreak makes results total-ordered.
  */
object TopK {

  type Entry = (Double, Long, Double) // (sortKey, id, payload)

  /** NaN sort keys rank FIRST (as the largest value), matching SQL
    * ORDER BY ... DESC semantics in Spark and DuckDB — Scala's default
    * Double ordering would bury NaN last and silently diverge from the
    * window-function formulation on e.g. zero-norm cosine inputs. */
  private def rankKey(s: Double): Double =
    if (s.isNaN) Double.PositiveInfinity else s

  private def ord: Ordering[Entry] =
    Ordering.by[Entry, (Double, Long)] { case (s, id, _) => (-rankKey(s), id) }

  class TopKAggregator(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    override def zero: Seq[Entry] = Seq.empty

    private def trim(s: Seq[Entry]): Seq[Entry] =
      if (s.size <= k) s else s.sorted(ord).take(k)

    override def reduce(buf: Seq[Entry], in: Entry): Seq[Entry] = {
      val appended = buf :+ in
      // amortize the sort: only trim when the buffer doubles
      if (appended.size > 2 * k) trim(appended) else appended
    }

    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = trim(a ++ b)
    override def finish(buf: Seq[Entry]): Seq[Entry] = trim(buf).sorted(ord)
    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
  }

  /** topk(k)(sortKey, id, payload) → array<struct<_1,_2,_3>> of the k
    * best (sortKey DESC, id ASC) entries, usable in DataFrame .agg(). */
  def topk(k: Int): (Column, Column, Column) => Column = {
    val f = udaf(new TopKAggregator(k))
    (sortKey, id, payload) => f(sortKey, id, payload)
  }
}
