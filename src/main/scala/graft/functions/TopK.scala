package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored id — input and element type of the bounded top-k aggregate. */
case class ScoredId(sim: Double, id: Long)

/** Bounded top-k aggregate: keeps the k best `(sim, id)` pairs ordered by
  * `sim` desc then `id` asc.
  *
  * Why an `Aggregator` instead of `row_number().over(Window.partitionBy
  * (probe))`: a window re-shuffles EVERY scored row into one partition
  * per probe (N×P rows through the exchange, skew-bound by the largest
  * probe). This aggregate is partial-merge capable, so each map task
  * reduces its slice to ≤k rows per probe before the exchange — the
  * shuffle carries only `partitions × probes × k` rows no matter how
  * large the scored input is. That is the difference between a plan that
  * survives 100 TB and one that does not.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  override def zero: Seq[ScoredId] = Nil

  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
    if (buf.lengthCompare(k) < 0 || better(in, buf.last)) {
      val (before, after) = buf.span(better(_, in))
      (before :+ in) ++ after.take(k - before.length - 1)
    } else buf

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
