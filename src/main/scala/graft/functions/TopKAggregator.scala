package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed `Aggregator` keeping the K largest doubles per group (descending).
  * Demonstrates the custom-UDAF extension point (SURVEY.md §2B "UDF
  * surface"); the buffer is a bounded sorted list, so partial aggregation is
  * map-side combinable and the result is order-insensitive (associative,
  * commutative merge) — safe under any shuffle partitioning.
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  override def zero: Seq[Double] = Seq.empty

  override def reduce(buf: Seq[Double], a: Double): Seq[Double] =
    insert(buf, a)

  override def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] =
    y.foldLeft(x)(insert)

  override def finish(r: Seq[Double]): Seq[Double] = r

  /** Bounded insertion into the descending-sorted buffer: O(1) rejection
    * when the buffer is full and `a` is no better than its minimum, O(k)
    * positional insert otherwise — no full re-sort per row.
    */
  private def insert(buf: Seq[Double], a: Double): Seq[Double] = {
    if (buf.size >= k && a <= buf.last) buf
    else {
      val pos = buf.indexWhere(_ < a) match {
        case -1 => buf.size
        case i => i
      }
      val withA = (buf.take(pos) :+ a) ++ buf.drop(pos)
      if (withA.size > k) withA.take(k) else withA
    }
  }

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
