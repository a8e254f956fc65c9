package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed `Aggregator` keeping the K lexicographically-smallest
  * `(Long, Long)` pairs per group, ascending — the anchor selector behind
  * `dedup_image`'s bounded bucket probing. Unlike a `row_number` window
  * (which sorts the WHOLE partition in one task — the degenerate all-zero
  * band bucket grows linearly with the corpus) the buffer here is bounded
  * at K on every map task and stays K through the merge, so the hot
  * bucket costs each task O(rows·K) worst case and the shuffle carries at
  * most K pairs per (bucket, map task). Associative, commutative merge —
  * safe under any partitioning, map-side combinable (the
  * [[TopKAggregator]] contract, specialized to pairs and min-K).
  */
class MinKPairs(k: Int) extends Aggregator[
    (Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  require(k > 0, "min_k_pairs needs k >= 1")

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    insert(buf, a)

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    y.foldLeft(x)(insert)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Bounded insertion into the ascending buffer: O(1) rejection when the
    * buffer is full and `a` is no smaller than its maximum.
    */
  private def insert(buf: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = {
    if (buf.size >= k && !lt(a, buf.last)) buf
    else {
      val pos = buf.indexWhere(b => lt(a, b)) match {
        case -1 => buf.size
        case i => i
      }
      val withA = (buf.take(pos) :+ a) ++ buf.drop(pos)
      if (withA.size > k) withA.take(k) else withA
    }
  }

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
