package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (id, score) pairs — the scalable
  * grouped top-k: because it is an `Aggregator`, Spark applies it with
  * map-side partial aggregation (ObjectHashAggregate), so each map
  * partition contributes at most k rows per group to the shuffle. The
  * Window(row_number)-then-filter formulation instead shuffles every
  * scored row into one partition per group — fine at thousands of
  * rows, a straggler at 100 TB.
  *
  * Ordering: score DESC, id ASC (deterministic tiebreak) — identical
  * to the ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) <= k oracle.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Array[(Long, Double)]] {

  // min-heap on (score asc, id desc): the head is the WORST element,
  // evicted when a better candidate arrives
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(
      buf: mutable.PriorityQueue[(Double, Long)],
      in: (Long, Double)): mutable.PriorityQueue[(Double, Long)] = {
    val cand = (in._2, in._1)
    if (buf.size < k) buf.enqueue(cand)
    else if (better(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { cand =>
      if (a.size < k) a.enqueue(cand)
      else if (better(cand, a.head)) { a.dequeue(); a.enqueue(cand) }
    }
    a
  }

  override def finish(buf: mutable.PriorityQueue[(Double, Long)]): Array[(Long, Double)] =
    buf.toArray.sortWith(better).map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
}
