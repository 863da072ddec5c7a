package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a mergeable aggregate.
  *
  * `row_number().over(Window.partitionBy(g).orderBy(o))` + `filter(rn<=k)`
  * is the declarative top-k, but it materializes and SORTS every group in
  * one task — with 3 group values over 100 TB that is 3 executors sorting
  * 33 TB each. This Aggregator keeps only k rows per partial buffer, so
  * the heavy lifting happens map-side and the shuffle carries ≤ k rows per
  * (partition, group): the same partial/final shape as a sum.
  *
  * Usage (typed):
  *   ds.groupByKey(_.group).agg(TopK.topK[Row](k)(ord).toColumn)
  */
class TopKAggregator[A](k: Int, ord: Ordering[A],
                        enc: Encoder[A], seqEnc: Encoder[Seq[A]])
    extends Aggregator[A, Seq[A], Seq[A]] {

  // buffer: descending-sorted, length ≤ k
  override def zero: Seq[A] = Vector.empty

  private def insert(buf: Seq[A], a: A): Seq[A] = {
    if (buf.length >= k && ord.gteq(buf.last, a)) buf
    else {
      val (hi, lo) = buf.span(b => ord.gteq(b, a))
      ((hi :+ a) ++ lo).take(k)
    }
  }

  override def reduce(buf: Seq[A], a: A): Seq[A] = insert(buf, a)

  override def merge(b1: Seq[A], b2: Seq[A]): Seq[A] =
    b2.foldLeft(b1)(insert)

  override def finish(r: Seq[A]): Seq[A] = r

  override def bufferEncoder: Encoder[Seq[A]] = seqEnc
  override def outputEncoder: Encoder[Seq[A]] = seqEnc
}

object TopK {
  /** Top-k of (sortKey, payload) pairs, descending by key then ascending
    * payload for deterministic ties.
    */
  def topKPairs(k: Int): TopKAggregator[(Double, Long)] = {
    implicit val tupleEnc: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    val ord = Ordering.by[(Double, Long), (Double, Long)] {
      case (s, id) => (s, -id)
    }
    new TopKAggregator[(Double, Long)](k, ord, tupleEnc,
      org.apache.spark.sql.Encoders.kryo[Seq[(Double, Long)]])
  }

  /** Top-k of (score, key1, key2) rows: score descending, then key1/key2
    * ascending — the exact tie discipline of the window top-k
    * (q_topk_per_group), so both strategies share one oracle.
    */
  def topKTriples(k: Int): TopKAggregator[(Double, Long, Int)] = {
    implicit val tripleEnc: Encoder[(Double, Long, Int)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong,
                     Encoders.scalaInt)
    val ord = Ordering.by[(Double, Long, Int), (Double, Long, Int)] {
      case (s, k1, k2) => (s, -k1, -k2)
    }
    new TopKAggregator[(Double, Long, Int)](k, ord, tripleEnc,
      org.apache.spark.sql.Encoders.kryo[Seq[(Double, Long, Int)]])
  }
}
