package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator: every partition keeps at
  * most k (score, id) pairs, partial buffers merge pairwise — the shuffle
  * carries k rows per group per partition instead of EVERY scored row.
  *
  * The window `row_number().over(partitionBy(g).orderBy(score))` top-k
  * must shuffle and SORT the full candidate set per group; for ANN scoring
  * at corpus scale (|candidates| = millions per query) that is the
  * dominant cost. This aggregator is the bounded-memory path: O(k) state,
  * associative merges, runs as ObjectHashAggregate with map-side partials.
  *
  * Ordering: score desc, then id asc — identical tie policy to the window
  * formulation, so both paths return the same rows.
  */
object TopK {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  /** Aggregator instance; use via `functions.udaf(TopK.agg(k))`. */
  def agg(k: Int): Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] =
    new Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
      override def zero: Seq[(Double, Long)] = Nil
      override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
        trim(a +: b)
      override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
        trim(x ++ y)
      override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b.sorted(ord)
      override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        Encoders.kryo[Seq[(Double, Long)]]
      override def outputEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
        if (s.lengthCompare(k) <= 0) s else s.sorted(ord).take(k)
    }
}
