package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV ("k minimum values", a.k.a. bottom-k / theta) distinct sketch —
  * the set-operation sketch Spark's built-ins lack: HLL
  * (`approx_count_distinct`) unions but cannot intersect, exact bitmaps
  * (a22) intersect but carry the full key universe. A KMV sketch is the
  * k smallest distinct hash values of a set; because the SAME hash
  * orders every set, two sketches support union AND intersection
  * estimates (Beyer et al., SIGMOD'07) from O(k) state:
  *
  *   θ  = (k-th smallest + 1) / M          (normalized k-th order stat)
  *   D̂  = (k-1) / θ                        (full sketch; exact when |S|<k)
  *   D̂∩ = |K∪ ∩ A ∩ B| / |K∪| · D̂∪         (K∪ = sketch of the union)
  *
  * Scale shape: the aggregation keeps O(k) state per partition with
  * associative merges (ObjectHashAggregate, map-side partials) — the
  * shuffle carries ≤ k values per partition instead of the full distinct
  * key space that `count_distinct`/bitmap pay. Sketches persist as plain
  * `array<bigint>` columns: mergeable across days/shards by re-running
  * the same bottom-k over concatenated arrays (the a17 HLL-reagg story,
  * plus intersections).
  *
  * Hashing is the engine-portable md5-lower-64 family
  * ([[HashFns.md5Lower64Mod]]) folded into M = 2^40, so an external
  * engine can replay sketch content AND estimates bit-exactly — the
  * gate's oracle is full equality, not a tolerance verdict.
  */
object Kmv {

  /** Hash domain: 2^40. Wide enough that collisions are negligible at
    * gate scale (birthday ≈ n²/2^41), small enough that every value,
    * +1 offsets, and (k-1)·M products stay exact in both long and
    * double arithmetic everywhere. */
  val M: Long = 1L << 40

  /** Portable hash of a key column into [0, M). */
  def hashKey(key: Column): Column = HashFns.md5Lower64Mod(key, M)

  /** Bounded bottom-k-distinct Aggregator; use via
    * `functions.udaf(Kmv.agg(k), Encoders.scalaLong)`. Buffer is a
    * sorted ascending Seq capped at k distinct values: a full buffer
    * rejects any hash ≥ its max in one compare, so the per-row cost
    * after saturation is O(1) and total sort work is O(k·log(n/k))
    * accepted inserts. */
  def agg(k: Int): Aggregator[Long, Seq[Long], Seq[Long]] =
    new Aggregator[Long, Seq[Long], Seq[Long]] {
      override def zero: Seq[Long] = Nil
      override def reduce(b: Seq[Long], a: Long): Seq[Long] =
        if (b.lengthCompare(k) >= 0 && a >= b.last) b
        else if (b.contains(a)) b
        else ((a +: b).sorted: Seq[Long]).take(k)
      override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
        ((x ++ y).distinct.sorted: Seq[Long]).take(k)
      override def finish(b: Seq[Long]): Seq[Long] = b
      override def bufferEncoder: Encoder[Seq[Long]] =
        Encoders.kryo[Seq[Long]]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Distinct estimate from a sketch column: exact size below k, the
    * (k-1)/θ order-statistic estimator at k. (k-1)·M ≤ 2^48·k stays
    * exact in a double, so the expression is one IEEE division — an
    * external replay computes the identical bits. */
  def estimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble * M) / (element_at(sk, k) + lit(1L)))

  /** Sketch of the union of two sketched sets: bottom-k of the merged
    * samples (closed under union — the defining KMV property). */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Intersection estimate from two sketches: Jaccard over the union
    * sketch, scaled by the union estimate. Exact when both sets are
    * smaller than k (the sketches ARE the hashed sets). */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val u = unionSketch(a, b, k)
    val matches = size(filter(u, x => array_contains(a, x) && array_contains(b, x)))
    (matches.cast("double") / size(u).cast("double")) * estimate(u, k)
  }
}
