package graft.operators

import graft.functions.HashFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `sample()` on a DataFrame is seeded per-partition — repartition the
  * input and the sample changes, which is poison for reproducible corpus
  * builds. These samplers decide per ROW from a content hash, so the
  * selection is a pure function of the data: stable under any partitioning,
  * any cluster size, any execution order, and re-runnable incrementally
  * (new rows don't disturb old decisions). The hash primitive is the
  * engine-portable md5 low-64 (HashFns.md5Lower64), so a sample is
  * reproducible OUTSIDE this engine too.
  */
object Sampling {

  private val Buckets = 10000L

  /** Keep a row iff hash(key) mod 10000 < rate*10000. Deterministic,
    * partition-independent Bernoulli-style sampling. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1)
    df.filter(
      HashFns.md5Lower64Mod(keyCol.cast("string"), Buckets) < (rate * Buckets).toLong)
  }

  /** Weighted dataset mixture: union N corpora, each hash-sampled at its
    * own rate — the "mix web/books/code at fixed proportions" step of a
    * pretraining data recipe. Deterministic per source (same hash-keyed
    * selection as [[hashSample]]); schemas align by name. */
  def mixture(sources: Seq[(DataFrame, Double)], keyCol: String): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (df, rate) => hashSample(df, col(keyCol), rate) }
      .reduce(_ unionByName _)
  }

  /** Stratified deterministic sample: per-stratum rates (stratum column →
    * rate in [0,1]); strata absent from the map fall back to
    * `defaultRate`. Rates are baked into the plan as a literal map — no
    * join, no shuffle; the filter runs at the scan. */
  def stratified(
      df: DataFrame,
      stratumCol: Column,
      keyCol: Column,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val rateMap = map(rates.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      Seq(lit(k), lit((v * Buckets).toLong))
    }: _*)
    df.filter(
      HashFns.md5Lower64Mod(keyCol.cast("string"), Buckets) <
        coalesce(element_at(rateMap, stratumCol), lit((defaultRate * Buckets).toLong)))
  }
}
