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

  /** Weighted sampling WITHOUT replacement, exactly k rows — the
    * Efraimidis–Spirakis A-ES scheme (Inf. Process. Lett. 97(5), 2006):
    * each row draws u ∈ (0,1] from the portable hash of its key and
    * ranks by u^(1/w); the top-k by that key are a weighted sample
    * without replacement, exact in one pass. Ranking on the monotone
    * log form ln(u)/w (descending) avoids pow entirely, and the score
    * is floor-truncated to integer millionths (the text_lm_score ln
    * contract) so an external engine replays the ORDER bit-stably; ties
    * break on the key.
    *
    * Scale shape: score is computed scan-side (narrow); the top-k is a
    * distributed TakeOrdered — k rows per partition merge at the driver,
    * no full sort, no shuffle. Deterministic and partition-independent:
    * the sample is a pure function of (keys, weights, k).
    *
    * `weightCol` must be > 0 (a zero weight has undefined 1/w — filter
    * upstream); u is never 0 by construction ((h+1)/2^40), so ln(u) is
    * finite. */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
      k: Int): DataFrame = {
    val m = 1L << 40
    val u = (HashFns.md5Lower64Mod(keyCol.cast("string"), m) + lit(1L))
      .cast("double") / lit(m.toDouble)
    val score = floor(log(u) / weightCol.cast("double") * lit(1000000.0))
      .cast("long")
    df.withColumn("ares_score", score)
      .orderBy(col("ares_score").desc, keyCol)
      .limit(k)
  }

  /** Balanced per-group cap: keep at most `k` rows per group, selected by
    * portable-hash order of `keyCol` (ties broken by the key itself) — the
    * "no source dominates the mix" step of a pretraining recipe, fully
    * deterministic and partition-independent where a per-group
    * `df.sample` is neither.
    *
    * PRECONDITION for that determinism: `keyCol` is unique within each
    * group (doc_id in the gate). Rows sharing a (hash, key) pair tie in
    * the window order, and row_number breaks that tie by encounter
    * order — partition-layout-dependent, so the kept set for a
    * duplicate-key group can differ between runs. With a unique key the
    * order is total and the selection is reproducible anywhere.
    *
    * One shuffle on the group key; the `rn <= k`
    * filter triggers Spark's WindowGroupLimit, so each partition reduces
    * to k candidate rows per group BEFORE the exchange — a capped group's
    * long tail never crosses the wire at corpus scale. */
  def capPerGroup(df: DataFrame, groupCol: Column, keyCol: Column,
      k: Int): DataFrame = {
    require(k > 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(HashFns.md5Lower64Mod(keyCol.cast("string"), Buckets), keyCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Token-budget sampling — the "fill each source's token quota" step of
    * a data-mixing recipe: within each group, walk rows in the
    * deterministic md5-keyed order (the same shuffle-proof total order as
    * [[capPerGroup]]) and keep rows while the running weight of PRECEDING
    * kept rows is below `budget` — so the row that crosses the budget
    * line is the last one kept and every group's quota is filled (never
    * undershot by more than one document) regardless of the document-size
    * distribution. `weightCol` is whatever the quota is denominated in
    * (token count, char count, bytes).
    *
    * One shuffle on the group key; the running sum rides the same window
    * as the ordering (no second exchange). The order key is (md5(key),
    * key) — total, so the RANGE-frame default equals ROWS and the
    * cumulative sum is engine-portable. At 100 TB the window sort of one
    * giant group is the limit: pre-cap with [[capPerGroup]] at
    * k ≈ budget/avg_weight × slack to bound the sorted set first — the
    * cap's WindowGroupLimit keeps the long tail off the wire. */
  def tokenBudgetSample(df: DataFrame, groupCol: Column, keyCol: Column,
      weightCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(HashFns.md5Lower64Mod(keyCol.cast("string"), Buckets), keyCol)
    df.withColumn("__cum", sum(weightCol).over(w) - weightCol)
      .filter(col("__cum") < budget)
      .drop("__cum")
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

  /** Temperature-flattened mixture — the multilingual-LM "sample with
    * temperature" recipe, realized by pure downsampling. Target stratum
    * proportions q_s ∝ p_s^alpha flatten the empirical distribution p_s;
    * dividing out p_s and normalizing so the max rate is 1 gives keep
    * rates r_s = (n_min / n_s)^(1-alpha): the rarest stratum keeps
    * everything, heavy strata are thinned toward the flattened mix.
    * alpha=1 keeps all rows; alpha=0.5 is the common T=2 setting.
    *
    * Row decisions are the same deterministic md5-hash accept as
    * [[hashSample]]. Rates derive from a per-stratum count aggregate —
    * vocabulary-sized, so at 100 TB the plan is: one small shuffle to
    * count strata, broadcast the (stratum, threshold) table back, and a
    * narrow filter on the big side. No wide shuffle touches the corpus.
    *
    * Dyadic alphas (1-alpha = m/2^k, e.g. 0.5, 0.25, 0.75, 0.125) route
    * through a product of IEEE-exact `sqrt` chains ([[dyadicRate]]), so
    * the accept decision is bit-reproducible across engines (the DuckDB
    * oracle recomputes identical thresholds from the same op sequence);
    * non-dyadic alphas fall back to `pow` (1-ulp libm), portable in
    * practice but not certified at floor boundaries.
    * The output keeps `__thr` — the stratum's accept threshold out of
    * 10000 — so callers (and the gate) can audit the realized rates.
    *
    * Rows whose stratum is NULL form their own stratum: the join below is
    * null-safe (`<=>`), so they are thinned at the NULL stratum's own
    * rate rather than silently dropped. */
  def temperatureMixture(
      df: DataFrame,
      stratumCol: Column,
      keyCol: Column,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(stratumCol.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__minn"))
    val ratio = col("__minn").cast("double") / col("__n").cast("double")
    val rate = dyadicRate(ratio, 1 - alpha).getOrElse(pow(ratio, 1 - alpha))
    val thresholds = counts.crossJoin(minN)
      .select(col("__stratum"),
        floor(rate * Buckets).cast("long").as("__thr"))
    df.join(broadcast(thresholds), stratumCol <=> col("__stratum"))
      .filter(HashFns.md5Lower64Mod(keyCol.cast("string"), Buckets) < col("__thr"))
      .drop("__stratum")
  }

  /** x^e as a left-to-right product of repeated-sqrt terms when e is a
    * dyadic rational m/2^k (k <= 6): e = Σ 2^-k_i  ⇒  x^e = Π sqrt^{k_i}(x),
    * ascending k_i. Every step (sqrt, *) is correctly rounded under
    * IEEE-754, so any engine replaying the same op sequence reproduces the
    * result bit-for-bit — unlike libm `pow`. None when e is not dyadic. */
  private[operators] def dyadicRate(x: Column, e: Double): Option[Column] = {
    if (e == 0.0) return Some(lit(1.0))
    if (e == 1.0) return Some(x)
    val scaled = e * 64 // 2^6
    if (scaled != math.floor(scaled) || e < 0 || e > 1) return None
    val bits = scaled.toLong // e = bits / 64
    val terms = (1 to 6).flatMap { k =>
      if ((bits & (64L >> k)) != 0L)
        Some((1 to k).foldLeft(x)((c, _) => sqrt(c)))
      else None
    }
    Some(terms.reduceLeft(_ * _))
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

  /** Dedup-aware train/validation/test splits: each near-dup CLUSTER is
    * assigned atomically to one split by the portable hash of its cluster
    * label (docs outside the pair graph are their own cluster), so two
    * near-duplicate documents can never land on opposite sides of a
    * train/eval boundary. Corpus-level dedup alone does not give this:
    * survivors of distinct-but-similar clusters, or a pipeline that keeps
    * all members, still leak eval content into training unless the SPLIT
    * is cluster-atomic. Standard practice splits by URL/domain for the
    * same reason; cluster labels subsume that when near-dup detection is
    * content-based.
    *
    * `splits` are (name, weight) with weights summing to 1; assignment is
    * by cumulative hash-bucket ranges, so it is deterministic,
    * partition-independent, and engine-portable (md5 low-64, the same
    * primitive as [[hashSample]]). The labels side is USUALLY a
    * pair-graph-sized table (tiny vs corpus — the
    * [[graft.operators.Dedup.clusters]] boundedness argument), so the
    * join broadcasts below `broadcastMaxLabels` and the corpus never
    * shuffles; above the cap (a pathologically duplicate-heavy corpus
    * labels a large fraction of its docs) the hint is withheld and the
    * join shuffles on doc_id instead of OOMing every executor with an
    * oversized broadcast table. The cap probe is `limit(cap+1).count()` —
    * early-stopping, nothing materialized on the driver; callers with an
    * expensive labels lineage should persist it first (the dedup gates
    * pass a LocalRelation / checkpointed labels, so the probe is free). */
  def leakageSafeSplits(documents: DataFrame, labels: DataFrame,
      splits: Seq[(String, Double)],
      broadcastMaxLabels: Long = 1L << 22): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    require(broadcastMaxLabels > 0 && broadcastMaxLabels < Int.MaxValue,
      s"broadcastMaxLabels must be in (0, Int.MaxValue), got $broadcastMaxLabels")
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * Buckets))
    val labelsSide =
      if (labels.limit((broadcastMaxLabels + 1).toInt).count() <= broadcastMaxLabels)
        broadcast(labels)
      else labels
    val keyed = documents
      .join(labelsSide, Seq("doc_id"), "left")
      .withColumn("__ck", coalesce(col("cluster_id"), col("doc_id")))
    val b = HashFns.md5Lower64Mod(col("__ck").cast("string"), Buckets)
    val assign = splits.zip(cuts).dropRight(1).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), t)) => when(b < t, name).otherwise(acc)
      }
    keyed.withColumn("split", assign).drop("__ck", "cluster_id")
  }
}
