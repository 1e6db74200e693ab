package graft.operators

import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed pretraining-corpus filter — the end-to-end shape of a
  * training-data pipeline's cheap filtering pass, built from the
  * individually-verified pieces (language ID, quality score, token bounds,
  * exact dedup).
  *
  * Plan shape: every predicate except the dedup keeper is a narrow
  * per-row expression evaluated in one scan pass; the keeper adds the one
  * unavoidable shuffle (per-content-hash window). Filters run BEFORE the
  * shuffle, so only surviving rows are exchanged.
  */
object Pretrain {

  /** Keep documents that (1) are detected `lang`, (2) score at least
    * `minQuality`, (3) have a whitespace token count within bounds, and
    * (4) are the keeper (min doc_id) of their exact-content class.
    *
    * Quality + token count come from the single-pass native
    * graft_text_profile (bit-identical to the TextFns HOF formulation —
    * TextProfileSpec; measured ~3x on this filter, the HOF path
    * re-tokenizes once per metric). */
  def filterCorpus(
      documents: DataFrame,
      lang: String = "en",
      minQuality: Double = 0.4,
      minTokens: Int = 5,
      maxTokens: Int = 100000): DataFrame = {
    val p = call_function("graft_text_profile", col("text"))
    val passed = documents
      .withColumn("__p", p)
      .filter(
        call_function("graft_langid", col("text")) === lang &&
          col("__p.quality") >= minQuality &&
          col("__p.n_tokens").between(minTokens, maxTokens))
      .drop("__p")
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    passed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Benchmark decontamination: drop every training document sharing at
    * least one word `shingleLen`-gram with the eval corpus (the standard
    * n-gram overlap rule; 8+ grams in practice so organic prose doesn't
    * collide by accident).
    *
    * Scale shape: eval sets are small by nature, so the distinct eval
    * shingle-hash set BROADCASTS (bounded by eval corpus size — a
    * contract, not a hope); the training side is one narrow explode +
    * broadcast semi-join + anti-join — the corpus itself never shuffles,
    * which is what makes this runnable as a cheap final pass over 100 TB.
    * The contaminated-ids anti-join side is USUALLY a sliver, but a
    * boilerplate eval gram can mark an arbitrary corpus fraction, so it
    * gets the same size tier as `Sampling.leakageSafeSplits`: the sliver
    * is materialized once (localCheckpoint — also keeps the shingle scan
    * out of the join's broadcast exchange), broadcast below
    * `broadcastMaxIds`, shuffled above it instead of OOMing executors.
    * Shingle hashing (xxhash64) matches the dedup inverted-index
    * convention.
    *
    * RESOURCE NOTE: the contaminated-ids sliver is localCheckpoint'ed
    * EAGERLY on every call, and its storage blocks must outlive the
    * returned (lazy) anti-join — so they are deliberately NOT unpersisted
    * here and accumulate across repeated library calls in a long-lived
    * session. Wrap repeated calls in [[decontaminateScoped]] to release
    * them once the result is consumed (Bench's inter-query hygiene pass
    * covers the gate path the same way). */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame,
      shingleLen: Int = 8, broadcastMaxIds: Long = 1L << 22): DataFrame =
    decontaminateImpl(corpus, evalDocs, shingleLen, broadcastMaxIds)._1

  /** Shared body: returns (anti-joined result, the checkpointed
    * contaminated-ids sliver) so [[decontaminateScoped]] can release
    * EXACTLY its own blocks once the result is consumed. */
  private def decontaminateImpl(corpus: DataFrame, evalDocs: DataFrame,
      shingleLen: Int, broadcastMaxIds: Long): (DataFrame, DataFrame) = {
    def sh(df: DataFrame, cols: Column*): DataFrame = df.select(
      cols :+ explode(array_distinct(call_function("graft_shingles",
        col("text"), lit(shingleLen)))).as("__sh"): _*)
    val evalGrams = sh(evalDocs)
      .select(xxhash64(col("__sh")).as("__shh")).distinct()
    val contaminated = sh(corpus, col("doc_id"))
      .select(col("doc_id"), xxhash64(col("__sh")).as("__shh"))
      .join(broadcast(evalGrams), "__shh")
      .select("doc_id").distinct()
      .localCheckpoint(true)
    val antiSide =
      if (contaminated.count() <= broadcastMaxIds) broadcast(contaminated)
      else contaminated
    (corpus.join(antiSide, Seq("doc_id"), "left_anti"), contaminated)
  }

  /** Bloom-filter decontamination — the zero-shuffle scale tier of
    * [[decontaminate]]. The eval grams collapse into a Bloom SKETCH
    * (fixed bit array, ~29 bits/gram at fpp=1e-6) instead of an exact
    * broadcast hash set, and the corpus side becomes a pure scan-local
    * predicate: `exists(shingles, g -> bloom(hash(g)))` compiled through
    * the codegen'd [[graft.expressions.BloomMightContain]], short-
    * circuiting on the first hit. No explode, no semi-join, no
    * contaminated-ids materialization, no anti-join — the filter fuses
    * into the corpus scan's whole-stage-codegen span, which is the shape
    * you want when this runs as a final pass over 100 TB.
    *
    * The trade is one-sided and safe for this use: Bloom filters have no
    * false negatives, so every truly contaminated document still drops;
    * fpp controls the fraction of CLEAN documents falsely dropped
    * (per-doc ≈ 1-(1-fpp)^distinct_grams — size fpp to the corpus's gram
    * counts; 1e-6 loses ~4 clean docs per million 40-gram docs).
    * Deterministic: the sketch seed is fixed, so reruns drop the same
    * rows. */
  def decontaminateBloom(corpus: DataFrame, evalDocs: DataFrame,
      shingleLen: Int = 8, fpp: Double = 1e-6): DataFrame = {
    import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
    // one eval scan, pinned: counted for sizing, then sketched
    val evalGrams = evalDocs.select(
        explode(array_distinct(call_function("graft_shingles",
          col("text"), lit(shingleLen)))).as("__sh"))
      .select(xxhash64(col("__sh")).as("__shh")).distinct()
      .localCheckpoint(true)
    val nGrams = evalGrams.count()
    if (nGrams == 0) corpus // empty sketch aggregation yields no buffer
    else {
      val bf = evalGrams.stat.bloomFilter("__shh", nGrams, fpp)
      val contaminated = exists(
        call_function("graft_shingles", col("text"), lit(shingleLen)),
        g => ExpressionUtils.column(graft.expressions.BloomMightContain(
          ExpressionUtils.expression(xxhash64(g)), bf)))
      corpus.filter(!contaminated)
    }
  }

  /** [[decontaminate]] with bounded block lifetime: runs `consume` on the
    * clean corpus, then unpersists the RDD blocks the call materialized
    * (the contaminated-ids localCheckpoint), so repeated pipeline calls
    * do not accumulate storage memory. `consume` must fully drain the
    * result (write/collect/count) — the blocks are gone when it returns.
    * Release is PRECISE (exactly this call's checkpoint, via
    * CheckpointUtil) — safe under concurrent queries on one session,
    * unlike the registry diff it replaced in r15. */
  def decontaminateScoped[T](corpus: DataFrame, evalDocs: DataFrame,
      shingleLen: Int = 8, broadcastMaxIds: Long = 1L << 22)(
      consume: DataFrame => T): T = {
    val (clean, ckpt) =
      decontaminateImpl(corpus, evalDocs, shingleLen, broadcastMaxIds)
    try consume(clean)
    finally CheckpointUtil.free(ckpt)
  }

  /** Semantic decontamination — the embedding-level sibling of the n-gram
    * rule: drop every training vector whose cosine against ANY eval
    * vector reaches `tau` (paraphrased eval leakage that shares no
    * 8-gram). This is a thin composition over the kNN-join tiers: the
    * nearest eval neighbor (k=1) decides the drop, so
    * [[Similarity.knnJoinExact]] is the truth path and
    * [[Similarity.knnJoinIvf]] (shared coarse cells, one shuffle
    * equi-join, no corpus broadcast) is the both-sides-large plan —
    * pass `centroids`/`nProbe` to choose it. NOTE the IVF tier's error
    * is the OPPOSITE side from [[decontaminateBloom]]'s: ANN recall < 1
    * can MISS a near-eval neighbor and under-drop, so reserve it for
    * corpora where the exact tier's N×M scan is unpayable, and size
    * nProbe generously (the spec proves full-probe == exact). Returns
    * the surviving corpus rows (anti-join on the dropped sliver, which
    * is small by the same argument as [[decontaminate]]). */
  def decontaminateSemantic(corpusEmb: DataFrame, evalEmb: DataFrame,
      tau: Double, centroids: Option[DataFrame] = None,
      nProbe: Int = 4): DataFrame = {
    val nn = centroids match {
      case Some(c) => Similarity.knnJoinIvf(corpusEmb, evalEmb, 1, c, nProbe)
      case None    => Similarity.knnJoinExact(corpusEmb, evalEmb, 1)
    }
    val dropped = nn.filter(col("cos") >= tau)
      .select(col("query_id").as("vec_id")).distinct()
    corpusEmb.join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Multi-eval-set decontamination with attribution: for every training
    * doc overlapping any eval set, WHICH set and how many distinct
    * offending grams. The attribution is what [[decontaminate]]'s boolean
    * drop cannot give a pipeline: a doc tripping a held-out benchmark is
    * dropped, one tripping a low-stakes internal set may only be flagged,
    * and per-set hit counts are the audit that distinguishes real eval
    * leakage from boilerplate collisions (1 shared gram vs hundreds).
    *
    * Same scale shape as [[decontaminate]]: all eval gram tables are
    * small → one broadcast union tagged by set name; the corpus scans
    * once and never shuffles wide (the output groupBy is on contaminated
    * (doc, set) pairs — a sliver). Returns (doc_id, eval_set, grams_hit). */
  def decontaminateReport(corpus: DataFrame,
      evalSets: Seq[(String, DataFrame)], shingleLen: Int = 8): DataFrame = {
    require(evalSets.nonEmpty, "need at least one eval set")
    val grams = evalSets.map { case (name, df) =>
      df.select(explode(array_distinct(call_function("graft_shingles",
          col("text"), lit(shingleLen)))).as("__sh"))
        .select(lit(name).as("eval_set"), xxhash64(col("__sh")).as("__shh"))
        .distinct()
    }.reduce(_ unionByName _)
    corpus.select(col("doc_id"),
        explode(array_distinct(call_function("graft_shingles",
          col("text"), lit(shingleLen)))).as("__sh"))
      .select(col("doc_id"), xxhash64(col("__sh")).as("__shh"))
      .join(broadcast(grams), "__shh")
      .groupBy(col("doc_id"), col("eval_set"))
      .agg(count(lit(1)).as("grams_hit"))
  }
}
