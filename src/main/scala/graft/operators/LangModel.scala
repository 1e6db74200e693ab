package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring — the classic
  * perplexity-style quality filter (the CCNet/KenLM role: score a doc by
  * how predictable its text is under a reference corpus model; outliers
  * on either end are boilerplate or garbage).
  *
  * Model: bigram with add-one (Laplace) smoothing over the reference
  * vocabulary — p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V). A document's
  * score is the mean negative log-likelihood per bigram.
  *
  * Engine-exactness: each bigram occurrence's ln(p) floor-truncates to
  * fixed-point millionths BEFORE the per-doc sum (the BM25 trick), so
  * the sum is exact integer arithmetic; the final mean is one IEEE
  * division, floor-truncated.
  *
  * Scale shape: the reference corpus is scanned twice (unigram + bigram
  * counts — both ONE shuffle each, map-side combined); the count tables
  * are vocabulary/bigram-type-sized (≪ corpus) and join the scored
  * docs' bigram stream per occurrence (AQE broadcasts them when they
  * fit). The scored corpus is scanned once and never shuffled whole —
  * only its (doc, bigram) stream shuffles for the count join and the
  * per-doc aggregate.
  */
object LangModel {

  /** Adjacent token pairs as (w1, w2) structs; < 2 tokens ⇒ empty. */
  private def bigramPairs(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))

  /** Score `docs` under a bigram model counted from `corpus`.
    * Returns (doc_id, n_bi, nll_fp_sum, avg_nll): bigram count, exact
    * fixed-point NLL sum, and the floor-truncated mean NLL per bigram
    * (0.0 for docs with < 2 tokens). Unseen words/bigrams smooth to
    * (0 + 1)/(0 + V). */
  def bigramNll(corpus: DataFrame, docs: DataFrame): DataFrame = {
    // Tokenize ONCE into a materialized column. Passing tokensWs(text)
    // straight into bigramPairs inlines the full split into every
    // element_at inside the transform lambda — the doc is re-tokenized
    // twice PER BIGRAM (r13 PlanDump: the scan stage ran ~100× over
    // cost). A separate projection pins one evaluation per row;
    // CollapseProject keeps non-cheap multiply-referenced aliases.
    val corpusToks = corpus.select(TextFns.tokensWs(col("text")).as("toks"))
    val uni = corpusToks
      .select(explode(col("toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocabSize = uni.agg(count(lit(1)).cast("double").as("v"))
    val bi = corpusToks
      .select(explode(bigramPairs(col("toks"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val occurrences = docs
      .select(col("doc_id"), TextFns.tokensWs(col("text")).as("toks"))
      .select(col("doc_id"), explode(bigramPairs(col("toks"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val scored = occurrences
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocabSize))
      .select(col("doc_id"),
        floor(
          -log((coalesce(col("c12"), lit(0L)).cast("double") + lit(1.0))
            / (coalesce(col("c1"), lit(0L)).cast("double") + col("v")))
            * lit(1000000.0)).as("nll_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bi"), sum(col("nll_fp")).as("nll_fp_sum"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("nll_fp_sum"), lit(0L)).as("nll_fp_sum"),
        when(coalesce(col("n_bi"), lit(0L)) === 0, lit(0.0))
          .otherwise(TextFns.truncate6(
            (col("nll_fp_sum").cast("double") / lit(1000000.0)) / col("n_bi")))
          .as("avg_nll"))
  }

  /** Bigram collocations by pointwise mutual information — phrase
    * detection (the word2vec-phrases / corpus-prep role: "new york"
    * co-occurs far above chance; "of the" does not). For each adjacent
    * pair with corpus count ≥ `minCount` (the standard guard against the
    * PMI hapax pathology — rare pairs otherwise max the score):
    *
    *   pmi = ln( (c12 · N²) / (B · c1 · c2) )
    *
    * with N = total tokens, B = total bigram occurrences. The rational
    * is evaluated in ONE double expression with a fixed multiplication
    * order (mirrored operand-for-operand by the oracle) and the ln
    * floor-truncates to millionths — the text_lm_score exactness recipe.
    *
    * Scale shape: two count shuffles (unigram, bigram — both map-side
    * combined), then joins over COUNT TABLES only (bigram-type-sized,
    * ≪ corpus; AQE broadcasts the unigram side when it fits). The
    * corpus itself is scanned twice and never re-shuffled. */
  def collocations(corpus: DataFrame, minCount: Long = 5L): DataFrame = {
    val toks = corpus.select(TextFns.tokensWs(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).cast("double").as("n_uni"))
    val bi = toks.select(explode(bigramPairs(col("toks"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val nBi = bi.agg(sum(col("c12")).cast("double").as("n_bi_total"))
    bi.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("c12"),
        TextFns.truncate6(log(
          (col("c12").cast("double") * col("n_uni") * col("n_uni"))
            / (col("n_bi_total") * col("c1").cast("double")
              * col("c2").cast("double")))).as("pmi_t"))
  }
}
