package graft.operators

import graft.functions.TextFns._
import org.apache.spark.sql.DataFrame
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
}
