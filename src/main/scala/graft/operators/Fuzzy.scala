package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance-1) self-join via deletion neighborhoods — the
  * FastSS blocking scheme (Bocek et al., 2007): two strings are within
  * one edit iff they share an element of {word} ∪ del1(word) (a
  * substitution shares the variant with the substituted position
  * deleted; an insert/delete makes the shorter word itself a variant of
  * the longer). Sharing is necessary but not sufficient ("ab"/"ba"
  * share "a" at distance 2), so candidates verify with one exact
  * levenshtein — cheap, because blocking already shrank the space.
  *
  * Scale shape: the naive all-pairs check is |W|² distance calls; this
  * is a linear variant expansion (fan-out = |w|+1 per word, scan-side)
  * followed by ONE equi-shuffle on the variant and a verification
  * filter — the n² never materializes. The same blocking extends to
  * distance d with d-deletion neighborhoods (fan-out |w|^d — the
  * practical reason production fuzzy joins stop at d ≤ 2).
  */
object Fuzzy {

  /** The word plus every single-character deletion, deduplicated
    * (repeated characters produce identical variants). */
  private[operators] def variants(w: Column): Column =
    array_distinct(concat(
      array(w),
      transform(sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - lit(1)),
          w.substr(i + lit(1), length(w) - i)))))

  /** All unordered pairs (w1 < w2) of distinct `wordCol` values at edit
    * distance exactly 1. Input rows must be distinct words. */
  def editDistance1Pairs(words: DataFrame, wordCol: String): DataFrame = {
    val v = words.select(col(wordCol).as("w"))
      .select(col("w"), explode(variants(col("w"))).as("v"))
    v.as("a").join(v.as("b"),
        col("a.v") === col("b.v") && col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
      .distinct() // a pair can share several variants — dedupe BEFORE verify
      .filter(levenshtein(col("w1"), col("w2")) === 1)
  }
}
