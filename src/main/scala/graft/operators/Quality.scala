package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the "validate before you
  * train/serve on it" stage of a pipeline. Inspired by the public
  * constraint-suite idea (Deequ's unit-tests-for-data): a rule set is
  * declared once and evaluated into a (rule, violations) report the run
  * can gate on.
  *
  * Execution shape, by rule class:
  *  - Row-local rules (notNull, range, matches) compile to conditional
  *    sums and fold into ONE full-scan aggregate — adding a rule adds an
  *    expression, not a pass. At 100 TB the scan is the cost floor;
  *    this stays exactly at the floor.
  *  - `unique` needs a distinct count: one hash shuffle on the key.
  *  - `refIntegrity` is a left-anti probe of the dimension: broadcast
  *    below `broadcastMaxDim` (probe = early-stopping limit+count, the
  *    leakageSafeSplits tier pattern), shuffle above.
  * Each non-row-local rule is an independent aggregate; the report
  * unions the single-row results (cheap — one row per rule). */
object Quality {

  sealed trait Rule { def name: String }
  /** Violations = rows where `col` is null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** Violations = non-null rows outside [min, max]. */
  final case class Range(col: String, min: Double, max: Double) extends Rule {
    def name = s"range($col,$min,$max)"
  }
  /** Violations = non-null rows not matching the anchored regex. The
    * regex is part of the rule name: two different patterns on the same
    * column are distinct rules and must report as distinct rows. */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = s"matches($col,$regex)"
  }
  /** Violations = rows in excess of one per distinct key tuple. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Violations = rows whose non-null `col` has no match in dim.`dimCol`. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
      extends Rule {
    def name = s"ref($col)"
  }

  /** Evaluate all rules; returns DataFrame(rule: String, violations: Long)
    * with one row per rule, in no particular order. */
  def violations(df: DataFrame, rules: Seq[Rule],
      broadcastMaxDim: Long = 1L << 22): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(broadcastMaxDim > 0 && broadcastMaxDim < Int.MaxValue,
      s"broadcastMaxDim must be in (0, Int.MaxValue), got $broadcastMaxDim")
    val spark = df.sparkSession
    import spark.implicits._

    // coalesce: sum over an EMPTY relation is null, but "no rows" means
    // zero violations, not an unknown count
    def cnt(pred: Column): Column =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).cast("long")

    val rowLocal: Seq[(String, Column)] = rules.collect {
      case r @ NotNull(c) => r.name -> cnt(col(c).isNull)
      case r @ Range(c, lo, hi) =>
        r.name -> cnt(col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case r @ Matches(c, re) =>
        r.name -> cnt(col(c).isNotNull && !col(c).rlike(re))
    }
    val scanReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else Some {
        val agg = df.agg(rowLocal.head._2.as("c0"),
          rowLocal.tail.zipWithIndex.map { case ((_, e), i) => e.as(s"c${i + 1}") }: _*)
        val row = agg // one row; stack to (rule, violations)
        // array-of-struct, not map: a map literal keyed by rule name fails
        // at runtime on duplicate names (mapKeyDedupPolicy=EXCEPTION) or
        // silently drops a report row (LAST_WIN); duplicate-named rules
        // are legal here and simply report as duplicate rows
        row.select(explode(array(
            rowLocal.zipWithIndex.map { case ((n, _), i) =>
              struct(lit(n).as("rule"), col(s"c$i").as("violations")) }: _*))
            .as("__r"))
          .select(col("__r.rule"), col("__r.violations"))
      }

    val others: Seq[DataFrame] = rules.collect {
      case r @ Unique(cols0) =>
        val keys = cols0.map(col)
        df.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n")) - count(lit(1)), lit(0L))
            .cast("long").as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case r @ RefIntegrity(c, dim, dimCol) =>
        val keys = dim.select(col(dimCol)).distinct()
        val side =
          if (keys.limit((broadcastMaxDim + 1).toInt).count() <= broadcastMaxDim)
            broadcast(keys)
          else keys
        df.filter(col(c).isNotNull)
          .join(side, col(c) === side(dimCol), "left_anti")
          .agg(count(lit(1)).cast("long").as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
    }

    (scanReport.toSeq ++ others).reduce(_ unionByName _)
  }

  /** Gopher-style top-n-gram repetition signal: for each document, the
    * single most frequent word n-gram (ties broken lexicographically)
    * and the fraction of the document's characters covered by its
    * occurrences — `top_ct * len(top_gram) / len(text)`, the published
    * "fraction of characters in the most common n-gram" filter
    * (arXiv:2112.11446 §A.1.1). High coverage ⇒ boilerplate/spam.
    *
    * Complements [[graft.functions.TextFns.repetitionRatio]] (fraction
    * of DUPLICATE n-grams) — a doc can score low there but high here
    * when ONE gram dominates.
    *
    * Plan: explode n-grams (scan-side), count per (doc, gram) with
    * map-side combine, pick the per-doc argmax by window rank (a second
    * shuffle of the COUNTS, bounded by tokens-per-doc — never wider
    * than the gram table). Division is one IEEE op on exact ints,
    * floor-truncated — engine-exact. */
  def topNgramCoverage(documents: DataFrame, n: Int): DataFrame = {
    import graft.functions.TextFns
    val grams = documents.select(
      col("doc_id"), length(col("text")).as("n_chars_t"),
      explode(TextFns.shingles(TextFns.tokensWs(col("text")), n)).as("gram"))
    val counts = grams.groupBy(col("doc_id"), col("n_chars_t"), col("gram"))
      .agg(count(lit(1)).as("ct"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("ct").desc, col("gram").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("gram").as("top_gram"),
        col("ct").cast("long").as("top_ct"),
        when(col("n_chars_t") === 0, lit(0.0)).otherwise(
          TextFns.truncate6(
            (col("ct") * length(col("gram"))).cast("double")
              / col("n_chars_t"))).as("coverage"))
  }

  /** k-anonymity audit — the privacy-release check: a row is re-
    * identifiable when its quasi-identifier combination (zip+age+segment
    * shapes) is shared by fewer than k rows. Two-level aggregation (the
    * quasi-group sizes carry map-side combine; the rollup is one row), so
    * the report costs one keyed shuffle at any scale. Pair with
    * [[Erasure.pseudonymize]] (tokenize direct identifiers) and coarsen
    * quasi-columns until `groups_below_k` reaches zero. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("groups_below_k"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("rows_at_risk"),
        min(col("sz")).as("min_group"),
        max(col("sz")).as("max_group"))

  /** Per-group key-skew diagnostic — the "will this join/agg hot-spot"
    * report you run BEFORE picking a salting factor (the j8 salted-join
    * family consumes exactly this shape). Two-level aggregation: the
    * (group, key) counts carry map-side combine, then a group-sized
    * rollup — the heaviest key never concentrates on one task because
    * only its COUNT travels. skew_t = hottest/mean per-key count (1.0 =
    * uniform); the hottest key itself rides a composite max_by
    * (ct·1e11 − key), so ties break to the smallest key identically on
    * every engine. Key cardinality and count bound: key < 1e11,
    * per-key ct < ~9e7 — events user_ids are far inside both. */
  def keySkewReport(df: DataFrame, groupCols: Seq[String],
      keyCol: String): DataFrame = {
    val gs = groupCols.map(col)
    df.groupBy(gs :+ col(keyCol): _*)
      .agg(count(lit(1)).as("ct"))
      .groupBy(gs: _*)
      .agg(sum(col("ct")).as("total"),
        count(lit(1)).as("n_keys"),
        max(col("ct")).as("max_ct"),
        max_by(col(keyCol), col("ct") * 100000000000L - col(keyCol))
          .as("hot_key"))
      .withColumn("skew_t", graft.functions.TextFns.truncate6(
        col("max_ct") * col("n_keys") / col("total").cast("double")))
  }
}
