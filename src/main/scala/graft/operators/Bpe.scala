package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge induction (Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer-vocabulary learning step of a
  * training-data pipeline, distributed Spark-first.
  *
  * Shape: the corpus is scanned ONCE to build the word-count vocabulary
  * (one shuffle on word); every merge round after that runs on the
  * VOCABULARY table — vocabulary-sized (≪ corpus), cached, linear
  * lineage. Per round: adjacent symbol pairs explode scan-side over the
  * cached vocab, one weighted-count aggregate picks the argmax pair
  * (ties: count desc, then lexicographic), and the merge applies as a
  * pure per-row fold. The only driver reads are one row per round (the
  * winning pair) — the bounded-metadata pattern, same as k-means
  * centroids.
  *
  * Merge application is a left-to-right greedy fold INTO a
  * '|'-separated string: if the accumulated tail symbol equals `lhs`
  * and the next symbol equals `rhs`, append `rhs` WITHOUT a separator
  * (growing the tail symbol into the merge); otherwise append with one.
  * A newly formed merge can never re-match as `lhs` in the same round
  * (its text is lhs+rhs ≠ lhs since rhs is non-empty), so the fold is
  * exactly the sequential greedy scan — and it is replayable
  * operand-for-operand in the DuckDB oracle via list_reduce. Symbols
  * must not contain '|' (true for whitespace-split tokens here; a
  * byte-level variant would escape first).
  */
object Bpe {

  /** Adjacent symbol pairs of a symbol array, as (a, b) structs. */
  private def adjPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"),
          element_at(syms, i + 1).as("b"))))

  /** Greedy left-to-right application of one merge rule to a symbol
    * array (see object doc for why the string fold is exact). */
  private[graft] def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    when(size(syms) <= 1, syms).otherwise(
      split(
        aggregate(
          slice(syms, lit(2), size(syms) - 1),
          element_at(syms, 1),
          (acc, x) =>
            when(endswith(concat(lit("|"), acc), lit("|" + lhs)) && x === lit(rhs),
              concat(acc, x))
              .otherwise(concat(acc, lit("|"), x))),
        "\\|"))

  /** Learn `rounds` BPE merges over the corpus. Returns one row per
    * round: (round, lhs, rhs, ct, syms_after) where `ct` is the
    * corpus-weighted frequency of the merged pair and `syms_after` the
    * corpus-weighted total symbol count after applying it (strictly
    * decreasing by `ct` each round — the compression ledger).
    *
    * Eager (like trainCentroids): each round materializes the argmax
    * pair — one driver row per round. The vocab table is persisted and
    * rolled forward; intermediate generations unpersist as soon as the
    * next is materialized, so peak cache is two vocab copies. */
  def merges(documents: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    val spark = documents.sparkSession
    import spark.implicits._

    val vocab0 = documents
      .select(explode(TextFns.tokensWs(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wct"))
      .select(col("word"), col("wct"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var vocab = vocab0
    val ledger = Seq.newBuilder[(Long, String, String, Long, Long)]
    try {
      for (r <- 1 to rounds) {
        val top = vocab
          .select(col("wct"), explode(adjPairs(col("syms"))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("wct")).as("ct"))
          .orderBy(col("ct").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (top.nonEmpty) {
          val (lhs, rhs, ct) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          val next = vocab
            .select(col("word"), col("wct"),
              applyMerge(col("syms"), lhs, rhs).as("syms"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val symsAfter = next
            .agg(sum(col("wct") * size(col("syms"))).cast("long")).as[Long].head()
          if (vocab ne vocab0) vocab.unpersist()
          vocab = next
          ledger += ((r.toLong, lhs, rhs, ct, symsAfter))
        }
      }
    } finally {
      if (vocab ne vocab0) vocab.unpersist()
      vocab0.unpersist()
    }
    ledger.result().toDF("round", "lhs", "rhs", "ct", "syms_after")
  }

  /** Segment the corpus with an ordered merge list (the output of
    * [[merges]]): every document becomes its BPE symbol sequence, words
    * in document order, symbols in word order.
    *
    * Scale shape: the merge chain applies once per DISTINCT word (a
    * vocabulary-sized projection, each merge one per-row fold — no
    * shuffle between rounds), then the segmented vocab joins back to
    * the corpus words (AQE broadcasts it when it fits; hash join
    * otherwise). Reassembly is a per-doc sort+flatten of that doc's own
    * words — row-bounded, never wider than the document itself. */
  def encode(documents: DataFrame, mergeList: Seq[(String, String)]): DataFrame = {
    val words = documents.select(col("doc_id"),
      posexplode(TextFns.tokensWs(col("text"))))
      .toDF("doc_id", "pos", "word")
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    val vocab = words.select(col("word")).distinct()
      .select(col("word"),
        mergeList.foldLeft(chars) { case (c, (l, r)) => applyMerge(c, l, r) }
          .as("syms"))
    val agg = words.join(vocab, "word")
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("syms")))),
        s => s.getField("syms"))).as("bpe"))
    documents.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bpe"), array().cast("array<string>")).as("bpe"))
  }
}
