package graft.operators

import graft.functions.TextFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data shaping: fixed-token-window chunking and sequence
  * packing — the two steps between a filtered corpus and model-ready
  * samples. (No reference analogue: these extend the engine for the
  * LLM-pipeline brief, like Dedup/Similarity.)
  *
  * Both are scan-side/narrow or one-window-per-shard — no corpus-wide
  * shuffle, no driver involvement, so they scale with input size like
  * any projection does.
  */
object Chunking {

  /** Slide a `window`-token window by `stride` over each document's
    * whitespace tokens: chunk i covers tokens [i*stride, i*stride+window).
    * Start positions are every multiple of `stride` below the token count
    * (an empty doc yields one empty chunk), so tail chunks may be short —
    * the standard overlap-chunking shape for context-window prep.
    *
    * Pure per-row expression (tokenize → posexplode over the start
    * sequence → slice): zero shuffle, runs inside the scan stage. */
  def chunk(documents: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    documents
      .select(col("doc_id"), tokensWs(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(stride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_tok"),
        slice(col("toks"), col("col") + 1, lit(window)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_toks"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Pack documents into contiguous token-budget bins, independently per
    * shard: within a shard (doc_id mod `shards`), docs are laid out in
    * doc_id order and a doc belongs to the bin its starting token offset
    * falls in (`(cumsum - n) div budget`). This is streaming first-fit
    * packing with a deterministic layout — re-running on the same corpus
    * reproduces identical packs, and shards are independent, so
    * parallelism is `shards` regardless of corpus size (size shards to
    * the cluster; the per-shard window never sees more than 1/shards of
    * the docs). */
  def packSequences(documents: DataFrame, budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        tokenCount(col("text")).cast("long").as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .select(col("doc_id"), col("shard"), col("n_toks"),
        // integer `div`, not double `/`: exact bin assignment at any
        // cumulative token count (double division loses integer precision
        // past 2^53 tokens/shard and would diverge from the layout contract)
        expr(s"(cum - n_toks) div ${budget.toLong}").as("pack_id"))
  }
}
