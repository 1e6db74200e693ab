package graft

import graft.functions.TextFns
import graft.operators.Chunking
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: sliding window with stride, short tail, empty doc") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, W=4 S=3 -> starts 0,3,6,9
      (2L, "x y"),                 // 2 tokens -> one short chunk
      (3L, "   ")                  // empty after trim -> one empty chunk
    ).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, window = 4, stride = 3)
      .select("doc_id", "chunk_idx", "start_tok", "n_toks", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().sorted.toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 3L, 4L, "d e f g"),
      (1L, 2L, 6L, 4L, "g h i j"),
      (1L, 3L, 9L, 1L, "j"),
      (2L, 0L, 0L, 2L, "x y"),
      (3L, 0L, 0L, 0L, "")))
  }

  test("chunk covers every token and respects overlap") {
    val docs = Seq((7L, (1 to 53).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Chunking.chunk(docs, window = 16, stride = 8)
      .select("start_tok", "n_toks").as[(Long, Long)].collect().sorted
    // starts at every multiple of 8 below 53
    assert(rows.map(_._1).toSeq === (0L until 53L by 8L).toSeq)
    // chunks clamp at the end; full window elsewhere
    rows.foreach { case (s, n) => assert(n === math.min(16L, 53L - s)) }
  }

  test("packSequences: contiguous fill per shard, deterministic bins") {
    // one shard (shards=1): docs in id order, budget 10
    val docs = Seq(
      (0L, "a b c d"),      // 4 toks, cum 4,  starts at 0  -> pack 0
      (1L, "a b c d e"),    // 5 toks, cum 9,  starts at 4  -> pack 0
      (2L, "a b c"),        // 3 toks, cum 12, starts at 9  -> pack 0
      (3L, "a b c d e f"),  // 6 toks, cum 18, starts at 12 -> pack 1
      (4L, "a")             // 1 tok,  cum 19, starts at 18 -> pack 1
    ).toDF("doc_id", "text")
    val got = Chunking.packSequences(docs, budget = 10, shards = 1)
      .select("doc_id", "shard", "pack_id").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(got === Seq((0L, 0L, 0L), (1L, 0L, 0L), (2L, 0L, 0L),
      (3L, 0L, 1L), (4L, 0L, 1L)))
  }

  test("packSequences is stable under repartitioning (shards are the layout)") {
    val docs = (0L until 200L).map(i => (i, ("w " * ((i % 37).toInt + 1)).trim)).toDF("doc_id", "text")
    val a = Chunking.packSequences(docs, budget = 64, shards = 4)
      .select("doc_id", "shard", "pack_id").as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Chunking.packSequences(docs.repartition(13), budget = 64, shards = 4)
      .select("doc_id", "shard", "pack_id").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a === b)
    // every doc lands in its doc_id % 4 shard
    assert(a.forall { case (d, s, _) => s == d % 4 })
  }

  test("repetitionRatio: repeated vs distinct n-grams, short-doc zero") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // 7 shingles: abc,bca,cab,abc,bca,cab,abc -> 3 distinct
      (2L, "q w e r t y"),       // 4 shingles, all distinct -> 0.0
      (3L, "a b")                // < 3 tokens -> single shingle -> 0.0
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextFns.truncate6(TextFns.repetitionRatio(col("text"), 3)).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === math.floor((1.0 - 3.0 / 7.0) * 1e6) / 1e6)
    assert(got(2L) === 0.0)
    assert(got(3L) === 0.0)
  }

  test("piiScrub replaces emails and phones, leaves clean text alone") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@corp.example.org today"),
      (2L, "call 555-123-4567 or 555.987.6543 now"),
      (3L, "no pii here, just 12345 and version 1.2.3")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextFns.piiScrub(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "reach me at <EMAIL> today")
    assert(got(2L) === "call <PHONE> or <PHONE> now")
    assert(got(3L) === "no pii here, just 12345 and version 1.2.3")
  }
}
