package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge induction (Bpe.merges / applyMerge). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge: greedy left-to-right, overlapping pairs don't chain") {
    val df = Seq(
      Seq("a", "a", "a"),            // (a,a) -> [aa, a], NOT [aaa]
      Seq("a", "a", "a", "a"),       // -> [aa, aa]
      Seq("b", "a", "a"),            // -> [b, aa]
      Seq("a", "b"),                 // no (a,a) pair: unchanged
      Seq("x")                       // singleton: unchanged
    ).toDF("syms")
    val r = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(r === Seq(
      Seq("aa", "a"), Seq("aa", "aa"), Seq("b", "aa"),
      Seq("a", "b"), Seq("x")))
  }

  test("applyMerge: boundary-exact — a symbol merely ENDING in lhs " +
    "does not match") {
    val df = Seq(Seq("xa", "b"), Seq("a", "b")).toDF("syms")
    val r = df.select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(r === Seq(Seq("xa", "b"), Seq("ab")))
  }

  test("merges: ledger is consistent — syms_after falls by exactly ct " +
    "each round; ties break lexicographically") {
    // "ab" x3, "ba" x3: pair (a,b) ct=3 ties (b,a) ct=3 -> (a,b) wins
    val docs = Seq((1L, "ab ab ab ba ba ba")).toDF("doc_id", "text")
    val m = Bpe.merges(docs, rounds = 2)
      .orderBy("round")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(m.head === ((1L, "a", "b", 3L, 9L)))  // 12 chars - 3 merges
    // round 2: remaining pairs are (b,a) x3 -> merge, 9 - 3 = 6 symbols
    assert(m(1) === ((2L, "b", "a", 3L, 6L)))
  }

  test("encode: segments with merges in order, reassembles in doc order, " +
    "empty docs yield empty arrays") {
    val docs = Seq((1L, "abab ab"), (2L, ""), (3L, "ba")).toDF("doc_id", "text")
    val r = Bpe.encode(docs, Seq(("a", "b"), ("ab", "ab")))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    // "abab": chars -> (a,b) merge -> [ab, ab] -> (ab,ab) merge -> [abab]
    assert(r === Seq(
      (1L, Seq("abab", "ab")), (2L, Seq.empty[String]), (3L, Seq("b", "a"))))
  }

  test("merges: result is partition-layout invariant") {
    val docs = Seq(
      (1L, "spark spark shark"), (2L, "spar spars park"),
      (3L, "a bb ccc dddd")).toDF("doc_id", "text")
    val a = Bpe.merges(docs, rounds = 3).collect().toSeq
    val b = Bpe.merges(docs.repartition(7), rounds = 3).collect().toSeq
    assert(a === b)
  }
}
