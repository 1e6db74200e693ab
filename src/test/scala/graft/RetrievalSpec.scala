package graft

import graft.operators.TfIdf
import org.apache.spark.sql.functions._

/** BM25 sparse retrieval (TfIdf.bm25TopK). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, "spark shuffle join join join"),
    (11L, "spark filter scan"),
    (12L, "duckdb oracle parquet scan scan"),
    (13L, "the the the the the the the the the the the the join"),
    (14L, "unrelated words entirely")).toDF("doc_id", "text")

  test("bm25: rare query terms outrank common ones; k truncates") {
    val q = Seq((1L, "join oracle")).toDF("query_id", "text")
    val r = TfIdf.bm25TopK(corpus, q, k = 3)
      .orderBy("rank").collect()
    assert(r.length === 3)
    // 'oracle' appears only in doc 12 (idf high); 'join' in 10 (tf 3) and 13
    val ranked = r.map(_.getLong(1)).toSeq
    assert(ranked.toSet.subsetOf(Set(10L, 12L, 13L)))
    // doc 10 (tf=3 'join', short doc) must beat doc 13 (tf=1, long doc)
    assert(ranked.indexOf(10L) < ranked.indexOf(13L))
    // every score positive, ranks are 1..3
    assert(r.map(_.getLong(3)).forall(_ > 0L))
    assert(r.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
  }

  test("bm25: fixed-point scores are partition-count invariant") {
    val q = Seq((1L, "join oracle scan"), (2L, "spark the")).toDF("query_id", "text")
    val a = TfIdf.bm25TopK(corpus, q, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val b = TfIdf.bm25TopK(corpus.repartition(7), q.repartition(3), k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a === b)
  }

  test("bm25: query with no matching terms returns no rows, not zeros") {
    val q = Seq((9L, "zzz qqq")).toDF("query_id", "text")
    assert(TfIdf.bm25TopK(corpus, q, k = 3).count() === 0L)
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    val c2 = Seq(
      (1L, "alpha beta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha")).toDF("query_id", "text")
    val r = TfIdf.bm25TopK(c2, q, k = 2).orderBy("rank").collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(r(0).getLong(3) > r(1).getLong(3))
  }
}
