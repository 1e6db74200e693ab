package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("persisted IVF index returns the same neighbors as the in-memory path") {
    val path = Files.createTempDirectory("graft-ivf").toString + "/index"
    val centroids = Similarity.trainCentroids(emb, k = 8, iters = 1)
      .localCheckpoint(true) // pin: both paths must use identical centroids
    val queries = emb.filter(col("vec_id") < 3)
    Similarity.buildIvfIndex(emb, centroids, path)
    val indexed = Similarity.ivfTopKIndexed(spark, path, queries, k = 5,
      centroids, nProbe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sorted
    val inMem = Similarity.ivfTopK(emb, queries, k = 5, centroids, nProbe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sorted
    assert(indexed === inMem)
    assert(indexed.nonEmpty)
  }

  test("TopK aggregator == window row_number top-k (same rows, same order)") {
    val queries = emb.filter(col("vec_id") < 5)
    val win = Similarity.bruteForceTopKWindow(emb, queries, k = 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().sorted
    val agg = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().sorted
    assert(agg === win)
  }

  test("all top-k paths rank via ObjectHashAggregate, not a per-group sort") {
    val queries = emb.filter(col("vec_id") < 5)
    val centroids = Similarity.trainCentroids(emb, k = 8, iters = 1)
      .localCheckpoint(true)
    val plans = Map(
      "brute" -> Similarity.bruteForceTopK(emb, queries, k = 5),
      "lsh" -> Similarity.lshTopK(emb, queries, k = 5,
        graft.functions.VectorFns.randomPlanes(8, 64)),
      "ivf" -> Similarity.ivfTopK(emb, queries, k = 5, centroids, nProbe = 2)
    ).view.mapValues(_.queryExecution.executedPlan.toString)
    plans.foreach { case (name, plan) =>
      assert(plan.contains("ObjectHashAggregate"), s"$name: ${plan.take(600)}")
      assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "),
        s"$name still ranks via a window: ${plan.take(600)}")
    }
  }

  test("sampled quantizer training yields a full, well-formed centroid set " +
    "and a valid IVF search") {
    val dims = emb.select(size(col("embedding"))).as[Int].head()
    val centroids = Similarity.trainCentroids(emb, k = 8, iters = 1,
      sampleRate = 0.5).localCheckpoint(true)
    val rows = centroids.select(col("cluster_id"), size(col("centroid")))
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 8L)) // k centroids, dense ids
    assert(rows.forall(_._2 == dims)) // full embedding dimensionality
    // deterministic: the hash sample is seed-free/content-addressed
    val again = Similarity.trainCentroids(emb, k = 8, iters = 1,
      sampleRate = 0.5)
    assert(again.collect().map(_.toString).sorted
      === centroids.collect().map(_.toString).sorted)
    // the search contract holds on sample-trained centroids
    val queries = emb.filter(col("vec_id") < 3)
    val out = Similarity.ivfTopK(emb, queries, k = 5, centroids, nProbe = 4)
      .select("query_id", "rank").as[(Long, Int)].collect()
    assert(out.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5) })
  }

  test("a too-thin sample falls back to full-corpus training (never fewer " +
    "vectors than 4k)") {
    // 500 vecs * 0.01 = ~5 sampled < 4*8: fallback must reproduce the
    // full-corpus quantizer exactly
    val sampled = Similarity.trainCentroids(emb, k = 8, iters = 1,
      sampleRate = 0.01)
    val full = Similarity.trainCentroids(emb, k = 8, iters = 1)
    assert(sampled.collect().map(_.toString).sorted
      === full.collect().map(_.toString).sorted)
  }

  test("index scan is pruned to the probed cluster partitions") {
    val path = Files.createTempDirectory("graft-ivf2").toString + "/index"
    val centroids = Similarity.trainCentroids(emb, k = 8, iters = 1)
      .localCheckpoint(true)
    Similarity.buildIvfIndex(emb, centroids, path)
    // the partition layout is one directory per cluster
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cluster_id=")).map(_.getName).sorted
    assert(dirs.length === 8)
    // a pruned read of 2 clusters touches 2 partition values
    val two = spark.read.parquet(path).filter(col("cluster_id").isin(1L, 2L))
    val plan = two.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("cluster_id"), plan.take(600))
    val vals = two.select(col("cluster_id")).distinct().as[Long].collect().toSet
    assert(vals.subsetOf(Set(1L, 2L)))
  }
}
