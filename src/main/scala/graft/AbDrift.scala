package graft

import org.apache.spark.sql.functions._

/** In-JVM interleaved A/B harness for bench-drift attribution (VERDICT r9
  * task 1). Sequential same-JVM runs lie about perf deltas (JIT, cache,
  * page-cache state drift between the two arms — the r8 persist_tf
  * mis-read); interleaving A and B trials in ONE JVM exposes both arms to
  * the same environment, so the median delta is attributable to the plan,
  * not the machine.
  *
  * Arms (sf0.1 unless SPARK_GRAFT_SF_DIR overrides):
  *   tfidf_persist / tfidf_nopersist — TfIdf.topTerms with and without the
  *     TF-table cache (r9 driver bench moved 1.63→2.16 s with persist on).
  *   sim_brute / sim_lsh / sim_ivf — the three sim_topk_* gate bodies,
  *     byte-identical to SparkEntry's (brute and lsh are operators
  *     unchanged since r8 that still moved +50% in the r9 driver bench —
  *     if they reproduce slow here relative to their changed sibling, the
  *     regression is real; if the trio is flat, the driver movement was
  *     environmental load).
  *
  * Prints one line per trial plus per-arm median/min; Bench-style hygiene
  * (unpersist, clearCache, GC) runs between trials so one arm's residue
  * never taxes the next.
  */
object AbDrift {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_AB_TRIALS", "5").toInt
    val spark = Sessions.tuned("local[32]", "32")
    import graft.operators.{Similarity, TfIdf}
    import graft.functions.VectorFns

    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }

    val arms: Seq[(String, () => Long)] = Seq(
      "tfidf_persist" -> (() =>
        TfIdf.topTerms(Tables.documents(spark, sfDir), k = 2, persistTf = Some(true))
          .orderBy(col("doc_id"), col("rnk")).count()),
      "tfidf_nopersist" -> (() =>
        TfIdf.topTerms(Tables.documents(spark, sfDir), k = 2, persistTf = Some(false))
          .orderBy(col("doc_id"), col("rnk")).count()),
      "sim_brute" -> (() => {
        val emb = Tables.embeddings(spark, sfDir)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
          .orderBy(col("query_id"), col("rank")).count()
      }),
      "sim_lsh" -> (() => {
        val emb = Tables.embeddings(spark, sfDir)
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
          VectorFns.randomPlanes(8, 64))
          .orderBy(col("query_id"), col("rank")).count()
      }),
      "sim_ivf" -> (() => {
        val emb = Tables.embeddings(spark, sfDir)
        val centroids = Similarity.trainCentroids(emb, k = 16, iters = 2,
          sampleRate = 0.5)
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
          centroids, nProbe = 4).count()
      }),
      // r10 drift watch (VERDICT r10 task 5): dedup_clusters moved 4.8→10.7 s
      // and dedup_embedding 1.1→3.0 s in the driver bench. dedup_clusters is
      // alphabetically FIRST of the three gates sharing the shingle-pair
      // memo (SparkEntry.sharedNgramPairs), so it alone pays the shared
      // scan in bench order — these arms bypass the memo and time the scan
      // and the scan+clusters plans separately, so the delta attributes to
      // a plan or to attribution/load.
      "ngram_pairs_scan" -> (() => {
        import graft.operators.Dedup
        Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir)).count()
      }),
      "clusters_e2e" -> (() => {
        import graft.operators.Dedup
        Dedup.clusters(
          Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir))).count()
      }),
      "embedding_neardup" -> (() => {
        import graft.operators.Dedup
        Dedup.embeddingNearDup(Tables.embeddings(spark, sfDir),
          VectorFns.randomPlanes(3, 64), minCosine = 0.4,
          maxBucket = 1000000).count()
      })
    )

    // untimed warmup: compile every arm's plan once so trial 1 isn't
    // charged first-touch JIT (the exact artifact this harness de-noises)
    arms.foreach { case (_, f) => try { f(); () } catch { case _: Throwable => () }; reset() }

    val timings = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (t <- 1 to trials; (name, f) <- arms) {
      reset()
      val t0 = System.nanoTime()
      f()
      val sec = (System.nanoTime() - t0) / 1e9
      timings(name) = timings(name) :+ sec
      println(f"[ab] trial $t $name%-16s $sec%7.3f s")
    }
    println("[ab] ---- per-arm summary ----")
    arms.foreach { case (name, _) =>
      val v = timings(name).sorted
      val med = v(v.size / 2)
      println(f"[ab] $name%-16s median $med%7.3f  min ${v.head}%7.3f  max ${v.last}%7.3f  n=${v.size}")
    }
    spark.stop()
  }
}
