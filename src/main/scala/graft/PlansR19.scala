package graft

import graft.operators.{PairLedger, Similarity, Versioned}
import org.apache.spark.sql.functions._

/** Throwaway r19 plan-artifact dumper (not part of the driver
  * contract): writes the `explain("formatted")`-style before/after
  * plans for the round's optimizations to plans/r19/. "Before" shapes
  * are generated from the RETAINED fallback code paths (the rescan
  * induction loop, the distributed manifest reader, the per-arm recall
  * join), so each dump reflects committed code, not a reconstruction.
  * Usage: runMain graft.PlansR19 [sfDir]. */
object PlansR19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.tuned("local[32]", "32")
    import org.apache.spark.sql.DataFrame
    new java.io.File("plans/r19").mkdirs()
    def dump(name: String, df: DataFrame, header: String): Unit = {
      val txt = s"[plantext] ===== $name =====\n[plantext] $header\n" +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExtendedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r19/$name.txt"), txt)
      println(s"[plans] wrote plans/r19/$name.txt")
    }

    // ── 1. Induction per-round scan: rescan shape (before — retained as
    // the budget fallback) vs incremental deltaScan shape (after).
    val units = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(explode(transform(
        sequence(lit(1), length(col("text")), lit(128)),
        i => col("text").substr(i, lit(128)))).as("unit"))
    val vocab = units
      .select(col("unit").as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("wct"))
      .select(col("wct"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("syms"))
      .localCheckpoint(true)
    val before = vocab
      .select(col("wct"),
        explode(call_function("graft_run_pairs", col("syms"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wct") * col("p.ct")).as("ct"),
        sum(col("wct") * col("p.mct")).as("mct"))
      .orderBy(col("ct").desc, col("a").asc, col("b").asc)
      .limit(64)
    dump("text_bpe_merges_large_before", before,
      "per-round FULL PAIR RESCAN (r18 shape, retained as the " +
        "over-budget fallback in Bpe.mergesRescanLoop): every adjacent " +
        "pair of every word exploded + aggregated + ranked, EVERY round")
    val after = PairLedger.deltaScanPlan(vocab,
      Seq(Seq(("a", "b"))), Seq(("b", "c")))
    dump("text_bpe_merges_large_after", after,
      "per-round INCREMENTAL DELTA SCAN (r19, PairLedger.deltaScan): " +
        "one graft_merge_pair_deltas kernel evaluation per row " +
        "(deferred layers + batch fold + windowed runPairs diff), " +
        "aggregate input = a few delta rows per CHANGED word + the " +
        "sentinel totals; AQE off, one reducer; candidates ranked " +
        "DRIVER-SIDE from the maintained pair table (no orderBy/limit " +
        "job at all)")

    // ── 2. Versioned store manifest open: distributed scan (before —
    // retained as the pre-sidecar/decode-surprise fallback) vs
    // driver-local LocalRelation (after).
    val store = s"/dev/shm/graft-plans-r19-${System.nanoTime()}"
    try {
      val base = spark.range(0, 5000)
        .select(col("id").as("k"), (col("id") % 8).as("bucket"),
          (col("id") * 3).cast("long").as("x"))
      Versioned.init(spark, store, "bucket", base, statsCol = Some("k"))
      Versioned.deleteKeysDv(spark, store, "bucket", "k",
        base.filter(col("k") % 97 === 0).select(col("k"), col("bucket")))
      sys.props("graft.manifest.nolocal") = "1"
      dump("versioned_manifest_open_before",
        Versioned.manifestFdPlan(spark, store),
        "manifest (file, dv) resolution BEFORE (r18): a parquet scan + " +
          "collect = one driver-scheduled Spark job per store open")
      sys.props.remove("graft.manifest.nolocal")
      dump("versioned_manifest_open_after",
        Versioned.manifestFdPlan(spark, store),
        "manifest (file, dv) resolution AFTER (r19, ManifestLocal): " +
          "rows decoded driver-side behind the _manifest_schema.json " +
          "sidecar -> LocalRelation; the collect folds to a local " +
          "operation, zero Spark jobs")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(store))
    }

    // ── 3. sim_recall_report: per-arm recall join+count (before) vs the
    // single family-tagged union aggregation (after).
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val centroids = Similarity.trainCentroids(emb, k = 16, iters = 1,
      sampleRate = 0.5)
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, centroids, nProbe = 4)
    val lsh = Similarity.lshTopK(emb, queries, k = 5,
      graft.functions.VectorFns.randomPlanes(4, 64))
    dump("sim_recall_report_before",
      truth.join(ivf.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits")),
      "recall arm BEFORE (r18): truth.join(ann).count() — one of SEVEN " +
        "sequential driver actions (ivf, ivfpq, lsh, pq, ivfpq6, pq16, " +
        "knn), each a separate job round-trip; 120 jobs total measured")
    val annAll = Seq(("ivf", ivf), ("lsh", lsh)).map { case (m, df) =>
      df.select(lit(m).as("method"), lit("main").as("family"),
        col("query_id"), col("neighbor_id"))
    }.reduce(_.unionByName(_))
    val truthAll = truth.select(lit("main").as("family"), col("query_id"),
      col("neighbor_id"))
    dump("sim_recall_report_after",
      truthAll.join(annAll, Seq("family", "query_id", "neighbor_id"))
        .groupBy(col("method")).agg(count(lit(1)).as("hits")),
      "recall arms AFTER (r19): ONE family-tagged union joined against " +
        "the union of truth sets, aggregated by method — a single " +
        "action whose independent arm subtrees the scheduler runs " +
        "concurrently (two arms shown; the gate unions all seven)")
    spark.stop()
  }
}
