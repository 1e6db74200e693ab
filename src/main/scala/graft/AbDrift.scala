package graft

import org.apache.spark.sql.functions._

/** In-JVM interleaved A/B harness for bench-drift attribution (VERDICT r9
  * task 1). Sequential same-JVM runs lie about perf deltas (JIT, cache,
  * page-cache state drift between the two arms — the r8 persist_tf
  * mis-read); interleaving A and B trials in ONE JVM exposes both arms to
  * the same environment, so the median delta is attributable to the plan,
  * not the machine.
  *
  * Round-12 arms (sf0.1 unless SPARK_GRAFT_SF_DIR overrides):
  *   semantic_train / semantic_full — dedup_semantic's k-means training
  *     alone vs the whole gate body (byte-identical via SparkEntry
  *     .queries), to attribute the r11 driver-vs-builder 3.4× spread
  *     (7.95 vs 2.32 s): if train ≈ full here, the spread is training
  *     under ambient load; if full ≫ train, it's the pair/verdict plan.
  *   simhash — dedup_simhash moved 1.25→2.01 s (1.61×) against the r11
  *     0.615× tide on an UNCHANGED operator; reproduce or exonerate.
  *   j1_sp8 / j1_sp2 — the stream-stream interval join (4 state stores
  *     per partition, 10 state rows) at 8 vs 2 state partitions: is the
  *     r11 3.5-4.3 s state_commit per-store fixed I/O (then sp2 ≈ sp8/4)
  *     or per-batch fixed (then flat)?
  *   tws_uv_sp8 / tws_uv_sp2 / tws_uv_changelog — transformWithState
  *     uvDedup (RocksDB-bound) at 8 vs 2 partitions, and at 8 with
  *     RocksDB changelog checkpointing (commit ships a changelog instead
  *     of a full snapshot) — the three candidate levers for the tws
  *     twins' 2.3× state-commit premium over FMGWS.
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
    import graft.operators.Similarity

    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }

    // j1 gate body with a chosen state partition count (the gate itself
    // is byte-identical except for the statePartitions argument)
    def j1(statePartitions: Int): Long = {
      val ev = graft.streaming.Sources.eventsStream(spark, sfDir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.intervalJoin(
          views, clicks, "v_user", "c_user", "v_ts", "c_ts",
          lowerSec = 0L, upperSec = 600L),
        statePartitions = statePartitions)
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("pair_ct"))
        .count()
    }

    def withConf(key: String, value: String)(body: => Long): Long = {
      val before = spark.conf.getOption(key)
      spark.conf.set(key, value)
      try body
      finally before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    def twsUv(statePartitions: Int, changelog: Boolean): Long =
      withConf("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
        withConf("spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled", changelog.toString) {
          graft.streaming.StreamRunner.collect(
            graft.streaming.TwsStreams.uvDedup(
              graft.streaming.Sources.eventsStreamSplit(spark, sfDir)
                .withWatermark("ts", "0 seconds")),
            statePartitions = statePartitions)
            .count()
        }
      }

    val arms: Seq[(String, () => Long)] = Seq(
      "semantic_train" -> (() =>
        Similarity.trainCentroids(Tables.embeddings(spark, sfDir), k = 16,
          iters = 2, sampleRate = 0.5).count()),
      "semantic_full" -> (() =>
        SparkEntry.queries("dedup_semantic")(spark, sfDir).count()),
      "simhash" -> (() =>
        SparkEntry.queries("dedup_simhash")(spark, sfDir).count()),
      "j1_sp8" -> (() => j1(8)),
      "j1_sp2" -> (() => j1(2)),
      "tws_uv_sp8" -> (() => twsUv(8, changelog = false)),
      "tws_uv_sp2" -> (() => twsUv(2, changelog = false)),
      "tws_uv_changelog" -> (() => twsUv(8, changelog = true))
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
      println(f"[ab] trial $t $name%-18s $sec%7.3f s")
    }
    println("[ab] ---- per-arm summary ----")
    arms.foreach { case (name, _) =>
      val v = timings(name).sorted
      val med = v(v.size / 2)
      println(f"[ab] $name%-18s median $med%7.3f  min ${v.head}%7.3f  max ${v.last}%7.3f  n=${v.size}")
    }
    spark.stop()
  }
}
