package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

object Bench {

  /** Per-stream-gate micro-batch accounting, summed over every progress
    * event the gate's (bounded) run emitted. Splits the streaming
    * lifecycle cost — state-store commit, WAL/offset commits, planning —
    * from the data cost (addBatch), so a round-over-round drift in a
    * stream gate is attributable instead of argued (stream timings swing
    * with machine load precisely in these components). */
  private final class StreamAgg {
    var batches = 0L
    var triggerMs = 0L
    var addBatchMs = 0L
    var walCommitMs = 0L
    var commitOffsetsMs = 0L
    var queryPlanningMs = 0L
    var stateCommitMs = 0L
    var stateRowsTotal = 0L // last observed total state rows
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tuned(s"local[$cpus]", cpus)
    // local-iteration knob (unset for the driver): restrict to named queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // absorb session/JIT/codegen warmup so the first measured query isn't
    // charged for it
    try Sessions.force(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case _: Throwable => () }
    // Per-PLAN warmup at the smallest sf: whichever query first touches a
    // codegen/JIT path pays its compile cost — measured 1.6s of first-
    // touch on a 0.3s query — and WHICH query pays moved whenever the
    // iteration order changed (the r7 a3_keyword_stats 0.38→2.03 swing).
    // Running every batch query once on sf0.001 (tiny, untimed) compiles
    // every plan up front, so timed numbers are steady-state per-query
    // cost. stream_* gates are excluded: each timed run re-executes its
    // full micro-batch + checkpoint lifecycle regardless, and running 15
    // streaming queries here would double bench wall-clock for paths the
    // batch twins already compile.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!name.startsWith("stream_") && only.forall(_.contains(name)))
          try Sessions.force(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    else
      // a silently-skipped warmup reintroduces the exact first-touch
      // attribution nondeterminism the pass exists to remove — say so
      println(s"[bench] WARM DIR ABSENT ($warmDir): per-plan warmup " +
        "skipped; first-touch JIT cost lands on the first timed query")
    // Inter-query hygiene (untimed): drop leftover memory-sink tables,
    // unpersist localCheckpoint blocks, and GC — one query's residue must
    // not tax the next query's timing (measured: the last bench query ran
    // 5-20x slower than in isolation before this).
    def reset(): Unit = {
      spark.catalog.listTables().collect()
        .filter(t => t.name.startsWith("graft_stream_") ||
          t.name.startsWith("docs_") || t.name.startsWith("ev_sql_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }
    // Streaming lifecycle listener: progress events are attributed to the
    // gate being timed via `current` (gates run strictly sequentially).
    val streamAgg = new java.util.concurrent.ConcurrentHashMap[String, StreamAgg]()
    @volatile var current: String = null
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val gate = current
        if (gate != null) {
          val a = streamAgg.computeIfAbsent(gate, _ => new StreamAgg)
          val d = e.progress.durationMs
          def ms(k: String): Long =
            Option(d.get(k)).map(_.longValue()).getOrElse(0L)
          a.synchronized {
            a.batches += 1
            a.triggerMs += ms("triggerExecution")
            a.addBatchMs += ms("addBatch")
            a.walCommitMs += ms("walCommit")
            a.commitOffsetsMs += ms("commitOffsets")
            a.queryPlanningMs += ms("queryPlanning")
            val ops = e.progress.stateOperators
            if (ops != null && ops.nonEmpty) {
              a.stateCommitMs += ops.map(_.commitTimeMs).sum
              a.stateRowsTotal = ops.map(_.numRowsTotal).sum
            }
          }
        }
      }
    }
    spark.streams.addListener(listener)
    // (sec, succeeded) per query — a throwing query must NOT masquerade as
    // a healthy timing
    // sorted execution order: Map iteration order shifts when gates are
    // added, which silently moves shared-cost attribution (e.g. which
    // dedup gate warms the shared pair memo) between rounds — sorting
    // pins it
    def timeGate(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      reset()
      current = name
      val t0 = System.nanoTime()
      // Sessions.force, NOT count(): a bare count lets the optimizer prune
      // unused aggregates/windows/projections/sorts out of the timed plan —
      // the bench then under-measures exactly the gates with the most
      // compute (see BASELINE.md "r13 bench methodology fix").
      val ok = try { Sessions.force(fn(spark, sfDir)); true } catch { case _: Throwable => false }
      // progress events ride the async listener bus; drain it (untimed
      // would be wrong — the events ARE part of the gate's lifecycle, but
      // dispatch latency is micro) before handing attribution to the next
      // gate, or an in-flight event is dropped / mis-credited
      if (name.startsWith("stream_"))
        org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
      current = null
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val gateList = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val firstPass = gateList.map { case (name, fn) =>
      name -> timeGate(name, fn)
    }
    // Second-trial MIN for the slowest gates (r15 verdict task 7): two
    // consecutive rounds burned adjudication cycles on family-correlated
    // AMBIENT drift concentrated in the most expensive gates (sim_ivf*
    // r14, pipe_rag_topk r15 — same commit, 2.8x apart across runs).
    // min-of-2 on exactly those gates collapses the one-sided noise
    // (load can only ADD time) at ~15% extra bench wall. The retried
    // gate's stream accounting keeps the LAST trial (reset per trial);
    // SPARK_GRAFT_MIN_TRIALS_TOP=0 disables for throwaway local runs.
    val retryTop = sys.env.getOrElse("SPARK_GRAFT_MIN_TRIALS_TOP", "20").toInt
    val slowest = firstPass.filter(_._2._2).sortBy { case (_, (v, _)) => -v }
      .take(retryTop).map(_._1).toSet
    val results = firstPass.map { case (name, (t1, ok1)) =>
      if (!slowest.contains(name)) name -> ((t1, ok1))
      else {
        streamAgg.remove(name)
        val (t2, ok2) = timeGate(name,
          gateList.find(_._1 == name).get._2)
        // a second-trial failure is real (the code ran once already) —
        // surface it rather than hiding behind trial 1's success
        name -> ((math.min(t1, t2), ok1 && ok2))
      }
    }
    spark.streams.removeListener(listener)
    // Full-precision per-query lines for humans/logs (the driver ignores
    // these; they scroll off its 2000-char stdout tail window)
    results.foreach { case (k, (v, ok)) =>
      println(f"[bench] $k%-28s ${if (ok) f"$v%9.3f" else "FAILED"}")
    }
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    def r2(v: Double): String = (math.rint(v * 100) / 100).toString
    val sfShort = sfDir.split('/').last
    writeFullArtifact(results, streamAgg, failed, total, sfShort)
    // The driver records only the LAST ~2000 chars of stdout, and sbt
    // appends ~70 chars of its own after us — so the ONE metric line must
    // stay well under that or its head is truncated and the driver's JSON
    // parse nulls out (every round r1-r6 lost its bench numbers this way).
    // 2-decimal values + short sf; if the query set ever outgrows the
    // budget, drop the FASTEST queries from the map (their timings are the
    // least informative) and say how many were omitted.
    def line(qmap: Seq[(String, String)], omitted: Int): String = {
      val qs = qmap.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      s"""{"metric":"total","value":${r2(total)},"unit":"sec","queries":$qs$om,"failed":$failed,"sf":"$sfShort"}"""
    }
    val bySlowest = results.toSeq.sortBy { case (_, (v, _)) => -v }
      .map { case (k, (v, ok)) => k -> (if (ok) r2(v) else "-1") }
    var keep = bySlowest.length
    while (keep > 1 && line(bySlowest.take(keep), bySlowest.length - keep).length > 1800)
      keep -= 1
    println(line(bySlowest.take(keep), bySlowest.length - keep))
    spark.stop()
  }

  /** The COMPLETE per-query artifact the 1800-char metric line cannot
    * carry: every timing at full precision, plus the per-stream-gate
    * micro-batch duration breakdown. Written to `bench_full_r<N>.json`
    * in the working directory (N = 1 + the highest committed BENCH_r
    * round, so the artifact lands next to the round's driver files) and
    * committed with the round — all 114+ timings stay diffable between
    * rounds. `SPARK_GRAFT_BENCH_FULL` overrides the path (set it to
    * /dev/null for throwaway local runs). */
  private def writeFullArtifact(
      results: Seq[(String, (Double, Boolean))],
      streamAgg: java.util.concurrent.ConcurrentHashMap[String, StreamAgg],
      failed: String, total: Double, sfShort: String): Unit = {
    val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", {
      val round = Option(new java.io.File(".").listFiles()).toSeq.flatten
        .map(_.getName)
        .collect { case n if n.startsWith("BENCH_r") && n.endsWith(".json") =>
          n.stripPrefix("BENCH_r").stripSuffix(".json") }
        .flatMap(s => scala.util.Try(s.toInt).toOption)
        .foldLeft(0)(math.max) + 1
      f"bench_full_r$round%02d.json"
    })
    if (path == "/dev/null") return
    def q3(v: Double): String = f"$v%.3f"
    val queries = results.map { case (k, (v, ok)) =>
      s""""$k":${if (ok) q3(v) else "-1"}""" }.mkString("{", ",", "}")
    val streams = {
      import scala.jdk.CollectionConverters._
      streamAgg.asScala.toSeq.sortBy(_._1).map { case (k, a) =>
        s""""$k":{"batches":${a.batches},"trigger_ms":${a.triggerMs},""" +
          s""""add_batch_ms":${a.addBatchMs},"state_commit_ms":${a.stateCommitMs},""" +
          s""""wal_commit_ms":${a.walCommitMs},"commit_offsets_ms":${a.commitOffsetsMs},""" +
          s""""query_planning_ms":${a.queryPlanningMs},"state_rows":${a.stateRowsTotal}}"""
      }.mkString("{", ",", "}")
    }
    val json =
      s"""{"sf":"$sfShort","total_sec":${q3(total)},"failed":$failed,
         |"queries":$queries,
         |"streams":$streams}
         |""".stripMargin
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
      println(s"[bench] full artifact: $path")
    } catch { case e: Throwable =>
      println(s"[bench] full artifact write failed ($path): $e")
    }
  }
}
