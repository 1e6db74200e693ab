package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tuned(s"local[$cpus]", cpus)
    // local-iteration knob (unset for the driver): restrict to named queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // absorb session/JIT/codegen warmup so the first measured query isn't
    // charged for it
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
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
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!name.startsWith("stream_") && only.forall(_.contains(name)))
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
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
    // (sec, succeeded) per query — a throwing query must NOT masquerade as
    // a healthy timing
    // sorted execution order: Map iteration order shifts when gates are
    // added, which silently moves shared-cost attribution (e.g. which
    // dedup gate warms the shared pair memo) between rounds — sorting
    // pins it
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      reset()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Full-precision per-query lines for humans/logs (the driver ignores
    // these; they scroll off its 2000-char stdout tail window)
    results.foreach { case (k, (v, ok)) =>
      println(f"[bench] $k%-28s ${if (ok) f"$v%9.3f" else "FAILED"}")
    }
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    def r2(v: Double): String = (math.rint(v * 100) / 100).toString
    // The driver records only the LAST ~2000 chars of stdout, and sbt
    // appends ~70 chars of its own after us — so the ONE metric line must
    // stay well under that or its head is truncated and the driver's JSON
    // parse nulls out (every round r1-r6 lost its bench numbers this way).
    // 2-decimal values + short sf; if the query set ever outgrows the
    // budget, drop the FASTEST queries from the map (their timings are the
    // least informative) and say how many were omitted.
    val sfShort = sfDir.split('/').last
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
}
