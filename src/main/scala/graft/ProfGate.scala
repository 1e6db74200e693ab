package graft

/** Throwaway gate-level job-timeline profiler (not part of the driver
  * contract): run one gate exactly as Bench does (noop-forced), record
  * every Spark job's start/end and first stage's call site, and print
  * the timeline with DRIVER GAPS (wall time between consecutive jobs —
  * planning, file listing, schema inference, FS ops) made explicit.
  * Usage: runMain graft.ProfGate <gate> [sfDir] [reps]. */
object ProfGate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfGate <gate> [sfDir] [reps]")
    val gate = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.tuned("local[32]", "32")
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, Long, String)]() // id -> (startNs, endNs, site)
    @volatile var record = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (record) {
            val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
            jobs.put(e.jobId, (System.nanoTime(), 0L, site)); ()
          }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobs.get(e.jobId)
          if (s != null) { jobs.put(e.jobId, (s._1, System.nanoTime(), s._3)); () }
        }
      })
    val fn = SparkEntry.queries(gate)
    // warmup runs: JIT + codegen + page cache, exactly like Bench's
    for (_ <- 1 until reps) {
      try Sessions.force(fn(spark, dir)) catch { case e: Throwable =>
        println(s"[profgate] warmup failed: $e") }
    }
    jobs.clear()
    record = true
    val t0 = System.nanoTime()
    Sessions.force(fn(spark, dir))
    val t1 = System.nanoTime()
    record = false
    import scala.jdk.CollectionConverters._
    val tl = jobs.asScala.toSeq.sortBy(_._2._1)
    println(f"[profgate] $gate total ${(t1 - t0) / 1e9}%.3f s, ${tl.size} jobs")
    var prevEnd = t0
    var gapSum = 0L
    var jobSum = 0L
    for ((id, (s, e, site)) <- tl) {
      val gap = s - prevEnd
      if (gap > 20e6.toLong)
        println(f"[profgate]   --- driver gap ${gap / 1e9}%7.3f s")
      gapSum += math.max(gap, 0L)
      if (e > 0) jobSum += e - s
      println(f"[profgate]   job $id%4d ${(e - s) / 1e9}%7.3f s  ${site.take(95)}")
      prevEnd = math.max(prevEnd, if (e > 0) e else s)
    }
    println(f"[profgate] job time ${jobSum / 1e9}%.3f s, driver gaps ${gapSum / 1e9}%.3f s")
    spark.stop()
  }
}
