package graft

/** Diagnostic main: execute one gate fully (noop sink) and print its final
  * adaptive plan with runtime SQL metrics — the tool for attributing a
  * slow bench gate to a plan node instead of guessing from the DataFrame
  * code. Usage: runMain graft.PlanDump <gate> [sfDir]. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <gate> [sfDir]")
    val gate = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.tuned("local[32]", "32")
    val df = SparkEntry.queries(gate)(spark, dir)
    val t0 = System.nanoTime()
    // Execute the df's OWN QueryExecution (a .write would wrap the plan in
    // a fresh QueryExecution and leave this one's metrics empty).
    df.queryExecution.toRdd.foreachPartition { it =>
      while (it.hasNext) { it.next(); () }
    }
    println(f"[plandump] $gate forced in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println("[plandump] ===== final plan with metrics =====")
    println(df.queryExecution.executedPlan.toString)
    println("[plandump] ===== per-node runtime metrics =====")
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.collect {
        case (k, m) if m.value > 0 &&
            (k.contains("time") || k.contains("Time") || k == "numOutputRows"
              || k.contains("size") || k.contains("spill")) =>
          s"$k=${m.value}"
      }
      println(s"[plandump] ${"  " * depth}${p.nodeName}  ${interesting.mkString(" ")}")
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case other => other.children
      }
      kids.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
