package graft

/** Diagnostic main: print a gate's `explain("formatted")` WITHOUT
  * executing it — the artifact the optimization rounds commit as
  * `plans/r<N>/<gate>_{before,after}.txt` (PlanDump is the runtime
  * twin: it executes and prints per-node metrics). Gates whose
  * construction is itself a driver-coordinated loop (the BPE/WordPiece
  * induction tiers) still run their loop during construction; for those
  * the committed artifact is the INNER per-round plan, dumped by the
  * round's harness instead. Usage: runMain graft.PlanText <gate> [sfDir]. */
object PlanText {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanText <gate> [sfDir]")
    val gate = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.tuned("local[32]", "32")
    val df = SparkEntry.queries(gate)(spark, dir)
    println(s"[plantext] ===== $gate =====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
