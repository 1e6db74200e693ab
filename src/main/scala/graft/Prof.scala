package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler (not part of the driver contract).
  * Current focus: cold vs steady-state cost of the tokenize gates — the
  * evidence behind Bench's per-plan warmup pass (first-touch JIT/codegen
  * was ~1.5s on a 0.3s query and landed on whichever query ran first).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tuned("local[32]", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"== $label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("warmup docs scan")(docs.count())
    time("warmup q1")(SparkEntry.queries("q1_agg")(spark, dir).count())
    time("a3 keyword_stats cold")(SparkEntry.queries("a3_keyword_stats")(spark, dir).count())
    time("a3 keyword_stats warm")(SparkEntry.queries("a3_keyword_stats")(spark, dir).count())
    time("a3 lateral cold")(SparkEntry.queries("a3_keyword_lateral")(spark, dir).count())
    time("a3 lateral warm")(SparkEntry.queries("a3_keyword_lateral")(spark, dir).count())
    spark.stop()
  }
}
