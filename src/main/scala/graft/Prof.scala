package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tuned("local[8]", "8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"== $label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("warmup scan")(docs.count())
    time("text_quality count (bench shape)")(
      SparkEntry.queries("text_quality")(spark, dir).count())
    time("text_quality collect")(
      SparkEntry.queries("text_quality")(spark, dir).collect())
    time("profile only")(docs.select(
      call_function("graft_text_profile", col("text")).as("p"))
      .select(sum(col("p.n_tokens"))).collect())
    spark.stop()
  }
}
