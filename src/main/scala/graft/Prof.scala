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
    time("warmup")(Tables.events(spark, dir).count())
    def joinQuery() = SparkEntry.queries("stream_j1_interval_join")(spark, dir).count()
    time("stream_j1 @32 shuffle parts") {
      spark.conf.set("spark.sql.shuffle.partitions", "32"); joinQuery()
    }
    time("stream_j1 @8 shuffle parts") {
      spark.conf.set("spark.sql.shuffle.partitions", "8"); joinQuery()
    }
    time("stream_j1 @4 shuffle parts") {
      spark.conf.set("spark.sql.shuffle.partitions", "4"); joinQuery()
    }
    time("stream_t3 @8 parts") {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      SparkEntry.queries("stream_t3_bounce")(spark, dir).count()
    }
    spark.stop()
  }
}
