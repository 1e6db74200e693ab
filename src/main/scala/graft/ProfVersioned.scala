package graft

import graft.operators.Versioned
import org.apache.spark.sql.functions._

/** Throwaway profiler (not part of the driver contract): time the
  * versioned store's commit primitives one Spark action at a time, so
  * the k-gate family's cost splits into init / merge / read / probe
  * instead of being argued from gate totals. */
object ProfVersioned {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.tuned("local[32]", "32")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profv] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    // per-job timing listener: attribute a merge's wall time to its
    // constituent Spark jobs (manifest read, rewrite write, stats scan…)
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          starts.put(e.jobId, (System.nanoTime(), d)); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(e.jobId)
          if (verbose && s != null)
            println(f"[profv]   job ${e.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2.take(90)}")
        }
      })
    val path = s"/dev/shm/graft-profv-${System.nanoTime()}"
    try {
      val raw = Tables.orders(spark, dir)
        .select(col("o_orderkey").as("k"), dec("o_totalprice").as("price"),
          pmod(col("o_orderkey"), lit(8L)).as("bucket"))
      time("warm orders scan")(raw.count())
      time("init (no stats)")(
        Versioned.init(spark, path, "bucket", raw))
      val b1 = raw.filter(col("bucket") === 2 && col("k") % 3 === 0)
        .withColumn("price", (col("price") * 2).cast("decimal(18,2)"))
        .withColumn("op", lit("U"))
      time("merge 1")(
        Versioned.merge(spark, path, "bucket", "k", b1))
      verbose = true
      time("merge 2")(
        Versioned.merge(spark, path, "bucket", "k",
          b1.withColumn("op", lit("D"))))
      verbose = false
      time("read latest count")(
        Versioned.read(spark, path).count())
      time("read v1 count")(
        Versioned.read(spark, path, 1L).count())
      // stats-carrying store
      val path2 = s"$path-stats"
      time("init (stats k,c)")(
        Versioned.init(spark, path2, "bucket",
          Tables.orders(spark, dir).select(col("o_orderkey").as("k"),
            col("o_custkey").as("c"), dec("o_totalprice").as("price"),
            pmod(col("o_orderkey"), lit(8L)).as("bucket")),
          statsCols = Seq("k", "c")))
      val mx = 1000L
      time("point probe")(
        Versioned.readPoint(spark, path2, "k", mx, 1L).count())
      graft.GateSupport.rmTree(path2)
    } finally graft.GateSupport.rmTree(path)
    spark.stop()
  }
  private def dec(c: String) = col(c).cast("decimal(18,2)")
}
