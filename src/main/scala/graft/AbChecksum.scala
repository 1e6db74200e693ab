package graft

import org.apache.spark.sql.functions._

/** Scratch interleaved A/B: streaming checkpoint file-checksum on vs off,
  * on one representative stateful multi-batch gate (stream_cep_funnel, 5
  * micro-batches, flatMapGroupsWithState). The conf is read at query
  * start, so toggling between trials in ONE JVM gives both arms the same
  * machine state. */
object AbChecksum {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_AB_TRIALS", "4").toInt
    val spark = Sessions.tuned("local[32]", "32")
    val key = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    def gate(): Long = SparkEntry.queries("stream_cep_funnel")(spark, sfDir).count()
    def reset(): Unit = {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    // warmup both paths untimed
    Seq("true", "false").foreach { v =>
      spark.conf.set(key, v); try { gate(); () } catch { case _: Throwable => () }; reset()
    }
    val t = scala.collection.mutable.Map("true" -> Vector.empty[Double],
      "false" -> Vector.empty[Double])
    for (i <- 1 to trials; v <- Seq("true", "false")) {
      spark.conf.set(key, v); reset()
      val t0 = System.nanoTime(); gate()
      val sec = (System.nanoTime() - t0) / 1e9
      t(v) = t(v) :+ sec
      println(f"[abck] trial $i checksum=$v%-5s $sec%7.3f s")
    }
    t.foreach { case (v, xs) =>
      val s = xs.sorted
      println(f"[abck] checksum=$v%-5s median ${s(s.size / 2)}%7.3f min ${s.head}%7.3f max ${s.last}%7.3f")
    }
    spark.stop()
  }
}
