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
    time("warmup docs scan")(docs.count())
    time("warmup q1")(SparkEntry.queries("q1_agg")(spark, dir).count())

    // ngram pipeline: count-based jaccard (no re-shingling verify stage)
    time("ngram cold")(SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count())
    time("ngram warm")(operators.Dedup.ngramJaccardPairs(docs).count())
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(call_function("graft_shingles",
        col("text"), lit(3)))).as("sh"))
    time("  shingle explode")(sh.count())
    val buckets = sh
      .groupBy(xxhash64(col("sh")).as("shh"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= 1000)
    time("  bucket agg")(buckets.count())

    // a6 pieces
    time("a6 full")(SparkEntry.queries("a6_topn_per_group")(spark, dir).count())
    time("a6 again")(SparkEntry.queries("a6_topn_per_group")(spark, dir).count())
    val o = Tables.orders(spark, dir); val c = Tables.customer(spark, dir); val n = Tables.nation(spark, dir)
    val rev = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    time("a6 agg only")(rev.count())
    time("orders scan")(o.count())
    spark.stop()
  }
}
