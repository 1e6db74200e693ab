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
    time("warmup")(docs.count())
    val buckets = docs
      .select(col("doc_id"),
        explode(array_distinct(call_function("graft_shingles",
          col("text"), lit(3)))).as("sh"))
      .groupBy(xxhash64(col("sh")).as("shh"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= 1000)
    time("buckets")(buckets.count())
    println("bucket size histo:")
    buckets.groupBy(size(col("ids")).as("sz")).count()
      .orderBy(desc("sz")).limit(10).collect()
      .foreach(r => println(s"  size=${r.get(0)} buckets=${r.get(1)}"))
    val pairs = time("pairs")(operators.Dedup
      .ngramJaccardPairs(docs))
    time("full ngram")(pairs.count())
    spark.stop()
  }
}
