package graft

import graft.functions.VectorFns
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
    val emb = Tables.embeddings(spark, dir)
    // all-pairs cosine sum: 2000 x 2000 x 64-dim — the loop dominates
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val cross = a.crossJoin(b)
    time("warmup")(cross.count())
    time("all-pairs cosine NATIVE")(
      cross.select(sum(VectorFns.cosine(col("ea"), col("eb")))).collect())
    time("all-pairs cosine HOF")(
      cross.select(sum(VectorFns.cosineHof(col("ea"), col("eb")))).collect())
    spark.stop()
  }
}
