package graft

import graft.functions.HashFns._
import graft.functions.TextFns._
import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tuned("local[8]", "8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = Tables.documents(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"== $label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val perms = permutations(128)
    val withSh = docs.select(col("doc_id"), shingles(tokensWs(col("text")), 3).as("sh"))
    time("force shingles")(withSh.select(sum(size(col("sh")))).collect())
    val sigs0 = withSh.withColumn("sig", minHash(col("sh"), perms)).select(col("doc_id"), col("sig"))
    time("force sig")(sigs0.select(sum(element_at(col("sig"), 1))).collect())
    val banded = sigs0.select(col("doc_id"), explode(lshBands(col("sig"), 32, 4)).as("b"))
    val banded2 = banded.select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    time("force band keys")(banded2.select(sum(pmod(col("key"), lit(1000003L)))).collect())
    time("full minhashLsh")(operators.Dedup.minhashLsh(docs).count())
    time("full simhash")(operators.Dedup.simhashPairs(docs, maxHamming = 8).count())
    time("full ngramJaccard")(operators.Dedup.ngramJaccardPairs(docs).count())
    val emb = Tables.embeddings(spark, dir)
    time("full embeddingNearDup")(operators.Dedup.embeddingNearDup(
      emb, functions.VectorFns.randomPlanes(3, 64), minCosine = 0.4).count())
    time("text_quality path")(docs.select(col("doc_id"),
      truncate6(qualityScore(col("text"))).as("q")).agg(sum(col("q"))).collect())
    time("langid path")(docs.select(langId(col("text")).as("p"))
      .groupBy(col("p")).count().collect())
    time("fingerprint path")(docs.select(fingerprint(col("text")).as("fp"))
      .agg(sum(pmod(col("fp"), lit(1000003L)))).collect())
    spark.stop()
  }
}
