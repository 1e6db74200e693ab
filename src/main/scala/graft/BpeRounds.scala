package graft

import graft.operators.Bpe

/** Rounds-dimension evidence for BPE induction (r13 verdict task 1):
  * the data dimension is covered by ScaleGrowth; THIS harness varies the
  * number of learned merges at fixed data and prints time vs merges for
  * the sequential tier ([[Bpe.merges]], one driver round per merge) and
  * the batched tier ([[Bpe.mergesBatched]], up to 8 triple-disjoint
  * merges per round). The claim under test: sequential cost grows ~1 s
  * per MERGE (driver scheduling dominates vocabulary-sized work), while
  * batched cost grows ~1 s per BATCH — near-flat per merge as rounds
  * scale, which is what 10³-merge tokenizers need.
  *
  * Prints a SCALE.md-ready markdown table; each configuration also
  * reports its learned-merge count (batched selection can fill short of
  * batchSize when the candidate window runs dry).
  */
object BpeRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.tuned("local[32]", "32")
    val docs = Tables.documents(spark, sfDir)

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // untimed warmup (JIT + codegen) on the smallest configuration of
    // each tier so neither pays the first-run tax in the table
    Bpe.merges(docs, rounds = 2).collect()
    Bpe.mergesBatched(docs, batches = 1, batchSize = 8, window = 48).collect()

    println(s"| tier | merges learned | driver rounds | sec | sec/merge | ($sfDir) |")
    println("|---|---|---|---|---|---|")
    for (r <- Seq(8, 16, 32)) {
      val (sec, n) = timed(Bpe.merges(docs, rounds = r).count())
      println(f"| sequential | $n | $r | $sec%.2f | ${sec / n}%.3f | |")
    }
    for (b <- Seq(1, 2, 4, 8)) {
      val (sec, n) =
        timed(Bpe.mergesBatched(docs, batches = b, batchSize = 8,
          window = 48).count())
      println(f"| batched(8/round) | $n | $b | $sec%.2f | ${sec / n}%.3f | |")
    }
    // the >=256-merge regime (r15): word units exhaust this corpus's
    // 31-word vocabulary (~89 merges and dry), so the large tier
    // induces over 128-char SEQUENCE units — byte-level-tokenizer
    // shape, open-ended merge space. Flat sec/merge at 288 merges is
    // the order-of-magnitude point the r14 table lacked.
    import org.apache.spark.sql.functions._
    val units = docs.filter(length(col("text")) > 0)
      .select(explode(transform(
        sequence(lit(1), length(col("text")), lit(128)),
        i => col("text").substr(i, lit(128)))).as("unit"))
    Bpe.mergesBatchedUnits(units, batches = 1, batchSize = 8,
      window = 64).count() // untimed warmup
    for (b <- Seq(8, 18, 36)) {
      val (sec, n) =
        timed(Bpe.mergesBatchedUnits(units, batches = b, batchSize = 8,
          window = 64).count())
      println(f"| batched-chunks(8/round) | $n | $b | $sec%.2f | ${sec / n}%.3f | |")
    }
    // the ≥1024-merge XL tier (r15 verdict task 8): real tokenizer
    // vocabulary depth at sf0.1, the scale gates cannot run at (the
    // 36-round semantics are oracle-pinned by text_bpe_merges_large at
    // both driver scales; THIS run is the depth witness — opt out with
    // SPARK_GRAFT_BPE_XL=0 for quick local tables). The conservation
    // require rides every one of the ~140 rounds; run-aware self-pair
    // attribution (r16) is live here — whitespace runs in chunk units
    // are exactly the dominant-self-pair corpus.
    if (!sys.env.get("SPARK_GRAFT_BPE_XL").contains("0")) {
      val (sec, n) = timed(Bpe.mergesBatchedUnits(units, batches = 140,
        batchSize = 8, window = 64).count())
      println(f"| text_bpe_merges_xl (chunks, 8/round) | $n | 140 | $sec%.2f | ${sec / n}%.3f | require >= 1024: ${n >= 1024} |")
      require(n >= 1024,
        s"text_bpe_merges_xl: learned only $n merges in 140 rounds — " +
          "the chunk-unit merge space ran dry before tokenizer depth")
    }

    // ENCODE tiers vs merge-table size (r14): encodeBatches' expression
    // tree grows ~4x per batch (exponential — the analyzer ceiling), so
    // its curve bends with the table; encodeTable is one constant-depth
    // mapPartitions pass whose per-rule cost is an O(1) set probe — the
    // 10^3+-merge regime. Both forced through a count of exploded
    // symbols so the whole segmentation materializes.
    val led = Bpe.mergesBatched(docs, batches = 8, batchSize = 8,
      window = 48).orderBy(org.apache.spark.sql.functions.col("merge_idx"))
      .collect()
    val batched = led.groupBy(_.getLong(1)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getLong(0))
        .map(r => (r.getString(2), r.getString(3))).toSeq)
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.functions._
      df.select(explode(col("bpe")).as("s"))
        .agg(sum(length(col("s")))).head().getLong(0)
    }
    println()
    println(s"| encode tier | merges | sec | sec/merge | ($sfDir) |")
    println("|---|---|---|---|---|")
    // warmups
    force(Bpe.encodeBatches(docs, batched.take(1)))
    force(Bpe.encodeTable(docs, batched.take(1).flatten))
    for (b <- Seq(2, 4, 5)) {
      // the fold tier stops at 5 batches: its expression tree grows ~4x
      // per nesting level, and past ~6 levels analysis never returns
      val rules = batched.take(b)
      val n = rules.map(_.size).sum
      val (secB, _) = timed(force(Bpe.encodeBatches(docs, rules)))
      println(f"| encodeBatches | $n | $secB%.2f | ${secB / n}%.3f | |")
    }
    for (b <- Seq(2, 4, 5, 8)) {
      val rules = batched.take(b)
      val n = rules.map(_.size).sum
      val (secT, _) = timed(force(Bpe.encodeTable(docs, rules.flatten)))
      println(f"| encodeTable | $n | $secT%.2f | ${secT / n}%.3f | |")
    }
    println("| encodeBatches | (8 batches) | DNF | analyzer ceiling: " +
      "tree ~4^8 x base | |")
    spark.stop()
  }
}
