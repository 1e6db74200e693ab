package graft.operators

import graft.functions.HashFns._
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication suite — the training-data-pipeline operators
  * layered on the reference's dedup machinery (SURVEY.md §7.4).
  *
  * Shuffle budget (the thing that matters at 100 TB):
  *  - exact:        1 shuffle (groupBy content hash).
  *  - minhashLsh:   signatures computed at scan (narrow), 1 shuffle on
  *                  (band, key) buckets, candidate verify joins only
  *                  within-bucket pairs — never the full cross product.
  *  - simhash:      narrow fingerprint + 1 shuffle on band keys.
  *  - ngramJaccard: inverted-index join on shingle hash — shuffle is
  *                  bounded by posting-list sizes, with a frequency cap to
  *                  drop degenerate high-DF shingles (classic skew guard).
  */
object Dedup {

  /** All unordered pairs (a<b) from a sorted id array, as one expression:
    * for each element, pair it with every later element. */
  private def pairCombinations(ids: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + lit(2), size(ids)), b => struct(a.as("a"), b.as("b")))))

  /** Candidate pairs from LSH-style buckets WITHOUT a self-join: group by
    * bucket, collect member ids, emit within-bucket combinations. One
    * shuffle (the groupBy); signatures are computed exactly once. A
    * self-join formulation is catastrophically worse here: each join leg
    * re-inlines the full signature expression tree, the fused join stage
    * blows past whole-stage-codegen limits, and evaluation falls back to
    * the interpreter (measured 91s vs 0.3s on 500 docs at sf0.01).
    *
    * `maxBucket` is the skew guard: a degenerate bucket of B members emits
    * B(B-1)/2 pairs, so one mass-duplicate cluster can dwarf the rest of
    * the job. Buckets larger than the cap fall back to star pairing
    * (everyone vs the min id) — connectivity for dedup clustering is
    * preserved, only redundant intra-cluster pairs are dropped. */
  private[graft] def bucketPairs(
      banded: DataFrame,
      bucketCols: Seq[String],
      memberCol: org.apache.spark.sql.Column,
      maxBucket: Int = 1000): DataFrame = {
    val grouped = banded
      .groupBy(bucketCols.map(col): _*)
      .agg(sort_array(collect_set(memberCol)).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairs = when(size(col("ids")) <= maxBucket, pairCombinations(col("ids")))
      .otherwise(transform(slice(col("ids"), lit(2), size(col("ids"))), b =>
        struct(element_at(col("ids"), 1).as("a"), b.as("b"))))
    grouped
      .select(explode(pairs).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** Exact dedup by content hash: keeper = min doc_id per md5(text). */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("copies"))

  /** Exact dedup, returning surviving rows (keeper rows only). */
  def exactKeepers(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    documents.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Paragraph-level dedup (the CCNet/RefinedWeb pass that runs BELOW
    * document granularity): split each document on `sep`, keep the
    * globally FIRST occurrence of every paragraph — first = min
    * (doc_id, position), so a boilerplate header survives exactly once,
    * in its earliest document — and reassemble each document from its
    * surviving paragraphs in original order. Documents whose every
    * paragraph lost the race come back with empty text (n_kept = 0),
    * preserving the row for downstream length/quality filters to drop.
    *
    * Returns (doc_id, n_paras, n_kept, text_dedup).
    *
    * Shuffle budget: one exchange keyed by paragraph text (keeper agg —
    * min(struct) is a hash aggregation with map-side partials), the
    * winners join back to the exploded paragraphs on the same key, and
    * one exchange by doc_id reassembles. The paragraph TEXT is the
    * shuffle key here for oracle bit-exactness; at 100 TB key the agg
    * and join on xxhash64(para) instead (8-byte keys, collision odds
    * ~n²/2⁶⁴ — the spanDupStats convention) and ship each paragraph's
    * bytes only once. */
  def paragraphDedup(documents: DataFrame, sep: String = "\n"): DataFrame = {
    // sep is a LITERAL separator on both the split and the rejoin
    val sepRe = java.util.regex.Pattern.quote(sep)
    val paras = documents
      .select(col("doc_id"), posexplode(split(col("text"), sepRe)))
      .toDF("doc_id", "idx", "para")
    val keepers = paras.groupBy(col("para"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("k"))
    val kept = paras.join(keepers, "para")
      .filter(col("doc_id") === col("k.doc_id") && col("idx") === col("k.idx"))
      .select(col("doc_id"), col("idx"), col("para"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("idx"), col("para")))),
          s => s.getField("para"))).as("text_dedup"))
    documents
      .select(col("doc_id"),
        size(split(col("text"), sepRe)).cast("long").as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** MinHash + LSH near-dup candidate pairs, verified with exact shingle
    * Jaccard. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    *
    * numPerms=128, bands=32 (rows=4) targets ~0.5 collision at J≈0.42 —
    * standard (1/b)^(1/r) threshold tuning.
    */
  def minhashLsh(
      documents: DataFrame,
      shingleLen: Int = 3,
      numPerms: Int = 128,
      bands: Int = 32,
      minJaccard: Double = 0.5): DataFrame = {
    require(numPerms % bands == 0)

    // fused native sketch: tokenize→shingle→hash→fold in one pass per row
    // (graft.expressions.MinHashBands); the HOF pipeline (shingles →
    // minHash → lshBands) computes identical band keys but pays
    // interpreted-lambda cost per shingle×permutation
    val sigs = documents
      .select(col("doc_id"),
        explode(call_function("graft_minhash_bands",
          col("text"), lit(shingleLen), lit(numPerms), lit(bands))).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))

    val candidates = bucketPairs(sigs, Seq("band", "key"), col("doc_id"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"))

    verifyJaccard(documents, candidates, shingleLen)
      .filter(col("jaccard") >= minJaccard)
  }

  /** Engine-portable MinHash+LSH twin of [[minhashLsh]]: md5-lower-64
    * element hashes and plain-string band keys (graft_minhash_bands_p), so
    * an external engine (the DuckDB oracle) can recompute the exact same
    * candidate set from the same affine permutation family. Same plan
    * shape and shuffle budget as the fast path; defaults tuned so the
    * (1/b)^(1/r) collision threshold sits at minJaccard. */
  def minhashLshPortable(
      documents: DataFrame,
      shingleLen: Int = 3,
      numPerms: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    require(numPerms % bands == 0)
    val sigs = documents
      .select(col("doc_id"),
        explode(call_function("graft_minhash_bands_p",
          col("text"), lit(shingleLen), lit(numPerms), lit(bands))).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    val candidates = bucketPairs(sigs, Seq("band", "key"), col("doc_id"), maxBucket)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    verifyJaccard(documents, candidates, shingleLen)
      .filter(col("jaccard") >= minJaccard)
  }

  /** The persistable MinHash band index of a corpus: one (doc_id, band,
    * key) row per band — the O(bands × docs) footprint that incremental
    * ingestion joins against instead of rescanning corpus text. Write it
    * partitioned/bucketed by (band, key) and [[incrementalNearDups]]'s
    * probe join co-locates for free. */
  def minhashBandIndex(documents: DataFrame, shingleLen: Int = 3,
      numPerms: Int = 64, bands: Int = 16): DataFrame = {
    require(numPerms % bands == 0)
    documents
      .select(col("doc_id"),
        explode(call_function("graft_minhash_bands_p",
          col("text"), lit(shingleLen), lit(numPerms), lit(bands))).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
  }

  /** Incremental ingestion dedup: flag each INCOMING document whose band
    * signature collides with the persisted HISTORY index and whose exact
    * shingle Jaccard against the collided history doc clears `minJaccard`.
    *
    * The 100 TB contract: history TEXT is never rescanned wholesale — the
    * new batch's signatures probe the (band, key)-keyed index, and only
    * the candidate history docs (a semi-join-pruned sliver) are re-read
    * for exact verification. Ingesting 1 TB into a 100 TB corpus costs
    * O(new batch) + O(index probe), not O(corpus). Intra-batch dups are
    * the standard [[minhashLshPortable]] pass over the batch alone.
    * (ref behavior: gmall has no dedup; this is the LLM-pipeline suite.) */
  def incrementalNearDups(incoming: DataFrame, history: DataFrame,
      historyIndex: DataFrame, shingleLen: Int = 3, numPerms: Int = 64,
      bands: Int = 16, minJaccard: Double = 0.5): DataFrame = {
    val probe = minhashBandIndex(incoming, shingleLen, numPerms, bands)
    val cand = probe.as("n")
      .join(historyIndex.as("h"), Seq("band", "key"))
      .select(col("n.doc_id").as("doc_a"), col("h.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(incoming.unionByName(history), cand, shingleLen)
      .filter(col("jaccard") >= minJaccard)
  }

  /** Streaming exact dedup under at-least-once delivery: a replayed log
    * (Kafka redelivery, binlog replay, file re-stage) re-presents rows the
    * stream already emitted; `dropDuplicatesWithinWatermark` keeps the
    * FIRST arrival per key and drops replays, while the watermark bounds
    * state — a key whose event time falls behind `watermark - delay` is
    * evicted, so state is O(keys-per-delay-window), not O(stream history).
    * That eviction is the whole point at 100 TB (plain `dropDuplicates`
    * on a stream accumulates state forever) and is also the contract's
    * caveat: a replay arriving LATER than `delay` after the original
    * re-emits. Size `delay` to the transport's max redelivery horizon.
    * (ref: gmall's UV dedup keeps the same first-arrival-wins rule in
    * per-key ValueState with a 24h TTL — `DauApp`-family logic; this is
    * the engine-native form.) */
  def streamExactDedup(stream: DataFrame, keys: Seq[String],
      tsCol: String = "ts", delay: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-safe twin of [[incrementalNearDups]]: the incoming side keeps
    * its text THROUGH the band-explode and index probe, so verification
    * needs only stream-static joins (probe → index, candidate → history
    * shingles) — no stream-stream join, no stream/batch union, and it
    * runs unchanged as a batch plan (DedupSpec pins batch parity with
    * [[incrementalNearDups]]).
    *
    * Trade-off vs the batch path: text rides the explode ×bands, so this
    * shape is right when the incoming batch is small relative to history
    * (the ingestion case — the index probe broadcasts or buckets); a
    * huge backfill should use the batch pair-then-rejoin path instead.
    * `dropDuplicates` collapses multi-band collisions; in a real
    * long-running stream use `dropDuplicatesWithinWatermark` so that
    * state stays bounded. */
  def incrementalNearDupsStreamable(incoming: DataFrame,
      history: DataFrame, historyIndex: DataFrame, shingleLen: Int = 3,
      numPerms: Int = 64, bands: Int = 16,
      minJaccard: Double = 0.5): DataFrame = {
    val probe = incoming
      .select(col("doc_id").as("doc_a"), col("text").as("__text_a"),
        explode(call_function("graft_minhash_bands_p",
          col("text"), lit(shingleLen), lit(numPerms), lit(bands))).as("b"))
      .select(col("doc_a"), col("__text_a"),
        col("b.band").as("band"), col("b.key").as("key"))
    val histSh = history.select(col("doc_id").as("doc_b"),
      array_distinct(call_function("graft_shingles",
        col("text"), lit(shingleLen))).as("sh_b"))
    probe
      .join(historyIndex.select(col("doc_id").as("doc_b"),
        col("band"), col("key")), Seq("band", "key"))
      .dropDuplicates("doc_a", "doc_b")
      .join(histSh, "doc_b")
      .withColumn("__sh_a", array_distinct(call_function("graft_shingles",
        col("__text_a"), lit(shingleLen))))
      .withColumn("inter", size(array_intersect(col("__sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("__sh_a")) + size(col("sh_b")) - col("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Exact shingle-set Jaccard for given candidate pairs (joins the pair
    * list against per-doc shingle sets twice; join strategy left to
    * Catalyst/AQE — at harness scale the shingle side converts to a
    * runtime broadcast, at 100 TB both sides shuffle on doc id). */
  def verifyJaccard(documents: DataFrame, pairs: DataFrame, shingleLen: Int): DataFrame = {
    val docShingles = documents
      .select(col("doc_id"),
        array_distinct(call_function("graft_shingles",
          col("text"), lit(shingleLen))).as("sh"))
    val a = docShingles.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docShingles.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    pairs
      .join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprints over word 3-gram shingles
    * (order-sensitive — token bags alone are too uniform on natural
    * corpora), candidates from 4x16-bit band collisions, verified by exact
    * hamming <= maxHamming. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3,
      shingleLen: Int = 3): DataFrame = {
    val fp = documents.select(col("doc_id"),
      call_function("graft_simhash", col("text"), lit(shingleLen)).as("fp"))
    val banded = fp.select(
      struct(col("doc_id"), col("fp")).as("m"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("b"))
      .select(col("m"), col("b.band"), col("b.key"))
    bucketPairs(banded, Seq("band", "key"), col("m"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Engine-portable SimHash twin of [[simhashPairs]]: the fingerprint is
    * two unsigned 32-bit halves built from md5-lower-64 shingle-hash bit
    * votes (graft_simhash_p), banded 4×16-bit, hamming = popcount of the
    * xors — every step recomputable verbatim in the DuckDB oracle. */
  def simhashPairsPortable(documents: DataFrame, maxHamming: Int = 3,
      shingleLen: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val fp = documents.select(col("doc_id"),
      call_function("graft_simhash_p", col("text"), lit(shingleLen)).as("fp"))
    val banded = fp.select(
      struct(col("doc_id"), col("fp.lo").as("lo"), col("fp.hi").as("hi")).as("m"),
      explode(array(
        struct(lit(0).as("band"), col("fp.lo").bitwiseAND(lit(0xFFFFL)).as("key")),
        struct(lit(1).as("band"), shiftright(col("fp.lo"), 16).as("key")),
        struct(lit(2).as("band"), col("fp.hi").bitwiseAND(lit(0xFFFFL)).as("key")),
        struct(lit(3).as("band"), shiftright(col("fp.hi"), 16).as("key")))).as("b"))
      .select(col("m"), col("b.band"), col("b.key"))
    bucketPairs(banded, Seq("band", "key"), col("m"), maxBucket)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.lo").bitwiseXOR(col("b.lo"))) +
          bit_count(col("a.hi").bitwiseXOR(col("b.hi")))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Banded Hamming near-dup pairs over ANY precomputed 64-bit
    * fingerprint column (perceptual image hashes, simhashes computed
    * upstream, feature signatures): 4×16-bit band buckets, exact
    * popcount verify. COMPLETE for maxHamming <= 3 (pigeonhole: <= 3
    * differing bits cannot touch all 4 bands); above 3 it is a recall
    * heuristic, so the cap is enforced. One shuffle on (band, key);
    * degenerate buckets star-pair via bucketPairs' guard. */
  def hammingPairs64(hashes: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(maxHamming <= 3,
      s"4x16 banding is only complete for maxHamming <= 3, got $maxHamming")
    val fp = hashes.select(col(idCol).as("doc_id"), col(fpCol).as("fp"))
    val banded = fp.select(
      struct(col("doc_id"), col("fp")).as("m"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("b"))
      .select(col("m"), col("b.band"), col("b.key"))
    bucketPairs(banded, Seq("band", "key"), col("m"), maxBucket)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard via inverted index: candidate pairs share at least
    * `minCommon` shingles; high-document-frequency shingles are dropped
    * (skew guard — a stopword shingle would otherwise create a quadratic
    * posting-list join). */
  def ngramJaccardPairs(
      documents: DataFrame,
      shingleLen: Int = 3,
      minJaccard: Double = 0.5,
      maxDf: Long = 1000L,
      minCommon: Int = 1): DataFrame = {
    // Inverted index without a posting-list self-join: group the postings
    // by shingle hash (a long join key instead of the shingle string),
    // emit within-bucket pairs and count shared shingles per pair. The
    // per-pair count IS the intersection size (buckets are distinct
    // shingles), so jaccard = common/(|A|+|B|-common) needs only a narrow
    // (doc_id, set size) table — no re-shingling, no array_intersect over
    // candidate pairs (measured 3x on the verify stage at sf0.1).
    //
    // maxDf skew guard, made exact: shingles with df > maxDf (boilerplate)
    // would create quadratic posting-list blow-ups, so they are excluded
    // from pair COUNTING — but a capped shingle shared by a pair would then
    // undercount `common` and silently drop true pairs near minJaccard.
    // Guard: count each doc's capped shingles (c). A pair can miss at most
    // least(c_a, c_b) common shingles, so any pair whose upper-bound
    // jaccard (common + m)/(la + lb - common - m) clears minJaccard while
    // its lower bound doesn't is re-verified through the exact
    // verifyJaccard path. On organic corpora no bucket is capped, the
    // borderline set is empty, and the plan degenerates to the pure
    // bucket-count path. Pairs sharing ONLY capped shingles still surface
    // via star pairing over the capped buckets (connectivity preserved for
    // clustering; full enumeration of boilerplate-only pairs is the one
    // documented non-goal — it is the quadratic case the cap exists to
    // prevent).
    val postings = documents
      .select(col("doc_id"),
        explode(array_distinct(call_function("graft_shingles",
          col("text"), lit(shingleLen)))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("shh"))
    val sizes = postings.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val byShingle = postings
      .groupBy(col("shh"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val okBuckets = byShingle.filter(size(col("ids")) <= maxDf)
    val cappedBuckets = byShingle.filter(size(col("ids")) > maxDf)
    // per-doc count of shingles living in capped buckets (0 when none)
    val cappedCnt = cappedBuckets
      .select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("c"))
    val counted = okBuckets
      .select(explode(pairCombinations(col("ids"))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    // star pairing over capped buckets: O(B) candidates that keep
    // boilerplate-only duplicate clusters connected without B^2 pairs
    val starCands = cappedBuckets
      .select(element_at(col("ids"), 1).as("doc_a"),
        explode(slice(col("ids"), lit(2), size(col("ids")))).as("doc_b"))
      .distinct()
      .join(counted.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")
    val scored = counted
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("la")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("lb")), "doc_b")
      .join(cappedCnt.select(col("doc_id").as("doc_a"), col("c").as("ca")),
        Seq("doc_a"), "left")
      .join(cappedCnt.select(col("doc_id").as("doc_b"), col("c").as("cb")),
        Seq("doc_b"), "left")
      .withColumn("m", least(coalesce(col("ca"), lit(0L)), coalesce(col("cb"), lit(0L))))
      .withColumn("j_lo",
        col("common").cast("double") / (col("la") + col("lb") - col("common")))
      .withColumn("j_hi",
        (col("common") + col("m")).cast("double") /
          (col("la") + col("lb") - col("common") - col("m")))
    val certain = scored
      .filter(col("j_lo") >= minJaccard && col("m") === 0)
      .select(col("doc_a"), col("doc_b"), col("j_lo").as("jaccard"))
    // any pair a capped shingle could have affected — either borderline
    // (j_lo < t <= j_hi) or already-passing but with an undercounted value
    // (m > 0) — gets the exact jaccard
    val uncertain = scored
      .filter(col("m") > 0 && col("j_hi") >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
      .unionByName(starCands)
    val reverified = verifyJaccard(documents, uncertain, shingleLen)
      .filter(col("jaccard") >= minJaccard)
    certain.unionByName(reverified)
  }

  /** Prefix-filtered n-gram Jaccard pairs — the PPJoin-family index
    * reduction (Xiao et al. 2008; Vernica et al. SIGMOD 2010 for the
    * distributed form): under ANY global shingle order, a pair with
    * J >= t must share its ORDER-SMALLEST common shingle inside both
    * docs' prefixes of length |d| - ceil(t*|d|) + 1 (if that element sat
    * in a doc's (ceil(t|d|)-1)-sized suffix, ALL common elements would —
    * capping the intersection below t|d| <= the required overlap). So
    * only prefixes are indexed: at t=0.5 the posting table halves; the
    * df-ascending order additionally pushes boilerplate shingles OUT of
    * prefixes, which is what keeps bucket sizes flat at 100 TB — the
    * sibling ngramJaccardPairs indexes everything and then guards the
    * hot buckets after the fact.
    *
    * Plan: df agg + one shuffle to rank each doc's shingles by
    * (df, hash), bucket-join the prefix postings, exact-verify the
    * candidate pairs (verifyJaccard — candidates are filter-bounded, so
    * the array_intersect cost the counting sibling avoids is paid on a
    * far smaller set). Buckets beyond maxBucket star-pair through the
    * same verify (connectivity preserved; enumerating boilerplate-only
    * pair sets is the documented non-goal, as in the sibling). */
  def ngramJaccardPrefix(
      documents: DataFrame,
      shingleLen: Int = 3,
      minJaccard: Double = 0.5,
      maxBucket: Long = 1000L): DataFrame = {
    val postings = documents
      .select(col("doc_id"),
        explode(array_distinct(call_function("graft_shingles",
          col("text"), lit(shingleLen)))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("shh"))
    val dfreq = postings.groupBy(col("shh")).agg(count(lit(1)).as("df"))
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val prefix = postings.join(dfreq, "shh").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shh"))))
      .filter(col("rn") <=
        col("n_sh") - ceil(col("n_sh") * minJaccard).cast("long") + 1)
    val buckets = prefix.groupBy(col("shh"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val cands = buckets.filter(size(col("ids")) <= maxBucket)
      .select(explode(pairCombinations(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .unionByName(buckets.filter(size(col("ids")) > maxBucket)
        .select(element_at(col("ids"), 1).as("doc_a"),
          explode(slice(col("ids"), lit(2), size(col("ids")))).as("doc_b")))
      .distinct()
    // PPJoin's length filter ahead of verification: J >= t forces
    // min(|A|,|B|) >= t·max (else J <= min/max < t), and the SIZES table
    // is narrow — so mismatched-length candidates are cut before any
    // shingle array moves. Verification then intersects SORTED LONG hash
    // arrays (the same xxhash64 keys the index is built on — one
    // collect_set per doc) instead of re-shingled string arrays: measured
    // end-to-end 6.6 → 3.6 s at sf0.1 (409k candidates), same answer.
    val docSets = postings.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("shh"))).as("shs"))
    val lenOk = cands
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("la")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("lb")), "doc_b")
      .filter(least(col("la"), col("lb")).cast("double") >=
        lit(minJaccard) * greatest(col("la"), col("lb")))
    // native two-pointer merge over the sorted distinct hash arrays:
    // size(array_intersect) allocated a hash set per candidate pair and
    // was the gate's dominant stage (see SortedLongIntersectCount).
    import org.apache.spark.sql.GraftColumnBridge
    lenOk
      .join(docSets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(docSets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .withColumn("inter", GraftColumnBridge.column(
        graft.expressions.SortedLongIntersectCount(
          GraftColumnBridge.expression(col("sa")),
          GraftColumnBridge.expression(col("sb")))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("la") + col("lb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Cross-document repeated-span profile — the set-wise re-expression of
    * exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better": repeated ≥k-token spans are the
    * strongest memorization signal). Per document: how many of its
    * distinct word-`spanLen`-gram spans occur in at least one OTHER
    * document, and the fraction of the doc that is such duplicated
    * material. Filter on `dup_frac` to drop template-heavy docs, or join
    * the shared-span table back to locate the spans themselves.
    *
    * Scale shape: spans are hashed scan-side (long keys), doc frequency
    * is ONE hash aggregation, and the shared-span set joins back by key —
    * no pair enumeration anywhere, so a boilerplate span shared by a
    * million docs costs one agg cell, not 10^12 pairs (the trap the
    * suffix-array formulation of EXACTSUBSTR exists to avoid; set-wise +
    * hash-agg sidesteps it natively). Spans are distinct per doc
    * (array_distinct), so a span's row count IS its doc frequency. */
  def spanDupStats(documents: DataFrame, spanLen: Int = 8): DataFrame = {
    val spans = documents.select(col("doc_id"),
      explode(array_distinct(call_function("graft_shingles",
        col("text"), lit(spanLen)))).as("sp"))
      .select(col("doc_id"), xxhash64(col("sp")).as("sph"))
    val shared = spans.groupBy(col("sph"))
      .agg(count(lit(1)).as("span_df"))
      .filter(col("span_df") >= 2)
    spans.join(shared, Seq("sph"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("span_df").isNotNull, 1L).otherwise(0L)).as("dup_spans"))
      .withColumn("dup_frac",
        col("dup_spans").cast("double") / col("n_spans"))
  }

  /** Span-level duplicate REMOVAL — the rewrite step completing
    * [[spanDupStats]]'s profile (Lee et al. 2022's EXACTSUBSTR acts on the
    * text, not just the doc score: repeated ≥k-token spans are cut out and
    * the surrounding text kept). A token is removed when ANY
    * `spanLen`-token span containing it also occurs in at least one OTHER
    * document; the doc survives with its unique material. Docs shorter
    * than `spanLen` tokens have no k-token span and are never trimmed.
    *
    * Scale shape: same set-wise sidestep of the suffix-array formulation
    * as [[spanDupStats]] — span doc-frequency is one hash aggregation on
    * 64-bit span hashes, and coverage comes back as (doc, position) keys,
    * so cost is linear in corpus tokens plus spanLen× the SHARED span
    * count; no pair enumeration, no per-doc quadratic membership scans
    * (the kept-token filter is a hash anti-join on (doc_id, p), not an
    * array_contains loop). Returns
    * (doc_id, n_tokens, kept_tokens, trimmed_text). */
  def spanTrim(documents: DataFrame, spanLen: Int = 8): DataFrame = {
    val toks = documents.select(col("doc_id"),
      graft.functions.TextFns.tokensWs(col("text")).as("t"))
    // window hashes roll in O(n + spanLen) per doc (graft_span_hashes)
    // instead of materializing each window's joined string — the cost no
    // longer grows with the threshold, which is what makes EXACTSUBSTR's
    // published 50-token grain affordable (same 64-bit collision class)
    val spans = toks.filter(size(col("t")) >= spanLen)
      .select(col("doc_id"), posexplode(call_function("graft_span_hashes",
        array_join(col("t"), " "), lit(spanLen))))
      .toDF("doc_id", "pos", "sph")
    val shared = spans.select(col("doc_id"), col("sph")).distinct()
      .groupBy(col("sph")).agg(count(lit(1)).as("span_df"))
      .filter(col("span_df") >= 2)
    val covered = spans.join(shared.select("sph"), Seq("sph"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(spanLen - 1))).as("p"))
      .distinct()
    val pos = toks
      .select(col("doc_id"), posexplode(col("t")))
      .toDF("doc_id", "p", "tok")
    val kept = pos.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_tokens"),
        expr("array_join(transform(array_sort(collect_list(struct(p, tok)))," +
          " x -> x.tok), ' ')").as("trimmed_text"))
    toks.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("trimmed_text"), lit("")).as("trimmed_text"))
  }

  /** Connected components over dedup pairs — the "resolve pairs into
    * duplicate clusters" step that completes a dedup pipeline (keep one
    * doc per cluster). Iterative min-label propagation with POINTER
    * DOUBLING: each round every node adopts the smallest of (its label,
    * its neighbors' labels, its label's label). The shortcut hop halves
    * chain depth every round, so convergence is O(log diameter) rounds
    * instead of O(diameter) — near-clique duplicate clusters still finish
    * in 2-3 rounds, and chain-shaped transitive near-dup components (the
    * worst case connected-components exists for) no longer scale rounds
    * with chain length. Three shuffles per round, data stays distributed;
    * the driver-side loop is O(rounds) only.
    *
    * Small-graph fast path: a dedup pair set is orders of magnitude
    * smaller than its corpus (it holds only near-duplicates), so below
    * `driverMaxEdges` (default 4M edges — a few hundred MB of boxed JVM
    * objects at the cap, well inside any real driver's heap) the edges
    * come back to the driver for a union-find instead:
    * exact same labels, none of the per-round scheduling latency the
    * iterative path pays on tiny graphs. A 100TB corpus with billions of
    * pairs exceeds the cap and takes the distributed loop.
    * Returns (doc_id, cluster_id = min doc id reachable). */
  /** Observability for specs and the scale-growth probe: which tier the
    * last [[clusters]] call ON THIS THREAD took ("driver" | "distributed")
    * and, for the distributed loop, how many propagation rounds it ran.
    * Thread-local so concurrent clusters() calls (parallel suites, future
    * concurrent gate execution) cannot observe each other's diagnostics.
    * Diagnostic only — not part of the operator contract. */
  private val clustersPathTL = ThreadLocal.withInitial[String](() => "")
  private val clusterRoundsTL = ThreadLocal.withInitial[Integer](() => 0)
  private[graft] def lastClustersPath: String = clustersPathTL.get()
  private[graft] def lastClustersPath_=(v: String): Unit = clustersPathTL.set(v)
  private[graft] def lastClusterRounds: Int = clusterRoundsTL.get()
  private[graft] def lastClusterRounds_=(v: Int): Unit = clusterRoundsTL.set(v)

  def clusters(pairs: DataFrame, maxIters: Int = 20,
      driverMaxEdges: Long = 1L << 22): DataFrame = {
    // materialize the pair computation ONCE: upstream dedup pipelines
    // (ngram shingling, minhash banding) are the expensive part, and the
    // symmetrizing union below would otherwise run them twice — and every
    // propagation round would re-read the un-cached lineage
    val p0 = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    if (p0.count() <= driverMaxEdges) {
      lastClustersPath = "driver"; lastClusterRounds = 0
      return clustersDriver(p0)
    }
    lastClustersPath = "distributed"
    val edges = p0
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p0.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("lbl").as("dlbl")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("dlbl")).as("nlbl"))
      // pointer-doubling hop: the label of my label. Labels are node ids
      // (invariant: lbl is a node in the same component, lbl <= node), so
      // the self-join resolves; min-labeled roots have lbl2 = lbl.
      val shortcut = labels.select(col("lbl").as("hop"), col("node"))
        .join(labels.select(col("node").as("hop"), col("lbl").as("lbl2")), "hop")
        .select(col("node"), col("lbl2"))
      // the changed flag is computed IN the update select and materialized
      // with the labels by the same localCheckpoint job; the convergence
      // probe is then a narrow scan of the cached blocks — no second
      // join-and-recompute action per round
      val next = labels.join(nbrMin, Seq("node"), "left")
        .join(shortcut, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl")),
            coalesce(col("lbl2"), col("lbl"))).as("lbl"),
          (least(coalesce(col("nlbl"), col("lbl")),
            coalesce(col("lbl2"), col("lbl"))) < col("lbl")).as("chg"))
        .localCheckpoint(true)
      converged = next.filter(col("chg")).isEmpty
      labels = next.select("node", "lbl")
      round += 1
      lastClusterRounds = round
    }
    // Partially-propagated labels are silently WRONG (two docs in one
    // duplicate component end up in different clusters), so a diameter
    // above maxIters must fail loudly, not return. Near-clique duplicate
    // components converge in 2-3 rounds; chain-shaped transitive near-dup
    // components are exactly where this trips.
    if (!converged)
      throw new IllegalStateException(
        s"Dedup.clusters did not converge within maxIters=$maxIters rounds; " +
          "the pair graph has a component with diameter > maxIters — raise maxIters")
    labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Complete the dedup pipeline: given cluster labels from [[clusters]],
    * keep each cluster's canonical (min-id) document plus every unpaired
    * document. One anti-join against the dropped set — which is |cluster
    * members| − |clusters|, tiny next to the corpus, so AQE broadcasts
    * it; the corpus itself never shuffles. */
  def keepCanonical(documents: DataFrame, labels: DataFrame): DataFrame =
    documents.join(
      labels.filter(col("cluster_id") =!= col("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_anti")

  /** Quality-aware canonical selection: keep each cluster's member with
    * the HIGHEST `score` (ties: min doc_id — deterministic), plus every
    * unpaired document. This is the policy production dedup actually
    * wants — the min-id keeper of [[keepCanonical]] discards arbitrarily,
    * while crawls usually keep the longest / highest-quality copy.
    * `score` is any numeric Column over `documents`' columns (length,
    * quality-model score, …). A NULL score LOSES to any real score
    * (coalesced to -inf before the argmax — struct comparison would
    * otherwise sort NULL smallest in the negated field and hand the
    * win to the unscored member, the exact opposite of "highest
    * quality wins"); an all-NULL cluster falls back to min doc_id.
    * Same scale shape as keepCanonical: labels
    * are cluster-members-sized (tiny vs corpus, AQE broadcasts them),
    * the corpus itself never shuffles — one members join, one group-agg
    * over members, one anti-join of the dropped sliver. */
  def keepBest(documents: DataFrame, labels: DataFrame,
      score: Column): DataFrame = {
    val members = documents.join(labels, "doc_id")
      .select(col("cluster_id"), col("doc_id"),
        coalesce(score.cast("double"),
          lit(Double.NegativeInfinity)).as("__q"))
    // min_by over (-q, doc_id) = argmax q with min-id tie-break
    val winners = members.groupBy(col("cluster_id"))
      .agg(min_by(col("doc_id"),
        struct((-col("__q")).as("nq"), col("doc_id"))).as("keep_id"))
    val dropped = members.join(winners, "cluster_id")
      .filter(col("doc_id") =!= col("keep_id")).select("doc_id")
    documents.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** Driver union-find for small pair graphs (see [[clusters]]): union by
    * min id with path compression, so each root IS its component's
    * minimum — identical labels to the distributed loop (DedupSpec pins
    * the parity). */
  private def clustersDriver(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      // attach the larger root under the smaller: roots stay minima
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.toSeq.sorted.map(k => (k, find(k)))
      .toDF("doc_id", "cluster_id")
  }

  /** Embedding near-dup: cosine above threshold among hyperplane-bucket
    * cohabitants (see Similarity.lshBuckets for the bucket construction). */
  def embeddingNearDup(embeddings: DataFrame, planes: Seq[Array[Double]],
      minCosine: Double = 0.95, maxBucket: Int = 1000): DataFrame = {
    import graft.functions.VectorFns._
    val bucketed = embeddings.select(
      struct(col("vec_id"), col("embedding")).as("m"),
      hyperplaneBucket(col("embedding"), planes).as("bucket"))
    bucketPairs(bucketed, Seq("bucket"), col("m"), maxBucket)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** Semantic dedup over LEARNED clusters (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): k-means cells shard the pairwise-cosine work —
    * unlike [[embeddingNearDup]]'s random hyperplanes, the cells follow
    * the corpus's own density, so semantically-close vectors co-locate
    * even when no hyperplane cut separates their region. Within a cell, a
    * vector is dropped when ANY earlier (lower-id) member is more similar
    * than `tau`; its witness is the most-similar such member (ties to the
    * lowest witness id). The min-id member of every cell is always kept.
    *
    * Scale posture: pairwise work is Σ|cell|², so `k` is the scale lever
    * (grow it with the corpus to keep cells bounded); a cell the trainer
    * failed to split past `maxBucket` raises in-plan (`raise_error`)
    * rather than silently going quadratic — the fix is a bigger k, not a
    * degraded answer. The directed self-join shuffles on cluster_id only;
    * witness selection is a hash aggregation (`max_by`), no window sort.
    *
    * Returns one row per input vector:
    * (vec_id, cluster_id, keep, witness_id, witness_cos).
    */
  def semanticDedup(embeddings: DataFrame, centroids: DataFrame,
      tau: Double, maxBucket: Int = 100000): DataFrame = {
    import graft.functions.VectorFns._
    // one corpus pass: the guard aggregate, both sides of the pair join
    // and the final left join all re-read the assignment — without this
    // the scan + centroid-assign subtree executes 3-4× (Catalyst does not
    // reuse it across the self-join). Blocks die with the session; Bench's
    // hygiene pass sweeps them (the trainCentroids idiom).
    val assigned = Similarity.withCluster(embeddings, centroids)
      .select(col("cluster_id"), col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    // the raise_error is embedded in the guard's JOIN KEY itself (+0L is
    // identity below the cap): building the broadcast side must evaluate
    // the key, so the guard fires under ANY downstream shape — a bare
    // count() prunes unused projections (observed: a separate _guard
    // column was optimized away), but a join key cannot be pruned
    val guard = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("c_n"))
      .select((col("cluster_id") +
        when(col("c_n") > maxBucket, raise_error(concat(
            lit("semanticDedup: cluster "), col("cluster_id"),
            lit(s" exceeds maxBucket=$maxBucket members — raise k"))))
          .otherwise(lit(0L))).as("cluster_id"))
    val members = assigned.join(broadcast(guard), Seq("cluster_id"))
      .select(col("cluster_id"), col("vec_id"), col("embedding"))
    val earlier = members.select(col("cluster_id"),
      col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val witnesses = members.join(earlier, Seq("cluster_id"))
      .filter(col("b_id") < col("vec_id"))
      .select(col("vec_id"), col("b_id"),
        cosine(col("embedding"), col("b_emb")).as("cos"))
      .filter(col("cos") > tau)
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("b_id"), col("cos")),
        struct(col("cos"), -col("b_id"))).as("w"))
    members
      .join(witnesses, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        col("w").isNull.as("keep"),
        col("w.b_id").as("witness_id"), col("w.cos").as("witness_cos"))
  }

  /** [[semanticDedup]] with `k` derived from the corpus size instead of
    * hand-picked: k = clamp(ceil(n / targetCell), 2, maxK). This is the
    * scale rule the explicit-k variant's "raise k" error points at —
    * expected cell size stays ~targetCell as the corpus grows, so the
    * pairwise stage's Σ|cell|² cost grows LINEARLY in n (n/targetCell
    * cells × targetCell² work), not quadratically.
    *
    * The one count() pass is metadata-cheap next to training. `maxK`
    * bounds the broadcast centroid table (k × dim doubles must ship to
    * every executor); a corpus big enough to hit maxK with a honest
    * targetCell wants a hierarchical quantizer (coarse cells → re-split
    * the heavy ones), which composes from this same primitive. */
  def semanticDedupAutoK(embeddings: DataFrame, tau: Double,
      targetCell: Int = 1000, iters: Int = 2, sampleRate: Double = 0.5,
      maxK: Int = 65536, maxBucket: Int = 100000): DataFrame = {
    require(targetCell > 0, s"targetCell must be positive, got $targetCell")
    val n = embeddings.count()
    val k = math.max(2L, math.min(maxK.toLong,
      (n + targetCell - 1) / targetCell)).toInt
    val centroids = Similarity.trainCentroids(embeddings, k, iters, sampleRate)
    semanticDedup(embeddings, centroids, tau, maxBucket)
  }
}
