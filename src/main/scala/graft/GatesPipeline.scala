package graft

import graft.functions.TimeFns._
import graft.functions.TextFns._
import graft.functions.VectorFns
import graft.multimodal.Multimodal
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM training-data pipeline: dedup tiers, ANN/similarity, text
  * analysis, sampling, multimodal plumbing, end-to-end corpus recipes.
  *
  * Gate registry family split out of SparkEntry (round 13, registry
  * hygiene); SparkEntry.queries/oracleSql union the six families.
  */
private[graft] object GatesPipeline {
  import GateSupport._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Balanced per-source cap: at most 10 docs per source by portable
    // hash order — deterministic mix balancing; rn<=k rides Spark's
    // WindowGroupLimit (partial top-k per partition before the
    // exchange, spec-pinned).
    "sample_cap_per_source" -> ((s, dir) =>
      graft.operators.Sampling.capPerGroup(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          col("source"), col("doc_id"), k = 10)
        .orderBy(col("source"), col("doc_id"))),


    // ── Token-budget sampling: fill each source's 4000-char quota in the
    // deterministic md5 order (the data-mixing primitive — budgets are
    // denominated in whatever weight the recipe uses; chars here so the
    // oracle recomputes the identical running sum). The crossing doc is
    // kept, so chars_kept >= budget whenever the source has enough — an
    // off-by-one in the frame (RANGE peers, cum including self) moves
    // docs_kept/chars_kept and hash-fails.
    "sample_token_budget" -> ((s, dir) =>
      graft.operators.Sampling.tokenBudgetSample(
          Tables.documents(s, dir), col("source"), col("doc_id"),
          col("n_chars"), budget = 4000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs_kept"),
          sum(col("n_chars").cast("long")).as("chars_kept"))
        .orderBy(col("source"))),


    // ── Embedding random projection (Johnson–Lindenstrauss dim
    // reduction, 64→8): each output row is one (vector, plane) dot
    // product — pure codegen'd scan-side arithmetic, zero shuffle.
    // Both sides truncate to 6 decimals (floor, the established
    // a16_moments idiom): a 64-term double dot product is NOT
    // bit-portable — graft_dot accumulates strictly sequentially while
    // DuckDB's kernels reassociate, a measured 1-ulp drift.
    "emb_project" -> ((s, dir) => {
      val planes = graft.functions.VectorFns.randomPlanes(8, 64)
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          posexplode(graft.functions.VectorFns.project(col("embedding"), planes)))
        .select(col("vec_id"), col("pos").cast("long").as("plane"),
          graft.functions.TextFns.truncate6(col("col")).as("proj"))
        .orderBy(col("vec_id"), col("plane"))
    }),


    // ── Sequence-length histogram: docs/tokens per power-of-two token-
    // count bucket — the length-distribution audit every pretraining mix
    // needs (context-window fit, packing efficiency). The bucket is
    // integer floor(log2) via binary-string length: exact integer math,
    // no floating log2 boundary risk in either engine.
    "text_len_hist" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(tokenCount(col("text")).cast("long").as("n"))
        .select((length(bin(greatest(col("n"), lit(1L)))) - 1).cast("long")
          .as("len_bucket"), col("n"))
        .groupBy(col("len_bucket"))
        .agg(count(lit(1)).as("docs"), sum(col("n")).as("tokens"),
          min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"))
        .orderBy(col("len_bucket"))),


    // ── Fixed-k deterministic sample: exactly k docs by smallest portable
    // content hash — "take exactly N uniformly, reproducibly" (hashSample
    // gives a rate, not a count). A distributed TakeOrdered (top-k per
    // partition → merge k·P rows) — no full sort, no full shuffle.
    "sample_fixed_k" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          graft.functions.HashFns.md5Lower64Mod(col("doc_id").cast("string"),
            1L << 40).as("hk"))
        .orderBy(col("hk"), col("doc_id"))
        .limit(500)),


    // ── Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-ES,
    // Sampling.weightedSample): exactly k docs with selection
    // probability ∝ n_chars, reproducible anywhere — the "sample the
    // corpus, prefer long documents" recipe step that rate-based
    // hashSample and unweighted fixed-k cannot express. Score =
    // ln(u)/w in floor-truncated integer millionths (u exact by
    // construction: (md5+1)/2^40 is a power-of-two division), top-k by
    // score = a distributed TakeOrdered — no full sort, no shuffle.
    // The oracle replays the identical arithmetic and ORDER BY, so the
    // selected SET (not just its size) must match.
    "sample_weighted_ares" -> ((s, dir) =>
      Sampling.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        col("doc_id"), col("n_chars"), k = 200)),


    // ── URL canonicalization + dedup: scheme/host case-folded, query and
    // fragment stripped; docs sharing a canonical URL collapse to the
    // min-doc_id keeper (path uses doc_id % 40 so collision groups are
    // real). One hash shuffle on the canonical key — exact-dedup's plan
    // with the normalization fused scan-side.
    "dedup_url_canonical" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("url", concat(lit("HTTPS://"), upper(col("source")),
          lit(".Example.Org/"), col("lang"), lit("/p/"),
          pmod(col("doc_id"), lit(40L)).cast("string"), lit("?utm=x&ref=r"),
          pmod(col("doc_id"), lit(7L)).cast("string"), lit("#top")))
      d.select(col("doc_id"),
          concat(lit("https://"), lower(parse_url(col("url"), lit("HOST"))),
            parse_url(col("url"), lit("PATH"))).as("canon"))
        .groupBy(col("canon"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("dup_ct"))
        .orderBy(col("canon"))
    }),


    // ── Sampling: deterministic stratified hash sample — selection is a
    // pure function of (doc_id, lang), stable under any partitioning
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratified(Tables.documents(s, dir), col("lang"), col("doc_id"),
        Map("en" -> 0.5, "zh" -> 0.1), defaultRate = 0.25)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),


    // ── Sampling: temperature-flattened language mixture (alpha=0.5 ≡
    // T=2) — per-lang keep rates sqrt(n_min/n_lang), md5-hash accept.
    // thr audits the realized rate (out of 10000) per stratum.
    "sample_temperature" -> ((s, dir) =>
      Sampling.temperatureMixture(
        Tables.documents(s, dir), col("lang"), col("doc_id"), alpha = 0.5)
        .groupBy(col("lang"))
        .agg(max(col("__thr")).as("thr"),
          count(lit(1)).as("docs_kept"),
          sum(col("n_chars")).as("chars_kept"))
        .orderBy(col("lang"))),


    // ── Sampling: second certified alpha (0.25 ≡ T=4/3 flattening) — the
    // exponent 0.75 decomposes to sqrt(r)*sqrt(sqrt(r)), every step
    // IEEE-exact, so T≠2 settings don't rest on uncertified libm pow
    "sample_temperature_a25" -> ((s, dir) =>
      Sampling.temperatureMixture(
        Tables.documents(s, dir), col("lang"), col("doc_id"), alpha = 0.25)
        .groupBy(col("lang"))
        .agg(max(col("__thr")).as("thr"),
          count(lit(1)).as("docs_kept"),
          sum(col("n_chars")).as("chars_kept"))
        .orderBy(col("lang"))),


    // ── Embeddings: scalar transform pack (norms, moments, extrema)
    "emb_scalar_pack" -> ((s, dir) => {
      def e = transform(col("embedding"), _.cast("double"))
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        truncate6(sqrt(aggregate(e, lit(0.0), (a, x) => a + x * x))).as("l2"),
        truncate6(aggregate(e, lit(0.0), (a, x) => a + x) / size(col("embedding")))
          .as("mean"),
        truncate6(array_max(e)).as("maxv"),
        truncate6(array_min(e)).as("minv"))
        .orderBy(col("vec_id"))
    }),


    // ── Text: TF-IDF top terms per document (integer-ranked: tf desc,
    // df asc — engine-exact, no float idf convention in the contract)
    "text_tfidf_top" -> ((s, dir) =>
      TfIdf.topTerms(Tables.documents(s, dir), k = 2)
        .orderBy(col("doc_id"), col("rnk"))),


    // ── Pipeline: BM25 sparse retrieval — the lexical twin of
    // pipe_rag_topk's dense path. Inverted-index probe (query-vocab
    // broadcast into the postings; the corpus is tokenized ONCE and
    // never shuffled whole). Scores are fixed-point millionths summed as
    // longs, so ranking is engine-exact; full DuckDB oracle replays the
    // identical arithmetic.
    "pipe_bm25_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val qids = Seq(0L, 1L, 2L)
      TfIdf.bm25TopK(
        docs.filter(!col("doc_id").isin(qids: _*)),
        docs.filter(col("doc_id").isin(qids: _*))
          .select(col("doc_id").as("query_id"), col("text")),
        k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),


    // ── Text: fixed-token-window chunking with stride (context-window
    // prep) — pure scan-side expression, zero shuffle
    "text_chunk" -> ((s, dir) =>
      Chunking.chunk(Tables.documents(s, dir), window = 32, stride = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))),


    // ── Text: sequence packing — contiguous token-budget bins per shard
    // (deterministic layout, shards independent ⇒ parallelism = shards)
    "pack_sequences" -> ((s, dir) =>
      Chunking.packSequences(Tables.documents(s, dir), budget = 256, shards = 8)
        .groupBy(col("shard"), col("pack_id"))
        .agg(count(lit(1)).as("doc_ct"), sum(col("n_toks")).as("tok_ct"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("pack_id"))),


    // ── Text: duplicate-3-gram repetition ratio (Gopher-style repetition
    // quality signal), floor-truncated for engine parity
    "text_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(graft.functions.TextFns.shingles(
            graft.functions.TextFns.tokensWs(col("text")), 3)).cast("long").as("n_grams"),
          truncate6(graft.functions.TextFns.repetitionRatio(col("text"), 3)).as("rep_ratio"))
        .orderBy(col("doc_id"))),


    // ── Text: top-2-gram character coverage (the OTHER Gopher repetition
    // axis — one dominant gram vs many scattered duplicates); per-doc
    // argmax with lexicographic tie-break, engine-exact
    "text_top_ngram" -> ((s, dir) =>
      Quality.topNgramCoverage(Tables.documents(s, dir), n = 2)
        .orderBy(col("doc_id"))),


    // ── Text: BPE merge induction — 4 rounds of tokenizer-vocabulary
    // learning. Round r's winning pair depends on round r-1's merge
    // APPLICATION, and syms_after must fall by exactly ct each round, so
    // the oracle transitively pins the whole greedy-merge semantics,
    // not just pair counting.
    "text_bpe_merges" -> ((s, dir) =>
      Bpe.merges(Tables.documents(s, dir), rounds = 4)
        .orderBy(col("round"))),


    // ── Text: n-gram LM scoring — mean bigram negative log-likelihood
    // under an add-one-smoothed model counted from the corpus itself
    // (the CCNet/KenLM perplexity-filter role). Fixed-point per-bigram
    // contributions (the BM25 trick) keep the sums engine-exact.
    "text_lm_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      LangModel.bigramNll(docs, docs).orderBy(col("doc_id"))
    }),


    // ── Text: bigram COLLOCATIONS by PMI — phrase detection over the
    // corpus (pairs co-occurring above chance; minCount=5 guards the
    // hapax pathology). One double rational + ln, floor-truncated —
    // the lm-score exactness recipe; count-table-sized joins only.
    "text_collocations" -> ((s, dir) =>
      LangModel.collocations(Tables.documents(s, dir), minCount = 5L)
        .orderBy(col("w1"), col("w2"))),


    // ── Text: BPE ENCODE — segment the corpus with the 4 learned merges
    // (vocab-sized merge application, joined back to corpus words; per-doc
    // reassembly is row-bounded). n_bpe + ordered head pin both the
    // segmentation and the document-order reassembly.
    "text_bpe_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ms = Bpe.merges(docs, rounds = 4).orderBy(col("round"))
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.encode(docs, ms)
        .select(col("doc_id"), size(col("bpe")).cast("long").as("n_bpe"),
          concat_ws(" ", slice(col("bpe"), 1, 3)).as("head"))
        .orderBy(col("doc_id"))
    }),


    // ── Text: BATCHED BPE induction — the rounds-dimension scale path
    // (r13 verdict task 1): 5 driver-coordinated rounds learn ≥32 merges
    // (up to 8 triple-disjoint pairs per round from a 48-candidate
    // window). The oracle replays candidate ranking, the greedy
    // disjoint selection (recursive CTE), the one-pass multi-rule fold,
    // and the running symbol ledger — so the whole batched semantics is
    // pinned, not just pair counting. The in-engine measured-vs-derived
    // symbol-total assert runs on every batch as a distributed invariant.
    "text_bpe_batch" -> ((s, dir) =>
      Bpe.mergesBatched(Tables.documents(s, dir),
          batches = 5, batchSize = 8, window = 48)
        .orderBy(col("merge_idx"))),


    // ── Text: LARGE-DEPTH BPE induction — the ≥256-merge regime real
    // tokenizers live in (r14 verdict task 6). Word units exhaust on
    // this corpus (31 distinct words — every word collapses to one
    // symbol by ~merge 89), which is exactly why byte-level tokenizers
    // induce over SEQUENCES: the units here are 128-char document
    // chunks (spaces are symbols), giving an open-ended merge space.
    // 36 batches x 8 triple-disjoint merges learn 288; the in-engine
    // conservation require runs per batch, the in-gate require pins
    // >= 256 actually learned, and the oracle replays candidate
    // ranking, greedy selection, fold application, and the ledger for
    // all 36 rounds.
    "text_bpe_merges_large" -> ((s, dir) => {
      val units = Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(explode(transform(
          sequence(lit(1), length(col("text")), lit(128)),
          i => col("text").substr(i, lit(128)))).as("unit"))
      val led = Bpe.mergesBatchedUnits(units, batches = 36, batchSize = 8,
          window = 64)
        .orderBy(col("merge_idx")).localCheckpoint(true)
      require(led.count() >= 256,
        s"text_bpe_merges_large: learned ${led.count()} merges, need >= 256")
      led
    }),


    // ── Text: XL-DEPTH BPE induction — the ≥1024-merge regime (r16
    // verdict task 4: the BpeRounds harness proved the tier at 1,105
    // merges; this is the same regime DRIVER-CHECKED as an oracle gate).
    // Wider batches keep the driver-round count at the large tier's ~40
    // (the per-round scheduling floor is the scale cost, not the merge
    // count): 40 batches x up-to-64 triple-disjoint merges from
    // 768-candidate windows over the same 128-char chunk units.
    // Under-selection (a window without 64 disjoint picks) is allowed by
    // BOTH sides in lockstep — measured yield decays with depth (symbol
    // collisions thin each window's disjoint set; narrower configs dried
    // up: 32-wide batches plateaued at 942 merges by 56 rounds) — and the
    // in-gate require pins >= 1024 actually learned (measured: 1,057 at
    // sf0.01, 1,064 at sf0.001).
    "text_bpe_merges_xl" -> ((s, dir) => {
      val units = Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(explode(transform(
          sequence(lit(1), length(col("text")), lit(128)),
          i => col("text").substr(i, lit(128)))).as("unit"))
      val led = Bpe.mergesBatchedUnits(units, batches = 40, batchSize = 64,
          window = 768)
        .orderBy(col("merge_idx")).localCheckpoint(true)
      require(led.count() >= 1024,
        s"text_bpe_merges_xl: learned ${led.count()} merges, need >= 1024")
      led
    }),


    // ── Text: WORDPIECE greedy subword encode — the OTHER tokenizer
    // family (BERT shape): a fixed top-k vocabulary with ## continuation
    // pieces, maximal-munch inference per unit (operators/WordPiece +
    // the native graft_wordpiece kernel — vocab baked into the plan as a
    // literal, hashed once per task, no UDF). Units are 24-char document
    // chunks (the corpus has 31 distinct words — chunk units give the
    // vocab a real selection problem, same trick as the BPE depth
    // tiers). The oracle re-derives the SAME vocabulary from the SAME
    // corpus in SQL and replays the greedy walk step by step (24 chained
    // extraction steps — min advance 1 char/step bounds tokens by unit
    // length), so derivation AND encode are both pinned. PRECONDITION
    // (guarded loudly on both sides): no '#' in the corpus — a literal
    // '##' inside a unit would conflate raw and continuation piece keys.
    "text_wordpiece_encode" -> ((s, dir) => {
      val units = Tables.documents(s, dir).filter(length(col("text")) > 0)
        .select(explode(transform(
          sequence(lit(1), length(col("text")), lit(24)),
          i => col("text").substr(i, lit(24)))).as("unit"))
      require(units.filter(col("unit").contains("#")).isEmpty,
        "text_wordpiece_encode: corpus units must be '#'-free (the ## " +
          "continuation convention would alias) — pick another corpus")
      val pieces = WordPiece.vocabUnits(units, k = 200, maxPieceLen = 4)
        .collect().map(_.getString(0)).toSeq // k rows: plan-sized metadata
      WordPiece.encodeUnits(units, pieces)
        .select(size(col("toks")).cast("long").as("n_tokens"), col("wct"),
          array_contains(col("toks"), lit("[UNK]")).as("has_unk"),
          length(concat_ws(" ", col("toks"))).cast("long").as("tok_chars"),
          col("unit"))
        .groupBy(col("n_tokens"))
        .agg(count(lit(1)).as("units"),
          sum(col("wct")).as("occurrences"),
          sum(when(col("has_unk"), 1L).otherwise(0L)).as("unk_units"),
          sum(col("tok_chars")).as("tok_chars_sum"),
          min(col("unit")).as("unit_min"),
          max(col("unit")).as("unit_max"))
        .orderBy(col("n_tokens"))
    }),


    // ── Text: UNIGRAM-LM VITERBI ENCODE — the THIRD tokenizer family
    // (SentencePiece's unigram algorithm, Kudo 2018 §3), completing the
    // induction trio: BPE replays merges, WordPiece munches greedily,
    // Unigram segments GLOBALLY — dp[i] = max_j dp[j]·p(unit[j..i)),
    // the segmentation maximizing the product of piece probabilities
    // (operators/Unigram + the native graft_unigram lattice kernel —
    // vocab AND counts baked into the plan as literals, no UDF). Same
    // 24-char chunk units and closed-form top-k derivation as the
    // WordPiece encode gate, plus the alphabet floor (all single chars
    // ride along, so no unit can strand). Engine-portable with NO
    // tolerance: p = ct/total is one exact IEEE division of sub-2^53
    // longs and every lattice score is a fixed-order chain of
    // correctly-rounded multiplies, so the oracle's 24-step DP replay
    // (score DESC, start ASC argmax per position, backtraced
    // recursively) reproduces the argmax bit for bit — derivation,
    // lattice, and backtrace are all pinned by the hash match.
    "text_unigram_encode" -> ((s, dir) => {
      val units = Tables.documents(s, dir).filter(length(col("text")) > 0)
        .select(explode(transform(
          sequence(lit(1), length(col("text")), lit(24)),
          i => col("text").substr(i, lit(24)))).as("unit"))
      val vocab = Unigram.vocabUnits(units, k = 200, maxPieceLen = 4)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy(_._1) // k + alphabet rows: plan-sized metadata
      Unigram.encodeUnits(units, vocab)
        .select(col("unit"), col("wct"),
          size(col("toks")).cast("long").as("n_tokens"),
          concat_ws(" ", col("toks")).as("seg"))
        .groupBy(col("n_tokens"))
        .agg(count(lit(1)).as("units"),
          sum(col("wct")).as("occurrences"),
          sum(length(col("seg"))).cast("long").as("seg_chars_sum"),
          min(col("seg")).as("seg_min"),
          max(col("seg")).as("seg_max"))
        .orderBy(col("n_tokens"))
    }),


    // ── Text: UNIGRAM-LM HARD-EM TRAINING — the re-estimation loop on
    // top of the encode gate's seed (Viterbi-EM, the hard-assignment
    // variant of Kudo 2018 §3.2's EM — SentencePiece's Viterbi training
    // mode): per round, segment every distinct unit under the current
    // model, RECOUNT piece usage weighted by unit frequency, and let
    // never-used pieces drop out (round 1 sheds the seed's dead n-grams
    // in bulk; later rounds refine — measured at sf0.001 the vocab
    // walks 205→176→167→160). Reachability is invariant: every piece of
    // a round's segmentations survives into the next vocabulary, so
    // each unit keeps at least its previous path. The ledger pins
    // vocab-size dynamics, token conservation (total_ct from the
    // recount == corpus_tokens from segmentation lengths — computed
    // independently on both sides), and the segmentations themselves
    // (seg_min/seg_max per round); the oracle replays seed + all three
    // lattice passes + recounts with zero tolerance (the same
    // exact-division / fixed-order-multiply portability contract).
    "text_unigram_train" -> ((s, dir) => {
      val units = Tables.documents(s, dir).filter(length(col("text")) > 0)
        .select(explode(transform(
          sequence(lit(1), length(col("text")), lit(24)),
          i => col("text").substr(i, lit(24)))).as("unit"))
      Unigram.trainUnits(units, k = 200, maxPieceLen = 4, rounds = 3)
        .orderBy(col("round"))
    }),


    // ── Text: WORDPIECE TRAINING — likelihood-scored merge induction
    // (Schuster & Nakajima 2012: argmax of ct/(ct_a·ct_b), the pair
    // whose fusion most raises unigram-LM corpus likelihood — the real
    // WordPiece training loop, vs frequency BPE's raw-count argmax).
    // The argmax is engine-portable EXACTLY: all three counts are longs
    // under 2^53, so the one IEEE double division is bit-identical in
    // Spark and DuckDB; ties break on (a, b). The oracle replays all 8
    // rounds: pair counts, symbol counts, the scored argmax, the greedy
    // fold, and the running symbol ledger.
    "text_wordpiece_train" -> ((s, dir) =>
      WordPiece.learnVocab(
        Tables.documents(s, dir)
          .select(explode(tokensWs(col("text"))).as("unit")), rounds = 8)
        .orderBy(col("round"))),


    // ── Text: LARGE-DEPTH WORDPIECE TRAINING — the likelihood argmax at
    // the ≥256-merge regime (r17 verdict task 3: the triple-disjoint
    // batched selection of Bpe.mergesBatched ported to the scored
    // argmax; WordPiece.learnVocabBatched). Units are the BPE depth
    // tiers' 128-char document chunks (whitespace words run dry on this
    // 31-word corpus). Disjointness keeps snapshot scores exact at
    // application time — no selected merge moves another's pair count OR
    // its ct_a·ct_b denominator — so the oracle replays candidate
    // scoring, the (score DESC, a, b) window, greedy selection, fold
    // application, and the telescoping symbol ledger for all rounds.
    // The in-gate require pins >= 256 actually learned.
    "text_wordpiece_train_large" -> ((s, dir) => {
      val units = Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(explode(transform(
          sequence(lit(1), length(col("text")), lit(128)),
          i => col("text").substr(i, lit(128)))).as("unit"))
      val led = WordPiece.learnVocabBatched(units, batches = 36,
          batchSize = 8, window = 64)
        .orderBy(col("merge_idx")).localCheckpoint(true)
      require(led.count() >= 256,
        s"text_wordpiece_train_large: learned ${led.count()} merges, " +
          "need >= 256")
      led
    }),


    // ── Text: BATCHED BPE ENCODE — segment the corpus with the ~39
    // learned merges, one fold pass per BATCH (constant expression depth
    // in batch size; 5 nested folds instead of 39).
    // ── Text: TABLE-DRIVEN BPE ENCODE — the 10³–10⁵-merge tier: same
    // learned merges as text_bpe_batch_encode but segmented by
    // Bpe.encodeTable (one mapPartitions JVM pass per distinct word,
    // rule table broadcast) instead of nested Catalyst folds — plan
    // depth is CONSTANT in the merge count, so this is the encode a
    // real-vocabulary tokenizer runs. Exact-parity contract: shares
    // text_bpe_batch_encode's oracle verbatim.
    "text_bpe_encode_table" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val led = Bpe.mergesBatched(docs, batches = 5, batchSize = 8,
        window = 48).orderBy(col("merge_idx")).collect()
      val flat = led.map(r => (r.getString(2), r.getString(3))).toSeq
      Bpe.encodeTable(docs, flat)
        .select(col("doc_id"), size(col("bpe")).cast("long").as("n_bpe"),
          concat_ws(" ", slice(col("bpe"), 1, 3)).as("head"))
        .orderBy(col("doc_id"))
    }),


    // ── Text: BYTE-FALLBACK BPE ENCODE (r15 verdict task 8) — the two
    // pieces a tokenizer needs around the merge table: special tokens
    // ('<|doc|>' bypasses segmentation as ONE symbol) and byte-level
    // OOV fallback (every code point outside the ASCII alphabet expands
    // to '<0xAB>' UTF-8 byte tokens BEFORE the merge chain — nothing is
    // unrepresentable, the GPT-2/LLaMA convention; the reference's
    // keyword splitter falls back to the whole token instead,
    // SplitFunction.java:22-24). The fixture injects a special token
    // and a mixed ASCII+OOV marker word (2- and 3-byte UTF-8 chars,
    // doc_id-derived) into EVERY doc; the fixed rule table includes
    // BYTE-PAIR merges ('→' reassembles from its three bytes in two
    // rules) and ASCII merges that must compose with expanded bytes in
    // one word. tail4 pins the injected suffix's exact segmentation;
    // the oracle replays fallback expansion + the rule chain per word.
    "text_bpe_encode_bytes" -> ((s, dir) => {
      val oov = array(lit("中"), lit("文"), lit("→"), lit("é"),
        lit("ß"), lit("λ"), lit("ツ"), lit("☃"))
      val injected = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(col("text"), lit(" <|doc|> mix"),
            element_at(oov, (pmod(col("doc_id"), lit(8L)) + 1).cast("int")))
            .as("text"))
      val rules = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
        ("m", "i"), ("mi", "x"),
        ("<0xE2>", "<0x86>"), ("<0xE2><0x86>", "<0x92>"))
      val ascii = (0 until 128).map(_.toChar.toString).toSet
      Bpe.encodeTableBytes(injected, rules, ascii, Set("<|doc|>"))
        .select(col("doc_id"), size(col("bpe")).cast("long").as("n_bpe"),
          concat_ws(" ", slice(col("bpe"), 1, 3)).as("head"),
          concat_ws(" ", slice(col("bpe"), -4, 4)).as("tail4"))
        .orderBy(col("doc_id"))
    }),


    // (4 batches, not 5: the fold tree grows ~4x per batch — BpeRounds
    // measures 3.5 s at 4 batches vs 16.3 s at 5 at sf0.1 — and the
    // large-table regime is text_bpe_encode_table's job; this gate pins
    // the FOLD tier's semantics at its economic depth)
    "text_bpe_batch_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val led = Bpe.mergesBatched(docs, batches = 4, batchSize = 8,
        window = 48).orderBy(col("merge_idx")).collect()
      val batches = led.groupBy(_.getLong(1)).toSeq.sortBy(_._1).map(_._2
        .sortBy(_.getLong(0)).map(r => (r.getString(2), r.getString(3))).toSeq)
      Bpe.encodeBatches(docs, batches)
        .select(col("doc_id"), size(col("bpe")).cast("long").as("n_bpe"),
          concat_ws(" ", slice(col("bpe"), 1, 3)).as("head"))
        .orderBy(col("doc_id"))
    }),


    // ── Text: PII scrubbing. The fixture has no organic PII, so the gate
    // deterministically injects a doc_id-derived email + phone before
    // scrubbing — the regex path is exercised byte-for-byte on every row
    // and the oracle replays the same injection + replacement.
    "text_pii_scrub" -> ((s, dir) => {
      val inj = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or call "),
        format_string("555-%03d-%04d",
          pmod(col("doc_id"), lit(1000L)), pmod(col("doc_id"), lit(10000L))))
      Tables.documents(s, dir)
        .select(col("doc_id"), inj.as("inj"))
        .select(col("doc_id"),
          graft.functions.TextFns.piiScrub(col("inj")).as("scrubbed"),
          size(regexp_extract_all(col("inj"),
            lit(graft.functions.TextFns.EmailRe), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(col("inj"),
            lit(graft.functions.TextFns.PhoneRe), lit(0))).cast("long").as("n_phone"))
        .orderBy(col("doc_id"))
    }),


    // ── Embeddings: symmetric int8 quantization (4x storage shrink for
    // ANN scans; floor-based so quantized vectors are engine-portable)
    "emb_quantize" -> ((s, dir) => {
      def q = VectorFns.quantizeInt8(col("embedding"))
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        truncate6(array_max(transform(col("embedding"), x => abs(x.cast("double")))))
          .as("scale_t"),
        aggregate(q, lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(q).as("q_min"),
        array_max(q).as("q_max"))
        .orderBy(col("vec_id"))
    }),


    // ── Corpus analytics: per-language report (docs, tokens, mean quality,
    // distinct contents). Quality sums run in decimal — exact and
    // associative, so the mean is reproducible under any partitioning.
    "corpus_report" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), col("text"),
          call_function("graft_text_profile", col("text")).as("p"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("docs"),
          sum(col("p.n_tokens")).as("tokens"),
          truncate6(sum(col("p.quality").cast("decimal(18,12)")).cast("double")
            / count(lit(1))).as("mean_quality"),
          count_distinct(md5(col("text"))).as("distinct_docs"))
        .orderBy(col("lang"))),


    // ── Pipeline: composed pretraining corpus filter (langid + quality +
    // token bounds + exact-dedup keeper)
    "pipe_pretrain_filter" -> ((s, dir) =>
      Pretrain.filterCorpus(Tables.documents(s, dir),
        lang = "en", minQuality = 0.4, minTokens = 5, maxTokens = 100000)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),


    // ── Pipeline END-TO-END: the full cheap-pass recipe in one gate —
    // language/quality/token filter → exact-dedup keeper → benchmark
    // decontamination (eval slice deliberately overlaps train via the
    // %101 slice, so drops fire on real rows: 5/5/40 docs at the three
    // scales) → per-language corpus report. Each stage is individually
    // oracled elsewhere; this gate pins their COMPOSITION (column
    // contracts, filter-then-dedup-then-drop order) against one DuckDB
    // replay of the whole pipeline.
    "pipe_pretrain_e2e" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(pmod(col("doc_id"), lit(89L)) === 0 ||
        pmod(col("doc_id"), lit(101L)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(89L)) =!= 0)
      val filtered = Pretrain.filterCorpus(train, lang = "en",
        minQuality = 0.4, minTokens = 5, maxTokens = 100000)
      Pretrain.decontaminate(filtered, evalSet, shingleLen = 8)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs_kept"),
          sum(col("n_chars")).as("chars_kept"))
        .orderBy(col("lang"))
    }),


    // ── Pipeline: benchmark decontamination — drop training docs sharing
    // any word 8-gram with the (deterministically sampled) eval set; the
    // eval shingle set broadcasts, the corpus never shuffles. The eval
    // sample deliberately overlaps train (the %101 slice stays in train),
    // so the DROP arm is exercised on real rows, not just the keep arm.
    "pipe_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(pmod(col("doc_id"), lit(97L)) === 0 ||
        pmod(col("doc_id"), lit(101L)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0)
      val clean = Pretrain.decontaminate(train, evalSet, shingleLen = 8)
      train.groupBy(col("lang")).agg(count(lit(1)).as("docs_train"))
        .join(clean.groupBy(col("lang")).agg(count(lit(1)).as("docs_clean"),
          sum(col("n_chars")).as("chars_clean")), Seq("lang"), "left")
        .select(col("lang"), col("docs_train"),
          coalesce(col("docs_clean"), lit(0L)).as("docs_clean"),
          coalesce(col("chars_clean"), lit(0L)).as("chars_clean"))
        .orderBy(col("lang"))
    }),


    // ── Pipeline: Bloom-tier decontamination — same fixture as
    // pipe_decontaminate, with the eval grams sketched instead of
    // exact. The kept SET is sketch-dependent (DuckDB can't replay the
    // bloom bits), so the gate pins the one-sided contract: no false
    // negatives (bloom survivors ⊆ exact survivors — a missed
    // contaminated doc breaks subset_ok) and a false-drop budget
    // (≤ max(5, 1%) of the exact survivors at fpp=1e-6; the sketch seed
    // is fixed so the count is deterministic per dataset). docs_train
    // and kept_exact anchor the verdicts to DuckDB-recomputed truth.
    "pipe_decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(pmod(col("doc_id"), lit(97L)) === 0 ||
        pmod(col("doc_id"), lit(101L)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0)
      val exact = Pretrain.decontaminate(train, evalSet, shingleLen = 8)
        .select("doc_id").localCheckpoint(true)
      val bloom = Pretrain.decontaminateBloom(train, evalSet, shingleLen = 8)
        .select("doc_id").localCheckpoint(true)
      val kExact = exact.agg(count(lit(1)).as("kept_exact"))
      val viol = bloom.join(exact, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("__v"))
      val fps = exact.join(bloom, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("__fp"))
      train.agg(count(lit(1)).as("docs_train"))
        .crossJoin(kExact).crossJoin(viol).crossJoin(fps)
        .select(col("docs_train"), col("kept_exact"),
          (col("__v") === 0).cast("long").as("subset_ok"),
          (col("__fp") <= greatest(lit(5L),
            ceil(col("kept_exact") * 0.01).cast("long"))).cast("long").as("fp_ok"))
    }),


    // ── Pipeline: SEMANTIC decontamination — embedding-level eval
    // leakage (paraphrases that share no 8-gram). Nearest-eval-neighbor
    // (kNN join, k=1) max-cosine >= tau drops the training vector; tau
    // 0.42 fires the drop arm at every scale (3/5/47 drops, minimum
    // threshold margin 7e-5 — far above cross-engine double noise).
    // Full oracle: DuckDB recomputes the max-cos rule exactly.
    "pipe_decontaminate_sem" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Pretrain.decontaminateSemantic(
        emb.filter(pmod(col("vec_id"), lit(17L)) =!= 0),
        emb.filter(pmod(col("vec_id"), lit(17L)) === 0), tau = 0.42)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),


    // ── Dedup: exact content-hash
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir)).orderBy(col("keeper_id"))),


    // ── Dedup: n-gram Jaccard via inverted shingle index. The pair set is
    // computed once per run and shared with the two downstream gates
    // (see sharedNgramPairs) — one logical scan, measured once.
    "dedup_ngram_jaccard" -> ((s, dir) =>
      sharedNgramPairs(s, dir)
        .orderBy(col("doc_a"), col("doc_b"))),


    // ── Dedup: PPJoin-style prefix-filtered Jaccard — only each doc's
    // df-ascending prefix (|d| − ceil(t·|d|) + 1 shingles) is indexed;
    // the exhaustive oracle proves the reduced index loses no pair.
    "dedup_ngram_prefix" -> ((s, dir) =>
      Dedup.ngramJaccardPrefix(Tables.documents(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))),


    // ── Dedup: connected components over near-dup pairs — pairs resolved
    // to duplicate clusters (min-id label propagation)
    "dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(sharedNgramPairs(s, dir))
        .orderBy(col("doc_id"))),


    // ── Dedup: QUALITY-AWARE canonical selection — keep each near-dup
    // cluster's LONGEST member (ties: min id), not the arbitrary min-id
    // one: the policy production dedup wants (the best copy survives,
    // boilerplate-trimmed fragments drop). Same pair graph as
    // dedup_clusters; the oracle replays the transitive closure, the
    // per-cluster argmax by (length DESC, doc_id), and the survivor set
    // row-for-row.
    "dedup_keep_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val labels = Dedup.clusters(sharedNgramPairs(s, dir))
      Dedup.keepBest(docs, labels, length(col("text")))
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),


    // ── Dedup pipeline END-TO-END: corpus → ngram near-dup pairs →
    // connected components → drop non-canonical members → surviving
    // corpus, reported per language. The full "dedup a crawl" flow
    // through one oracle.
    "pipe_dedup_survivors" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val labels = Dedup.clusters(sharedNgramPairs(s, dir))
      Dedup.keepCanonical(docs, labels)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs_kept"),
          sum(col("n_chars")).as("chars_kept"),
          count_distinct(col("source")).as("sources"))
        .orderBy(col("lang"))
    }),


    // ── Dedup: paragraph-level (CCNet-style — dedup BELOW document
    // granularity; the globally first occurrence of each paragraph
    // survives, documents reassemble from their survivors). The corpus
    // has no multi-paragraph docs, so the gate derives a deterministic
    // fixture from the table itself: each doc becomes two paragraphs —
    // its own text + its ((doc_id+1) mod 50) partner's text — chaining
    // docs 0..49 so earlier docs steal later docs' own paragraphs
    // (n_kept spans 0/1/2) and every doc ≥ 50 sheds its partner copy.
    // Full oracle replays the rule in DuckDB.
    "dedup_paragraph" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val partner = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("pid"), col("text").as("ptext"))
      val multi = docs
        .select(col("doc_id"), col("text"),
          pmod(col("doc_id") + 1, lit(50L)).as("pid"))
        .join(broadcast(partner), "pid")
        .select(col("doc_id"), concat(col("text"), lit("\n"), col("ptext")).as("text"))
      Dedup.paragraphDedup(multi)
        .orderBy(col("doc_id"))
    }),


    // ── Dedup: repeated-span profile — per-doc count/fraction of distinct
    // 8-word spans that also occur in another document (exact-substring
    // dedup signal, set-wise). Linear: hash-agg + key join, no pairs.
    "dedup_span_frac" -> ((s, dir) =>
      Dedup.spanDupStats(Tables.documents(s, dir))
        .orderBy(col("doc_id"))),


    // ── Span-level duplicate REMOVAL (EXACTSUBSTR's rewrite step): every
    // token inside a cross-document-repeated 8-token span is cut; the
    // oracle rebuilds each trimmed text character-exactly in SQL.
    "dedup_span_trim" -> ((s, dir) =>
      Dedup.spanTrim(Tables.documents(s, dir))
        .orderBy(col("doc_id"))),


    // ── Pipeline: dedup-cluster-atomic train/valid/test splits — near-dup
    // clusters are assigned whole, so no near-duplicate straddles a
    // train/eval boundary. Reported per (split, lang).
    "pipe_split_leakage" -> ((s, dir) => {
      val labels = Dedup.clusters(sharedNgramPairs(s, dir))
      Sampling.leakageSafeSplits(Tables.documents(s, dir), labels,
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
        .orderBy(col("split"), col("lang"))
    }),


    // ── Pipeline: decontamination REPORT — per (doc, eval set) distinct
    // 8-gram hit counts across TWO eval sets; the attribution/audit twin
    // of pipe_decontaminate's boolean drop.
    "pipe_decontaminate_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0 &&
        pmod(col("doc_id"), lit(101L)) =!= 0)
      Pretrain.decontaminateReport(train, Seq(
          "holdout_a" -> docs.filter(pmod(col("doc_id"), lit(97L)) === 0),
          "holdout_b" -> docs.filter(pmod(col("doc_id"), lit(101L)) === 0)))
        .orderBy(col("doc_id"), col("eval_set"))
    }),


    // ── Dedup: MinHash+LSH — the portable-hash twin (md5-lower-64 family,
    // string band keys), so the DuckDB oracle recomputes the exact same
    // candidate set. maxBucket lifted above any sf0.01 bucket so the gate
    // compares full enumeration (the star-fallback guard has its own spec).
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPortable(Tables.documents(s, dir), maxBucket = 1000000)
        .orderBy(col("doc_a"), col("doc_b"))),


    // ── Dedup: incremental ingestion — the doc_id%5==0 slice plays the
    // incoming batch, the rest the persisted corpus; incoming signatures
    // probe the history band INDEX (history text is only re-read for the
    // candidate sliver), so ingesting a batch never rescans the corpus
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val incoming = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
      val history = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0L)
      Dedup.incrementalNearDups(incoming, history,
          Dedup.minhashBandIndex(history))
        .orderBy(col("doc_a"), col("doc_b"))
    }),


    // ── Dedup: the AT-REST index round-trip — the band index is WRITTEN
    // to disk partitioned by band (the persisted layout the scaladoc
    // promises: incremental ingestion probes O(bands × docs) index rows,
    // never re-shingles history text) and read back before the probe.
    // Same fixture and oracle as dedup_incremental: the disk round-trip
    // must not move the candidate set or any jaccard.
    "dedup_index_atrest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val incoming = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
      val history = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0L)
      val path = s"$shmRoot/graft-bandidx-${System.nanoTime()}"
      try {
        Dedup.minhashBandIndex(history)
          .write.partitionBy("band").mode("overwrite").parquet(path)
        val idx = s.read.parquet(path)
          .select(col("doc_id"),
            col("band").cast("int").as("band"), col("key"))
        Dedup.incrementalNearDups(incoming, history, idx)
          .orderBy(col("doc_a"), col("doc_b"))
          .localCheckpoint(true) // materialize before the index sweeps
      } finally rmTree(path)
    }),


    // ── Dedup: SimHash — portable twin (md5-lower-64 bit votes)
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairsPortable(Tables.documents(s, dir), maxHamming = 8,
          maxBucket = 1000000)
        .orderBy(col("doc_a"), col("doc_b"))),


    // ── Dedup: embedding near-dup via hyperplane buckets (planes are baked
    // into the oracle SQL as literals; floor-truncate, not round)
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDup(
        Tables.embeddings(s, dir), VectorFns.randomPlanes(3, 64), minCosine = 0.4,
        maxBucket = 1000000)
        .select(col("vec_a"), col("vec_b"),
          (floor(col("cos") * 1e4) / 1e4).as("cos"))
        .orderBy(col("vec_a"), col("vec_b"))),


    // ── Dedup: SemDeDup — semantic dedup over LEARNED k-means cells
    // (arXiv:2303.09540), vs dedup_embedding's random hyperplanes. The
    // oracle cannot re-learn the centroids in SQL, so the gate follows
    // the sim_topk_ivf shape: it emits invariant VERDICTS the oracle
    // pins — conservation (one classified row per vector), witness
    // validity (every drop justified by an earlier same-cell member
    // above tau), cluster-minimum keeps, and non-vacuity (tau=0.4 drops
    // 17/17/215 vectors at sf0.001/0.01/0.1) — while DedupSpec pins the
    // exact keep/drop/witness semantics on a constructed fixture with
    // explicit centroids.
    "dedup_semantic" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // single threshold shared by the dedup call and the witness verdict:
      // retuning it in one place must not silently weaken the other
      val tau = 0.4
      val cents = Similarity.trainCentroids(emb, k = 16, iters = 2,
        sampleRate = 0.5)
      semanticVerdicts(Dedup.semanticDedup(emb, cents, tau = tau), tau)
    }),


    // ── SemDeDup with AUTO-CHOSEN k (k = ceil(n/targetCell)): the scale
    // rule the explicit-k gate's "raise k" error points at, proven green
    // end-to-end. Same verdict invariants as dedup_semantic (the oracle
    // cannot re-learn centroids in SQL); targetCell=125 puts k at 4/4/16
    // across sf0.001/0.01/0.1, so the k-selection rule itself is
    // exercised at more than one value by the driver's scales.
    "dedup_semantic_autok" -> ((s, dir) => {
      val tau = 0.4
      semanticVerdicts(
        Dedup.semanticDedupAutoK(Tables.embeddings(s, dir), tau = tau,
          targetCell = 125),
        tau)
    }),


    // ── Similarity: exact brute-force cosine top-k
    "sim_topk_brute" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos"), 4).as("cos_r"))
        .orderBy(col("query_id"), col("rank"))
    }),


    // ── Similarity: LSH-bucketed ANN (rows-only; approximate)
    "sim_topk_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
        VectorFns.randomPlanes(8, 64))
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),


    // ── Similarity: IVF ANN with distributed k-means (rows-only)
    // One-sided containment oracle: the k-means path stays engine-side
    // (centroids are data-dependent, so DuckDB can't re-derive the emitted
    // neighbor SET), but every per-query INVARIANT is hash-checked against
    // constants DuckDB computes independently: exactly k results, k
    // distinct neighbors, dense ranks 1..k, every emitted cosine equal to
    // the exact pairwise cosine (the cosine expression itself is
    // full-oracle-verified by sim_topk_brute), no self-pairs, and ranks
    // ordered by (cos desc, neighbor_id asc). A wrong-distance, dup,
    // self-match, or mis-rank bug breaks a count and hash-fails the gate.
    // ── Similarity: PQ (product quantization) — the memory-compression
    // ANN tier (Jégou et al. 2011): m-byte codes replace d×4-byte raw
    // vectors in the scan; ADC shortlists candidates from per-query
    // distance tables, an exact-cosine re-rank over ONLY the shortlist
    // emits final neighbors. Same one-sided invariant oracle as
    // sim_topk_ivf (codebooks are data-learned, so DuckDB cannot
    // re-derive the SET): per query — exactly k results, k distinct
    // neighbors, dense ranks, every emitted cosine equal to the exact
    // pairwise cosine (the re-rank contract: quantization error may cost
    // recall, never distance fidelity), ranks ordered. A corpus-level
    // recall floor (>= 0.3 overlap@5 vs exact brute force; measured
    // 0.6-0.8 at these scales) pins non-vacuity: a scrambled codebook or
    // broken ADC lookup craters overlap and hash-fails.
    "sim_topk_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
      val cb = Similarity.trainPqCodebooks(emb, m = 8, k = 64, iters = 2,
        sampleRate = 0.5)
      val codes = Similarity.pqEncode(emb, cb)
      val pq = Similarity.pqTopKReranked(emb, codes, queries, k = 5, cb,
        shortlist = 50)
      val exact = pq
        .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
        .withColumn("cos_exact",
          graft.functions.VectorFns.cosine(col("qe"), col("ne")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")
      val flagged = exact
        .withColumn("prev_cos", lag(col("cos"), 1).over(w))
        .withColumn("prev_nbr", lag(col("neighbor_id"), 1).over(w))
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (col("cos") === col("cos_exact") &&
            col("neighbor_id") =!= col("query_id")).as("valid"),
          (col("prev_cos").isNull || col("prev_cos") > col("cos") ||
            (col("prev_cos") === col("cos") &&
              col("prev_nbr") < col("neighbor_id"))).as("ordered"))
      val perQuery = queries.select(col("vec_id").as("query_id"))
        .join(flagged.groupBy("query_id").agg(
          count(lit(1)).as("n_results"),
          count_distinct(col("neighbor_id")).as("n_distinct"),
          count_distinct(when(col("rank").between(1, 5), col("rank"))).as("n_ranks"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("rank") > 1 && col("ordered"), 1L).otherwise(0L)).as("n_ordered")),
          Seq("query_id"), "left")
      val overlap = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .join(pq.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .agg((count(lit(1)) >= lit(0.3 * 25)).cast("long").as("recall_floor_ok"))
      perQuery.crossJoin(overlap)
        .select(col("query_id"),
          coalesce(col("n_results"), lit(0L)).as("n_results"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          coalesce(col("n_ranks"), lit(0L)).as("n_ranks"),
          coalesce(col("n_valid"), lit(0L)).as("n_valid"),
          coalesce(col("n_ordered"), lit(0L)).as("n_ordered"),
          col("recall_floor_ok"))
        .orderBy(col("query_id"))
    }),


    // ── Composed IVF-PQ (IVFADC, Jégou et al. 2011 §V) — the
    // billion-scale layout: the at-rest index stores m-byte PQ codes
    // PARTITIONED BY IVF cell, so a probe of 4/16 cells deserializes a
    // quarter of the files and the files hold codes, not vectors (~32×
    // smaller scan than the raw IVF index — ScaleGrowth measures the
    // byte ratio). Search = probe cells → ADC over only probed codes →
    // exact-cosine re-rank of the shortlist. Same one-sided invariant
    // oracle as sim_topk_pq (both quantizers are data-learned): per
    // query — exactly k results, k distinct neighbors, dense ordered
    // ranks, every emitted cosine equal to the exact pairwise cosine
    // (re-rank fidelity), plus a corpus-level recall floor vs exact
    // brute force so a broken probe path or scrambled codebook
    // hash-fails rather than degrading silently.
    "sim_topk_ivfpq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
      val centroids = Similarity.trainCentroids(emb, k = 16, iters = 2,
        sampleRate = 0.5)
      val cb = Similarity.trainPqCodebooks(emb, m = 8, k = 64, iters = 2,
        sampleRate = 0.5)
      val path = s"$shmRoot/graft-ivfpq-${System.nanoTime()}"
      try {
        Similarity.buildIvfPqIndex(emb, centroids, cb, path)
        val ivfpq = Similarity.ivfPqTopKIndexed(s, path, emb, queries,
          k = 5, centroids, cb, nProbe = 4, shortlist = 50)
        val exact = ivfpq
          .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
          .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
          .withColumn("cos_exact",
            graft.functions.VectorFns.cosine(col("qe"), col("ne")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy("rank")
        val flagged = exact
          .withColumn("prev_cos", lag(col("cos"), 1).over(w))
          .withColumn("prev_nbr", lag(col("neighbor_id"), 1).over(w))
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            (col("cos") === col("cos_exact") &&
              col("neighbor_id") =!= col("query_id")).as("valid"),
            (col("prev_cos").isNull || col("prev_cos") > col("cos") ||
              (col("prev_cos") === col("cos") &&
                col("prev_nbr") < col("neighbor_id"))).as("ordered"))
        val perQuery = queries.select(col("vec_id").as("query_id"))
          .join(flagged.groupBy("query_id").agg(
            count(lit(1)).as("n_results"),
            count_distinct(col("neighbor_id")).as("n_distinct"),
            count_distinct(when(col("rank").between(1, 5), col("rank"))).as("n_ranks"),
            sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
            sum(when(col("rank") > 1 && col("ordered"), 1L).otherwise(0L)).as("n_ordered")),
            Seq("query_id"), "left")
        val overlap = Similarity.bruteForceTopK(emb, queries, k = 5)
          .select(col("query_id"), col("neighbor_id"))
          .join(ivfpq.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"))
          .agg((count(lit(1)) >= lit(0.2 * 25)).cast("long").as("recall_floor_ok"))
        perQuery.crossJoin(overlap)
          .select(col("query_id"),
            coalesce(col("n_results"), lit(0L)).as("n_results"),
            coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
            coalesce(col("n_ranks"), lit(0L)).as("n_ranks"),
            coalesce(col("n_valid"), lit(0L)).as("n_valid"),
            coalesce(col("n_ordered"), lit(0L)).as("n_ordered"),
            col("recall_floor_ok"))
          .orderBy(col("query_id"))
          .localCheckpoint(true) // materialize before the index sweeps
      } finally rmTree(path)
    }),


    // ── ANN recall REPORT (r15 verdict task 6) — the quality tripwire
    // the determinism gates can't be: each approximate tier's own gate
    // hash-matches its own (deterministic) output, so a tuning
    // regression that silently tanks retrieval quality would still
    // pass. This gate measures recall@5 of every ANN tier against
    // bruteForceTopK truth on a 20-query set and REQUIRES each tier's
    // floor in-gate (set at roughly half the min measured across the
    // three scales — a real regression trips the require, which the
    // driver records as err). The floors and the query-set size are the
    // oracle-replayed output; the measured recalls print to the log for
    // banking (data-learned quantizers make them non-SQL-expressible).
    "sim_recall_report" -> ((s, dir) => {
      // r19 shape: the report runs SEVEN independent recall arms over
      // independently trained quantizers — sequential, that was 120
      // driver-scheduled jobs averaging 70 ms with a ~50 ms gap each
      // (measured; no single hot job). Two fusions, results identical:
      //   1. the independent TRAININGS / truth sets run on concurrent
      //      driver threads (Spark sessions support multi-threaded
      //      action submission; nothing here mutates session conf) —
      //      each arm's Lloyd loops are driver-sequential, but the arms'
      //      loops overlap;
      //   2. the per-arm `truth.join(ann).count()` actions fuse into ONE
      //      family-tagged union aggregated by method — one action whose
      //      independent stages the scheduler runs in parallel, instead
      //      of 7 join+count round-trips. Ratios are byte-identical:
      //      same inner joins, same counts, same denominators.
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 20)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val truthF = Future {
        val t = Similarity.bruteForceTopK(emb, queries, k = 5)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
        (t, t.count().toDouble)
      }
      val nQF = Future(queries.count())
      val centroidsF = Future(Similarity.trainCentroids(emb, k = 16,
        iters = 2, sampleRate = 0.5))
      val cbF = Future(Similarity.trainPqCodebooks(emb, m = 8, k = 64,
        iters = 2, sampleRate = 0.5))
      // SUB-QUANTIZER resolution probe (r18): the r17 nProbe sweep
      // showed the curve is shallow in the probe set — the verdict's
      // hypothesis is that ivfpq recall lives in m (each sub-vector
      // halves from 8 to 4 dims at m=16, so each code byte quantizes
      // a finer slice). PQ-only, logged for the BASELINE trend table,
      // never required, prices the quantizer itself, not IVF routing.
      val cb16F = Future(Similarity.trainPqCodebooks(emb, m = 16, k = 64,
        iters = 2, sampleRate = 0.5))
      // kNN JOIN recall (r17 verdict task 6): the both-sides-large tier
      // folded into this report so the whole ANN surface shares one
      // trend table. Truth is the exact kNN join over the same split.
      val knnRight = emb.filter(col("vec_id") >= 20)
      val knnTruthF = Future {
        val t = Similarity.knnJoinExact(queries, knnRight, k = 5)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
        (t, t.count().toDouble)
      }
      val (truth, denom) = Await.result(truthF, Duration.Inf)
      val nQ = Await.result(nQF, Duration.Inf)
      val centroids = Await.result(centroidsF, Duration.Inf)
      val cb = Await.result(cbF, Duration.Inf)
      val cb16 = Await.result(cb16F, Duration.Inf)
      val (knnTruth, knnDenom) = Await.result(knnTruthF, Duration.Inf)
      val path = s"$shmRoot/graft-recall-${System.nanoTime()}"
      try {
        val indexF = Future(Similarity.buildIvfPqIndex(emb, centroids, cb,
          path))
        val codesF = Future(Similarity.pqEncode(emb, cb))
        val codes16F = Future(Similarity.pqEncode(emb, cb16))
        Await.result(indexF, Duration.Inf)
        val codes = Await.result(codesF, Duration.Inf)
        val codes16 = Await.result(codes16F, Duration.Inf)
        // (method, floor%) — floors TIGHTENED r17 per the banked plan
        // (BASELINE.md r17 recall trend: three identical measurement
        // rounds — deterministic tunings): ≈0.9 × the 3-scale min of
        // each tier (ivf 0.69, ivfpq 0.62, lsh 0.46, pq 0.62).
        // 4 LSH planes (16 buckets), not sim_topk_lsh's 8: the recall
        // arm wants the recall-oriented tuning — at sf0.001 the
        // 256-bucket variant strands most queries with near-empty
        // buckets (measured 0.11 recall@5; 4 planes measures ~0.5).
        // ivfpq6 is the r17 recall/cost CURVE probe (nProbe=6, logged
        // for banking, never required — nProbe=4 stays the contract).
        val arms: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
          ("ivf", Similarity.ivfTopK(emb, queries, k = 5,
            centroids, nProbe = 4)),
          ("ivfpq", Similarity.ivfPqTopKIndexed(s, path, emb,
            queries, k = 5, centroids, cb, nProbe = 4, shortlist = 50)),
          ("lsh", Similarity.lshTopK(emb, queries, k = 5,
            graft.functions.VectorFns.randomPlanes(4, 64))),
          ("pq", Similarity.pqTopKReranked(emb, codes, queries,
            k = 5, cb, shortlist = 50)),
          ("ivfpq6", Similarity.ivfPqTopKIndexed(s, path, emb, queries,
            k = 5, centroids, cb, nProbe = 6, shortlist = 50)),
          ("pq16", Similarity.pqTopKReranked(emb, codes16, queries,
            k = 5, cb16, shortlist = 50)),
          ("knn", Similarity.knnJoinIvf(queries, knnRight, k = 5,
            centroids, nProbe = 4)))
        // one tagged union: `family` keys which truth set an arm is
        // measured against (the knn arm's truth is the exact kNN join
        // over its own corpus split, not the brute-force top-k)
        val annAll = arms.map { case (method, df) =>
          df.select(lit(method).as("method"),
            lit(if (method == "knn") "knn" else "main").as("family"),
            col("query_id"), col("neighbor_id"))
        }.reduce(_.unionByName(_))
        val truthAll = truth
          .select(lit("main").as("family"), col("query_id"),
            col("neighbor_id"))
          .unionByName(knnTruth.select(lit("knn").as("family"),
            col("query_id"), col("neighbor_id")))
        val hits = truthAll
          .join(annAll, Seq("family", "query_id", "neighbor_id"))
          .groupBy(col("method")).agg(count(lit(1)).as("hits"))
          .collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        def recallOf(method: String): Double =
          hits.getOrElse(method, 0L) /
            (if (method == "knn") knnDenom else denom)
        val floors = Seq(("ivf", 60L), ("ivfpq", 50L), ("lsh", 35L),
          ("pq", 55L))
        val rows = floors.map { case (method, floorPct) =>
          val r = recallOf(method)
          println(f"[sim_recall_report] $method%-6s recall@5 = $r%.3f " +
            s"(floor ${floorPct / 100.0})")
          require(r * 100 >= floorPct,
            f"sim_recall_report: $method recall@5 $r%.3f fell below its " +
              s"${floorPct / 100.0} floor — a quality regression, not noise")
          (method, nQ, 5L, floorPct, 1L)
        }
        println(f"[sim_recall_report] ivfpq  recall@5 = ${recallOf("ivfpq6")}%.3f " +
          "(nProbe=6 curve probe, unrequired)")
        println(f"[sim_recall_report] pq     recall@5 = ${recallOf("pq16")}%.3f " +
          "(m=16 resolution curve probe, unrequired; committed m=8)")
        val rKnn = recallOf("knn")
        println(f"[sim_recall_report] knn    recall@5 = $rKnn%.3f (floor 0.5)")
        require(rKnn * 100 >= 50L,
          f"sim_recall_report: knn-join recall@5 $rKnn%.3f fell below its " +
            "0.5 floor — a quality regression, not noise")
        import s.implicits._
        (rows :+ (("knn", nQ, 5L, 50L, 1L)))
          .toDF("method", "n_queries", "k", "floor_pct", "floor_ok")
          .orderBy(col("method"))
          .localCheckpoint(true) // materialize before the index sweeps
      } finally rmTree(path)
    }),


    // ── ANN: IVF retrain + rebuild — the compaction analogue for the
    // frozen-quantizer contract sim_ivf_append documents: after appends
    // drift the distribution, the index is read back, a NEW coarse
    // quantizer is trained on a hash sample, and the rows are rewritten
    // under the new cell layout. The gate proves search parity on the
    // unchanged corpus: rebuilt-index search == one-shot in-memory
    // search with the retrained centroids (n_match: neighbor AND cosine
    // per rank), every cosine equal to the exact pairwise recompute
    // (n_valid).
    "sim_ivf_rebuild" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(pmod(col("vec_id"), lit(3L)) =!= 0)
      val delta = emb.filter(pmod(col("vec_id"), lit(3L)) === 0)
      val queries = emb.filter(col("vec_id") < 5)
      val c1 = Similarity.trainCentroids(base, k = 16, iters = 2,
        sampleRate = 0.5)
      val p1 = s"$shmRoot/graft-ivf-rb1-${System.nanoTime()}"
      val p2 = s"$shmRoot/graft-ivf-rb2-${System.nanoTime()}"
      try {
        Similarity.buildIvfIndex(base, c1, p1)
        Similarity.appendIvfIndex(delta, c1, p1)
        val c2 = Similarity.rebuildIvfIndex(s, p1, p2, k = 16, iters = 2,
          sampleRate = 0.5)
        val rebuilt = Similarity.ivfTopKIndexed(s, p2, queries, k = 5,
          c2, nProbe = 4)
        val one = Similarity.ivfTopK(emb, queries, k = 5, c2, nProbe = 4)
          .select(col("query_id"), col("rank"),
            col("neighbor_id").as("nbr1"), col("cos").as("cos1"))
        rebuilt
          .join(emb.select(col("vec_id").as("query_id"),
            col("embedding").as("qe")), "query_id")
          .join(emb.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("ne")), "neighbor_id")
          .withColumn("cos_exact",
            graft.functions.VectorFns.cosine(col("qe"), col("ne")))
          .join(one, Seq("query_id", "rank"))
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_results"),
            sum(when(col("neighbor_id") === col("nbr1") &&
              col("cos") === col("cos1"), 1L).otherwise(0L)).as("n_match"),
            sum(when(col("cos") === col("cos_exact"), 1L).otherwise(0L))
              .as("n_valid"))
          .orderBy(col("query_id"))
          .localCheckpoint(true) // materialize before the index sweeps
      } finally { rmTree(p1); rmTree(p2) }
    }),


    // ── ANN: incremental IVF index maintenance — a vector delta appends
    // into the persisted index by ASSIGNMENT ONLY (the at-rest corpus is
    // never read or rewritten; the coarse quantizer stays frozen), and
    // search over the appended index must return EXACTLY what a one-shot
    // build over base∪delta returns with the same centroids (n_match),
    // with every emitted cosine equal to the exact pairwise recompute
    // (n_valid) — the sim_topk_ivf anchoring pattern.
    "sim_ivf_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(pmod(col("vec_id"), lit(3L)) =!= 0)
      val delta = emb.filter(pmod(col("vec_id"), lit(3L)) === 0)
      val queries = emb.filter(col("vec_id") < 5)
      val centroids = Similarity.trainCentroids(base, k = 16, iters = 2,
        sampleRate = 0.5)
      val path = s"$shmRoot/graft-ivf-append-${System.nanoTime()}"
      try {
        Similarity.buildIvfIndex(base, centroids, path)
        Similarity.appendIvfIndex(delta, centroids, path)
        val inc = Similarity.ivfTopKIndexed(s, path, queries, k = 5,
          centroids, nProbe = 4)
        val one = Similarity.ivfTopK(emb, queries, k = 5, centroids,
          nProbe = 4)
          .select(col("query_id"), col("rank"),
            col("neighbor_id").as("nbr1"), col("cos").as("cos1"))
        inc
          .join(emb.select(col("vec_id").as("query_id"),
            col("embedding").as("qe")), "query_id")
          .join(emb.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("ne")), "neighbor_id")
          .withColumn("cos_exact",
            graft.functions.VectorFns.cosine(col("qe"), col("ne")))
          .join(one, Seq("query_id", "rank"))
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_results"),
            sum(when(col("neighbor_id") === col("nbr1") &&
              col("cos") === col("cos1"), 1L).otherwise(0L)).as("n_match"),
            sum(when(col("cos") === col("cos_exact"), 1L).otherwise(0L))
              .as("n_valid"))
          .orderBy(col("query_id"))
          .localCheckpoint(true) // materialize before the index sweeps
      } finally rmTree(path)
    }),


    // ── ANN: IVF-PQ incremental append (r13 verdict task 4) — the
    // composed index's ingest path: the delta PQ-encodes against the
    // FROZEN codebooks and coarse-assigns against the FROZEN centroids,
    // landing as new code files inside existing cell directories. The
    // gate pins the full invariant set: search over the appended index
    // == the in-memory one-shot twin over base∪delta with the same
    // quantizers per (query, rank) — neighbor AND cosine (n_match) —
    // every emitted cosine equal to the exact pairwise recompute
    // (n_valid), and the base index files BYTE-IDENTICAL after the
    // append (path+length snapshot, base_files_ok).
    "sim_ivfpq_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(pmod(col("vec_id"), lit(3L)) =!= 0)
      val delta = emb.filter(pmod(col("vec_id"), lit(3L)) === 0)
      val queries = emb.filter(col("vec_id") < 5)
      val centroids = Similarity.trainCentroids(base, k = 16, iters = 2,
        sampleRate = 0.5)
      val cb = Similarity.trainPqCodebooks(base, m = 8, k = 64, iters = 2,
        sampleRate = 0.5)
      val path = s"$shmRoot/graft-ivfpq-append-${System.nanoTime()}"
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
              .toSeq.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(path))
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.length()).toMap
      }
      try {
        Similarity.buildIvfPqIndex(base, centroids, cb, path)
        val baseFiles = files()
        Similarity.appendIvfPqIndex(delta, centroids, cb, path)
        val after = files()
        val baseOk = baseFiles.forall { case (p, n) =>
          after.get(p).contains(n) } && after.size > baseFiles.size
        val inc = Similarity.ivfPqTopKIndexed(s, path, emb, queries,
          k = 5, centroids, cb, nProbe = 4, shortlist = 50)
        val one = Similarity.ivfPqTopK(emb, queries, k = 5, centroids,
          cb, nProbe = 4, shortlist = 50)
          .select(col("query_id"), col("rank"),
            col("neighbor_id").as("nbr1"), col("cos").as("cos1"))
        inc
          .join(emb.select(col("vec_id").as("query_id"),
            col("embedding").as("qe")), "query_id")
          .join(emb.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("ne")), "neighbor_id")
          .withColumn("cos_exact",
            graft.functions.VectorFns.cosine(col("qe"), col("ne")))
          .join(one, Seq("query_id", "rank"))
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_results"),
            sum(when(col("neighbor_id") === col("nbr1") &&
              col("cos") === col("cos1"), 1L).otherwise(0L)).as("n_match"),
            sum(when(col("cos") === col("cos_exact"), 1L).otherwise(0L))
              .as("n_valid"))
          .withColumn("base_files_ok", lit(if (baseOk) 1L else 0L))
          .orderBy(col("query_id"))
          .localCheckpoint(true) // materialize before the index sweeps
      } finally rmTree(path)
    }),


    "sim_topk_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
      // quantizer trained on a deterministic half-sample — the scale path
      // (training cost follows the sample, not the corpus); the
      // containment/validity oracle below is identical either way
      val centroids = Similarity.trainCentroids(emb, k = 16, iters = 2,
        sampleRate = 0.5)
      val ivf = Similarity.ivfTopK(emb, queries, k = 5, centroids, nProbe = 4)
      val exact = ivf
        .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
        .withColumn("cos_exact",
          graft.functions.VectorFns.cosine(col("qe"), col("ne")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")
      val flagged = exact
        .withColumn("prev_cos", lag(col("cos"), 1).over(w))
        .withColumn("prev_nbr", lag(col("neighbor_id"), 1).over(w))
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (col("cos") === col("cos_exact") &&
            col("neighbor_id") =!= col("query_id")).as("valid"),
          (col("prev_cos").isNull || col("prev_cos") > col("cos") ||
            (col("prev_cos") === col("cos") &&
              col("prev_nbr") < col("neighbor_id"))).as("ordered"))
      queries.select(col("vec_id").as("query_id"))
        .join(flagged.groupBy("query_id").agg(
          count(lit(1)).as("n_results"),
          count_distinct(col("neighbor_id")).as("n_distinct"),
          count_distinct(when(col("rank").between(1, 5), col("rank"))).as("n_ranks"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("rank") > 1 && col("ordered"), 1L).otherwise(0L)).as("n_ordered")),
          Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_results"), lit(0L)).as("n_results"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          coalesce(col("n_ranks"), lit(0L)).as("n_ranks"),
          coalesce(col("n_valid"), lit(0L)).as("n_valid"),
          coalesce(col("n_ordered"), lit(0L)).as("n_ordered"))
        .orderBy(col("query_id"))
    }),


    // ── Similarity: exact kNN JOIN — top-k neighbors for EVERY row of a
    // query TABLE (two-corpus retrieval/linkage; neither side needs to
    // fit in a broadcast — Catalyst block-pairs the cross join above the
    // broadcast threshold). Full oracle: DuckDB ranks the same cross
    // product.
    "sim_knn_join" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnJoinExact(
        emb.filter(pmod(col("vec_id"), lit(10L)) === 3),
        emb.filter(pmod(col("vec_id"), lit(10L)) =!= 3), k = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos"), 4).as("cos_r"))
        .orderBy(col("query_id"), col("rank"))
    }),


    // ── Similarity: IVF kNN JOIN — the both-sides-large scale path (one
    // shuffle join on shared coarse cells; no corpus broadcast, no
    // cartesian — PlanSpec pins the shape). Same one-sided invariant
    // oracle as sim_topk_ivf (cells are data-learned) over the FULL query
    // table, plus a corpus-level recall floor vs the exact join so a
    // broken quantizer or probe path craters overlap and hash-fails.
    "sim_knn_join_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val left = emb.filter(pmod(col("vec_id"), lit(10L)) === 3)
      val right = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 3)
      val centroids = Similarity.trainCentroids(right, k = 16, iters = 2,
        sampleRate = 0.5)
      val knn = Similarity.knnJoinIvf(left, right, k = 3, centroids, nProbe = 4)
      val exact = knn
        .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
        .withColumn("cos_exact",
          graft.functions.VectorFns.cosine(col("qe"), col("ne")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")
      val flagged = exact
        .withColumn("prev_cos", lag(col("cos"), 1).over(w))
        .withColumn("prev_nbr", lag(col("neighbor_id"), 1).over(w))
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (col("cos") === col("cos_exact")).as("valid"),
          (col("prev_cos").isNull || col("prev_cos") > col("cos") ||
            (col("prev_cos") === col("cos") &&
              col("prev_nbr") < col("neighbor_id"))).as("ordered"))
      val perQuery = left.select(col("vec_id").as("query_id"))
        .join(flagged.groupBy("query_id").agg(
          count(lit(1)).as("n_results"),
          count_distinct(col("neighbor_id")).as("n_distinct"),
          count_distinct(when(col("rank").between(1, 3), col("rank"))).as("n_ranks"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("rank") > 1 && col("ordered"), 1L).otherwise(0L)).as("n_ordered")),
          Seq("query_id"), "left")
      val nQueries = left.count()
      val overlap = Similarity.knnJoinExact(left, right, k = 3)
        .select(col("query_id"), col("neighbor_id"))
        .join(knn.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .agg((count(lit(1)) >= lit(0.3 * 3 * nQueries)).cast("long")
          .as("recall_floor_ok"))
      perQuery.crossJoin(overlap)
        .select(col("query_id"),
          coalesce(col("n_results"), lit(0L)).as("n_results"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          coalesce(col("n_ranks"), lit(0L)).as("n_ranks"),
          coalesce(col("n_valid"), lit(0L)).as("n_valid"),
          coalesce(col("n_ordered"), lit(0L)).as("n_ordered"),
          col("recall_floor_ok"))
        .orderBy(col("query_id"))
    }),


    // ── Pipeline: RAG indexing/retrieval END-TO-END — context-window
    // chunking → hashing-trick featurization (portable md5 buckets, so
    // the "encoder" is exactly replayable) → top-k retrieval, all from
    // the engine's own pieces. Chunk vectors are exact integer counts,
    // so cosines are bit-portable; full oracle replays the whole path.
    "pipe_rag_topk" -> ((s, dir) => {
      val chunks = Chunking.chunk(Tables.documents(s, dir),
        window = 32, stride = 32).filter(col("n_toks") > 0)
      val emb = chunks.select(
        (col("doc_id") * 1000 + col("chunk_idx")).as("vec_id"),
        hashingTrickEmbed(tokensWs(col("chunk_text")), 16).as("embedding"))
      val queryIds = Seq(0L, 1000L, 2000L)
      Similarity.bruteForceTopK(
        emb.filter(!col("vec_id").isin(queryIds: _*)),
        emb.filter(col("vec_id").isin(queryIds: _*)), k = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos"), 4).as("cos_r"))
        .orderBy(col("query_id"), col("rank"))
    }),


    // ── Text: quality scoring — single-pass native profile expression
    // (graft_text_profile computes every metric in one tokenization; the
    // HOF formulation in TextFns is the semantically-identical slow twin)
    "text_quality" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          call_function("graft_text_profile", col("text")).as("p"))
        .select(
          col("doc_id"),
          col("p.n_tokens").as("n_tokens"),
          truncate6(col("p.mean_tok_len")).as("mean_tok_len"),
          truncate6(col("p.stopword_ratio")).as("stopword_ratio"),
          truncate6(col("p.quality")).as("quality"))
        .orderBy(col("doc_id"))),


    // ── Text: learned-model quality filtering — a linear classifier
    // (fastText-style, distilled to its linear layer) over the one-pass
    // profile features, folded into the scan as literals: zero shuffle,
    // no model server. Weights chosen so the kept arm splits the corpus
    // (~36% kept) with ≥1e-6 margin at the 0.5 threshold — ten orders
    // above cross-engine libm noise. Full oracle replays the formula.
    "text_quality_model" -> ((s, dir) => {
      val m = QualityModel(wTokens = 0.5, wMeanTokLen = 0.3,
        wStopword = 8.0, wPunct = -6.0, bias = -4.0)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          classifierScore(col("text"), m).as("s0"))
        .select(col("doc_id"), truncate6(col("s0")).as("score"),
          (col("s0") >= 0.5).cast("int").as("kept"))
        .orderBy(col("doc_id"))
    }),


    // ── Text: language ID heuristic vs labeled lang (native one-pass)
    "text_langid" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), call_function("graft_langid", col("text")).as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("ct"))
        .orderBy(col("lang"), col("pred"))),


    // ── Text: token counting (whitespace + regex pre-tokenizer)
    "text_token_count" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_ws"),
        size(tokensRe(col("text"))).as("n_re"),
        length(col("text")).as("n_chars_m"),
        col("n_chars"))
        .orderBy(col("doc_id"))),


    // ── Text: document fingerprint — portable rolling hash (md5-primitive
    // twin of the xxhash64 fast path), bit-for-bit oracle-checkable
    "text_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), fingerprintPortable(col("text")).as("fp"))
        .orderBy(col("doc_id"))),


    // ── Unicode NFC normalization (native `graft_nfc` expression, real
    // doGenCode): canonicalize at ingest so composed/decomposed encodings
    // fingerprint identically downstream. md5 of the normalized bytes is
    // the cross-engine witness (DuckDB nfc_normalize is the same UAX #15
    // form); already_nfc flags how much of the corpus the ASCII/early-exit
    // fast path covers.
    "text_normalize" -> ((s, dir) => {
      graft.expressions.GraftExtensions.ensureRegistered(s)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(call_function("graft_nfc", col("text")).cast("binary")).as("nfc_md5"),
          (call_function("graft_nfc", col("text")) === col("text")).as("already_nfc"))
        .orderBy(col("doc_id"))
    }),


    // ── Multimodal: frame sampling over sequence media. The offsets array
    // is flattened to scalars + csv — the gate's comparator hashes scalar
    // cells, and the csv keeps the full array contents under check.
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(
        Multimodal.attachBinary(Tables.documents(s, dir)), stride = 16)
        .select(col("doc_id"),
          size(col("frame_offsets")).cast("long").as("n_frames"),
          element_at(col("frame_offsets"), -1).cast("long").as("last_offset"),
          array_join(transform(col("frame_offsets"), _.cast("string")), ",")
            .as("offsets_csv"))
        .orderBy(col("doc_id"))),


    // ── Multimodal: binary payload + typed metadata
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.attachBinary(Tables.documents(s, dir))
        .select(col("doc_id"), col("kind"),
          col("meta.n_bytes").as("n_bytes"), col("meta.codec").as("codec"))
        .orderBy(col("doc_id"))),


    // ── Multimodal: stubbed resize/downsample (binary in -> smaller
    // binary out, metadata updated; per-partition batch shape)
    "mm_resize" -> ((s, dir) =>
      Multimodal.resize(
        Multimodal.attachBinary(Tables.documents(s, dir)), factor = 4)
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes_out"))
        .orderBy(col("doc_id"))),


    // ── Multimodal with a REAL codec in the loop: per-doc PNG fixture
    // (deterministic dims + pixels from doc_id) → ImageIO decode →
    // nearest-neighbor downscale → PNG encode → re-decode and compare
    // every pixel to the formula. mismatches=0 is only reachable if the
    // full decode→scale→encode round trip is lossless; the oracle
    // recomputes the expected output dims from doc_id in SQL.
    "mm_resize_png" -> ((s, dir) => {
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).filter(col("doc_id") < 200)
      Multimodal.validatePngResize(
          Multimodal.resizePng(Multimodal.pngMedia(ids), factor = 2),
          factor = 2)
        .orderBy(col("doc_id"))
    }),


    // ── Multimodal: perceptual average-hash over the REAL PNG codec path
    // — decode → 8×8 nearest-neighbor sample → integer luma → threshold
    // at the mean → 64-bit pack. The fixture pixels are a pure function
    // of doc_id, so the oracle recomputes the ENTIRE hash in SQL; a
    // single bit of drift anywhere in decode/sample/luma/pack mismatches.
    "mm_phash" -> ((s, dir) => {
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).filter(col("doc_id") % 11 === 0)
      Multimodal.aHash(Multimodal.pngMedia(ids)).orderBy(col("doc_id"))
    }),


    // ── Multimodal × dedup: near-duplicate IMAGE detection — aHash over
    // a twin fixture (each base image + a copy with the blue LSB of one
    // pixel flipped: a sub-quantum perturbation), then banded-Hamming
    // pairs (complete for hamming <= 3). The oracle recomputes both
    // hashes per id and the exhaustive pairwise popcount truth.
    "mm_phash_neardup" -> ((s, dir) => {
      val ids = Tables.documents(s, dir)
        .select(col("doc_id")).filter(col("doc_id") % 23 === 0)
      Dedup.hammingPairs64(
        Multimodal.aHash(Multimodal.pngMediaTwins(ids, 1000000L)),
        "doc_id", "phash", maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),


    // ── Multimodal: stubbed per-partition feature extraction. Scalar
    // projections of the feature vector (dim; sum == payload byte count by
    // construction of the histogram stub) make the stage oracle-checkable.
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.attachBinary(Tables.documents(s, dir)))
        .select(col("doc_id"),
          size(col("feature")).cast("long").as("feature_dim"),
          aggregate(col("feature"), lit(0.0), (a, x) => a + x).cast("long")
            .as("feature_sum"))
        .orderBy(col("doc_id")))
  )

  /** DuckDB oracle SQL, column-name-aligned with `queries`. */
  /** Generated oracle for the batched BPE gates. One block per round:
    * pair counts → ranked `window`-candidate list → GREEDY triple-disjoint
    * selection (recursive CTE keyed on candidate rank, the t5_rate_limit
    * fold-replay pattern) → one-pass multi-rule merge fold. Every chained
    * CTE is MATERIALIZED: DuckDB inlines CTEs by default, and the
    * recursion would otherwise re-derive the whole upstream round chain
    * per iteration (measured: the un-hinted form does not terminate at
    * sf0.001; hinted, 0.3 s). */
  /** The default induction unit: whitespace words (tokensWs replay). */
  private val bpeWordUnitsSql: String =
    """SELECT unnest(list_filter(
      |      string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS word
      |    FROM documents""".stripMargin

  /** Sequence units for the large-merge tier: fixed 128-char document
    * chunks (1-based char slicing, truncating tail — the exact replay of
    * Spark's substr(i, 128) over sequence(1, len, 128)); empty chunks
    * filtered like the engine side. */
  private val bpeChunkUnitsSql: String =
    """SELECT unnest([text[i:i+127] for i in range(1, length(text)+1, 128)]) AS word
      |    FROM documents WHERE length(text) > 0""".stripMargin

  private def bpeBatchSql(batches: Int, batchSize: Int, window: Int,
      encodeTail: Boolean, unitsSql: String = bpeWordUnitsSql): String = {
    def block(r: Int): String = {
      val prev = s"s${r - 1}"
      // selfm$r: run-aware greedy-mergeable counts for SELF-pairs via
      // gaps-and-islands (i - row_number per (word, sym) groups
      // consecutive positions into runs; a run of length L greedily
      // merges L // 2 pairs) — the exact replay of the engine's RLE
      // mct. Distinct pairs cannot self-overlap: mct = ct.
      s"""p$r AS MATERIALIZED (SELECT syms[i] AS a, syms[i+1] AS b,
         |    CAST(SUM(wct) AS BIGINT) AS ct
         |  FROM $prev, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
         |selfm$r AS MATERIALIZED (
         |  SELECT sym, CAST(SUM(wct * (rl // 2)) AS BIGINT) AS smct FROM (
         |    SELECT word, ANY_VALUE(wct) AS wct, sym, island,
         |      COUNT(*) AS rl FROM (
         |      SELECT word, wct, syms[i] AS sym,
         |        i - row_number() OVER (PARTITION BY word, syms[i]
         |          ORDER BY i) AS island
         |      FROM $prev, UNNEST(range(1, len(syms)+1)) AS u(i))
         |    GROUP BY word, sym, island)
         |  WHERE rl >= 2 GROUP BY sym),
         |c$r AS MATERIALIZED (SELECT a, b, ct,
         |    CASE WHEN a = b THEN coalesce(sm.smct, 0) ELSE ct END AS mct,
         |    row_number() OVER (ORDER BY ct DESC, a, b) AS rk
         |  FROM (SELECT a, b, ct FROM p$r
         |    ORDER BY ct DESC, a, b LIMIT $window) q
         |  LEFT JOIN selfm$r sm ON q.a = q.b AND sm.sym = q.a),
         |g$r AS (
         |  SELECT 0 AS rk,
         |    CAST([] AS STRUCT(a VARCHAR, b VARCHAR, ct BIGINT,
         |      mct BIGINT)[]) AS sel
         |  UNION ALL
         |  SELECT c.rk,
         |    CASE WHEN len(g.sel) >= $batchSize OR list_has_any(
         |        [c.a, c.b, c.a || c.b],
         |        flatten(list_transform(g.sel, s -> [s.a, s.b, s.a || s.b])))
         |      THEN g.sel
         |      ELSE list_append(g.sel,
         |        {'a': c.a, 'b': c.b, 'ct': c.ct, 'mct': c.mct}) END
         |  FROM g$r g JOIN c$r c ON c.rk = g.rk + 1),
         |sel$r AS MATERIALIZED (SELECT sel FROM g$r ORDER BY rk DESC LIMIT 1),
         |s$r AS MATERIALIZED (SELECT word, wct,
         |    CASE WHEN len(syms) <= 1 THEN syms
         |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
         |      WHEN len(list_filter(sel$r.sel,
         |        m -> ends_with('|'||acc, '|'||m.a) AND x = m.b)) > 0
         |      THEN acc||x ELSE acc||'|'||x END), '|') END AS syms
         |  FROM $prev CROSS JOIN sel$r)""".stripMargin
    }
    val header =
      s"""WITH RECURSIVE v0 AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wct FROM (
         |    $unitsSql)
         |  WHERE word <> '' GROUP BY word),
         |s0 AS MATERIALIZED (SELECT word, wct,
         |    CASE WHEN contains(word, '|')
         |      THEN error('bpe fold oracle: pipe-bearing corpus word "' || word
         |        || '" would diverge from the engine under the |-fold replay')
         |    ELSE list_transform(range(1, length(word)+1),
         |      i -> substr(word, i, 1)) END AS syms FROM v0),
         |n0 AS MATERIALIZED (SELECT CAST(SUM(wct*len(syms)) AS BIGINT) AS total FROM s0),
         |""".stripMargin
    val blocks = (1 to batches).map(block).mkString(",\n")
    if (!encodeTail) {
      // the ledger's ct is the GREEDY-MERGEABLE count (mct) — the
      // symbols the fold actually removes, which is what syms_after
      // telescopes by (= naive ct for every non-self pair)
      val unions = (1 to batches).map(r =>
        s"""SELECT $r AS batch, u.i AS pos, sel[u.i].a AS lhs,
           |    sel[u.i].b AS rhs, sel[u.i].mct AS ct
           |  FROM sel$r, UNNEST(range(1, len(sel)+1)) AS u(i)""".stripMargin)
        .mkString("\n  UNION ALL ")
      header + blocks + s""",
        |mrows AS ($unions),
        |ord AS (SELECT *, row_number() OVER (ORDER BY batch, pos) AS merge_idx
        |  FROM mrows)
        |SELECT merge_idx, CAST(batch AS BIGINT) AS batch, lhs, rhs,
        |  CAST(ct AS BIGINT) AS ct,
        |  CAST(n0.total - SUM(ct) OVER (ORDER BY merge_idx) AS BIGINT) AS syms_after
        |FROM ord, n0 ORDER BY merge_idx""".stripMargin
    } else {
      val last = s"s$batches"
      header + blocks + s""",
        |t AS (SELECT doc_id, list_filter(
        |    string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |w AS (SELECT doc_id, toks[u.i] AS pos_word, u.i AS pos FROM t,
        |  UNNEST(range(1, len(toks)+1)) AS u(i)),
        |enc AS (SELECT w.doc_id, CAST(SUM(len($last.syms)) AS BIGINT) AS n_bpe,
        |    array_to_string(flatten(list($last.syms ORDER BY w.pos))[1:3], ' ') AS head
        |  FROM w JOIN $last ON w.pos_word = $last.word GROUP BY w.doc_id)
        |SELECT d.doc_id, COALESCE(enc.n_bpe, 0) AS n_bpe,
        |  COALESCE(enc.head, '') AS head
        |FROM documents d LEFT JOIN enc ON d.doc_id = enc.doc_id
        |ORDER BY d.doc_id""".stripMargin
    }
  }

  /** Replay of likelihood-scored WordPiece training: per round — naive
    * adjacent-pair counts, per-symbol occurrence counts, the scored
    * argmax (one IEEE double division of exact sub-2^53 longs —
    * bit-identical across engines; ties on (a, b)), the greedy
    * pipe-fold application (the no-'|'-in-corpus precondition is
    * ASSERTED in s0 via error(), as in every BPE fold oracle — a
    * pipe-bearing corpus fails loudly, never hash-mismatches), and the
    * measured symbol total. */
  private def wordPieceTrainSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"s${r - 1}"
      s"""p$r AS (SELECT syms[i] AS a, syms[i+1] AS b,
         |    CAST(SUM(wct) AS BIGINT) AS ct
         |  FROM $prev, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
         |c$r AS (SELECT s AS sym, CAST(SUM(wct) AS BIGINT) AS c
         |  FROM (SELECT wct, unnest(syms) AS s FROM $prev) GROUP BY 1),
         |b$r AS MATERIALIZED (SELECT p.a, p.b, p.ct,
         |    CAST(p.ct AS DOUBLE) /
         |      (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS score
         |  FROM p$r p
         |  JOIN c$r ca ON ca.sym = p.a
         |  JOIN c$r cb ON cb.sym = p.b
         |  ORDER BY score DESC, p.a, p.b LIMIT 1),
         |s$r AS MATERIALIZED (SELECT word, wct,
         |    CASE WHEN len(syms) <= 1 THEN syms
         |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
         |      WHEN ends_with('|'||acc, '|'||b$r.a) AND x = b$r.b THEN acc||x
         |      ELSE acc||'|'||x END), '|') END AS syms
         |  FROM $prev CROSS JOIN b$r),
         |l$r AS (SELECT CAST($r AS BIGINT) AS round, a AS lhs, b AS rhs,
         |    ct, floor(score * 1000000)/1000000 AS score,
         |    (SELECT CAST(SUM(wct*len(syms)) AS BIGINT) FROM s$r)
         |      AS syms_after
         |  FROM b$r)""".stripMargin
    }.mkString(",\n")
    val union = (1 to rounds).map(r => s"SELECT * FROM l$r")
      .mkString("\nUNION ALL ")
    s"""WITH v0 AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wct FROM (
       |    SELECT unnest(list_filter(
       |      string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))
       |      AS word
       |    FROM documents)
       |  GROUP BY word),
       |s0 AS MATERIALIZED (SELECT word, wct,
       |    CASE WHEN contains(word, '|')
       |      THEN error('wordpiece fold oracle: pipe-bearing corpus word "'
       |        || word || '" would diverge under the |-fold replay')
       |    ELSE list_transform(range(1, length(word)+1),
       |      i -> substr(word, i, 1)) END AS syms FROM v0),
       |$roundCtes
       |$union
       |ORDER BY round""".stripMargin
  }

  /** Generated oracle for the BATCHED likelihood-scored WordPiece
    * training gate — bpeBatchSql's per-round machinery (run-aware
    * self-pair mct via gaps-and-islands, recursive greedy triple-disjoint
    * selection, one-pass multi-rule fold) with the scored argmax: every
    * candidate pair joins the round's per-symbol counts and ranks by
    * `ct / (ct_a · ct_b)` — each exact long cast to double, one IEEE
    * multiply, one IEEE divide, bit-identical to the engine; ties on
    * (a, b). The window LIMIT therefore happens AFTER scoring (unlike
    * the frequency oracle, where top-ct and top-score coincide). Ledger
    * telescopes by the greedy-mergeable count `mct`; score is
    * truncate6'd. Units: the depth tiers' 128-char chunks. */
  private def wordPieceBatchSql(batches: Int, batchSize: Int,
      window: Int): String = {
    def block(r: Int): String = {
      val prev = s"s${r - 1}"
      s"""p$r AS MATERIALIZED (SELECT syms[i] AS a, syms[i+1] AS b,
         |    CAST(SUM(wct) AS BIGINT) AS ct
         |  FROM $prev, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
         |selfm$r AS MATERIALIZED (
         |  SELECT sym, CAST(SUM(wct * (rl // 2)) AS BIGINT) AS smct FROM (
         |    SELECT word, ANY_VALUE(wct) AS wct, sym, island,
         |      COUNT(*) AS rl FROM (
         |      SELECT word, wct, syms[i] AS sym,
         |        i - row_number() OVER (PARTITION BY word, syms[i]
         |          ORDER BY i) AS island
         |      FROM $prev, UNNEST(range(1, len(syms)+1)) AS u(i))
         |    GROUP BY word, sym, island)
         |  WHERE rl >= 2 GROUP BY sym),
         |y$r AS MATERIALIZED (SELECT s AS sym, CAST(SUM(wct) AS BIGINT) AS c
         |  FROM (SELECT wct, unnest(syms) AS s FROM $prev) GROUP BY 1),
         |c$r AS MATERIALIZED (SELECT a, b, ct, mct, score,
         |    row_number() OVER (ORDER BY score DESC, a, b) AS rk
         |  FROM (SELECT q.a, q.b, q.ct,
         |      CASE WHEN q.a = q.b THEN coalesce(sm.smct, 0) ELSE q.ct END
         |        AS mct,
         |      CAST(q.ct AS DOUBLE) /
         |        (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS score
         |    FROM p$r q
         |    JOIN y$r ca ON ca.sym = q.a
         |    JOIN y$r cb ON cb.sym = q.b
         |    LEFT JOIN selfm$r sm ON q.a = q.b AND sm.sym = q.a)
         |  ORDER BY score DESC, a, b LIMIT $window),
         |g$r AS (
         |  SELECT 0 AS rk,
         |    CAST([] AS STRUCT(a VARCHAR, b VARCHAR, mct BIGINT,
         |      score DOUBLE)[]) AS sel
         |  UNION ALL
         |  SELECT c.rk,
         |    CASE WHEN len(g.sel) >= $batchSize OR list_has_any(
         |        [c.a, c.b, c.a || c.b],
         |        flatten(list_transform(g.sel, s -> [s.a, s.b, s.a || s.b])))
         |      THEN g.sel
         |      ELSE list_append(g.sel,
         |        {'a': c.a, 'b': c.b, 'mct': c.mct, 'score': c.score}) END
         |  FROM g$r g JOIN c$r c ON c.rk = g.rk + 1),
         |sel$r AS MATERIALIZED (SELECT sel FROM g$r ORDER BY rk DESC LIMIT 1),
         |s$r AS MATERIALIZED (SELECT word, wct,
         |    CASE WHEN len(syms) <= 1 THEN syms
         |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
         |      WHEN len(list_filter(sel$r.sel,
         |        m -> ends_with('|'||acc, '|'||m.a) AND x = m.b)) > 0
         |      THEN acc||x ELSE acc||'|'||x END), '|') END AS syms
         |  FROM $prev CROSS JOIN sel$r)""".stripMargin
    }
    val header =
      s"""WITH RECURSIVE v0 AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wct FROM (
         |    $bpeChunkUnitsSql)
         |  WHERE word <> '' GROUP BY word),
         |s0 AS MATERIALIZED (SELECT word, wct,
         |    CASE WHEN contains(word, '|')
         |      THEN error('wordpiece fold oracle: pipe-bearing corpus word "'
         |        || word || '" would diverge under the |-fold replay')
         |    ELSE list_transform(range(1, length(word)+1),
         |      i -> substr(word, i, 1)) END AS syms FROM v0),
         |n0 AS MATERIALIZED (SELECT CAST(SUM(wct*len(syms)) AS BIGINT)
         |  AS total FROM s0),
         |""".stripMargin
    val blocks = (1 to batches).map(block).mkString(",\n")
    val unions = (1 to batches).map(r =>
      s"""SELECT $r AS batch, u.i AS pos, sel[u.i].a AS lhs,
         |    sel[u.i].b AS rhs, sel[u.i].mct AS ct, sel[u.i].score AS score
         |  FROM sel$r, UNNEST(range(1, len(sel)+1)) AS u(i)""".stripMargin)
      .mkString("\nUNION ALL\n")
    header + blocks + s""",
      |mrows AS ($unions),
      |ord AS (SELECT *, row_number() OVER (ORDER BY batch, pos) AS merge_idx
      |  FROM mrows)
      |SELECT merge_idx, CAST(batch AS BIGINT) AS batch, lhs, rhs,
      |  CAST(ct AS BIGINT) AS ct,
      |  floor(score * 1000000)/1000000 AS score,
      |  CAST(n0.total - SUM(ct) OVER (ORDER BY merge_idx) AS BIGINT)
      |    AS syms_after
      |FROM ord, n0 ORDER BY merge_idx""".stripMargin
  }

  /** Replay of the WordPiece gate: re-derive the top-`k` ##-convention
    * vocabulary from the same chunk units, then run the greedy
    * longest-match walk as `steps` chained extraction steps — each step
    * pulls the longest vocab piece prefixing the remainder (max_by over
    * an equality probe `raw = substr(rem, 1, rawlen)`; (raw, form) is
    * unique in the vocab so there are no length ties), emits [UNK] and
    * advances one char when nothing matches, and a remainder surviving
    * all steps fails loudly via error(). The '#'-free corpus
    * precondition is guarded in the unit CTE (a literal '##' would
    * alias raw and continuation piece keys — same loud-guard pattern as
    * the byte-fallback pipe check). */
  /** Replay of the unigram-LM Viterbi encode: the SAME closed-form
    * vocabulary derivation (positionless top-k + the alphabet floor),
    * exact probabilities (one BIGINT-to-DOUBLE division), then the
    * lattice as `chunk` chained DP steps — per position one
    * (score DESC, start ASC) window argmax over the ≤maxPieceLen
    * predecessors, scores carried as DOUBLE lists (every multiply is
    * correctly rounded in the same order as the kernel, so the argmax
    * is bit-identical) — and a recursive backtrace from each unit's
    * final position. Every dp CTE is MATERIALIZED: each is referenced
    * twice (carry + candidates), which would otherwise inline
    * exponentially across 24 levels. */
  /** The shared lattice replay of one Viterbi pass: `chunk` chained
    * MATERIALIZED DP CTEs named `$dp1..$dp$chunk` (carry + candidates
    * reference each level twice — inlining would go exponential across
    * 24 levels) reading piece probabilities from `$vp`, then the loud
    * unreachability check `${dp}chk` and the recursive backtrace
    * `${dp}bt` ending in `${dp}fin` (unit, wct, segl list, seg string).
    * `$dp0` (dp seed over `u`) must exist; `bt` CTEs are recursive, so
    * the enclosing WITH must be RECURSIVE. */
  private def unigramDpChain(dp: String, vp: String, chunk: Int,
      maxPieceLen: Int): String = {
    val stepCtes = (1 to chunk).map { i =>
      s"""$dp$i AS MATERIALIZED (
         |  SELECT d.unit, d.wct,
         |    list_append(d.dps, COALESCE(b.s, CAST(-1 AS DOUBLE))) AS dps,
         |    list_append(d.bks, COALESCE(b.j, -1)) AS bks
         |  FROM $dp${i - 1} d LEFT JOIN (
         |    SELECT unit, s, j FROM (
         |      SELECT unit, sc AS s, j, row_number() OVER (
         |          PARTITION BY unit ORDER BY sc DESC, j ASC) AS rn
         |      FROM (
         |        SELECT d.unit, jj.j AS j, d.dps[jj.j+1] * $vp.p AS sc
         |        FROM $dp${i - 1} d,
         |          UNNEST(range(greatest(0, $i - $maxPieceLen), $i))
         |            AS jj(j), $vp
         |        WHERE length(d.unit) >= $i AND d.dps[jj.j+1] >= 0
         |          AND $vp.piece = substr(d.unit, jj.j+1, $i - jj.j)))
         |    WHERE rn = 1) b USING (unit))""".stripMargin
    }.mkString(",\n")
    s"""$stepCtes,
       |${dp}chk AS MATERIALIZED (SELECT unit, wct, bks,
       |    CASE WHEN dps[length(unit)+1] < 0
       |      THEN error('unigram oracle: unreachable unit ' || unit)
       |      ELSE 1 END AS ok
       |  FROM $dp$chunk),
       |${dp}bt AS (
       |  SELECT unit, wct, CAST(length(unit) AS INT) AS pos,
       |    CAST([] AS VARCHAR[]) AS segr
       |  FROM ${dp}chk
       |  UNION ALL
       |  SELECT b.unit, b.wct, d.bks[b.pos+1] AS pos,
       |    list_append(b.segr,
       |      substr(b.unit, d.bks[b.pos+1]+1, b.pos - d.bks[b.pos+1]))
       |      AS segr
       |  FROM ${dp}bt b JOIN ${dp}chk d ON b.unit = d.unit
       |  WHERE b.pos > 0),
       |${dp}fin AS MATERIALIZED (SELECT unit, wct,
       |  list_reverse(segr) AS segl,
       |  array_to_string(list_reverse(segr), ' ') AS seg
       |  FROM ${dp}bt WHERE pos = 0)""".stripMargin
  }

  /** The shared closed-form vocabulary derivation: 24-char chunk units
    * `u` (unit, wct), positionless n-gram counts `pg`, `topk`, and the
    * alphabet-floored seed `v1`. */
  private def unigramSeedSql(chunk: Int, k: Int, maxPieceLen: Int): String =
    s"""u0 AS (
       |  SELECT unnest(list_transform(
       |      range(1, length(text)+1, $chunk),
       |      i -> substr(text, i, $chunk))) AS unit
       |  FROM documents WHERE length(text) > 0),
       |u AS MATERIALIZED (SELECT unit, CAST(COUNT(*) AS BIGINT) AS wct
       |  FROM u0 GROUP BY unit),
       |pg AS MATERIALIZED (
       |  SELECT substr(unit, p, n) AS piece, CAST(SUM(wct) AS BIGINT) AS ct
       |  FROM u,
       |    UNNEST(range(1, length(unit)+1)) AS up(p),
       |    UNNEST(range(1, least($maxPieceLen, length(unit) - p + 1) + 1))
       |      AS un(n)
       |  GROUP BY 1),
       |topk AS MATERIALIZED (
       |  SELECT piece, ct FROM pg ORDER BY ct DESC, piece LIMIT $k),
       |v1 AS (SELECT piece, ct FROM topk
       |  UNION ALL
       |  SELECT piece, ct FROM pg
       |  WHERE length(piece) = 1
       |    AND piece NOT IN (SELECT piece FROM topk))""".stripMargin

  private def unigramSql(chunk: Int, k: Int, maxPieceLen: Int): String = {
    s"""WITH RECURSIVE ${unigramSeedSql(chunk, k, maxPieceLen)},
       |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS total FROM v1),
       |vp AS MATERIALIZED (SELECT piece,
       |  CAST(ct AS DOUBLE) / CAST(total AS DOUBLE) AS p FROM v1, tot),
       |dp0 AS (SELECT unit, wct, [CAST(1.0 AS DOUBLE)] AS dps,
       |  [0] AS bks FROM u),
       |${unigramDpChain("dp", "vp", chunk, maxPieceLen)}
       |SELECT CAST(len(segl) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS units,
       |  CAST(SUM(wct) AS BIGINT) AS occurrences,
       |  CAST(SUM(length(seg)) AS BIGINT) AS seg_chars_sum,
       |  MIN(seg) AS seg_min, MAX(seg) AS seg_max
       |FROM dpfin GROUP BY 1 ORDER BY n_tokens""".stripMargin
  }

  /** Replay of the hard-EM trainer: the seed derivation, then per round
    * one full lattice pass (the shared DP chain against that round's
    * probabilities) and the recount `v{r+1}` from the segmentations;
    * the ledger unions one row per round, with total_ct and
    * corpus_tokens computed from recount and segmentation lengths
    * INDEPENDENTLY (token conservation is a pinned equality, as in the
    * engine). */
  private def unigramTrainSql(chunk: Int, k: Int, maxPieceLen: Int,
      rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""vpr$r AS MATERIALIZED (SELECT piece,
         |  CAST(ct AS DOUBLE) / CAST(total AS DOUBLE) AS p
         |  FROM v$r, (SELECT CAST(SUM(ct) AS BIGINT) AS total FROM v$r)),
         |dpr${r}_0 AS (SELECT unit, wct, [CAST(1.0 AS DOUBLE)] AS dps,
         |  [0] AS bks FROM u),
         |${unigramDpChain(s"dpr${r}_", s"vpr$r", chunk, maxPieceLen)},
         |v${r + 1} AS MATERIALIZED (
         |  SELECT t.piece, CAST(SUM(wct) AS BIGINT) AS ct
         |  FROM dpr${r}_fin, UNNEST(dpr${r}_fin.segl) AS t(piece)
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val leds = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v${r + 1}) AS n_pieces,
         |  (SELECT CAST(SUM(ct) AS BIGINT) FROM v${r + 1}) AS total_ct,
         |  CAST(SUM(wct * len(segl)) AS BIGINT) AS corpus_tokens,
         |  MIN(seg) AS seg_min, MAX(seg) AS seg_max
         |FROM dpr${r}_fin""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE ${unigramSeedSql(chunk, k, maxPieceLen)},
       |$roundCtes
       |SELECT * FROM (
       |$leds
       |) ORDER BY round""".stripMargin
  }


  private def wordPieceSql(steps: Int, k: Int, maxPieceLen: Int,
      chunk: Int): String = {
    val stepCtes = (1 to steps).map { i =>
      s"""e$i AS (
         |  SELECT unit, wct,
         |    CASE WHEN rem = '' THEN toks
         |         WHEN hit IS NULL THEN list_append(toks, '[UNK]')
         |         ELSE list_append(toks, hit) END AS toks,
         |    CASE WHEN rem = '' THEN ''
         |         WHEN hit IS NULL THEN substr(rem, 2)
         |         ELSE substr(rem, length(hit) -
         |           (CASE WHEN hit LIKE '##%' THEN 2 ELSE 0 END) + 1)
         |         END AS rem,
         |    FALSE AS is_start
         |  FROM (SELECT e.*, (SELECT max_by(v.piece, v.rawlen) FROM v
         |      WHERE v.is_init = e.is_start
         |        AND v.raw = substr(e.rem, 1, v.rawlen)) AS hit
         |    FROM e${i - 1} e))""".stripMargin
    }.mkString(",\n")
    s"""WITH u0 AS (
       |  SELECT CASE WHEN unit LIKE '%#%'
       |      THEN error('wordpiece oracle: #-bearing unit ' || unit)
       |      ELSE unit END AS unit
       |  FROM (SELECT unnest(list_transform(
       |      range(1, length(text)+1, $chunk),
       |      i -> substr(text, i, $chunk))) AS unit
       |    FROM documents WHERE length(text) > 0)),
       |u AS (SELECT unit, CAST(COUNT(*) AS BIGINT) AS wct
       |  FROM u0 GROUP BY unit),
       |pg AS (
       |  SELECT CASE WHEN p = 1 THEN substr(unit, p, n)
       |      ELSE '##' || substr(unit, p, n) END AS piece,
       |    CAST(SUM(wct) AS BIGINT) AS ct
       |  FROM u,
       |    UNNEST(range(1, length(unit)+1)) AS up(p),
       |    UNNEST(range(1, least($maxPieceLen, length(unit) - p + 1) + 1))
       |      AS un(n)
       |  GROUP BY 1),
       |v AS (
       |  SELECT piece,
       |    CASE WHEN piece LIKE '##%' THEN substr(piece, 3)
       |         ELSE piece END AS raw,
       |    CASE WHEN piece LIKE '##%' THEN length(piece) - 2
       |         ELSE length(piece) END AS rawlen,
       |    (piece NOT LIKE '##%') AS is_init
       |  FROM (SELECT piece FROM pg ORDER BY ct DESC, piece LIMIT $k)),
       |e0 AS (SELECT unit, wct, unit AS rem,
       |  CAST([] AS VARCHAR[]) AS toks, TRUE AS is_start FROM u),
       |$stepCtes,
       |fin AS (SELECT unit, wct,
       |    CASE WHEN rem <> ''
       |      THEN error('wordpiece oracle: unfinished unit ' || unit)
       |      ELSE toks END AS toks
       |  FROM e$steps)
       |SELECT CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS units,
       |  CAST(SUM(wct) AS BIGINT) AS occurrences,
       |  CAST(SUM(CASE WHEN list_contains(toks, '[UNK]') THEN 1 ELSE 0 END)
       |    AS BIGINT) AS unk_units,
       |  CAST(SUM(length(array_to_string(toks, ' '))) AS BIGINT)
       |    AS tok_chars_sum,
       |  MIN(unit) AS unit_min, MAX(unit) AS unit_max
       |FROM fin GROUP BY 1 ORDER BY n_tokens""".stripMargin
  }

  /** Replay of the byte-fallback encode tier: special-token bypass,
    * per-code-point ASCII test with UTF-8 byte expansion (hex(encode())
    * split into <0xAB> tokens — DuckDB slices strings by code point, the
    * engine iterates code points, so the two sides see identical
    * symbols), then the fixed rule chain applied sequentially with the
    * same pipe-fold greedy scan as every BPE oracle (specials bypass the
    * fold as single-symbol arrays, so their '|' never enters it). */
  private def byteEncodeSql(rules: Seq[(String, String)]): String = {
    val folds = rules.zipWithIndex.map { case ((lhs, rhs), i) =>
      val r = i + 1
      s"""s$r AS (SELECT word, CASE WHEN len(syms) <= 1 THEN syms
         |  ELSE string_split(list_reduce(syms, (acc, x) -> CASE
         |    WHEN ends_with('|'||acc, '|$lhs') AND x = '$rhs' THEN acc||x
         |    ELSE acc||'|'||x END), '|') END AS syms
         |  FROM s${r - 1})""".stripMargin
    }.mkString(",\n")
    val last = s"s${rules.size}"
    s"""WITH docs2 AS (SELECT doc_id,
       |    text || ' <|doc|> mix' ||
       |      (['中','文','→','é','ß','λ','ツ','☃'])[CAST(doc_id % 8 AS INT) + 1]
       |      AS text
       |  FROM documents),
       |t AS (SELECT doc_id, list_filter(
       |    string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
       |  FROM docs2),
       |w AS (SELECT doc_id, toks[u.i] AS word, u.i AS pos FROM t,
       |  UNNEST(range(1, len(toks)+1)) AS u(i)),
       |v AS (SELECT DISTINCT word FROM w),
       |s0 AS (SELECT word, CASE WHEN word = '<|doc|>' THEN [word]
       |    WHEN contains(word, '|')
       |      THEN error('byteEncodeSql: pipe-bearing corpus word "' || word
       |        || '" would diverge from the engine under the |-fold replay')
       |    ELSE flatten([CASE WHEN ascii(c) < 128 THEN [c]
       |      ELSE ['<0x' || substr(hex(encode(c)), b, 2) || '>'
       |            for b in range(1, length(hex(encode(c))), 2)] END
       |      for c in [word[i] for i in range(1, length(word)+1)]])
       |    END AS syms FROM v),
       |$folds,
       |enc AS (SELECT w.doc_id, CAST(SUM(len($last.syms)) AS BIGINT) AS n_bpe,
       |    array_to_string(flatten(list($last.syms ORDER BY w.pos))[1:3], ' ')
       |      AS head,
       |    array_to_string(flatten(list($last.syms ORDER BY w.pos))[-4:], ' ')
       |      AS tail4
       |  FROM w JOIN $last ON w.word = $last.word GROUP BY w.doc_id)
       |SELECT d.doc_id, COALESCE(enc.n_bpe, 0) AS n_bpe,
       |  COALESCE(enc.head, '') AS head, COALESCE(enc.tail4, '') AS tail4
       |FROM documents d LEFT JOIN enc ON d.doc_id = enc.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // shared by dedup_incremental and dedup_index_atrest (the at-rest
  // index round-trip must not move the candidate set or any jaccard)
  private val dedupIncrementalSql: String =
    s"""WITH perms(i, a, b) AS (VALUES ${permValuesSql(64)}),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS s
        |  FROM toks),
        |hv AS (SELECT doc_id, CAST(md5_number_lower(sv) % 2147483647 AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(s) AS sv FROM sh)),
        |mh AS (SELECT doc_id, p.i AS i,
        |    MIN((CAST(p.a AS BIGINT) * hv.h + p.b) % 2147483647) AS m
        |  FROM hv CROSS JOIN perms p GROUP BY doc_id, p.i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS key
        |  FROM mh GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
        |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
        |p2 AS (SELECT c.doc_a, c.doc_b, len(list_intersect(sa.s, sb.s)) AS i2,
        |    len(sa.s) AS la, len(sb.s) AS lb
        |  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
        |    JOIN sh sb ON sb.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(i2 AS DOUBLE)/(la + lb - i2) AS jaccard
        |FROM p2 WHERE CAST(i2 AS DOUBLE)/(la + lb - i2) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // Batched BPE: the generated round blocks replay candidate ranking,
    // greedy disjoint selection, and the one-pass multi-rule fold —
    // see bpeBatchSql.
    "text_bpe_batch" ->
      bpeBatchSql(batches = 5, batchSize = 8, window = 48, encodeTail = false),
    // the 288-merge chunk-unit tier: same generated replay, sequence units
    "text_bpe_merges_large" ->
      bpeBatchSql(batches = 36, batchSize = 8, window = 64,
        encodeTail = false, unitsSql = bpeChunkUnitsSql),
    // the >= 1024-merge tier: wider batches, same generated replay
    "text_bpe_merges_xl" ->
      bpeBatchSql(batches = 40, batchSize = 64, window = 768,
        encodeTail = false, unitsSql = bpeChunkUnitsSql),
    "text_bpe_batch_encode" ->
      bpeBatchSql(batches = 4, batchSize = 8, window = 48, encodeTail = true),
    // table-driven encode answers to the SAME replay: sequential
    // application of the flat learned list == batch-wise folds under the
    // selection's triple-disjointness (BpeSpec pins all three tiers equal)
    "text_bpe_encode_table" ->
      bpeBatchSql(batches = 5, batchSize = 8, window = 48, encodeTail = true),
    // byte-fallback tier: the rule list must match the gate's literally
    "text_bpe_encode_bytes" ->
      byteEncodeSql(Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
        ("m", "i"), ("mi", "x"),
        ("<0xE2>", "<0x86>"), ("<0xE2><0x86>", "<0x92>"))),

    // the recall values are data-learned (quantizer-dependent) and live
    // in the in-gate requires + log; the oracle replays the report's
    // contract rows — query-set size from the data, floors as committed
    // constants (changing a floor is a reviewed oracle change, not a
    // silent relaxation)
    "sim_recall_report" ->
      """WITH q AS (SELECT COUNT(*) AS nq FROM embeddings WHERE vec_id < 20)
        |SELECT m.method, CAST(q.nq AS BIGINT) AS n_queries,
        |  CAST(5 AS BIGINT) AS k, CAST(m.floor_pct AS BIGINT) AS floor_pct,
        |  CAST(1 AS BIGINT) AS floor_ok
        |FROM (VALUES ('ivf', 60), ('ivfpq', 50), ('knn', 50), ('lsh', 35),
        |    ('pq', 55))
        |  AS m(method, floor_pct)
        |CROSS JOIN q ORDER BY method""".stripMargin,

    "sample_cap_per_source" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 AS BIGINT),
        |      doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= 10
        |ORDER BY source, doc_id""".stripMargin,


    "sample_token_budget" ->
      """WITH r AS (SELECT source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY source ORDER BY
        |      CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 AS BIGINT),
        |      doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_chars AS cum
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS docs_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM r WHERE cum < 4000 GROUP BY source ORDER BY source""".stripMargin,


    "emb_project" ->
      s"""WITH p AS (
        |${projSql(graft.functions.VectorFns.randomPlanes(8, 64), "embedding")})
        |SELECT vec_id, plane, proj FROM p ORDER BY vec_id, plane""".stripMargin,


    "text_len_hist" ->
      """WITH t AS (SELECT
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '')) AS n
        |  FROM documents)
        |SELECT CAST(length(bin(CAST(GREATEST(n, 1) AS BIGINT))) - 1 AS BIGINT)
        |    AS len_bucket,
        |  COUNT(*) AS docs, CAST(SUM(n) AS BIGINT) AS tokens,
        |  CAST(MIN(n) AS BIGINT) AS min_tokens, CAST(MAX(n) AS BIGINT) AS max_tokens
        |FROM t GROUP BY len_bucket ORDER BY len_bucket""".stripMargin,


    "sample_fixed_k" ->
      """SELECT doc_id, lang, source,
        |  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 1099511627776 AS BIGINT) AS hk
        |FROM documents ORDER BY hk, doc_id LIMIT 500""".stripMargin,


    // identical A-ES arithmetic: u is exact (power-of-two division), ln
    // floor-truncates to millionths before the order, ties on doc_id
    "sample_weighted_ares" ->
      """WITH s AS (SELECT doc_id, lang, n_chars,
        |  CAST(floor(
        |    ln(CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 1099511627776 + 1
        |         AS DOUBLE) / 1099511627776.0)
        |    / CAST(n_chars AS DOUBLE) * 1000000) AS BIGINT) AS ares_score
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, ares_score FROM s
        |ORDER BY ares_score DESC, doc_id LIMIT 200""".stripMargin,


    "dedup_url_canonical" ->
      """WITH d AS (SELECT doc_id,
        |  'HTTPS://' || upper(source) || '.Example.Org/' || lang || '/p/' ||
        |  (doc_id % 40) || '?utm=x&ref=r' || (doc_id % 7) || '#top' AS url
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  'https://' || lower(regexp_extract(url, '^[Hh][Tt][Tt][Pp][Ss]://([^/?#]+)', 1)) ||
        |  regexp_extract(url, '^[^:]+://[^/?#]+([^?#]*)', 1) AS canon FROM d)
        |SELECT canon, MIN(doc_id) AS keeper, COUNT(*) AS dup_ct
        |FROM c GROUP BY canon ORDER BY canon""".stripMargin,


    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 <
        |  (CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 1000 ELSE 2500 END)
        |ORDER BY doc_id""".stripMargin,


    // thresholds recomputed from the data with the same IEEE-exact sqrt
    // chain (double divide → sqrt → *10000 → floor) as the Spark side
    "sample_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT MIN(n) AS minn FROM c),
        |t AS (SELECT lang,
        |    CAST(FLOOR(SQRT(CAST(minn AS DOUBLE)/CAST(n AS DOUBLE))*10000) AS BIGINT) AS thr
        |  FROM c, m)
        |SELECT d.lang, MAX(t.thr) AS thr, COUNT(*) AS docs_kept,
        |       CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
        |FROM documents d JOIN t ON d.lang = t.lang
        |WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 10000 < t.thr
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,


    // alpha=0.25: exponent 0.75 = 1/2 + 1/4 — same sqrt(r)*sqrt(sqrt(r))
    // op sequence as Sampling.dyadicRate, every step correctly rounded,
    // so the thresholds are bit-identical across engines
    "sample_temperature_a25" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT MIN(n) AS minn FROM c),
        |t AS (SELECT lang,
        |    CAST(FLOOR(SQRT(CAST(minn AS DOUBLE)/CAST(n AS DOUBLE))
        |      * SQRT(SQRT(CAST(minn AS DOUBLE)/CAST(n AS DOUBLE)))*10000) AS BIGINT) AS thr
        |  FROM c, m)
        |SELECT d.lang, MAX(t.thr) AS thr, COUNT(*) AS docs_kept,
        |       CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
        |FROM documents d JOIN t ON d.lang = t.lang
        |WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 10000 < t.thr
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,


    "emb_scalar_pack" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_id, len(v) AS dim,
        |  floor(sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b))*1000000)/1000000 AS l2,
        |  floor((list_reduce(v, (a,b) -> a+b)/len(v))*1000000)/1000000 AS mean,
        |  floor(list_max(v)*1000000)/1000000 AS maxv,
        |  floor(list_min(v)*1000000)/1000000 AS minv
        |FROM e ORDER BY vec_id""".stripMargin,


    "text_tfidf_top" ->
      """WITH tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS term
        |    FROM documents)
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rnk
        |  FROM tf JOIN df ON tf.term = df.term)
        |SELECT doc_id, term, tf, df, rnk FROM r WHERE rnk <= 2
        |ORDER BY doc_id, rnk""".stripMargin,


    // Same BM25 arithmetic shape as TfIdf.bm25TopK, operand for operand
    // (ln is libm natural log in both engines; avgdl is one division of
    // exact longs; each contribution floor-truncates to millionths
    // BEFORE the sum, so the per-(query,doc) score is exact integer
    // arithmetic and the rank order cannot drift cross-engine).
    "pipe_bm25_topk" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id NOT IN (0, 1, 2)),
        |q AS (SELECT doc_id AS query_id, text FROM documents WHERE doc_id IN (0, 1, 2)),
        |toks AS (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS term
        |  FROM corpus),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM dl),
        |qt AS (SELECT DISTINCT query_id, term FROM (
        |  SELECT query_id, unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS term
        |    FROM q)),
        |sc AS (SELECT qt.query_id, tf.doc_id,
        |    CAST(floor(
        |      ln(1.0 + (st.n_docs - CAST(df.df AS DOUBLE) + 0.5)
        |               / (CAST(df.df AS DOUBLE) + 0.5))
        |      * ((CAST(tf.tf AS DOUBLE) * 2.2)
        |         / (CAST(tf.tf AS DOUBLE)
        |            + 1.2 * (1.0 - 0.75
        |              + 0.75 * CAST(dl.dl AS DOUBLE) / (st.sum_dl / st.n_docs))))
        |      * 1000000.0) AS BIGINT) AS c_fp
        |  FROM qt JOIN tf USING (term) JOIN df USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |agg AS (SELECT query_id, doc_id,
        |    CAST(SUM(c_fp) AS BIGINT) AS score_fp FROM sc GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score_fp DESC, doc_id) AS rank FROM agg)
        |SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank, score_fp
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    // Chunk starts are every stride multiple below the token count (one
    // empty chunk for an empty doc); list_slice / slice both clamp the
    // window at the token-array end, so tail chunks agree.
    "text_chunk" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks,
        |    unnest(range(0, greatest(len(toks), 1), 16)) AS start FROM t)
        |SELECT doc_id, CAST(start // 16 AS BIGINT) AS chunk_idx,
        |  CAST(start AS BIGINT) AS start_tok,
        |  CAST(len(list_slice(toks, start + 1, start + 32)) AS BIGINT) AS n_toks,
        |  array_to_string(list_slice(toks, start + 1, start + 32), ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,


    // Same contiguous-fill rule: a doc belongs to the bin its starting
    // token offset falls in, laid out in doc_id order within each shard.
    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '')) AS n_toks
        |  FROM documents),
        |c AS (SELECT doc_id, shard, n_toks,
        |    sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT shard, CAST((cum - n_toks) // 256 AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS doc_ct, CAST(sum(n_toks) AS BIGINT) AS tok_ct,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Same 3-gram construction as the dedup oracles; ratio division is a
    // single IEEE op on small ints — bit-identical across engines, then
    // floor-truncated.
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END AS s
        |  FROM toks)
        |SELECT doc_id, CAST(len(s) AS BIGINT) AS n_grams,
        |  CASE WHEN len(s) <= 1 THEN 0.0
        |    ELSE floor((1.0 - CAST(len(list_distinct(s)) AS DOUBLE)/len(s))*1000000)/1000000
        |  END AS rep_ratio
        |FROM sh ORDER BY doc_id""".stripMargin,


    // Same 2-gram construction as the dedup/repetition oracles; the
    // per-doc argmax tie-breaks lexicographically in both engines, and
    // coverage is one IEEE division on exact ints, floor-truncated.
    "text_top_ngram" ->
      """WITH toks AS (SELECT doc_id, length(text) AS n_chars_t, list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, n_chars_t,
        |    unnest(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] END) AS gram
        |  FROM toks),
        |c AS (SELECT doc_id, n_chars_t, gram, COUNT(*) AS ct FROM sh GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY ct DESC, gram) AS rn FROM c)
        |SELECT doc_id, gram AS top_gram, CAST(ct AS BIGINT) AS top_ct,
        |  CASE WHEN n_chars_t = 0 THEN 0.0
        |    ELSE floor(CAST(ct * length(gram) AS DOUBLE) / n_chars_t * 1000000)/1000000
        |  END AS coverage
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,


    // 4 chained rounds: pair-count -> argmax (ct desc, then lexicographic)
    // -> greedy fold via list_reduce -- the same string fold, operand for
    // operand, as Bpe.applyMerge. All counts exact ints.
    "text_bpe_merges" ->
      """WITH v0 AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wct FROM (
        |    SELECT unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS word
        |    FROM documents)
        |  GROUP BY word),
        |s0 AS (SELECT word, wct,
        |    CASE WHEN contains(word, '|')
        |      THEN error('bpe fold oracle: pipe-bearing corpus word "' || word
        |        || '" would diverge from the engine under the |-fold replay')
        |    ELSE list_transform(range(1, length(word)+1),
        |      i -> substr(word, i, 1)) END AS syms FROM v0),
        |p1 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wct) AS BIGINT) AS ct
        |  FROM s0, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b1 AS (SELECT a, b, ct FROM p1 ORDER BY ct DESC, a, b LIMIT 1),
        |s1 AS (SELECT word, wct, CASE WHEN len(syms) <= 1 THEN syms
        |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
        |      WHEN ends_with('|'||acc, '|'||b1.a) AND x = b1.b THEN acc||x
        |      ELSE acc||'|'||x END), '|') END AS syms
        |  FROM s0 CROSS JOIN b1),
        |n1 AS (SELECT CAST(SUM(wct*len(syms)) AS BIGINT) AS syms_after FROM s1),
        |p2 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wct) AS BIGINT) AS ct
        |  FROM s1, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b2 AS (SELECT a, b, ct FROM p2 ORDER BY ct DESC, a, b LIMIT 1),
        |s2 AS (SELECT word, wct, CASE WHEN len(syms) <= 1 THEN syms
        |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
        |      WHEN ends_with('|'||acc, '|'||b2.a) AND x = b2.b THEN acc||x
        |      ELSE acc||'|'||x END), '|') END AS syms
        |  FROM s1 CROSS JOIN b2),
        |n2 AS (SELECT CAST(SUM(wct*len(syms)) AS BIGINT) AS syms_after FROM s2),
        |p3 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wct) AS BIGINT) AS ct
        |  FROM s2, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b3 AS (SELECT a, b, ct FROM p3 ORDER BY ct DESC, a, b LIMIT 1),
        |s3 AS (SELECT word, wct, CASE WHEN len(syms) <= 1 THEN syms
        |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
        |      WHEN ends_with('|'||acc, '|'||b3.a) AND x = b3.b THEN acc||x
        |      ELSE acc||'|'||x END), '|') END AS syms
        |  FROM s2 CROSS JOIN b3),
        |n3 AS (SELECT CAST(SUM(wct*len(syms)) AS BIGINT) AS syms_after FROM s3),
        |p4 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wct) AS BIGINT) AS ct
        |  FROM s3, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b4 AS (SELECT a, b, ct FROM p4 ORDER BY ct DESC, a, b LIMIT 1),
        |s4 AS (SELECT word, wct, CASE WHEN len(syms) <= 1 THEN syms
        |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
        |      WHEN ends_with('|'||acc, '|'||b4.a) AND x = b4.b THEN acc||x
        |      ELSE acc||'|'||x END), '|') END AS syms
        |  FROM s3 CROSS JOIN b4),
        |n4 AS (SELECT CAST(SUM(wct*len(syms)) AS BIGINT) AS syms_after FROM s4)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS round, a AS lhs, b AS rhs, ct, n1.syms_after FROM b1, n1
        |  UNION ALL SELECT 2, a, b, ct, n2.syms_after FROM b2, n2
        |  UNION ALL SELECT 3, a, b, ct, n3.syms_after FROM b3, n3
        |  UNION ALL SELECT 4, a, b, ct, n4.syms_after FROM b4, n4)
        |ORDER BY round""".stripMargin,


    // Same smoothed-bigram arithmetic as LangModel.bigramNll, operand for
    // operand: one IEEE division inside ln on exact ints, per-occurrence
    // floor to millionths, exact long sums, one final mean division.
    // PMI replayed with the identical double op order and truncation
    "text_collocations" ->
      """WITH t AS (SELECT list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        |nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_uni FROM uni),
        |bo AS (SELECT toks[u.i] AS w1, toks[u.i+1] AS w2
        |  FROM t, UNNEST(range(1, len(toks))) AS u(i)),
        |bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        |  FROM bo GROUP BY 1, 2),
        |nb AS (SELECT CAST(SUM(c12) AS DOUBLE) AS n_bi_total FROM bi)
        |SELECT bi.w1, bi.w2, bi.c12,
        |  floor(ln((CAST(bi.c12 AS DOUBLE) * nu.n_uni * nu.n_uni)
        |      / (nb.n_bi_total * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)))
        |    * 1000000.0) / 1000000.0 AS pmi_t
        |FROM bi JOIN uni u1 ON u1.w = bi.w1 JOIN uni u2 ON u2.w = bi.w2
        |CROSS JOIN nu CROSS JOIN nb
        |WHERE bi.c12 >= 5
        |ORDER BY w1, w2""".stripMargin,


    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
        |    SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
        |v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
        |bo AS (SELECT doc_id, toks[u.i] AS w1, toks[u.i+1] AS w2
        |  FROM t, UNNEST(range(1, len(toks))) AS u(i)),
        |bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bo GROUP BY 1, 2),
        |sc AS (SELECT bo.doc_id,
        |    CAST(floor(-ln((CAST(bi.c12 AS DOUBLE) + 1.0)
        |      / (CAST(uni.c1 AS DOUBLE) + v.v)) * 1000000.0) AS BIGINT) AS nll_fp
        |  FROM bo JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bi,
        |    CAST(SUM(nll_fp) AS BIGINT) AS nll_fp_sum FROM sc GROUP BY 1)
        |SELECT d.doc_id, COALESCE(agg.n_bi, 0) AS n_bi,
        |  COALESCE(agg.nll_fp_sum, 0) AS nll_fp_sum,
        |  CASE WHEN COALESCE(agg.n_bi, 0) = 0 THEN 0.0
        |    ELSE floor((CAST(agg.nll_fp_sum AS DOUBLE)/1000000.0)/agg.n_bi * 1000000)/1000000
        |  END AS avg_nll
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id ORDER BY d.doc_id""".stripMargin,


    // full replay: vocab derivation AND the greedy longest-match walk
    // (24 chained extraction steps over 24-char chunk units)
    "text_wordpiece_encode" -> wordPieceSql(24, 200, 4, 24),
    "text_unigram_encode" -> unigramSql(24, 200, 4),
    "text_unigram_train" -> unigramTrainSql(24, 200, 4, 3),

    // full replay of all 8 likelihood-scored training rounds
    "text_wordpiece_train" -> wordPieceTrainSql(8),
    "text_wordpiece_train_large" -> wordPieceBatchSql(36, 8, 64),

    // Same learned 4-merge chain as text_bpe_merges, then segmentation:
    // distinct words pick up their post-merge symbols, documents sum and
    // reassemble in (doc, word-position) order.
    "text_bpe_encode" ->
      """WITH v0 AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wct FROM (
        |    SELECT unnest(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS word
        |    FROM documents)
        |  GROUP BY word),
        |s0 AS (SELECT word, wct,
        |    CASE WHEN contains(word, '|')
        |      THEN error('bpe fold oracle: pipe-bearing corpus word "' || word
        |        || '" would diverge from the engine under the |-fold replay')
        |    ELSE list_transform(range(1, length(word)+1),
        |      i -> substr(word, i, 1)) END AS syms FROM v0),
        |p1 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wct) AS BIGINT) AS ct
        |  FROM s0, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b1 AS (SELECT a, b, ct FROM p1 ORDER BY ct DESC, a, b LIMIT 1),
        |s1 AS (SELECT word, wct, CASE WHEN len(syms) <= 1 THEN syms
        |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
        |      WHEN ends_with('|'||acc, '|'||b1.a) AND x = b1.b THEN acc||x
        |      ELSE acc||'|'||x END), '|') END AS syms
        |  FROM s0 CROSS JOIN b1),
        |p2 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wct) AS BIGINT) AS ct
        |  FROM s1, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b2 AS (SELECT a, b, ct FROM p2 ORDER BY ct DESC, a, b LIMIT 1),
        |s2 AS (SELECT word, wct, CASE WHEN len(syms) <= 1 THEN syms
        |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
        |      WHEN ends_with('|'||acc, '|'||b2.a) AND x = b2.b THEN acc||x
        |      ELSE acc||'|'||x END), '|') END AS syms
        |  FROM s1 CROSS JOIN b2),
        |p3 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wct) AS BIGINT) AS ct
        |  FROM s2, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b3 AS (SELECT a, b, ct FROM p3 ORDER BY ct DESC, a, b LIMIT 1),
        |s3 AS (SELECT word, wct, CASE WHEN len(syms) <= 1 THEN syms
        |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
        |      WHEN ends_with('|'||acc, '|'||b3.a) AND x = b3.b THEN acc||x
        |      ELSE acc||'|'||x END), '|') END AS syms
        |  FROM s2 CROSS JOIN b3),
        |p4 AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(wct) AS BIGINT) AS ct
        |  FROM s3, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b4 AS (SELECT a, b, ct FROM p4 ORDER BY ct DESC, a, b LIMIT 1),
        |s4 AS (SELECT word, wct, CASE WHEN len(syms) <= 1 THEN syms
        |    ELSE string_split(list_reduce(syms, (acc, x) -> CASE
        |      WHEN ends_with('|'||acc, '|'||b4.a) AND x = b4.b THEN acc||x
        |      ELSE acc||'|'||x END), '|') END AS syms
        |  FROM s3 CROSS JOIN b4),
        |t AS (SELECT doc_id, list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |w AS (SELECT doc_id, toks[u.i] AS pos_word, u.i AS pos FROM t,
        |  UNNEST(range(1, len(toks)+1)) AS u(i)),
        |enc AS (SELECT w.doc_id, CAST(SUM(len(s4.syms)) AS BIGINT) AS n_bpe,
        |    array_to_string(flatten(list(s4.syms ORDER BY w.pos))[1:3], ' ') AS head
        |  FROM w JOIN s4 ON w.pos_word = s4.word GROUP BY w.doc_id)
        |SELECT d.doc_id, COALESCE(enc.n_bpe, 0) AS n_bpe, COALESCE(enc.head, '') AS head
        |FROM documents d LEFT JOIN enc ON d.doc_id = enc.doc_id ORDER BY d.doc_id""".stripMargin,


    // Replays the injection and the scrub with RE2 equivalents of the
    // Java patterns (restricted syntax — see TextFns.EmailRe/PhoneRe).
    "text_pii_scrub" ->
      """WITH i AS (SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com or call '
        |      || printf('555-%03d-%04d', doc_id % 1000, doc_id % 10000) AS inj
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(inj,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(inj,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(inj,
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone
        |FROM i ORDER BY doc_id""".stripMargin,


    "emb_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS sc FROM e),
        |q AS (SELECT vec_id, sc,
        |    CASE WHEN sc = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(v, x -> CAST(floor(x/sc*127) AS BIGINT)) END AS qv
        |  FROM s)
        |SELECT vec_id, floor(sc*1000000)/1000000 AS scale_t,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), qv), (a,b) -> a+b) AS q_sum,
        |  list_min(qv) AS q_min, list_max(qv) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin,


    // quality formula mirrors the text_quality oracle; decimal(18,12) sums
    // keep the mean exact and partition-order-independent
    "corpus_report" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |m AS (SELECT doc_id, lang, text, len(toks) AS n_tokens,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','it','that'], x))) AS DOUBLE)/len(toks) END AS sw,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct
        |  FROM t),
        |q AS (SELECT doc_id, lang, text, n_tokens,
        |    0.4*least(length(text)/500.0, 1.0)
        |      + 0.3*(1.0 - least(punct*5.0, 1.0))
        |      + 0.3*least(sw*5.0, 1.0) AS quality
        |  FROM m)
        |SELECT lang, COUNT(*) AS docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        |  floor((CAST(SUM(CAST(quality AS DECIMAL(18,12))) AS DOUBLE)/COUNT(*))*1000000)/1000000 AS mean_quality,
        |  COUNT(DISTINCT md5(text)) AS distinct_docs
        |FROM q GROUP BY lang ORDER BY lang""".stripMargin,


    // mirrors TextFns.qualityScore + graft_langid + tokensWs + exact-keeper
    // — the same formulas as the text_quality / text_langid oracles
    "pipe_pretrain_filter" ->
      """WITH toks AS (SELECT doc_id, text, lang,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS tw,
        |    string_split_regex(lower(text), '[^\p{L}\p{N}]+') AS tr
        |  FROM documents),
        |lid AS (SELECT doc_id, text, lang, tw, len(tw) AS n_tok,
        |    len(list_filter(tr, x -> list_contains(['the','and','of','to','is','you','that','with'], x))) AS eh,
        |    len(list_filter(tr, x -> list_contains(['el','la','de','que','los','por','con','una'], x))) AS sh_,
        |    len(list_filter(tr, x -> list_contains(['le','la','les','des','est','une','dans','pour'], x))) AS fh,
        |    len(list_filter(tr, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein'], x))) AS dh,
        |    len(list_filter(tr, x -> list_contains(['的','是','不','我','了','在','人','有'], x))) AS zh_
        |  FROM toks),
        |pred AS (SELECT *, CASE
        |    WHEN greatest(eh, sh_, fh, dh, zh_) = 0 THEN 'und'
        |    WHEN zh_ = greatest(eh, sh_, fh, dh, zh_) THEN 'zh'
        |    WHEN fh = greatest(eh, sh_, fh, dh, zh_) THEN 'fr'
        |    WHEN sh_ = greatest(eh, sh_, fh, dh, zh_) THEN 'es'
        |    WHEN eh = greatest(eh, sh_, fh, dh, zh_) THEN 'en'
        |    ELSE 'de' END AS plang FROM lid),
        |q AS (SELECT *,
        |    CASE WHEN n_tok = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(tw, x -> list_contains(['the','a','an','of','and','to','in','is','it','that'], x))) AS DOUBLE)/n_tok END AS sw,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct
        |  FROM pred),
        |f AS (SELECT doc_id, text, lang FROM q
        |  WHERE plang = 'en'
        |    AND (0.4*least(length(text)/500.0, 1.0)
        |       + 0.3*(1.0 - least(punct*5.0, 1.0))
        |       + 0.3*least(sw*5.0, 1.0)) >= 0.4
        |    AND n_tok BETWEEN 5 AND 100000),
        |k AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f)
        |SELECT doc_id, lang FROM k WHERE rn = 1 ORDER BY doc_id""".stripMargin,


    // Full-pipeline replay: filter CTEs (pipe_pretrain_filter's formulas
    // with n_chars/tw carried through) feed the decontamination CTEs
    // (pipe_decontaminate's shingle rule) feed the per-lang report.
    "pipe_pretrain_e2e" ->
      """WITH toks AS (SELECT doc_id, text, lang, n_chars,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS tw,
        |    string_split_regex(lower(text), '[^\p{L}\p{N}]+') AS tr
        |  FROM documents),
        |lid AS (SELECT doc_id, text, lang, n_chars, tw, len(tw) AS n_tok,
        |    len(list_filter(tr, x -> list_contains(['the','and','of','to','is','you','that','with'], x))) AS eh,
        |    len(list_filter(tr, x -> list_contains(['el','la','de','que','los','por','con','una'], x))) AS sh_,
        |    len(list_filter(tr, x -> list_contains(['le','la','les','des','est','une','dans','pour'], x))) AS fh,
        |    len(list_filter(tr, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein'], x))) AS dh,
        |    len(list_filter(tr, x -> list_contains(['的','是','不','我','了','在','人','有'], x))) AS zh_
        |  FROM toks WHERE doc_id % 89 <> 0),
        |pred AS (SELECT *, CASE
        |    WHEN greatest(eh, sh_, fh, dh, zh_) = 0 THEN 'und'
        |    WHEN zh_ = greatest(eh, sh_, fh, dh, zh_) THEN 'zh'
        |    WHEN fh = greatest(eh, sh_, fh, dh, zh_) THEN 'fr'
        |    WHEN sh_ = greatest(eh, sh_, fh, dh, zh_) THEN 'es'
        |    WHEN eh = greatest(eh, sh_, fh, dh, zh_) THEN 'en'
        |    ELSE 'de' END AS plang FROM lid),
        |q AS (SELECT *,
        |    CASE WHEN n_tok = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(tw, x -> list_contains(['the','a','an','of','and','to','in','is','it','that'], x))) AS DOUBLE)/n_tok END AS sw,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct
        |  FROM pred),
        |f AS (SELECT doc_id, text, lang, n_chars, tw FROM q
        |  WHERE plang = 'en'
        |    AND (0.4*least(length(text)/500.0, 1.0)
        |       + 0.3*(1.0 - least(punct*5.0, 1.0))
        |       + 0.3*least(sw*5.0, 1.0)) >= 0.4
        |    AND n_tok BETWEEN 5 AND 100000),
        |k AS (SELECT doc_id, lang, n_chars, tw,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f),
        |kept AS (SELECT doc_id, lang, n_chars, tw FROM k WHERE rn = 1),
        |ksh AS (SELECT doc_id, lang, n_chars,
        |    list_distinct(CASE WHEN len(tw) < 8 THEN [array_to_string(tw, ' ')]
        |      ELSE [array_to_string(tw[i:i+7], ' ') for i in range(1, len(tw) - 6)] END) AS s
        |  FROM kept),
        |evt AS (SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 89 = 0 OR doc_id % 101 = 0),
        |ev AS (SELECT DISTINCT unnest(
        |    list_distinct(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)] END)) AS g
        |  FROM evt),
        |kg AS (SELECT doc_id, unnest(s) AS g FROM ksh),
        |bad AS (SELECT DISTINCT kg.doc_id FROM kg JOIN ev USING (g)),
        |clean AS (SELECT ksh.doc_id, ksh.lang, ksh.n_chars FROM ksh
        |  LEFT JOIN bad ON ksh.doc_id = bad.doc_id WHERE bad.doc_id IS NULL)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        |FROM clean GROUP BY lang ORDER BY lang""".stripMargin,


    // Same 8-gram construction Spark-side (graft_shingles) and here
    // (list comprehension); overlap on the shingle STRING set — the
    // xxhash64 bucketing Spark uses is a pure join-key encoding.
    "pipe_decontaminate" ->
      """WITH toks AS (SELECT doc_id, lang, n_chars,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, lang, n_chars,
        |    list_distinct(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)] END) AS s
        |  FROM toks),
        |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh
        |  WHERE doc_id % 97 = 0 OR doc_id % 101 = 0),
        |tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        |trg AS (SELECT doc_id, unnest(s) AS g FROM tr),
        |bad AS (SELECT DISTINCT trg.doc_id FROM trg JOIN ev USING (g)),
        |keep AS (SELECT tr.doc_id, tr.lang, tr.n_chars FROM tr
        |  LEFT JOIN bad ON tr.doc_id = bad.doc_id WHERE bad.doc_id IS NULL),
        |t2 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs_train FROM tr GROUP BY lang),
        |k2 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs_clean,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars_clean FROM keep GROUP BY lang)
        |SELECT t2.lang, docs_train,
        |  COALESCE(docs_clean, CAST(0 AS BIGINT)) AS docs_clean,
        |  COALESCE(chars_clean, CAST(0 AS BIGINT)) AS chars_clean
        |FROM t2 LEFT JOIN k2 ON t2.lang = k2.lang ORDER BY t2.lang""".stripMargin,


    // Bloom tier: DuckDB recomputes the EXACT decontamination truth
    // (same CTEs as pipe_decontaminate); the sketch-side verdicts are
    // pinned constants — subset_ok (no false negatives) and fp_ok
    // (false-drop budget) must both hold.
    "pipe_decontaminate_bloom" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)] END) AS s
        |  FROM toks),
        |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh
        |  WHERE doc_id % 97 = 0 OR doc_id % 101 = 0),
        |tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        |trg AS (SELECT doc_id, unnest(s) AS g FROM tr),
        |bad AS (SELECT DISTINCT trg.doc_id FROM trg JOIN ev USING (g)),
        |keep AS (SELECT tr.doc_id FROM tr
        |  LEFT JOIN bad ON tr.doc_id = bad.doc_id WHERE bad.doc_id IS NULL)
        |SELECT CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS docs_train,
        |  CAST((SELECT COUNT(*) FROM keep) AS BIGINT) AS kept_exact,
        |  CAST(1 AS BIGINT) AS subset_ok, CAST(1 AS BIGINT) AS fp_ok""".stripMargin,


    "pipe_decontaminate_sem" ->
      """WITH ev AS (SELECT CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 17 = 0),
        |tr AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 17 <> 0),
        |m AS (SELECT tr.vec_id, tr.label,
        |    max(list_cosine_similarity(tr.v, ev.v)) AS mc
        |  FROM tr, ev GROUP BY tr.vec_id, tr.label)
        |SELECT vec_id, label FROM m WHERE mc < 0.42 ORDER BY vec_id""".stripMargin,


    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin,


    "dedup_ngram_jaccard" -> ngramJaccardOracleSql,


    // the prefix-filtered variant must find EXACTLY the same pair set —
    // the oracle (exhaustive pairwise Jaccard) IS the no-false-negative
    // proof of the prefix filter
    "dedup_ngram_prefix" -> ngramJaccardOracleSql,


    "dedup_clusters" ->
      """WITH RECURSIVE toks AS MATERIALIZED (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS s
        |  FROM toks),
        |p AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.s, b.s)) AS i, len(a.s) AS la, len(b.s) AS lb
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM p
        |  WHERE CAST(i AS DOUBLE)/(la + lb - i) >= 0.5),
        |e AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
        |  UNION SELECT doc_b AS s, doc_a AS d FROM pairs),
        |reach AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s)
        |SELECT s AS doc_id, least(s, MIN(d)) AS cluster_id
        |FROM reach GROUP BY s ORDER BY doc_id""".stripMargin,


    // same transitive-closure labels as dedup_clusters, then the
    // per-cluster argmax by (length DESC, doc_id) decides survival;
    // unpaired docs (not in the member set) survive by construction
    "dedup_keep_best" ->
      """WITH RECURSIVE toks AS MATERIALIZED (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS s
        |  FROM toks),
        |p AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.s, b.s)) AS i, len(a.s) AS la, len(b.s) AS lb
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM p
        |  WHERE CAST(i AS DOUBLE)/(la + lb - i) >= 0.5),
        |e AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
        |  UNION SELECT doc_b AS s, doc_a AS d FROM pairs),
        |reach AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s),
        |labels AS MATERIALIZED (SELECT s AS doc_id,
        |    least(s, MIN(d)) AS cluster_id FROM reach GROUP BY s),
        |members AS MATERIALIZED (SELECT l.cluster_id, l.doc_id,
        |    length(d.text) AS q
        |  FROM labels l JOIN documents d USING (doc_id)),
        |drop AS (SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY q DESC, doc_id) AS rn FROM members)
        |  WHERE rn > 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM drop)
        |ORDER BY d.doc_id""".stripMargin,


    // transitive closure of the ngram near-dup pairs; cluster = min
    // reachable doc id
    // End-to-end survivors: same transitive-closure labels as
    // dedup_clusters, then keep min-id members + unpaired docs.
    "pipe_dedup_survivors" ->
      """WITH RECURSIVE toks AS MATERIALIZED (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS s
        |  FROM toks),
        |p AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.s, b.s)) AS i, len(a.s) AS la, len(b.s) AS lb
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM p
        |  WHERE CAST(i AS DOUBLE)/(la + lb - i) >= 0.5),
        |e AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
        |  UNION SELECT doc_b AS s, doc_a AS d FROM pairs),
        |reach AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s),
        |lbl AS (SELECT s AS doc_id, least(s, MIN(d)) AS cluster_id
        |  FROM reach GROUP BY s),
        |keep AS (SELECT doc.* FROM documents doc LEFT JOIN lbl
        |    ON doc.doc_id = lbl.doc_id
        |  WHERE lbl.doc_id IS NULL OR lbl.cluster_id = doc.doc_id)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS sources
        |FROM keep GROUP BY lang ORDER BY lang""".stripMargin,


    // Replays the paragraph rule on the same derived fixture: global
    // first occurrence by (doc_id, position) survives, docs reassemble
    // from survivors in original order.
    "dedup_paragraph" ->
      """WITH multi AS (
        |  SELECT d.doc_id, d.text || chr(10) || p.text AS text
        |  FROM documents d JOIN documents p ON p.doc_id = (d.doc_id + 1) % 50),
        |paras AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS para,
        |    generate_subscripts(string_split(text, chr(10)), 1) AS idx
        |  FROM multi),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY para
        |      ORDER BY doc_id, idx) AS rn
        |  FROM paras)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
        |  CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(para, chr(10) ORDER BY idx)
        |    FILTER (WHERE rn = 1), '') AS text_dedup
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // Same tokenize+shingle idiom as the jaccard oracle at span length 8;
    // dup_frac is a single division of exact ints (bit-identical across
    // engines).
    "dedup_span_frac" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)] END) AS s
        |  FROM toks),
        |u AS (SELECT doc_id, unnest(s) AS sv FROM sh),
        |df AS (SELECT sv FROM u GROUP BY sv HAVING COUNT(*) >= 2)
        |SELECT u.doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(CASE WHEN df.sv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
        |  CAST(SUM(CASE WHEN df.sv IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS dup_frac
        |FROM u LEFT JOIN df ON u.sv = df.sv
        |GROUP BY u.doc_id ORDER BY u.doc_id""".stripMargin,


    "dedup_span_trim" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sp AS (SELECT doc_id, unnest(range(1, len(t) - 6)) AS i,
        |    unnest([array_to_string(t[j:j+7], ' ') for j in range(1, len(t) - 6)]) AS sv
        |  FROM toks WHERE len(t) >= 8),
        |df AS (SELECT sv FROM (SELECT DISTINCT doc_id, sv FROM sp)
        |       GROUP BY sv HAVING COUNT(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, p FROM (
        |  SELECT sp.doc_id, unnest(range(sp.i, sp.i + 8)) AS p
        |  FROM sp JOIN df USING (sv))),
        |pos AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS p,
        |    unnest(t) AS tok FROM toks),
        |k AS (SELECT pos.doc_id, COUNT(*) AS kept,
        |        string_agg(pos.tok, ' ' ORDER BY pos.p) AS txt
        |  FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
        |  WHERE cov.p IS NULL GROUP BY pos.doc_id)
        |SELECT toks.doc_id, CAST(len(toks.t) AS BIGINT) AS n_tokens,
        |  COALESCE(k.kept, 0) AS kept_tokens,
        |  COALESCE(k.txt, '') AS trimmed_text
        |FROM toks LEFT JOIN k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    // Clusters via the same recursive-CTE closure as the dedup_clusters
    // oracle; split assignment replays the md5-low-64 bucket ranges
    // (cuts 8000/9000/10000) on the cluster key.
    "pipe_split_leakage" ->
      """WITH RECURSIVE toks AS MATERIALIZED (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS s
        |  FROM toks),
        |p AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.s, b.s)) AS i, len(a.s) AS la, len(b.s) AS lb
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM p
        |  WHERE CAST(i AS DOUBLE)/(la + lb - i) >= 0.5),
        |e AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
        |  UNION SELECT doc_b AS s, doc_a AS d FROM pairs),
        |reach AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN e ON r.d = e.s),
        |lab AS (SELECT s AS doc_id, least(s, MIN(d)) AS cluster_id
        |  FROM reach GROUP BY s),
        |k AS (SELECT d.lang, d.n_chars,
        |    md5_number_lower(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)) % 10000 AS b
        |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id)
        |SELECT CASE WHEN b < 8000 THEN 'train'
        |            WHEN b < 9000 THEN 'valid' ELSE 'test' END AS split,
        |       lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM k GROUP BY split, lang ORDER BY split, lang""".stripMargin,


    // Both sides' gram sets are distinct per (doc)/(set), so the join's
    // per-(doc,set) row count IS the distinct shared-gram count.
    "pipe_decontaminate_report" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)] END) AS s
        |  FROM toks),
        |ev AS (SELECT DISTINCT eval_set, g FROM (
        |    SELECT 'holdout_a' AS eval_set, unnest(s) AS g FROM sh WHERE doc_id % 97 = 0
        |    UNION ALL
        |    SELECT 'holdout_b' AS eval_set, unnest(s) AS g FROM sh WHERE doc_id % 101 = 0)),
        |tr AS (SELECT doc_id, unnest(s) AS g FROM sh
        |  WHERE doc_id % 97 <> 0 AND doc_id % 101 <> 0)
        |SELECT tr.doc_id, ev.eval_set, COUNT(*) AS grams_hit
        |FROM tr JOIN ev USING (g)
        |GROUP BY tr.doc_id, ev.eval_set
        |ORDER BY tr.doc_id, ev.eval_set""".stripMargin,


    // Recomputes graft_minhash_bands_p verbatim: md5-lower-64 % P element
    // hashes, the identical affine family (constants interpolated below),
    // band key = comma-joined signature slice, then exact set-jaccard
    // verification of the banded candidates.
    "dedup_minhash_lsh" ->
      s"""WITH perms(i, a, b) AS (VALUES ${permValuesSql(64)}),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS s
        |  FROM toks),
        |hv AS (SELECT doc_id, CAST(md5_number_lower(sv) % 2147483647 AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(s) AS sv FROM sh)),
        |mh AS (SELECT doc_id, p.i AS i,
        |    MIN((CAST(p.a AS BIGINT) * hv.h + p.b) % 2147483647) AS m
        |  FROM hv CROSS JOIN perms p GROUP BY doc_id, p.i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS key
        |  FROM mh GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
        |    AND a.doc_id < b.doc_id),
        |p2 AS (SELECT c.doc_a, c.doc_b, len(list_intersect(sa.s, sb.s)) AS i2,
        |    len(sa.s) AS la, len(sb.s) AS lb
        |  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
        |    JOIN sh sb ON sb.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(i2 AS DOUBLE)/(la + lb - i2) AS jaccard
        |FROM p2 WHERE CAST(i2 AS DOUBLE)/(la + lb - i2) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,


    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_index_atrest" -> dedupIncrementalSql,


    // Recomputes graft_simhash_p verbatim: per-shingle md5-lower-64 bit
    // votes (duplicates kept — no list_distinct), two unsigned 32-bit
    // halves, 4x16-bit bands, hamming = popcount of the half xors.
    "dedup_simhash" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |rsh AS (SELECT doc_id,
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END AS s
        |  FROM toks),
        |hv AS (SELECT doc_id, md5_number_lower(sv) AS h
        |  FROM (SELECT doc_id, unnest(s) AS sv FROM rsh)),
        |bits AS (SELECT doc_id, b,
        |    CASE WHEN SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
        |         THEN 1 ELSE 0 END AS bit
        |  FROM hv CROSS JOIN range(64) t(b) GROUP BY doc_id, b),
        |fp AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN bit = 1 AND b < 32 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN bit = 1 AND b >= 32 THEN CAST(1 AS BIGINT) << (b - 32) ELSE 0 END) AS BIGINT) AS hi
        |  FROM bits GROUP BY doc_id),
        |banded AS (SELECT doc_id, lo, hi, r.band AS band,
        |    CASE r.band WHEN 0 THEN lo & 65535 WHEN 1 THEN lo >> 16
        |                WHEN 2 THEN hi & 65535 ELSE hi >> 16 END AS key
        |  FROM fp CROSS JOIN range(4) r(band)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
        |    AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS INTEGER) AS hamming
        |FROM cand
        |WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin,


    // Hyperplane buckets with the exact plane literals the gate uses;
    // cosine floor-truncated (not rounded) to 4 decimals on both sides.
    "dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, embedding,
        |    ${bucketSql(VectorFns.randomPlanes(3, 64), "embedding")} AS bucket
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[])) AS c
        |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, floor(c*10000)/10000 AS cos
        |FROM p WHERE c >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,


    // SemDeDup verdicts: conservation from the table, the three
    // invariant verdicts pinned to 1 (validity is computed Spark-side,
    // exact semantics pinned in DedupSpec — the sim_topk_ivf pattern)
    "dedup_semantic" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(1 AS BIGINT) AS drops_witnessed_ok,
        |  CAST(1 AS BIGINT) AS minima_kept_ok,
        |  CAST(1 AS BIGINT) AS some_dropped
        |FROM embeddings""".stripMargin,


    // auto-k twin: identical invariants — k is derived in-engine from the
    // corpus size, which the oracle never needs to see
    "dedup_semantic_autok" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(1 AS BIGINT) AS drops_witnessed_ok,
        |  CAST(1 AS BIGINT) AS minima_kept_ok,
        |  CAST(1 AS BIGINT) AS some_dropped
        |FROM embeddings""".stripMargin,


    "sim_topk_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(qe, CAST(e.embedding AS DOUBLE[])) AS cos
        |      FROM q, embeddings e WHERE e.vec_id <> query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    // Recomputes lshTopK verbatim: hyperplane buckets from the gate's
    // plane literals, multi-probe = own bucket + each single-bit flip,
    // then cosine rank over the cohabitant set.
    "sim_topk_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding,
        |    ${bucketSql(VectorFns.randomPlanes(8, 64), "embedding")} AS bucket
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket AS b0
        |  FROM e WHERE vec_id < 5),
        |pr AS (SELECT query_id, qe,
        |    unnest([b0, ${(0 until 8).map(i => s"xor(b0, ${1L << i})").mkString(", ")}]) AS probe
        |  FROM q),
        |s AS (SELECT DISTINCT query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
        |  FROM pr JOIN e ON e.bucket = pr.probe AND e.vec_id <> pr.query_id),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank FROM s)
        |SELECT query_id, neighbor_id, rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    // One-sided containment (the emitted neighbor SET is engine-side —
    // data-dependent k-means — but its invariants aren't): the Spark gate
    // recomputes, per query, how many of its emitted rows carry an exact
    // pairwise cosine / distinct neighbors / dense ordered ranks; the
    // oracle pins those counts at the constants a correct top-5 must hit.
    "sim_topk_pq" ->
      """SELECT vec_id AS query_id,
        |  CAST(5 AS BIGINT) AS n_results, CAST(5 AS BIGINT) AS n_distinct,
        |  CAST(5 AS BIGINT) AS n_ranks, CAST(5 AS BIGINT) AS n_valid,
        |  CAST(4 AS BIGINT) AS n_ordered, CAST(1 AS BIGINT) AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin,


    // Composed IVF-PQ: same constants as sim_topk_pq (the invariant set a
    // correct cell-pruned + code-compressed + re-ranked top-5 must hit);
    // recall floor 0.2 — the composition stacks IVF probe misses on PQ
    // shortlist misses (measured 0.5-0.8 at these scales).
    "sim_topk_ivfpq" ->
      """SELECT vec_id AS query_id,
        |  CAST(5 AS BIGINT) AS n_results, CAST(5 AS BIGINT) AS n_distinct,
        |  CAST(5 AS BIGINT) AS n_ranks, CAST(5 AS BIGINT) AS n_valid,
        |  CAST(4 AS BIGINT) AS n_ordered, CAST(1 AS BIGINT) AS recall_floor_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin,


    // retrain+rebuild == one-shot with the retrained centroids (n_match),
    // every cosine exact (n_valid)
    "sim_ivf_rebuild" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results,
        |  CAST(5 AS BIGINT) AS n_match, CAST(5 AS BIGINT) AS n_valid
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin,


    // append == one-shot rebuild (n_match), every cosine exact (n_valid)
    "sim_ivf_append" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results,
        |  CAST(5 AS BIGINT) AS n_match, CAST(5 AS BIGINT) AS n_valid
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin,


    // code-append == one-shot in-memory twin per (query, rank) with both
    // quantizers frozen; base index files byte-identical after the append
    "sim_ivfpq_append" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results,
        |  CAST(5 AS BIGINT) AS n_match, CAST(5 AS BIGINT) AS n_valid,
        |  CAST(1 AS BIGINT) AS base_files_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin,


    "sim_topk_ivf" ->
      """SELECT vec_id AS query_id,
        |  CAST(5 AS BIGINT) AS n_results, CAST(5 AS BIGINT) AS n_distinct,
        |  CAST(5 AS BIGINT) AS n_ranks, CAST(5 AS BIGINT) AS n_valid,
        |  CAST(4 AS BIGINT) AS n_ordered
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin,


    "sim_knn_join" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id % 10 = 3),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(qe, CAST(e.embedding AS DOUBLE[])) AS cos
        |      FROM q, embeddings e WHERE e.vec_id % 10 <> 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,


    // Same one-sided containment idiom as sim_topk_ivf, over the full
    // query table; recall_floor_ok pins non-vacuity vs the exact join.
    "sim_knn_join_ivf" ->
      """SELECT vec_id AS query_id,
        |  CAST(3 AS BIGINT) AS n_results, CAST(3 AS BIGINT) AS n_distinct,
        |  CAST(3 AS BIGINT) AS n_ranks, CAST(3 AS BIGINT) AS n_valid,
        |  CAST(2 AS BIGINT) AS n_ordered, CAST(1 AS BIGINT) AS recall_floor_ok
        |FROM embeddings WHERE vec_id % 10 = 3 ORDER BY vec_id""".stripMargin,


    // The whole RAG path replayed: text_chunk's slicing (stride 32),
    // per-chunk md5-bucket counts, cosine rank — chunk vectors are
    // integer counts, so the cosines are bit-portable across engines.
    "pipe_rag_topk" ->
      s"""WITH t AS (SELECT doc_id, list_filter(
        |    string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks,
        |    unnest(range(0, greatest(len(toks), 1), 32)) AS start FROM t),
        |ch AS (SELECT doc_id * 1000 + start // 32 AS vec_id,
        |    list_transform(list_slice(toks, start + 1, start + 32),
        |      t2 -> CAST(md5_number_lower(t2) % 16 AS BIGINT)) AS hs
        |  FROM s WHERE len(list_slice(toks, start + 1, start + 32)) > 0),
        |e AS (SELECT vec_id, [${(0 until 16).map(i =>
                 s"CAST(len(list_filter(hs, h -> h = $i)) AS DOUBLE)").mkString(", ")}] AS v
        |  FROM ch),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1000, 2000)),
        |c AS (SELECT vec_id AS neighbor_id, v FROM e WHERE vec_id NOT IN (0, 1000, 2000)),
        |sc AS (SELECT query_id, neighbor_id,
        |    list_cosine_similarity(qv, v) AS cos FROM q, c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
        |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,


    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |m AS (SELECT doc_id, text, toks, len(toks) AS n_tokens,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |      ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)/len(toks) END AS mean_tok_len,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','it','that'], x))) AS DOUBLE)/len(toks) END AS sw,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct
        |  FROM t)
        |SELECT doc_id, n_tokens, floor(mean_tok_len*1000000)/1000000 AS mean_tok_len,
        |  floor(sw*1000000)/1000000 AS stopword_ratio,
        |  floor((0.4*least(length(text)/500.0, 1.0)
        |      + 0.3*(1.0 - least(punct*5.0, 1.0))
        |      + 0.3*least(sw*5.0, 1.0))*1000000)/1000000 AS quality
        |FROM m ORDER BY doc_id""".stripMargin,


    // sigmoid(w·f + b) over the same profile formulas as text_quality;
    // ln(1+n) stands in for log1p (identical to well past the truncate6
    // grid and the 1e-6 threshold margin)
    "text_quality_model" ->
      """WITH t AS (SELECT doc_id, text,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |m AS (SELECT doc_id, text, len(toks) AS n_tokens,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |      ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)/len(toks) END AS mean_tok_len,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','it','that'], x))) AS DOUBLE)/len(toks) END AS sw,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct
        |  FROM t),
        |s AS (SELECT doc_id,
        |    1.0/(1.0 + exp(-(0.5*ln(1.0 + n_tokens) + 0.3*mean_tok_len
        |      + 8.0*sw - 6.0*punct - 4.0))) AS score
        |  FROM m)
        |SELECT doc_id, floor(score*1000000)/1000000 AS score,
        |  CAST(score >= 0.5 AS INTEGER) AS kept
        |FROM s ORDER BY doc_id""".stripMargin,


    "text_langid" ->
      """WITH toks AS (SELECT lang,
        |    string_split_regex(lower(text), '[^\p{L}\p{N}]+') AS t FROM documents),
        |h AS (SELECT lang,
        |    len(list_filter(t, x -> list_contains(['the','and','of','to','is','you','that','with'], x))) AS eh,
        |    len(list_filter(t, x -> list_contains(['el','la','de','que','los','por','con','una'], x))) AS sh_,
        |    len(list_filter(t, x -> list_contains(['le','la','les','des','est','une','dans','pour'], x))) AS fh,
        |    len(list_filter(t, x -> list_contains(['der','die','und','das','ist','nicht','mit','ein'], x))) AS dh,
        |    len(list_filter(t, x -> list_contains(['的','是','不','我','了','在','人','有'], x))) AS zh_
        |  FROM toks),
        |p AS (SELECT lang, CASE
        |    WHEN greatest(eh, sh_, fh, dh, zh_) = 0 THEN 'und'
        |    WHEN zh_ = greatest(eh, sh_, fh, dh, zh_) THEN 'zh'
        |    WHEN fh = greatest(eh, sh_, fh, dh, zh_) THEN 'fr'
        |    WHEN sh_ = greatest(eh, sh_, fh, dh, zh_) THEN 'es'
        |    WHEN eh = greatest(eh, sh_, fh, dh, zh_) THEN 'en'
        |    ELSE 'de' END AS pred FROM h)
        |SELECT lang, pred, COUNT(*) AS ct FROM p GROUP BY lang, pred ORDER BY lang, pred""".stripMargin,


    "text_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS n_ws,
        |  len(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS n_re,
        |  length(text) AS n_chars_m, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,


    // same construction as TextFns.fingerprintPortable: two 31-bit
    // polynomial tracks over md5_number_lower-per-token, packed into 62 bits
    "text_fingerprint" ->
      """WITH toks AS (SELECT doc_id,
        |    list_transform(
        |      list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> ''),
        |      x -> CAST(md5_number_lower(x) % 2147483647 AS BIGINT)) AS hs
        |  FROM documents)
        |SELECT doc_id,
        |  (list_reduce(list_prepend(CAST(17 AS BIGINT), hs),
        |     (acc, h) -> (acc * 1000003 + h) % 2147483647) << 31)
        |  | list_reduce(list_prepend(CAST(17 AS BIGINT), hs),
        |     (acc, h) -> (acc * 998244353 + h) % 2147483647) AS fp
        |FROM toks ORDER BY doc_id""".stripMargin,


    "text_normalize" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
        |  nfc_normalize(text) = text AS already_nfc
        |FROM documents ORDER BY doc_id""".stripMargin,


    "mm_frame_sample" ->
      """SELECT doc_id,
        |  greatest((strlen(text)-1)//16, 0) + 1 AS n_frames,
        |  16*greatest((strlen(text)-1)//16, 0) AS last_offset,
        |  array_to_string([16*i for i in range(0, greatest((strlen(text)-1)//16, 0) + 1)], ',') AS offsets_csv
        |FROM documents ORDER BY doc_id""".stripMargin,


    "mm_binary_meta" ->
      """SELECT doc_id, 'text' AS kind, strlen(text) AS n_bytes, 'utf-8' AS codec
        |FROM documents ORDER BY doc_id""".stripMargin,


    // every-4th-byte downsample: output length = ceil(n_bytes/4)
    "mm_resize" ->
      """SELECT doc_id, CAST((strlen(text) + 3) // 4 AS BIGINT) AS n_bytes_out
        |FROM documents ORDER BY doc_id""".stripMargin,


    // fixture dims are pure functions of doc_id (w=4+id%5, h=3+id%7);
    // factor 2 → floor halves clamped at 1. mismatches=0 / has_payload
    // pin the codec round trip itself.
    "mm_resize_png" ->
      """SELECT doc_id,
        |  CAST(GREATEST(1, (4 + doc_id % 5) // 2) AS INTEGER) AS out_w,
        |  CAST(GREATEST(1, (3 + doc_id % 7) // 2) AS INTEGER) AS out_h,
        |  CAST(0 AS BIGINT) AS mismatches,
        |  TRUE AS has_payload
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,


    // the ENTIRE perceptual hash recomputed in SQL: fixture pixel
    // formulas -> 8x8 nearest-neighbor sample -> integer luma ->
    // mean threshold -> 64-bit pack (HUGEINT sum, wrapped to signed)
    "mm_phash" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 11 = 0),
        |cells AS (SELECT doc_id, gx.range AS x, gy.range AS y
        |  FROM ids, range(0,8) gx, range(0,8) gy),
        |sc AS (SELECT doc_id, x, y,
        |    (x * (4 + doc_id % 5)) // 8 AS sx,
        |    (y * (3 + doc_id % 7)) // 8 AS sy
        |  FROM cells),
        |lum AS (SELECT doc_id, x, y,
        |    (((doc_id*31 + sx*7 + sy*13) % 256) * 299
        |     + ((doc_id*17 + sx*3 + sy*5) % 256) * 587
        |     + ((doc_id*29 + sx*11 + sy*2) % 256) * 114) // 1000 AS l
        |  FROM sc),
        |m AS (SELECT doc_id, SUM(l) // 64 AS mean FROM lum GROUP BY doc_id),
        |h AS (SELECT lum.doc_id,
        |    SUM(CASE WHEN l > mean THEN CAST(1 AS HUGEINT) << (y*8 + x)
        |        ELSE 0 END) AS hv
        |  FROM lum JOIN m ON lum.doc_id = m.doc_id GROUP BY lum.doc_id)
        |SELECT doc_id,
        |  CAST(CASE WHEN hv >= 9223372036854775808
        |    THEN hv - 18446744073709551616 ELSE hv END AS BIGINT) AS phash
        |FROM h ORDER BY doc_id""".stripMargin,


    // both twins' hashes recomputed (the twin flips the blue LSB of
    // source pixel (0,0) — every 8x8 cell that samples (0,0) sees it),
    // then the exhaustive pairwise popcount truth at hamming <= 3
    "mm_phash_neardup" ->
      """WITH base AS (SELECT doc_id FROM documents WHERE doc_id % 23 = 0),
        |all_ids AS (
        |  SELECT doc_id, doc_id AS src, FALSE AS twin FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, TRUE FROM base),
        |cells AS (SELECT a.doc_id, a.src, a.twin, gx.range AS x, gy.range AS y
        |  FROM all_ids a, range(0,8) gx, range(0,8) gy),
        |sc AS (SELECT doc_id, src, twin, x, y,
        |    (x * (4 + src % 5)) // 8 AS sx,
        |    (y * (3 + src % 7)) // 8 AS sy
        |  FROM cells),
        |lum AS (SELECT doc_id, x, y,
        |    (((src*31 + sx*7 + sy*13) % 256) * 299
        |     + ((src*17 + sx*3 + sy*5) % 256) * 587
        |     + (CASE WHEN twin AND sx = 0 AND sy = 0
        |        THEN xor((src*29 + sx*11 + sy*2) % 256, 1)
        |        ELSE (src*29 + sx*11 + sy*2) % 256 END) * 114) // 1000 AS l
        |  FROM sc),
        |m AS (SELECT doc_id, SUM(l) // 64 AS mean FROM lum GROUP BY doc_id),
        |h AS (SELECT lum.doc_id,
        |    SUM(CASE WHEN l > mean THEN CAST(1 AS HUGEINT) << (y*8 + x)
        |        ELSE 0 END) AS hv
        |  FROM lum JOIN m ON lum.doc_id = m.doc_id GROUP BY lum.doc_id),
        |hs AS (SELECT doc_id,
        |  CAST(CASE WHEN hv >= 9223372036854775808
        |    THEN hv - 18446744073709551616 ELSE hv END AS BIGINT) AS ph
        |  FROM h)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
        |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,


    // the stub feature is a 16-bin byte histogram of the utf-8 payload, so
    // dim == 16 and sum(bins) == byte length — both engine-independent
    "mm_features" ->
      """SELECT doc_id, CAST(16 AS BIGINT) AS feature_dim,
        |  CAST(strlen(text) AS BIGINT) AS feature_sum
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
