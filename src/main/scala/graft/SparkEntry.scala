package graft

import graft.functions.TimeFns._
import graft.functions.TextFns._
import graft.functions.VectorFns
import graft.multimodal.Multimodal
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator IDs
  * (A=aggregation, J=join, P=projection/split, T=stateful, F=scalar fn,
  * S=source; dedup/sim/text/mm = the LLM-pipeline extensions).
  *
  * Numeric discipline for oracle parity: every money/measure sum runs in
  * DecimalType (exact, associative — reproducible under any partitioning)
  * and is cast to double only at the end; single divisions of exact values
  * are bit-identical across engines. Window starts are computed as
  * epoch-floor (integer math), formatted as strings.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private def dec(c: String): org.apache.spark.sql.Column =
    col(c).cast("decimal(18,2)")

  /** tmpfs root for gate-scoped throwaway stores (same /dev/shm-or-tmpdir
    * rule as Sources.ensureEventsSplit). */
  private def shmRoot: String =
    if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
    else System.getProperty("java.io.tmpdir")

  /** Recursive delete for gate-scoped throwaway dirs (every gate that
    * stages a fixture sweeps it here, success or failure). */
  private def rmTree(p: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(go)
      f.delete(); ()
    }
    go(new java.io.File(p))
  }

  /** Runs `body` with the RocksDB state-store provider set, restoring the
    * previous provider after. The big-state posture for the *_rocksdb /
    * *_tws gates (transformWithState requires this provider); `body` must
    * MATERIALIZE its result under the conf (`localCheckpoint(true)`) —
    * a lazy DataFrame would re-plan after the conf is restored. */
  private def withRocksDb(s: SparkSession)(
      body: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    // changelog checkpointing: each commit ships the batch's changelog
    // instead of a full snapshot (snapshots move to background
    // maintenance) — the production posture for frequent small commits,
    // and measured faster here too (AbDrift r12: tws_uv_changelog 2.33 s
    // vs 2.60 s median without)
    val clKey = "spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled"
    val before = s.conf.getOption(key)
    val clBefore = s.conf.getOption(clKey)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    s.conf.set(clKey, "true")
    try body.localCheckpoint(true)
    finally {
      (before match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      })
      clBefore match {
        case Some(v) => s.conf.set(clKey, v)
        case None => s.conf.unset(clKey)
      }
    }
  }

  /** The dedup_semantic* gates' shared verdict block: materializes the
    * dedup result once (three aggregations read it) and reduces it to the
    * oracle-pinned invariants — conservation (n_total), every drop
    * witnessed by an earlier same-cell member above tau, per-cell minima
    * kept, and non-vacuity. Exact keep/drop/witness semantics are pinned
    * by DedupSpec on a constructed fixture; the oracle cannot re-learn
    * centroids in SQL (the sim_topk_ivf pattern). */
  private def semanticVerdicts(result: org.apache.spark.sql.DataFrame,
      tau: Double): org.apache.spark.sql.DataFrame = {
    val r = result.localCheckpoint(true)
    val minima = r.groupBy(col("cluster_id")).agg(min(col("vec_id")).as("min_id"))
    val minKept = r.join(minima, r("vec_id") === minima("min_id"))
      .agg(coalesce(min(when(col("keep"), 1L).otherwise(0L)), lit(1L))
        .as("minima_kept_ok"))
    val agg = r.agg(
      count(lit(1)).as("n_total"),
      coalesce(min(when(!col("keep"),
          when(col("witness_cos") > tau && col("witness_id") < col("vec_id"), 1L)
            .otherwise(0L))), lit(1L)).as("drops_witnessed_ok"),
      (sum(when(!col("keep"), 1L).otherwise(0L)) > 0).cast("long")
        .as("some_dropped"))
    agg.crossJoin(minKept)
      .select(col("n_total"), col("drops_witnessed_ok"),
        col("minima_kept_ok"), col("some_dropped"))
  }

  /** Per-(application, input-dir) memo of the n-gram near-dup pair set.
    * `dedup_ngram_jaccard`, `dedup_clusters` and `pipe_dedup_survivors`
    * consume the SAME pair set; a real pipeline computes it once and
    * persists it, so re-running the shingle scan per gate triples the
    * measured cost of one logical scan. The pair graph is orders of
    * magnitude smaller than its corpus (near-duplicates only — the same
    * boundedness argument as `Dedup.clusters`' driver fast path), so the
    * memo holds the collected rows and rebuilds a LocalRelation per call:
    * immune to inter-query cache hygiene (unpersist/clearCache) and to
    * the lost-block failure a cross-query localCheckpoint would risk.
    * Graphs above `MemoMaxPairs` are never memoized — and, crucially,
    * never fully materialized on the driver either: the probe collects at
    * most cap+1 rows (`head(cap+1)`), so an above-cap pair graph costs one
    * bounded scan and the caller gets the lazy DataFrame back — the
    * at-scale posture (persist to storage, not driver memory). Values are
    * exact Rows, so oracle hashes are unchanged. */
  /** Harness hook (CurveSf1): drop the memo so a re-timed dedup gate pays
    * its full pair scan again instead of reading the first trial's rows. */
  private[graft] def clearNgramPairsMemo(): Unit = ngramPairsMemo.clear()

  private val MemoMaxPairs = 1 << 22
  private val ngramPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (org.apache.spark.sql.types.StructType,
               Array[org.apache.spark.sql.Row])]()

  private def sharedNgramPairs(s: SparkSession, dir: String): DataFrame = {
    val key = s.sparkContext.applicationId + "|" + dir
    val cached = Option(ngramPairsMemo.get(key))
    cached match {
      case Some((schema, rows)) =>
        s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      case None =>
        val df = Dedup.ngramJaccardPairs(Tables.documents(s, dir))
        // head(cap+1) bounds driver memory: Spark stops fetching once it
        // has cap+1 rows, so an above-cap graph never lands on the driver
        val rows = df.head(MemoMaxPairs + 1)
        if (rows.length <= MemoMaxPairs) {
          ngramPairsMemo.put(key, (df.schema, rows))
          s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
        } else df
    }
  }

  /** Exhaustive pairwise-Jaccard truth, shared by the inverted-index gate
    * and the prefix-filtered gate: both candidate-generation strategies
    * must land on the identical J >= 0.5 pair set. */
  private val ngramJaccardOracleSql =
    """WITH toks AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (SELECT doc_id,
      |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |      ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS s
      |  FROM toks),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.s, b.s)) AS i, len(a.s) AS la, len(b.s) AS lb
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, CAST(i AS DOUBLE)/(la + lb - i) AS jaccard
      |FROM p WHERE CAST(i AS DOUBLE)/(la + lb - i) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Token-bucket admission truth, shared by the batch fold gate and its
    * transformWithState streaming twin: the identical integer recurrence
    * replayed row-by-row through a recursive CTE. */
  private val rateLimitOracleSql =
    """WITH RECURSIVE e AS (SELECT user_id % 2 AS k,
      |    epoch_us(CAST(ts AS TIMESTAMP))//1000000//86400 AS tick,
      |    event_id AS vid,
      |    row_number() OVER (PARTITION BY user_id % 2
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
      |  FROM events WHERE event_id % 37 = 0),
      |rec AS (
      |  SELECT k, rn, tick, CAST(4 AS BIGINT) AS tok, TRUE AS acc, vid
      |    FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.k, e.rn, e.tick,
      |      CASE WHEN least(5, r.tok + (e.tick - r.tick)) >= 1
      |        THEN least(5, r.tok + (e.tick - r.tick)) - 1
      |        ELSE least(5, r.tok + (e.tick - r.tick)) END,
      |      least(5, r.tok + (e.tick - r.tick)) >= 1,
      |      e.vid
      |    FROM rec r JOIN e ON e.k = r.k AND e.rn = r.rn + 1)
      |SELECT k, COUNT(*) AS n,
      |  CAST(COUNT(*) FILTER (WHERE acc) AS BIGINT) AS n_acc,
      |  CAST(COUNT(*) FILTER (WHERE NOT acc) AS BIGINT) AS n_rej,
      |  CAST(COALESCE(SUM(vid) FILTER (WHERE acc), 0) AS BIGINT) AS acc_sum,
      |  CAST(COALESCE(SUM(vid) FILTER (WHERE NOT acc), 0) AS BIGINT) AS rej_sum
      |FROM rec GROUP BY k ORDER BY k""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Flagship: TPC-H Q1 pricing summary (A-class agg, full scan shape)
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(12,2)")).cast("double") / count(lit(1)))
            .as("avg_qty"),
          (sum(col("l_discount").cast("decimal(3,2)")).cast("double") / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ── TPC-H Q3 shape: selective dim filter → 3-way join → grouped
    // revenue → top-N. The filtered customer side is small at sf scales —
    // left to AQE's dynamic broadcast rather than forced (at 100 TB
    // customer is fact-sized; forcing a broadcast would be wrong there).
    // Top-N is fully tie-broken (revenue, date, orderkey) so LIMIT is
    // deterministic across engines.
    "q3_order_revenue" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_date"), col("l_orderkey"))
        .limit(10)
    }),

    // ── TPC-H Q5 shape: 6-way join down the region→nation→supplier spine
    // with a customer-nation co-location constraint. nation⨝region is
    // O(25) rows — broadcast unconditionally (correct at any scale); the
    // fact-side joins shuffle on their keys and AQE handles the rest.
    "q5_region_volume" -> ((s, dir) => {
      val nat = Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ── TPC-H Q4 shape: EXISTS → left-semi join (equi key + date
    // residual). The semi join emits each order at most once regardless
    // of how many lineitems qualify — the dedup the EXISTS contract
    // requires, with no distinct pass.
    "q4_priority_semi" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      ord.join(Tables.lineitem(s, dir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL '90' DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // ── NOT EXISTS → left-anti join: orders none of whose lineitems
    // shipped within 30 days. Completes the semi (q4) / anti join-shape
    // pair as a direct gate (left_anti otherwise appears only inside the
    // decontaminate / keepCanonical pipelines).
    "q6_priority_anti" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      ord.join(Tables.lineitem(s, dir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL '30' DAY"),
          "left_anti")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // ── TPC-H Q6 shape: pure filter + global aggregate — zero joins,
    // zero groupBy shuffle (partial agg per partition → one-row merge).
    // The three predicates push into the parquet scan (PlanSpec pins
    // PushedFilters), so at 100 TB row groups outside the date year are
    // never decompressed — the plan IS the I/O budget.
    "q6f_filter_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            col("l_discount").cast("decimal(3,2)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("ct"))),

    // ── TPC-H Q7 shape: two-nation volume shipping — the supplier-nation
    // × customer-nation cross-filter join. nation is O(25) rows →
    // broadcast both legs unconditionally (correct at any scale); the
    // lineitem⨝orders⨝customer/supplier spine shuffles on its keys.
    "q7_nation_volume" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_natkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_natkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_natkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_natkey"))
        .filter((col("supp_nation") === "FRANCE" && col("cust_nation") === "GERMANY") ||
          (col("supp_nation") === "GERMANY" && col("cust_nation") === "FRANCE"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // ── TPC-H Q8 shape: national market share — a 7-table star join
    // (fact + two filtered dims + customer/supplier legs + two nation
    // roles + region) feeding a conditional-fraction aggregate. Dims
    // broadcast (nation/region always; part/supplier by AQE size rule);
    // the fact shuffles once per non-broadcast equi key. The share is
    // exact-decimal numerator/denominator, ONE double division at the
    // end — engine-portable (BASELINE.md parity idiom).
    "q8_market_share" -> ((s, dir) => {
      val nSupp = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_natkey"), col("n_name").as("supp_nation"))
      val nCust = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_natkey"),
          col("n_regionkey").as("c_regionkey"))
      val rEur = Tables.region(s, dir)
        .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))
      val pMed = Tables.part(s, dir)
        .filter(col("p_type") === "MEDIUM").select(col("p_partkey"))
      val vol = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
      Tables.lineitem(s, dir)
        .join(pMed, col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nCust), col("c_nationkey") === col("c_natkey"))
        .join(broadcast(rEur), col("c_regionkey") === col("r_regionkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nSupp), col("s_nationkey") === col("s_natkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1", vol)).cast("double")
            .as("nation_volume"),
          sum(vol).cast("double").as("total_volume"))
        .select(col("o_year"),
          coalesce(col("nation_volume"), lit(0.0)).as("nation_volume"),
          col("total_volume"),
          (coalesce(col("nation_volume"), lit(0.0)) / col("total_volume"))
            .as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // ── J8: salted equi-join — the targeted skew recipe as a direct gate.
    // The salt only changes DISTRIBUTION (hot l_orderkey spread over 8
    // reducers; orders replicated ×8), so the joined/aggregated result is
    // identical to the plain join the oracle runs — that identity IS the
    // correctness claim. SkewSpec pins that the physical join key actually
    // includes the salt and spreads the hot key.
    "j8_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Joins.saltedJoin(li, ord, "l_orderkey", buckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("ct"),
          sum(col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

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

    // ── TPC-H Q10 shape: returned-item revenue, top-20 customers — a
    // selective fact filter, three-way join, grouped revenue, and a
    // bounded ORDER BY ... LIMIT (TakeOrdered: k rows per partition →
    // driver merge, never a global sort). Tie-break on c_custkey keeps
    // the limit boundary deterministic across engines.
    "q10_returned_customers" -> ((s, dir) => {
      Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ── TPC-H Q14 shape: promo revenue share — one month of the fact,
    // part joined for its type, a conditional-fraction aggregate. Exact
    // decimal numerator/denominator, ONE double division (the portable
    // idiom); the filter prunes the fact scan before the join.
    "q14_promo_share" -> ((s, dir) => {
      val vol = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", vol)).cast("double")
            .as("promo_revenue"),
          sum(vol).cast("double").as("total_revenue"))
        .select(
          coalesce(col("promo_revenue"), lit(0.0)).as("promo_revenue"),
          col("total_revenue"),
          (lit(100.0) * coalesce(col("promo_revenue"), lit(0.0)) /
            col("total_revenue")).as("promo_share"))
    }),

    // ── TPC-H Q19 shape: disjunction of (brand × size × quantity)
    // brackets as the JOIN condition — the classic OR-of-ANDs plan
    // challenge. The equi key still drives a hash join; the brackets
    // evaluate as a residual, and the single-side conjuncts
    // (brand/size on part, quantity on lineitem) are pushable.
    "q19_or_brackets" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val pt = Tables.part(s, dir)
      val bracket =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      li.join(pt, col("l_partkey") === col("p_partkey") && bracket)
        .agg(count(lit(1)).as("ct"),
          coalesce(sum(col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
            .cast("double"), lit(0.0)).as("revenue"))
    }),

    // ── TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    // join (customers with no qualifying orders must survive as count 0)
    // into a two-level aggregate. The orders-side predicate (stand-in for
    // Q13's o_comment NOT LIKE; this fixture has no comment column) is
    // applied BEFORE the join — for a left-outer join that is equivalent
    // to a join-condition predicate and prunes the shuffle. All-integer
    // result: engine-exact.
    "q13_order_dist" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.customer(s, dir).select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ── TPC-H Q18 shape: large-volume orders — a HAVING-filtered
    // aggregate subquery (sum(l_quantity) > 300 keeps ~0.3% of orders)
    // semi-joins the fact BEFORE the customer/lineitem joins, so the
    // expensive joins see only the pruned order set; the tiny survivor
    // list is broadcast (plan-pinned). Top-100 is TakeOrdered, never a
    // global sort. l_quantity is integral, so the double sum is exact.
    "q18_big_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
        .select(col("l_orderkey").as("big_okey"))
      Tables.orders(s, dir)
        .join(broadcast(big), col("o_orderkey") === col("big_okey"), "left_semi")
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_totalprice"))
        .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // ── TPC-H Q21 shape: suppliers who alone "failed" a multi-supplier
    // order — EXISTS (another supplier in the order) as a LEFT SEMI join
    // and NOT EXISTS (another FAILING supplier in the order) as a LEFT
    // ANTI join, both equi-keyed on l_orderkey with the <> residual, so
    // they plan as hash/merge joins, never cartesian (plan-pinned). The
    // fixture has no receipt/commit dates; l_returnflag = 'R' stands in
    // for Q21's "late" predicate — the join topology is identical.
    "q21_wait_suppliers" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
      val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val otherFails = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      l1.join(others,
          col("ok2") === col("l_orderkey") && col("sk2") =!= col("l_suppkey"),
          "left_semi")
        .join(otherFails,
          col("ok3") === col("l_orderkey") && col("sk3") =!= col("l_suppkey"),
          "left_anti")
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // ── TPC-H Q22 shape: scalar subquery in the filter + NOT EXISTS.
    // The positive-balance aggregate is ONE row cross-joined as a
    // broadcast (plan-pinned BroadcastNestedLoopJoin — the scalar-
    // subquery plan); the threshold compare multiplies by the count
    // instead of dividing (c_acctbal × cnt > sum: exact decimal×int on
    // both engines — an avg would put a reassociated double on the
    // knife edge). NOT EXISTS (an urgent order; this fixture gives every
    // customer orders, so Q22's "no orders at all" would be empty) is a
    // LEFT ANTI join.
    "q22_no_urgent" -> ((s, dir) => {
      val nations = Seq(1L, 3L, 5L, 7L, 9L)
      val cust = Tables.customer(s, dir)
        .filter(col("c_nationkey").isin(nations: _*))
      val pos = cust.filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast("decimal(12,2)")).as("tot"),
          count(lit(1)).as("cnt"))
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(pos))
        .filter(col("c_acctbal").cast("decimal(12,2)") * col("cnt") > col("tot"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(12,2)")).cast("double")
            .as("totacctbal"))
        .orderBy(col("c_nationkey"))
    }),

    // ── Z-order layout key: the native Morton-interleave expression
    // (expressions/ZValue.scala) computed over two part-derived dims.
    // The gate pins the BIT-EXACT curve value against an oracle that
    // spells out the interleave as shifts and ORs — a wrong bit
    // position, mask, or column order lands a different long. The
    // layout PAYOFF (per-file min/max envelopes, file skipping) is
    // measured in ZOrderSpec, where two written layouts are compared;
    // a value gate is the right oracle shape because layout itself
    // never changes query answers.
    "zorder_layout" -> ((s, dir) => {
      import graft.functions.LayoutFns
      Tables.part(s, dir).select(col("p_partkey"),
          pmod(col("p_partkey"), lit(1024L)).as("x"),
          pmod(expr("p_partkey div 7"), lit(1024L)).as("y"))
        .select(col("p_partkey"),
          LayoutFns.zvalue(10, col("x"), col("y")).as("zval"))
        .orderBy(col("p_partkey"))
    }),

    // ── Exact heavy hitters WITHOUT a full-key shuffle: per-partition
    // Misra-Gries candidates (one scan, zero shuffle, provable superset
    // of every key above N/(k+1)) + a candidate-or-other recount whose
    // aggregation key space is ≤ candidates+1. Fixture derives a skewed
    // key from l_orderkey (key 0 ≈ 50%, key 1 ≈ 25%, keys 2–5 ≈ 6.25%
    // each); capacity 7 → threshold N/8, so exactly {0, 1} qualify with
    // wide margins at every sf. Oracle is the plain GROUP BY + HAVING —
    // the two-pass shape must return EXACTLY the true answer, whatever
    // the sampled candidate set.
    "freq_heavy_hitters" -> ((s, dir) => {
      val keyed = Tables.lineitem(s, dir).select(
        when(pmod(col("l_orderkey"), lit(16L)) < 8, lit(0L))
          .when(pmod(col("l_orderkey"), lit(16L)) < 12, lit(1L))
          .otherwise(pmod(col("l_orderkey"), lit(16L)) - 10L).as("k"))
      graft.operators.Frequency.heavyHitters(keyed, "k", capacity = 7)
        .orderBy(col("k"))
    }),

    // ── J8b: TARGETED hot-key salting — the 100 TB refinement of j8.
    // Only keys above a sampled frequency threshold are salted; the cold
    // tail joins unsalted, so the right side replicates ×buckets for the
    // hot slice only (JoinsSpec counts the salted legs). The testdata's
    // categorical columns are all uniform, so the fixture DERIVES a
    // skewed key from l_orderkey (key 0 carries ~60% of rows, keys 6-9
    // ~10% each); the 1%-of-rows sample threshold flags exactly key 0 at
    // every sf, so the gate exercises BOTH legs. The oracle is the plain
    // join: equality is the claim whatever the sampled hot set, exactly
    // as with j8.
    "j8b_salted_hot" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        when(pmod(col("l_orderkey"), lit(10L)) < 6, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(10L))).as("skew_k"),
        col("l_extendedprice"), col("l_tax"))
      val dim = li.groupBy(col("skew_k"))
        .agg(min(col("l_tax").cast("decimal(12,2)")).cast("double")
          .as("k_min_tax"))
      val thresh = math.max(1L, li.count() / 100L)
      Joins.saltedJoinTargeted(li.drop("l_tax"), dim, "skew_k", buckets = 8,
          sampleFraction = 0.05, hotMinSampleCount = thresh, maxHotKeys = 16)
        .groupBy(col("skew_k"))
        .agg(count(lit(1)).as("ct"),
          sum(col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double").as("revenue"),
          min(col("k_min_tax")).as("k_min_tax"))
        .orderBy(col("skew_k"))
    }),

    // ── J9: bloom-filter pre-join — the build side (urgent 1997 H1
    // orders, ~4% of orders) is selective, so ~96% of lineitem rows
    // cannot match; the bloom drops them BEFORE the join shuffle. False
    // positives are removed by the exact join, so the oracle is the
    // plain join — equality IS the claim (same contract as j8).
    "j9_bloom_join" -> ((s, dir) => {
      val build = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderpriority"))
      Joins.bloomPreFilteredJoin(
          Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_extendedprice")),
          build, "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("ct"),
          sum(col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // ── J10: binned range join — point-in-interval containment with NO
    // equi key (j1/j2 carry their band on an equi key; this shape has
    // none, which naively forces BroadcastNestedLoop). Points are
    // lineitem prices in cents; ranges are 500-cent windows derived
    // from order totals (lo = total-cents mod 1e7 — width sized so the
    // sf0.1 candidate volume stresses the join without dominating the
    // bench). binWidth equals the range span, so each range covers ≤2
    // bins and the ranges side at most doubles; the plan is an ordinary
    // bin-key hash join (PlanSpec pins no nested-loop/cartesian). The
    // oracle is DuckDB's native inequality join — equality is the claim.
    "j10_range_join" -> ((s, dir) => {
      val pts = Tables.lineitem(s, dir).select(
        (col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long").as("p"))
      val rng = Tables.orders(s, dir).select(
        col("o_orderkey").as("range_id"),
        pmod((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"),
          lit(10000000L)).as("lo"))
        .withColumn("hi", col("lo") + lit(500L))
      Joins.rangeJoinBinned(pts, rng, "p", "lo", "hi", binWidth = 500L)
        .groupBy(col("range_id"))
        .agg(count(lit(1)).as("ct"),
          sum(col("p")).cast("double").as("psum"))
        .orderBy(col("range_id"))
    }),

    // ── J11: bucketed co-located join — both sides written bucketBy(8)
    // on their join keys (one-off layout cost), then joined with ZERO
    // exchanges (PlanSpec pins no shuffle before the SortMergeJoin; the
    // merge hint keeps the broadcast path from hiding the claim). This
    // is SCALE.md's "pre-partitioned inputs skip the exchange" made
    // runnable: at 100 TB the fact table shuffles once at ingest, never
    // per query. Result materialized (localCheckpoint) so the throwaway
    // tables + files can be swept in finally. Oracle: the plain join —
    // layout must not change the answer.
    "j11_bucketed_join" -> ((s, dir) => {
      val root = shmRoot
      val uniq = System.nanoTime()
      val (ltab, rtab) = (s"graft_bkt_li_$uniq", s"graft_bkt_ord_$uniq")
      val (lpath, rpath) = (s"$root/$ltab", s"$root/$rtab")
      try {
        graft.operators.Bucketing.writeBucketed(
          Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_extendedprice")),
          ltab, lpath, "l_orderkey", numBuckets = 8)
        graft.operators.Bucketing.writeBucketed(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
          rtab, rpath, "o_orderkey", numBuckets = 8)
        graft.operators.Bucketing.bucketedJoin(s, ltab, rtab,
            "l_orderkey", "o_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("ct"),
            sum(col("l_extendedprice").cast("decimal(12,2)"))
              .cast("double").as("revenue"))
          .orderBy(col("o_orderpriority"))
          .localCheckpoint(true)
      } finally {
        graft.operators.Bucketing.drop(s, ltab)
        graft.operators.Bucketing.drop(s, rtab)
        rmTree(lpath); rmTree(rpath)
      }
    }),

    // ── J13: null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) — the
    // dirty-dimension reality: keys go null (unparsed, unknown) and a
    // plain equi-join silently DROPS those rows, while `<=>` matches
    // null-to-null as one more key value. Still a hash join (null is
    // hashable under null-safe equality — PlanSpec-class claim: no
    // nested loop); the null bucket is ordinary join skew if nulls
    // dominate (then: filter-split the null keys, union back — the
    // salting family). Both sides derive a sparse nullable key from
    // orders/customer so the null×null arm carries real volume.
    "j13_nullsafe_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        when(col("o_custkey") % 49 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey") % 1000).as("k"),
        col("o_totalprice"))
      val c = Tables.customer(s, dir).select(
        when(col("c_custkey") % 25 === 0, lit(null).cast("long"))
          .otherwise(col("c_custkey") % 1000).as("k"),
        col("c_acctbal"))
      o.join(c, o("k") <=> c("k"))
        .groupBy(coalesce(o("k").cast("string"), lit("NULLKEY")).as("k"))
        .agg(count(lit(1)).as("pairs"),
          sum(dec("o_totalprice")).cast("double").as("price_sum"))
        .orderBy(col("k"))
    }),

    // ── J15: LATERAL correlated subquery (top-N per outer row in SQL) —
    // the per-row-subquery surface Catalyst decorrelates into a window
    // rank under the hood (DecorrelateInnerQuery; q2 does the rewrite by
    // hand, this gate hands the ENGINE the correlated form). Output is
    // the top-2 price SUM per order, which depends only on the top-2
    // price multiset — ties in price cannot change it, so no synthetic
    // tie-break column is needed.
    "j15_lateral_topn" -> ((s, dir) =>
      s.sql(s"""SELECT o.o_orderkey,
        |  CAST(SUM(CAST(l.price AS DECIMAL(18,2))) AS DOUBLE) AS top2_sum,
        |  COUNT(*) AS ct
        |FROM parquet.`$dir/orders.parquet` o,
        |LATERAL (SELECT l_extendedprice AS price
        |         FROM parquet.`$dir/lineitem.parquet`
        |         WHERE l_orderkey = o.o_orderkey
        |         ORDER BY l_extendedprice DESC LIMIT 2) l
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin)),

    // ── J16: fuzzy (edit-distance-1) self-join via FastSS deletion
    // neighborhoods (operators/Fuzzy.scala) — the approximate-string
    // join a spell-correcting entity resolver needs, where the naive
    // shape is |W|² levenshtein calls. Blocking: each word expands to
    // itself + its 1-deletions (linear, scan-side), candidates come
    // from ONE equi-shuffle on the shared variant, and an exact
    // levenshtein verifies (sharing is necessary, not sufficient:
    // "ab"/"ba" share "a" at distance 2 and must be rejected). Keys =
    // every-7th orderkey as strings — digit substitutions and
    // length-changing edits both occur at every scale (234/3266/41857
    // pairs). The oracle is the brute-force length-banded cross join.
    "j16_fuzzy_join" -> ((s, dir) => {
      val keys = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").cast("string").as("w")).distinct()
      Fuzzy.editDistance1Pairs(keys, "w").orderBy(col("w1"), col("w2"))
    }),

    // ── J14: temporal table join (Flink's FOR SYSTEM_TIME AS OF — the
    // reference's versioned-dim lookup semantics, `OrderWide`'s dims
    // done time-correctly): each fact joins the dim VERSION whose
    // [effective_from, effective_to) interval contains the fact's event
    // time — never today's value for yesterday's fact. Composes Scd.scd2
    // (builds the intervals from a changelog) with an equi-key hash join
    // + interval residual (the j6 as-of family; no nested loop — the key
    // drives the join, the interval only filters). Two-version fixture:
    // every customer has a v1; every third customer re-versions at
    // 1998-01-01, so both the version-split and the never-changed arms
    // carry volume.
    "j14_temporal_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val v1 = c.select(col("c_custkey"),
        lit("1992-01-01 00:00:00").cast("timestamp").as("ts"),
        lit(1L).as("seq"), col("c_acctbal").as("bal"))
      val v2 = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          lit("1998-01-01 00:00:00").cast("timestamp").as("ts"),
          lit(2L).as("seq"), (col("c_acctbal") + 100.0).as("bal"))
      val hist = graft.operators.Scd.scd2(
        v1.unionByName(v2), "c_custkey", "ts", "seq", Seq("bal"))
      val facts = Tables.orders(s, dir).select(
        col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("ft"))
      facts.join(hist,
          facts("o_custkey") === hist("c_custkey") &&
            col("ft") >= col("effective_from") &&
            (col("effective_to").isNull ||
              col("ft") < col("effective_to")))
        .groupBy(col("seq").as("version"))
        .agg(count(lit(1)).as("ct"),
          sum(dec("o_totalprice")).cast("double").as("price_sum"),
          sum(col("bal").cast("decimal(18,2)")).cast("double").as("bal_sum"))
        .orderBy(col("version"))
    }),

    // ── J14 streaming twin: temporal enrich as a STREAM-STATIC join —
    // the reference's production shape (OrderWide's dim lookups) done
    // time-correctly: each arriving fact joins the SCD2 version valid at
    // ITS event time, not the dim's latest value. Stream-static inner
    // joins are stateless on the stream side (no watermark, no join
    // state — the static side is just a build relation per micro-batch),
    // so this costs what the batch join costs, re-planned per batch.
    // Same oracle as j14 — the execution mode must not change the answer.
    "stream_j14_temporal" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val v1 = c.select(col("c_custkey"),
        lit("1992-01-01 00:00:00").cast("timestamp").as("ts"),
        lit(1L).as("seq"), col("c_acctbal").as("bal"))
      val v2 = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          lit("1998-01-01 00:00:00").cast("timestamp").as("ts"),
          lit(2L).as("seq"), (col("c_acctbal") + 100.0).as("bal"))
      val hist = graft.operators.Scd.scd2(
        v1.unionByName(v2), "c_custkey", "ts", "seq", Seq("bal"))
      val facts = Tables.orders(s, dir).select(
        col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("ft"))
      def part(i: Int) = facts.filter(pmod(col("o_custkey"), lit(3L)) === i)
      val stage = s"$shmRoot/graft-tmpj-${System.nanoTime()}"
      try {
        val stream = graft.streaming.Sources.stagedChunkStream(s,
          Seq(part(0), part(1), part(2)), Some(stage))
        graft.streaming.StreamRunner.collect(
          stream.join(hist,
            stream("o_custkey") === hist("c_custkey") &&
              col("ft") >= col("effective_from") &&
              (col("effective_to").isNull ||
                col("ft") < col("effective_to")))
            .select(col("seq").as("version"), col("o_totalprice"),
              col("bal")),
          statePartitions = 2)
          .groupBy(col("version"))
          .agg(count(lit(1)).as("ct"),
            sum(dec("o_totalprice")).cast("double").as("price_sum"),
            sum(col("bal").cast("decimal(18,2)")).cast("double")
              .as("bal_sum"))
          .orderBy(col("version"))
          .localCheckpoint(true)
      } finally rmTree(stage)
    }),

    // ── J12: dynamic partition pruning — the star-schema runtime
    // pruning that makes dimension-filtered fact scans cheap at 100 TB:
    // the dim filter's key set is computed at runtime and injected as a
    // PARTITION filter on the fact scan, so 25 of 30 day-partitions are
    // never read (static pruning can't see through a join).
    // Fact = events partitioned by day on disk; dim = a calendar frame
    // whose filter keeps 5 days. FileMaintenanceSpec pins the
    // dynamicpruning subquery in the fact scan's partition filters;
    // the oracle pins the answer.
    "j12_dpp" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-dpp-${System.nanoTime()}"
      try {
        Tables.events(s, dir)
          .withColumn("dt", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("dt").parquet(path)
        val fact = s.read.parquet(path)
        val dim = s.range(0, 30)
          .select(date_add(lit("2024-01-01").cast("date"),
            col("id").cast("int")).as("dt"),
            (col("id") + 1).as("day_no"))
          .filter(col("day_no") <= 5)
        fact.join(dim, "dt")
          .groupBy(date_format(col("dt"), "yyyy-MM-dd").as("dt"),
            col("event_type"))
          .agg(count(lit(1)).as("ct"),
            countDistinct(col("user_id")).as("users"))
          .orderBy(col("dt"), col("event_type"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── TPC-H Q2 shape: correlated "best row per group" subquery,
    // decorrelated into a window max + equality filter — ONE shuffle on
    // the group key instead of a per-row rescan. Ties all kept (the
    // EXISTS/= MAX contract), deterministic output.
    "q2_top_supplier" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("n_nationkey"))
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .withColumn("max_bal", max(col("s_acctbal")).over(w))
        .filter(col("s_acctbal") === col("max_bal"))
        .select(col("n_name"), col("s_name"),
          col("s_acctbal").cast("double").as("s_acctbal"))
        .orderBy(col("n_name"), col("s_name"))
    }),

    // ── TPC-H Q9 shape: profit by (nation, year) through a 4-table join
    // chain. The fact (lineitem) drives; part (name-filtered), supplier
    // and nation are all vocabulary-sized → broadcast, so the fact
    // shuffles ONCE, for the final group-by. `p_name LIKE '%widget%'` is
    // a contains-match (no prefix) — it evaluates scan-side but cannot
    // prune row groups; the plan pin checks the join order, not pushdown.
    "q9_profit" -> ((s, dir) => {
      val vol = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").contains("widget")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(sum(vol).cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // ── TPC-H Q11 shape: group aggregate HAVING-compared against a
    // GLOBAL scalar subquery (Q11's "important stock" fraction). The
    // one-row global aggregate broadcasts (scalar-subquery plan); the
    // compare multiplies by the group count instead of dividing — exact
    // decimal×int on both engines (the q22 idiom). partsupp is absent
    // from the fixture, so per-part lineitem value stands in for stock
    // value; the HAVING-vs-scalar topology is identical.
    "q11_important_parts" -> ((s, dir) => {
      val vol = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
      val perPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(sum(vol).as("value_dec"))
      val global = perPart.agg(sum(col("value_dec")).as("tot"),
        count(lit(1)).as("nparts"))
      perPart.crossJoin(broadcast(global))
        .filter(col("value_dec") * col("nparts") > col("tot"))
        .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // ── TPC-H Q12 shape: join + CONDITIONAL aggregation (CASE WHEN
    // inside the sums) — one pass computes both priority counts; naive
    // twin filtered aggregates would scan and join twice. All-integer
    // output: engine-exact. l_linestatus stands in for l_shipmode
    // (absent from the fixture); the shape is identical.
    "q12_priority_lines" -> ((s, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "N" &&
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linestatus")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_linestatus").as("shipmode"))
        .agg(sum(when(high, 1).otherwise(0)).cast("long").as("high_line_count"),
          sum(when(!high, 1).otherwise(0)).cast("long").as("low_line_count"))
        .orderBy(col("shipmode"))
    }),

    // ── TPC-H Q15 shape: aggregated view + `= (SELECT MAX(...) FROM
    // view)` scalar subquery. The revenue view computes ONCE feeding
    // both consumers; its one-row max broadcasts and the equality filter
    // runs on the EXACT decimal sum (never the double cast — a double
    // max-equality would be a cross-engine knife edge). Ties all kept.
    "q15_top_revenue_supplier" -> ((s, dir) => {
      val vol = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
      val revenue = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey")).agg(sum(vol).as("total_rev"))
      val mx = revenue.agg(max(col("total_rev")).as("mx"))
      Tables.supplier(s, dir)
        .join(revenue, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // ── TPC-H Q16 shape: NOT IN (subquery) → LEFT ANTI join + COUNT
    // DISTINCT per attribute group. The distinct (part, supplier) pairs
    // from lineitem stand in for partsupp (absent from the fixture).
    // The excluded-supplier list is tiny → broadcast anti join; p_size
    // IN (...) pushes to the part scan.
    "q16_supplier_cnt" -> ((s, dir) => {
      val ps = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val excluded = Tables.supplier(s, dir)
        .filter(col("s_name").endsWith("5")).select(col("s_suppkey"))
      ps.join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(excluded),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // ── TPC-H Q17 shape: correlated per-group AVG scalar subquery
    // ("quantity below 20% of this part's average"), decorrelated into a
    // per-part aggregate + broadcast join — the per-row rescan Q17
    // literally writes would be O(n²). The compare is all-integer-
    // valued: qty < 0.2·(sum/cnt) ⟺ 5·qty·cnt < sum (l_quantity is
    // integral; zero doubles on the knife edge). Output divides the
    // exact decimal sum by 7.0 once — a single IEEE division, portable.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("l_quantity"), col("l_extendedprice"))
      val th = li.groupBy(col("p_partkey").as("pk2"))
        .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("cq"))
      li.join(broadcast(th), col("p_partkey") === col("pk2"))
        .filter(col("l_quantity") * 5 * col("cq") < col("sq"))
        .agg((coalesce(sum(col("l_extendedprice").cast("decimal(12,2)")), lit(0))
            .cast("double") / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("ct"))
    }),

    // ── TPC-H Q20 shape: nested semi-join chain with a correlated
    // aggregate subquery — suppliers (in a nation band) who are the
    // DOMINANT supplier of some name-filtered part (sp_qty = per-part
    // MAX, the correlated aggregate; integer-exact equality). Two
    // aggregates over the same filtered join feed a broadcast semi
    // chain; the supplier table itself never shuffles.
    "q20_dominant_suppliers" -> ((s, dir) => {
      val lp = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").contains("bolt")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("l_suppkey"), col("l_quantity"))
      val spq = lp.groupBy(col("p_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("sp_qty"))
      val mx = spq.groupBy(col("p_partkey").as("pk2"))
        .agg(max(col("sp_qty")).as("mx_qty"))
      val dominant = spq.join(broadcast(mx),
          col("p_partkey") === col("pk2") && col("sp_qty") === col("mx_qty"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_nationkey") < 13).select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(dominant),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_name"))
    }),

    // ── A12: PIVOT — wide per-category columns in one pass. The value
    // list is EXPLICIT (the 5 TPC-H priorities): pivot without values
    // costs an extra distinct scan and makes the output schema
    // data-dependent — both wrong at 100 TB. One shuffle on the group
    // key; per-category sums partial-agg map-side.
    "a12_pivot" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
          "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_notspec",
          "5-LOW" -> "p5_low"))
        .orderBy(col("o_year"))),

    // ── A12b: UNPIVOT (melt) — the inverse reshape of a12's pivot: wide
    // per-priority columns back to (year, priority, total) rows. Pure
    // per-row expansion (Expand node) — zero additional shuffle beyond
    // the pivot's own aggregate.
    "a12b_unpivot" -> ((s, dir) => {
      val wide = queries("a12_pivot")(s, dir)
      wide.unpivot(
          Array(col("o_year")),
          Array(col("p1_urgent"), col("p2_high"), col("p3_medium"),
            col("p4_notspec"), col("p5_low")),
          "priority", "total")
        .filter(col("total").isNotNull)
        .orderBy(col("o_year"), col("priority"))
    }),

    // ── A16: higher statistical moments — stddev/variance (sample) +
    // skewness/kurtosis per group. Merge-order float drift across
    // engines is ~1e-12 relative; both sides truncate at 1e-6 (the
    // established truncate6 idiom — floor, never round) so the compare
    // is stable. DuckDB kurtosis is excess-kurtosis like Spark's.
    "a16_moments" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          truncate6(stddev_samp(col("l_quantity"))).as("sd_qty"),
          truncate6(var_samp(col("l_quantity"))).as("var_qty"),
          truncate6(skewness(col("l_quantity"))).as("skew_qty"),
          truncate6(kurtosis(col("l_quantity"))).as("kurt_qty"),
          truncate6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
          truncate6(covar_samp(col("l_quantity"), col("l_extendedprice")))
            .as("covar_qp"),
          count(lit(1)).as("ct"))
        .orderBy(col("l_returnflag"))),

    // ── A21: linear-regression aggregates (regr_*) — the one-pass
    // distributed OLS fit price ~ quantity per flag (slope/intercept/R²
    // from the same co-moment accumulators corr/covar ride; no second
    // scan, no driver fit). truncate6 on every double (a16 idiom) so the
    // hash compare is reassociation-proof; regr_count is integer-exact.
    "a21_regression" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          truncate6(regr_slope(col("l_extendedprice"), col("l_quantity")))
            .as("slope_pq"),
          truncate6(regr_intercept(col("l_extendedprice"), col("l_quantity")))
            .as("icept_pq"),
          truncate6(regr_r2(col("l_extendedprice"), col("l_quantity")))
            .as("r2_pq"),
          truncate6(regr_avgx(col("l_extendedprice"), col("l_quantity")))
            .as("avgx_q"),
          truncate6(regr_avgy(col("l_extendedprice"), col("l_quantity")))
            .as("avgy_p"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy(col("l_returnflag"))),

    // ── A18: ordered string aggregation — sort_array(collect_list) +
    // concat_ws is Spark's deterministic LISTAGG (collect_list alone is
    // arrival-ordered = nondeterministic; the sort is the contract).
    "a18_stringagg" -> ((s, dir) =>
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name"))))
          .as("nations"), count(lit(1)).as("ct"))
        .orderBy(col("r_name"))),

    // ── A17: re-aggregatable HLL sketches (DataSketches binary) — the
    // serving-layer pattern at 100 TB: store per-fine-grain SKETCHES, not
    // distinct sets, and answer coarser rollups by hll_union_agg with NO
    // fact re-scan (exact distincts cannot re-aggregate: distinct-of-
    // union ≠ sum-of-distincts). Estimates are engine-specific, so the
    // gate emits a checked error-bound verdict next to the exact count
    // (a1_approx convention): lgK=12 ⇒ rsd ≈ 1.6%, bound 5·rsd.
    "a17_hll_reagg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      val fine = o.groupBy(col("n_name"), col("o_orderpriority"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val coarse = fine.groupBy(col("n_name"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = o.groupBy(col("n_name"))
        .agg(count_distinct(col("o_custkey")).as("exact_ct"))
      coarse.join(exact, "n_name")
        .select(col("n_name"), col("exact_ct"),
          (abs(col("est") - col("exact_ct")) <=
            greatest(lit(3.0), lit(0.08) * col("exact_ct")))
            .cast("long").as("ok"))
        .orderBy(col("n_name"))
    }),

    // ── A22: re-aggregatable EXACT distinct via bitmaps — the other end
    // of a17's trade: where HLL re-aggregates approximately, RLE bitmaps
    // re-aggregate exactly (bitmap_or is lossless; sum-of-distincts is
    // not). Store per-(fine-grain, bucket) bitmaps of the key's bit
    // position; a coarser rollup is bitmap_or_agg per bucket + a
    // bitmap_count sum — no fact re-scan ever. Cost is memory ∝ key
    // range/density (why HLL still wins for ultra-high-cardinality keys);
    // for bounded ID spaces this is the serving-layer answer at 100 TB.
    "a22_bitmap_reagg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
      val fine = o.groupBy(col("n_name"), col("o_orderpriority"),
          expr("bitmap_bucket_number(o_custkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
          .as("bm"))
      fine.groupBy(col("n_name"), col("bkt"))
        .agg(expr("bitmap_or_agg(bm)").as("bmu"))
        .groupBy(col("n_name"))
        .agg(sum(expr("bitmap_count(bmu)")).as("exact_distinct"))
        .orderBy(col("n_name"))
    }),

    // ── A10: CUBE — all grouping-set combinations of (priority, year)
    // in one pass (partial-agg friendly: Spark expands grouping sets
    // map-side, one shuffle). Subtotal rows surface as 'ALL' via
    // coalesce so the oracle compare never hashes a grouping-null.
    "a10_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderpriority"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(count(lit(1)).as("ct"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_year").cast("string"), lit("ALL")).as("o_year"),
          col("ct"), col("total"))
        .orderBy(col("priority"), col("o_year"))),

    // ── A23: explicit GROUPING SETS — the irregular-rollup API cube and
    // rollup can't express: (priority, status), (priority), (status) but
    // NOT the grand total. Same Expand → partial agg → one shuffle
    // plan as a10_cube, with Expand emitting exactly the 3 listed sets
    // (cube would emit 4). grouping() disambiguates real NULLs from
    // set-placeholder NULLs in the output contract.
    "a23_grouping_sets" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("ct"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"),
          grouping(col("o_orderpriority")).cast("long").as("g_pri"),
          grouping(col("o_orderstatus")).cast("long").as("g_st"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("ct"), col("total"), col("g_pri"), col("g_st"))
        .orderBy(col("priority"), col("status"))),

    // ── Recursive CTE (Spark 4's WITH RECURSIVE) — iterative graph/
    // hierarchy traversal INSIDE one SQL query: walk the implicit binary
    // tree parent(k) = (k-1) div 2 over contiguous custkeys from root 0
    // and profile each depth level (~log2 n rounds; each round is one
    // join against the anchor-accumulated frontier — the engine runs the
    // same loop Graph.pageRank hand-rolls, planner-managed). Integer
    // keys and decimal balance sums keep every engine's arithmetic
    // exact; DuckDB replays the identical recursion.
    "sql_recursive_cte" -> ((s, dir) =>
      s.sql(s"""WITH RECURSIVE d(k, depth, bal) AS (
        |  SELECT c_custkey, 0, CAST(c_acctbal AS DECIMAL(18,2))
        |  FROM parquet.`$dir/customer.parquet` WHERE c_custkey = 0
        |  UNION ALL
        |  SELECT c.c_custkey, d.depth + 1, CAST(c.c_acctbal AS DECIMAL(18,2))
        |  FROM parquet.`$dir/customer.parquet` c
        |  JOIN d ON (c.c_custkey - 1) div 2 = d.k
        |  WHERE c.c_custkey >= 1)
        |SELECT depth, COUNT(*) AS ct, SUM(k) AS key_sum,
        |  CAST(SUM(bal) AS DOUBLE) AS bal_sum
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin)),

    // ── A24: window navigation with IGNORE NULLS — first/last/nth
    // non-null observation per user over a sparse column (the
    // fill-forward family: a sensor that only sometimes reports). The
    // full-frame spec makes every row of a user agree, so one distinct
    // collapses to per-user rows; (ts, event_id) total order makes the
    // picks deterministic. Nulls are injected on a derived column so the
    // ignore-nulls arm demonstrably skips real rows.
    "a24_window_nav" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_id") % 7 === 0, lit(null).cast("long"))
            .otherwise(get_json_object(col("props"), "$.k").cast("long"))
            .as("k"))
        .select(col("user_id"),
          first(col("k"), ignoreNulls = true).over(w).as("first_k"),
          last(col("k"), ignoreNulls = true).over(w).as("last_k"),
          nth_value(col("k"), 2, ignoreNulls = true).over(w).as("second_k"),
          count(col("k")).over(w).as("nonnull_ct"))
        .distinct()
        .orderBy(col("user_id"))
    }),

    // ── A25: exponential moving average per user — the order-sensitive
    // per-key fold analytics engines expose as an EMA/decay primitive.
    // A window-function closed form ((1-a)^(-j) weights) overflows doubles
    // on long series, so both engines run the SAME sequential fold over
    // the (ts, event_id)-sorted value list (Spark `aggregate` HOF, DuckDB
    // `list_reduce`, seed = first element): identical IEEE op sequence,
    // bitwise-equal doubles, no tolerance needed. Per-key arrays are
    // bounded by events-per-user; unbounded keys take the streaming
    // stateful path instead.
    "a25_ema" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          expr("sort_array(collect_list(struct(ts, event_id, value)))")
            .as("seq"))
        .select(col("user_id"), col("n_events"),
          expr("aggregate(slice(transform(seq, s -> s.value), 2, " +
            "greatest(size(seq) - 1, 0)), transform(seq, s -> s.value)[0], " +
            "(acc, x) -> 0.2D * x + 0.8D * acc)").as("ema"))
        .orderBy(col("user_id"))),

    // ── A11: LAG window — per-user inter-event gaps (the session-gap
    // primitive as an analytic function). Exact integer microsecond sums
    // + ONE final division keep the double bit-identical across engines;
    // (user, ts, event_id) ordering makes LAG deterministic under ties.
    // ── Array higher-order functions over per-order line arrays:
    // aggregate (fold), filter+size, exists, transform — the lambda
    // surface a user reshaping nested data needs, each reduced to a
    // scalar/string so the DuckDB comparison is representation-safe
    // (list-valued outputs render differently across engines). Arrays
    // are built deterministically (sort_array over collect_list).
    "f_array_hofs" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(
          sort_array(collect_list(col("l_linenumber").cast("long"))).as("ls"),
          sort_array(collect_list(
            (col("l_quantity").cast("decimal(12,2)") * 100).cast("long")))
            .as("qs"))
        .select(col("l_orderkey"),
          expr("aggregate(qs, 0L, (a, x) -> a + x)").as("q_sum"),
          expr("size(filter(qs, x -> x >= 2500))").cast("long").as("n_big"),
          expr("exists(qs, x -> x = 100)").cast("int").as("has_one"),
          expr("concat_ws(',', transform(ls, x -> cast(x * 2 as string)))")
            .as("ls2_csv"))
        .orderBy(col("l_orderkey"))
    }),

    // ── Map higher-order functions (transform_values / map_filter /
    // entries reshaping) — the map-typed twin of f_array_hofs. The map is
    // built from the same sorted parallel arrays the oracle keeps as
    // lists, so DuckDB replays the lambdas over lists without needing a
    // map type; output is a canonical sorted entries string (map iteration
    // order is not a contract — the sort is).
    "f_map_hofs" -> ((s, dir) => {
      // key = 1-based rank of the sorted quantity (l_linenumber repeats
      // within an order in this data, so it cannot key a map)
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(
          sort_array(collect_list(
            (col("l_quantity").cast("decimal(12,2)") * 100).cast("long")))
            .as("qs"))
        .select(col("l_orderkey"),
          expr("""concat_ws(',', transform(
            sort_array(map_entries(map_filter(
              transform_values(
                map_from_arrays(sequence(1L, cast(size(qs) as long)), qs),
                (k, v) -> v * 2),
              (k, v) -> v >= 5000))),
            e -> concat(cast(e.key as string), ':', cast(e.value as string))))""")
            .as("big_entries"),
          expr("""cast(size(map_from_arrays(
            sequence(1L, cast(size(qs) as long)), qs)) as long)""")
            .as("n_entries"))
        .orderBy(col("l_orderkey"))
    }),

    // ── CBO-lite: stats-driven join ordering — Profile.keyStats
    // (row count + sketch NDV, one agg per table, no exact arm: an
    // order-of-magnitude decision doesn't buy the exact-NDV Expand)
    // feeds the Selinger estimate |A⋈B| ≈ |A||B|/max(ndv), greedy
    // left-deep smallest-first. The planner starts this 4-way chain
    // from nation (25 rows) and builds dimension-out, never fact-first;
    // JoinPlannerSpec pins the chosen order, and since inner equi-joins
    // commute, the oracle is the plain join — equality is the claim.
    "cbo_join_order" -> ((s, dir) => {
      import graft.operators.{JoinPlanner, Profile}
      import JoinPlanner.{Edge, Rel}
      def rel(name: String, df: org.apache.spark.sql.DataFrame,
          keys: Seq[String]): Rel = {
        val (rows, ndv) = Profile.keyStats(df, keys)
        Rel(name, df, rows, ndv)
      }
      val plan = JoinPlanner.plan(
        Seq(
          rel("lineitem", Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_extendedprice")), Seq("l_orderkey")),
          rel("orders", Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_custkey")),
            Seq("o_orderkey", "o_custkey")),
          rel("customer", Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_nationkey")),
            Seq("c_custkey", "c_nationkey")),
          rel("nation", Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name")), Seq("n_nationkey"))),
        Seq(
          Edge("lineitem", "l_orderkey", "orders", "o_orderkey"),
          Edge("orders", "o_custkey", "customer", "c_custkey"),
          Edge("customer", "c_nationkey", "nation", "n_nationkey")))
      plan.groupBy(col("n_name"))
        .agg(count(lit(1)).as("ct"),
          sum(dec("l_extendedprice")).cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),

    // ── K8: partition backfill — dynamic partitionOverwriteMode scoped
    // to one write. The initial store lands TWO poisoned day partitions
    // (users zeroed on 01-05 and 01-09); the backfill recomputes ONLY
    // 01-05. Final truth: 01-05 corrected, 01-09 still poisoned, every
    // other day intact — which distinguishes dynamic overwrite from
    // both failure modes: a static overwrite would delete the other 28
    // days (row-count mismatch), a no-op backfill leaves 01-05 poisoned
    // (hash mismatch). Counting columns only (ct/users) — no double
    // sums ride the store.
    "k8_partition_backfill" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-backfill-${System.nanoTime()}"
      val (dayX, dayY) = ("2024-01-05", "2024-01-09")
      try {
        val truth = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("dt"), col("event_type"))
          .agg(count(lit(1)).as("ct"),
            countDistinct(col("user_id")).as("users"))
        val poisoned = truth.withColumn("users",
          when(col("dt").isin(dayX, dayY), lit(0L)).otherwise(col("users")))
        poisoned.write.mode("overwrite").partitionBy("dt").parquet(path)
        graft.streaming.Sinks.overwritePartitions(
          truth.filter(col("dt") === dayX), path, "dt")
        s.read.parquet(path)
          .select(date_format(col("dt"), "yyyy-MM-dd").as("dt"),
            col("event_type"), col("ct"), col("users"))
          .orderBy(col("dt"), col("event_type"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── K10: targeted delete (right-to-be-forgotten) — erase a set of
    // users from an append-only store by rewriting ONLY the partitions
    // their keys hash into; every other partition's files must come
    // through byte-identical. Store = events partitioned by
    // bucket = user_id mod 16; targets all live in bucket 3, so 15/16
    // partitions must not churn. The untouched_ok verdict compares the
    // full (name → size) file map outside bucket 3 before/after and the
    // oracle pins it to 1 — a full-table rewrite (same rows, new files)
    // FAILS this gate even though the row answer matches.
    "k10_targeted_delete" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-erase-${System.nanoTime()}"
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
              .toSeq.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(path))
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => f.getPath -> f.length()).toMap
      }
      try {
        val ev = Tables.events(s, dir)
          .withColumn("bucket", pmod(col("user_id"), lit(16L)))
        ev.write.mode("overwrite").partitionBy("bucket").parquet(path)
        val before = files()
        val targets = ev
          .filter(col("bucket") === 3 && col("user_id") % 5 === 0)
          .select(col("user_id"), col("bucket")).distinct()
        graft.operators.Erasure.deleteKeys(s, path, "bucket", "user_id",
          targets)
        val after = files()
        def outside(m: Map[String, Long]) =
          m.filter { case (p, _) => !p.contains("bucket=3") }
        val untouchedOk = outside(before) == outside(after)
        s.read.parquet(path)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("ct"),
            countDistinct(col("user_id")).as("users"))
          .withColumn("untouched_ok", lit(if (untouchedOk) 1L else 0L))
          .orderBy(col("event_type"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── K9: small-file compaction — the maintenance pass for fragmented
    // sinks (streaming writers, backfills, CDC upserts all emit many tiny
    // files; at 100 TB file listing, not row throughput, becomes the scan
    // bottleneck). Fixture: orders fractured to 48 files, compacted at a
    // target size chosen to land single-digit outputs; one round-robin
    // shuffle so outputs come out even (coalesce would inherit skew).
    // Rows must survive byte-exactly — the oracle runs on the ORIGINAL
    // parquet, so a dropped/duplicated row in the rewrite is a hash
    // mismatch; CompactionSpec pins the file-count mechanics.
    "k9_compaction" -> ((s, dir) => {
      val root = shmRoot
      val uniq = System.nanoTime()
      val fragPath = s"$root/graft-frag-$uniq"
      val compactPath = s"$root/graft-compact-$uniq"
      try {
        Tables.orders(s, dir).repartition(48)
          .write.mode("overwrite").parquet(fragPath)
        val (bytes, _) =
          graft.operators.Compaction.dataFileStats(s, fragPath)
        // target ≈ an eighth of the input ⇒ ~8 even-sized outputs; the
        // listing above is reused (knownBytes), not repeated
        graft.operators.Compaction.compact(s, fragPath, compactPath,
          targetBytes = math.max(1L, bytes / 8), knownBytes = Some(bytes))
        s.read.parquet(compactPath)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("ct"),
            sum(dec("o_totalprice")).cast("double").as("price_sum"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy(col("o_orderpriority"))
          .localCheckpoint(true)
      } finally { rmTree(fragPath); rmTree(compactPath) }
    }),

    // ── K11: copy-on-write MERGE INTO — one source batch carrying all
    // three arms (WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT
    // MATCHED INSERT) against a bucket-partitioned parquet store
    // (operators/Merge.scala). The source only names buckets 2 and 5,
    // so 6/8 partitions must come through byte-identical — the
    // untouched_ok verdict compares the full (file → size) map outside
    // the churned buckets before/after and the oracle pins it to 1: a
    // full-table rewrite FAILS this gate even with the right rows (the
    // k10 erasure contract applied to general writes). Updates double
    // the price, deletes take every third key of bucket 5, inserts are
    // fresh keys offset by 80M (≡ 0 mod 8, so the partition derivation
    // is exercised, not bypassed).
    "k11_merge_upsert" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-merge-${System.nanoTime()}"
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
              .toSeq.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(path))
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => f.getPath -> f.length()).toMap
      }
      try {
        val ord = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            dec("o_totalprice").as("price"), col("o_orderpriority"),
            pmod(col("o_orderkey"), lit(8L)).as("bucket"))
        ord.write.mode("overwrite").partitionBy("bucket").parquet(path)
        val before = files()
        val base = ord.filter(col("bucket").isin(2L, 5L))
        val updates = base
          .filter(col("bucket") === 2 && col("o_orderkey") % 3 === 0)
          .withColumn("price", (col("price") * 2).cast("decimal(18,2)"))
          .withColumn("op", lit("U"))
        val deletes = base
          .filter(col("bucket") === 5 && col("o_orderkey") % 3 === 1)
          .withColumn("op", lit("D"))
        val inserts = base
          .filter(col("bucket") === 2 && col("o_orderkey") % 3 === 2)
          .withColumn("o_orderkey", col("o_orderkey") + 80000000L)
          .withColumn("op", lit("I"))
        Merge.into(s, path, "bucket", "o_orderkey",
          updates.unionByName(deletes).unionByName(inserts))
        val after = files()
        def outside(m: Map[String, Long]) = m.filter { case (p, _) =>
          !p.contains("bucket=2") && !p.contains("bucket=5") }
        val untouchedOk = outside(before) == outside(after)
        s.read.parquet(path)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("ct"),
            sum(col("price")).cast("double").as("price_sum"),
            sum(col("o_orderkey")).as("key_sum"),
            count(when(col("o_orderkey") > 80000000L, 1)).as("inserted_ct"))
          .withColumn("untouched_ok", lit(if (untouchedOk) 1L else 0L))
          .orderBy(col("bucket"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── K12: incremental materialized-aggregate refresh — the batch
    // "never rescan history" maintenance pass (operators/Incremental:
    // the k3 serving-re-agg story at rest). History (orders before
    // 1997) collapses ONCE into a tiny table of MERGEABLE partials
    // (count/decimal-sum/min/max per priority — avg is derived at read
    // time, never stored); the refresh scans ONLY the landed delta and
    // the state table, so its cost is O(delta + groups) regardless of
    // history size. The oracle recomputes the aggregate over ALL
    // orders from scratch — equality proves incremental == full
    // recompute; MergeIncrementalSpec pins that the refresh plan's
    // inputFiles never touch the history beyond the one state build.
    "k12_incremental_agg" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-incragg-${System.nanoTime()}"
      try {
        val ord = Tables.orders(s, dir).withColumn("o_date",
          date_format(col("o_orderdate"), "yyyy-MM-dd"))
        val cut = "1997-01-01"
        Incremental.state(ord.filter(col("o_date") < cut),
          Seq("o_orderpriority"), sumCols = Seq("o_totalprice"),
          minMaxCols = Seq("o_date"))
          .write.mode("overwrite").parquet(path)
        val refreshed = Incremental.merge(Seq(
          s.read.parquet(path),
          Incremental.state(ord.filter(col("o_date") >= cut),
            Seq("o_orderpriority"), sumCols = Seq("o_totalprice"),
            minMaxCols = Seq("o_date"))),
          Seq("o_orderpriority"))
        Incremental.finalizeState(refreshed)
          .select(col("o_orderpriority"), col("cnt"),
            col("sum_o_totalprice").cast("double").as("price_sum"),
            col("avg_o_totalprice").as("price_avg"),
            col("min_o_date").as("dt_min"), col("max_o_date").as("dt_max"))
          .orderBy(col("o_orderpriority"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── Source: binaryFile — the raw-asset ingestion path for the
    // multimodal column family (mm_*): a directory of opaque files
    // becomes (path, length, content) rows with NO decode step, content
    // lands as a binary column ready for the mapPartitions feature
    // extractors. Fixture: every 25th doc's UTF-8 bytes as .bin files
    // (driver-side staging is fixture setup, not the operator); the
    // oracle recomputes byte length and md5 from the raw table — length
    // must be BYTES (strlen), not chars, or the zh docs fail the hash.
    "source_binary_files" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-bin-${System.nanoTime()}"
      try {
        new java.io.File(path).mkdirs()
        Tables.documents(s, dir)
          .filter(col("doc_id") % 25 === 0)
          .select(col("doc_id"), col("text")).collect()
          .foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$path/doc_${r.getLong(0)}.bin"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        s.read.format("binaryFile").load(path)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1)
              .cast("long").as("doc_id"),
            col("length"), md5(col("content")).as("content_md5"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── K13: retention/TTL partition expiry (Erasure.expirePartitions)
    // — age out data older than the retention horizon as a pure LISTING
    // operation: directory names decide, zero data files are opened or
    // rewritten (the defining economics vs k10's key-level rewrite).
    // Store = events by day (30 partitions); days before 2024-01-10
    // expire. Verdicts pin BOTH properties: kept partitions' files are
    // byte-identical (no rewrite happened) and exactly 9 day-values
    // dropped; the oracle recomputes the surviving aggregate from the
    // raw table with the same cutoff.
    "k13_retention_expire" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-ttl-${System.nanoTime()}"
      def files(): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
              .toSeq.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(path))
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => f.getPath -> f.length()).toMap
      }
      try {
        Tables.events(s, dir)
          .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
          .write.mode("overwrite").partitionBy("dt").parquet(path)
        val before = files()
        val dropped = Erasure.expirePartitions(s, path, "dt", "2024-01-10")
        val after = files()
        val keptUntouched = after == before.filter { case (p, _) =>
          !dropped.exists(d => p.contains(s"dt=$d")) }
        s.read.parquet(path)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("ct"),
            min(col("dt").cast("string")).as("dt_min"),
            countDistinct(col("dt")).as("days"))
          .withColumn("kept_untouched",
            lit(if (keptUntouched) 1L else 0L))
          .withColumn("dropped_days", lit(dropped.size.toLong))
          .orderBy(col("event_type"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── Manifest-driven file skipping (the Iceberg/Delta data-file-stats
    // idea): per-file min/max collected ONCE into a file-count-sized
    // manifest table; a range scan plans its file list FROM the manifest
    // and reads only intersecting envelopes. The layout writes 16
    // range-correlated buckets so envelopes are tight; pruned_ok pins
    // that planning read a strict subset of files, equal_ok pins that the
    // pruned read's answer equals the full-scan predicate's.
    "k14_manifest_prune" -> ((s, dir) => {
      import graft.operators.Manifest
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      val mxv = ev.agg(max(col("user_id"))).head().getLong(0)
      val path = s"$shmRoot/graft-manifest-${System.nanoTime()}"
      try {
        ev.withColumn("rb", least(
            floor(col("user_id") * 16.0 / (mxv + 1)).cast("long"), lit(15L)))
          .repartition(16, col("rb")).drop("rb")
          .write.mode("overwrite").parquet(path)
        val manifest = Manifest.build(s, path, "user_id")
          .localCheckpoint(true) // plan + count read one stable snapshot
        val total = manifest.count()
        val hi = mxv / 4
        val files = Manifest.filesForRange(manifest, 0L, hi)
        val pruned = Manifest.prunedRead(s, path, files, "user_id", 0L, hi)
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 1e6).cast("long")).as("v_fp")).head()
        val full = ev.filter(col("user_id") >= 0 && col("user_id") <= hi)
          .agg(count(lit(1)),
            sum(floor(col("value") * 1e6).cast("long"))).head()
        import s.implicits._
        Seq((pruned.getLong(0), pruned.getLong(1),
          files.size < total && files.nonEmpty,
          pruned.getLong(0) == full.getLong(0) &&
            pruned.getLong(1) == full.getLong(1)))
          .toDF("n", "v_fp", "pruned_ok", "equal_ok")
      } finally rmTree(path)
    }),

    // ── Count-Min sketch point queries (Frequency.cmsBuild/cmsEstimate)
    // — the mergeable FREQUENCY summary completing the sketch family
    // (a17 HLL ≈ distinct, a22 bitmap = distinct, a26 KMV = set ops,
    // freq_heavy_hitters = exact head): any key's count from d×w=3×1024
    // counters, estimate ≥ truth always (collisions only inflate),
    // cell-wise ADD merges shards. Hash rows are portable md5 over
    // "r:key", so the ORACLE REPLAYS the entire sketch and every
    // estimate bit-exactly — full equality on est, with the ≥-truth
    // verdict pinned alongside. Queried keys: every 37th partkey
    // (present arm) and the same +1e9 (absent arm — estimates may still
    // be >0 via collision, which is the sketch's documented error side).
    "freq_cms_point" -> ((s, dir) => {
      val (w, d) = (1024, 3)
      val li = Tables.lineitem(s, dir)
      val cms = Frequency.cmsBuild(li, col("l_partkey"), w, d)
      val present = li.select(col("l_partkey").as("key"))
        .filter(pmod(col("key"), lit(37L)) === 0).distinct()
      val queries = present.unionByName(
        present.select((col("key") + 1000000000L).as("key")))
      val exact = li.groupBy(col("l_partkey").as("key"))
        .agg(count(lit(1)).as("exact"))
      Frequency.cmsEstimate(cms, queries, col("key"), w, d)
        .join(exact, Seq("key"), "left")
        .select(col("key"), coalesce(col("exact"), lit(0L)).as("exact"),
          col("cms_est"),
          (col("cms_est") >= coalesce(col("exact"), lit(0L)))
            .cast("long").as("ge_ok"))
        .orderBy(col("key"))
    }),

    // ── K12 streaming twin: the SAME Incremental.merge fold, fed by real
    // Structured Streaming micro-batches through foreachBatch — each
    // batch's partials fold into the parquet state store, so the batch
    // refresh (k12) and the live pipeline maintain ONE interchangeable
    // state table (the lambda-architecture unification: no separate
    // "speed layer" aggregate to reconcile). Three ts-contiguous
    // micro-batches; associativity (MergeIncrementalSpec) is what makes
    // the fold order irrelevant — the oracle is the same full
    // recompute, equality at every batch split.
    "stream_k12_incremental" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-incrstream-${System.nanoTime()}"
      try {
        val stream = graft.streaming.Sources.eventsStreamSplit(s, dir, parts = 3)
        graft.streaming.StreamRunner.runForeachBatch(stream) { (b, _) =>
          val bs = Incremental.state(
            b.select(col("event_type"), col("value"),
              date_format(col("ts"), "yyyy-MM-dd").as("d")),
            Seq("event_type"), sumCols = Seq("value"), minMaxCols = Seq("d"))
          val merged =
            if (new java.io.File(path).exists())
              Incremental.merge(Seq(s.read.parquet(path), bs), Seq("event_type"))
                .localCheckpoint(true) // materialize before self-overwrite
            else bs
          merged.write.mode("overwrite").parquet(path)
        }
        Incremental.finalizeState(s.read.parquet(path))
          .select(col("event_type"), col("cnt"),
            col("sum_value").cast("double").as("value_sum"),
            col("avg_value").as("value_avg"),
            col("min_d").as("dt_min"), col("max_d").as("dt_max"))
          .orderBy(col("event_type"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── A26: KMV bottom-k distinct sketch (functions/Kmv.scala) — set
    // OPERATIONS over sketches (union AND intersection estimates), the
    // axis HLL (a17) cannot serve and exact bitmaps (a22) pay the full
    // key universe for. Bounded typed Aggregator: O(k) state per
    // partition, associative merges, ≤k values shuffled per partition.
    // The hash is the portable md5-lower-64 family folded into 2^40, so
    // the ORACLE REPLAYS the whole estimator — sketch content, θ,
    // (k-1)/θ, the union sketch, the Jaccard-scaled intersection —
    // bit-exactly in SQL: full equality, not a tolerance verdict. Two
    // set pairs: customer keys of URGENT vs HIGH orders (below k at
    // sf0.001 — the exact branch: the sketch IS the hashed set) and
    // lineitem orderkeys with returnflag R vs A (above k at every
    // scale — the order-statistic branch).
    "a26_kmv_setops" -> ((s, dir) => {
      import graft.functions.Kmv
      val k = 256
      val kmv = udaf(Kmv.agg(k), org.apache.spark.sql.Encoders.scalaLong)
      def one(pair: String, a: DataFrame, b: DataFrame): DataFrame = {
        // inputs arrive keyed as one column "kx"
        val sa = a.agg(
          kmv(Kmv.hashKey(col("kx").cast("string"))).as("ska"),
          count_distinct(col("kx")).as("exact_a"))
        val sb = b.agg(
          kmv(Kmv.hashKey(col("kx").cast("string"))).as("skb"),
          count_distinct(col("kx")).as("exact_b"))
        val eu = a.union(b).agg(count_distinct(col("kx")).as("exact_union"))
        val ei = a.intersect(b).agg(count(lit(1)).as("exact_inter"))
        sa.crossJoin(sb).crossJoin(eu).crossJoin(ei).select(
          lit(pair).as("pair"),
          col("exact_a"), col("exact_b"), col("exact_union"),
          col("exact_inter"),
          truncate6(Kmv.estimate(col("ska"), k)).as("est_a_t"),
          truncate6(Kmv.estimate(col("skb"), k)).as("est_b_t"),
          truncate6(Kmv.estimate(
            Kmv.unionSketch(col("ska"), col("skb"), k), k)).as("est_union_t"),
          truncate6(Kmv.intersectEstimate(col("ska"), col("skb"), k))
            .as("est_inter_t"))
      }
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      one("cust_priority",
        o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("kx")),
        o.filter(col("o_orderpriority") === "2-HIGH")
          .select(col("o_custkey").as("kx")))
        .unionByName(one("flag_orders",
          li.filter(col("l_returnflag") === "R")
            .select(col("l_orderkey").as("kx")),
          li.filter(col("l_returnflag") === "A")
            .select(col("l_orderkey").as("kx"))))
        .orderBy(col("pair"))
    }),

    // ── PageRank (3 iterations) in exact integer micro-units: the
    // iterative driver-loop family (Lloyd's twin) with the text_lm_score
    // fixed-point contract — contribution = rank div outdeg, update =
    // base + 85·Σ div 100, all longs, so the oracle replays the SAME
    // arithmetic through three unrolled CTE rounds and summation order
    // cannot matter. Same bounded mod-300 graph as graph_triangles.
    "graph_pagerank" -> ((s, dir) => {
      val edges = graft.operators.Graph.canonicalEdges(
        Tables.lineitem(s, dir).select(
          pmod(col("l_orderkey"), lit(300L)).as("s"),
          pmod(col("l_partkey"), lit(300L)).as("d")),
        "s", "d")
      graft.operators.Graph.pageRank(edges, iters = 3)
        .orderBy(col("node"))
    }),

    // ── Graph analytics: exact triangle + wedge counts over a derived
    // co-occurrence graph (lineitem (orderkey, partkey) mod 300 —
    // distinct canonical edges cap at C(300,2)=44,850, so cost is
    // bounded by the node space at every sf while the graph stays
    // triangle-rich even at sf0.001 —
    // multi-edges and loops exercised by construction, canonicalized
    // away). Degree orientation bounds the wedge fan-out at O(E^1.5)
    // where the naive 3-way self-join pays Σ deg² — the hub guard IS
    // the operator (GraphSpec pins orientation == naive on random
    // graphs and the K4/star/path shapes). Oracle: DuckDB's literal
    // a<b<c 3-way join plus the closed-form wedge sum.
    "graph_triangles" -> ((s, dir) => {
      val edges = graft.operators.Graph.canonicalEdges(
        Tables.lineitem(s, dir).select(
          pmod(col("l_orderkey"), lit(300L)).as("s"),
          pmod(col("l_partkey"), lit(300L)).as("d")),
        "s", "d")
      graft.operators.Graph.triangleStats(edges)
    }),

    // ── Retention cohorts: the canonical product-analytics matrix the
    // reference's DWS visitor stats feed (cohort = first active day;
    // cell = distinct users active offset days later). Plan: one
    // distinct on (user, day), a min per user, a user-keyed join (both
    // sides already hashed on user_id — AQE broadcasts the cohort side
    // when small), and a tiny (cohort × offset) agg. The fact table is
    // scanned once.
    "a19_retention_cohorts" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val cohorts = days.groupBy(col("user_id"))
        .agg(min(col("d")).as("cohort_d"))
      days.join(cohorts, "user_id")
        .groupBy(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_dt"),
          datediff(col("d"), col("cohort_d")).cast("long").as("offset_d"))
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy(col("cohort_dt"), col("offset_d"))
    }),

    // ── Event-transition matrix (Markov counts): per-user next-event
    // bigrams via ONE window pass (lag over (ts, event_id) — the a11
    // tie-break), aggregated to (prev, next) cells. Path analysis /
    // "what do users do after X" — the per-user shuffle is the only
    // wide exchange; the matrix itself is vocabulary-sized.
    "a20_event_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("ct"),
          countDistinct(col("user_id")).as("users"))
        .orderBy(col("prev_type"), col("event_type"))
    }),

    "a11_event_deltas" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("gap_ct"),
          sum(col("gap_us")).as("gap_sum_us"),
          max(col("gap_us")).as("gap_max_us"))
        .withColumn("avg_gap_sec",
          col("gap_sum_us").cast("double") / (lit(1000000.0) * col("gap_ct")))
        .orderBy(col("user_id"))
    }),

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

    // ── A27: frequent-pairs co-occurrence mining (the A-priori support
    // step of market-basket analysis) — parts that ship together in one
    // order, support = DISTINCT co-containing orders. Scale shape: the
    // per-order distinct projection first (so multiplicities never
    // inflate the fan-out), then a self-equi-join on the order key —
    // ONE shuffle both sides share (Catalyst reuses the exchange) —
    // with pair fan-out bounded by order size squared (≤C(7,2)=21 for
    // TPC-H-shaped orders), then a keyed count. The p1<p2 canonical
    // order halves the pair space and makes the output a set.
    "a27_frequent_pairs" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(col("p1"), col("p2"))
    }),

    // ── A28: date-spine gap fill + LOCF — time-series densification
    // (the serving-layer contract that a day with no events is a ZERO
    // row, not a missing row, and a dashboard's "current value" carries
    // the last observation forward). The spine is GENERATED (groups ×
    // sequence(min,max day) — never scanned), the fact table is
    // aggregated once, the left join fills, and last(IGNORE NULLS) over
    // the per-group date order is the carry-forward. The %97 event
    // filter keeps real gaps at every scale (289/300 cells empty at
    // sf0.001, ~10 at sf0.1); locf=-1 marks cells before a group's
    // first observation.
    "a28_gapfill_locf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val daily = ev.filter(col("event_id") % 97 === 0)
        .groupBy(pmod(col("user_id"), lit(10L)).as("grp"),
          to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("ct"))
      val spine = ev
        .agg(min(to_date(col("ts"))).as("mn"), max(to_date(col("ts"))).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"))).as("dt"))
        .crossJoin(s.range(0, 10).select(col("id").as("grp")))
      val w = Window.partitionBy(col("grp")).orderBy(col("dt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("grp", "dt"), "left")
        .withColumn("ct0", coalesce(col("ct"), lit(0L)))
        .withColumn("locf",
          coalesce(last(col("ct"), ignoreNulls = true).over(w), lit(-1L)))
        .select(col("grp"), date_format(col("dt"), "yyyy-MM-dd").as("dt"),
          col("ct0"), col("locf"))
        .orderBy(col("grp"), col("dt"))
    }),

    // ── A29: rolling percentiles — exact p50/p95 over a bounded ROWS
    // frame (last 100 points per series), the monitoring primitive
    // ("rolling p95 latency") a15's sum frames don't cover. Exact
    // `percentile` runs as a window AGGREGATE over the frame: state is
    // the 100-row frame, never the series; (ts, event_id) makes the
    // order total so the frame content is deterministic. truncate6 on
    // the interpolated value (the a8 cross-engine contract).
    "a29_rolling_pctl" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-99, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("event_id") % 11 === 0)
        .select(col("event_id"), col("event_type"),
          truncate6(expr("percentile(value, 0.5)").over(w)).as("p50_t"),
          truncate6(expr("percentile(value, 0.95)").over(w)).as("p95_t"))
        .orderBy(col("event_id"))
    }),

    // ── A30: equi-width histogram per group — bounds agg broadcast back,
    // one bucket-count agg; the bucket index is a single fixed IEEE
    // expression both engines replay bit-identically (see Stats.histogram).
    "a30_histogram" -> ((s, dir) =>
      Stats.histogram(Tables.events(s, dir), Seq("event_type"), "value", 10)
        .orderBy(col("event_type"), col("bucket"))),

    // ── A31: time-weighted average — irregular-series mean where each
    // sample holds until the next (telemetry gauges, position marks).
    // Exact integer weighted sums; the oracle replays lead() + the same
    // fixed-point arithmetic.
    "a31_twa" -> ((s, dir) =>
      Stats.timeWeightedAvg(Tables.events(s, dir), Seq("event_type"),
        "ts", "event_id", "value")
        .orderBy(col("event_type"))),

    // ── A34: mutual information + entropies between two categoricals —
    // the feature-relevance readout; one (x,y) cell shuffle, margins
    // re-agg the cell table. Each p·ln term floor-truncates before the
    // exact long sum (the lm-score recipe), so libm ulp drift cannot
    // reach the compare.
    "a34_mutual_info" -> ((s, dir) =>
      Stats.mutualInfo(
        Tables.events(s, dir)
          .withColumn("ub", pmod(col("user_id"), lit(5L))),
        "event_type", "ub")),

    // ── K15: deterministic pseudonymization — direct identifiers replaced
    // by salted md5 tokens SCAN-SIDE (zero shuffle); the same salt
    // tokenizes the fact's foreign key, and the gate JOINS ON THE TOKENS:
    // referential integrity surviving tokenization IS the tested claim.
    // The oracle replays every token (the portable md5 primitive).
    "k15_pseudonymize" -> ((s, dir) => {
      import graft.operators.Erasure
      val cust = Erasure.pseudonymize(Tables.customer(s, dir),
        Seq("c_custkey", "c_name"), "s3cret")
      val ord = Erasure.pseudonymize(Tables.orders(s, dir),
        Seq("o_custkey"), "s3cret")
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("orders"),
          count_distinct(col("c_name")).as("name_tokens"),
          min(col("c_name")).as("min_token"))
        .orderBy(col("c_mktsegment"))
    }),

    // ── DQ: k-anonymity audit — quasi-identifier group sizes vs the
    // re-identification floor; two-level agg, one keyed shuffle.
    "dq_k_anonymity" -> ((s, dir) =>
      graft.operators.Quality.kAnonymity(Tables.customer(s, dir),
        Seq("c_mktsegment", "c_nationkey"), k = 10L)),

    // ── J18: spatial proximity self-join — all point pairs within ε via
    // grid-cell bucketing (probe cell ⋈ build side exploded to its 3×3
    // neighborhood; ONE equi-join, never n²); exact all-integer
    // dx²+dy² ≤ ε² filter. Points are a formula fixture over user ids so
    // the oracle replays the exhaustive pairwise truth.
    "j18_spatial_join" -> ((s, dir) => {
      import graft.functions.HashFns
      val pts = Tables.events(s, dir)
        .filter(pmod(col("event_id"), lit(3L)) === 0)
        .select(col("event_id").as("id"))
        .select(col("id"),
          HashFns.md5Lower64Mod(
            concat(lit("x:"), col("id").cast("string")), 10000L).as("x"),
          HashFns.md5Lower64Mod(
            concat(lit("y:"), col("id").cast("string")), 10000L).as("y"))
      graft.operators.Spatial.proximityJoin(pts, "id", "x", "y", eps = 60L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ── A35: chi-square independence + Cramér's V — MI's frequentist
    // sibling over the same cell table; exact integer/decimal products,
    // one floor-truncated IEEE division per cell (sqrt is IEEE-exact).
    "a35_chi2" -> ((s, dir) =>
      Stats.chiSquare(
        Tables.events(s, dir)
          .withColumn("ub", pmod(col("user_id"), lit(5L))),
        "event_type", "ub")),

    // ── A33: Welch's t per group — the A/B readout from one
    // conditional-aggregation pass (no pivot, no second shuffle); exact
    // arm sums make t and the Welch–Satterthwaite df engine-exact.
    "a33_welch_ttest" -> ((s, dir) =>
      Stats.welchTTest(
        Tables.events(s, dir)
          .withColumn("variant", pmod(col("user_id"), lit(2L)).cast("int")),
        Seq("event_type"), "variant", "value")
        .orderBy(col("event_type"))),

    // ── DQ: key-skew diagnostic — hottest-key ratio per group, the
    // pre-flight report the j8 salting family consumes. Two-level agg;
    // the hot key travels as a count, never as rows.
    "dq_skew_report" -> ((s, dir) =>
      graft.operators.Quality.keySkewReport(
        Tables.events(s, dir), Seq("event_type"), "user_id")
        .orderBy(col("event_type"))),

    // ── J17 streaming: stream-static LEFT ANTI join — the deny-list /
    // dim-missing filter (fraud screens, bot exclusion, orphan alerts)
    // through the real streaming path. The static side builds once per
    // micro-batch plan and broadcasts; the join is STATELESS (no
    // watermark, no store — the anti condition needs only the static
    // side), so it composes before any stateful stage at zero state
    // cost. Oracle: the same exclusion as a batch predicate.
    "stream_j17_anti" -> ((s, dir) => {
      val deny = Tables.events(s, dir).select(col("user_id")).distinct()
        .filter(col("user_id") % 7 === 0)
      graft.streaming.StreamRunner.collect(
        graft.streaming.Sources.eventsStreamSplit(s, dir)
          .join(deny, Seq("user_id"), "left_anti"),
        statePartitions = 2)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("ct"),
          countDistinct(col("user_id")).as("users"))
        .orderBy(col("event_type"))
    }),

    // ── A1: ProductStats — 10s tumbling window, counters + exact distinct
    "a1_product_stats" -> ((s, dir) =>
      Stats.productStats(Tables.events(s, dir)).orderBy(col("stt"), col("event_type"))),

    // ── A2: VisitorStats — multi-key cube cell, 60s window
    "a2_visitor_stats" -> ((s, dir) =>
      Stats.visitorStats(Tables.events(s, dir))
        .orderBy(col("stt"), col("event_type"), col("cohort"))),

    // ── A3: KeywordStats — tokenize + explode + count (U1/F14)
    "a3_keyword_stats" -> ((s, dir) =>
      Stats.keywordStats(Tables.documents(s, dir)).orderBy(col("keyword"))),

    // ── A3 via the custom Catalyst Generator: SQL LATERAL VIEW
    // graft_tokenize — the reference's LATERAL TABLE(ik_analyze(...))
    // shape verbatim (U1, func/SplitFunction.java:12-27)
    "a3_keyword_lateral" -> ((s, dir) => {
      val view = s"docs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      Tables.documents(s, dir).createOrReplaceTempView(view)
      val df = s.sql(
        s"""SELECT keyword, count(*) AS ct
           |FROM $view LATERAL VIEW graft_tokenize(text) t AS keyword
           |GROUP BY keyword ORDER BY keyword""".stripMargin)
      // Dataset analysis is eager, so the view is already resolved into the
      // plan — drop it now so repeated invocations don't grow the catalog
      s.catalog.dropTempView(view)
      df
    }),

    // ── A4: ProvinceStats — geo rollup with distinct counts over BHJ dims
    "a4_province_stats" -> ((s, dir) =>
      Stats.provinceStats(
        Tables.orders(s, dir), Tables.customer(s, dir), Tables.nation(s, dir))
        .orderBy(col("n_name"))),

    // ── A5: GMV serving query
    "a5_gmv" -> ((s, dir) => Stats.gmv(Tables.orders(s, dir)).orderBy(col("dt"))),

    // ── J1: interval join, symmetric band [0, +30d]
    "j1_interval_join" -> ((s, dir) =>
      Joins.intervalJoin(
        Tables.orders(s, dir), Tables.lineitem(s, dir),
        "o_orderkey", "l_orderkey", "o_orderdate", "l_shipdate",
        lowerSec = 0L, upperSec = 30L * 86400L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("ct"),
          sum(dec("l_quantity")).cast("double").as("qty"))
        .orderBy(col("l_returnflag"))),

    // ── J2: interval join, asymmetric band [-15d, 0]
    "j2_interval_join_asym" -> ((s, dir) =>
      Joins.intervalJoin(
        Tables.lineitem(s, dir), Tables.orders(s, dir),
        "l_orderkey", "o_orderkey", "l_shipdate", "o_orderdate",
        lowerSec = 15L * 86400L, upperSec = 0L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("ct"),
          sum(dec("l_extendedprice")).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))),

    // ── J3: dimension enrichment via broadcast hash joins (x2 dims)
    "j3_dim_enrich" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).withColumnRenamed("p_partkey", "l_partkey")
      val sup = Tables.supplier(s, dir).withColumnRenamed("s_suppkey", "l_suppkey")
      Joins.enrich(l, Seq((p, Seq("l_partkey")), (sup, Seq("l_suppkey"))))
        .groupBy(col("p_brand"), col("s_name"))
        .agg(count(lit(1)).as("ct"),
          sum(dec("l_extendedprice")).cast("double").as("revenue"))
        .orderBy(col("p_brand"), col("s_name"))
    }),

    // ── J4: unionByName of shaped streams + reaggregation
    "j4_union_stats" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(createDate(col("ts")).as("dt"), lit(1L).as("pv"), lit(0L).as("cv"))
      val clicks = e.filter(col("event_type") === "click")
        .select(createDate(col("ts")).as("dt"), lit(0L).as("pv"), lit(1L).as("cv"))
      views.unionByName(clicks)
        .groupBy(col("dt"))
        .agg(sum(col("pv")).as("pv"), sum(col("cv")).as("cv"))
        .orderBy(col("dt"))
    }),

    // ── J5: config-driven routing (broadcast config join)
    "j5_config_route" -> ((s, dir) => {
      val cfg = s.createDataFrame(Seq(
        ("purchase", "insert", "dwd_purchase"),
        ("signup", "insert", "dwd_signup")))
        .toDF("source_table", "operate_type", "sink_table")
      val facts = Tables.events(s, dir).withColumn("op", lit("insert"))
      Joins.configRoute(facts, cfg, "event_type", "op")
        .groupBy(col("sink_table"))
        .agg(count(lit(1)).as("ct"))
        .orderBy(col("sink_table"))
    }),

    // ── J6: as-of join (union+window — no join operator, one key shuffle).
    // Each order gets the customer's previous order date (strictly before).
    "j6_asof_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      Joins.asOfJoin(
        o, o.select(col("o_custkey").as("ck"), col("o_orderdate").as("od")),
        "o_custkey", "ck", "o_orderdate", "od",
        payload = Seq("od"), strict = true)
        .select(col("o_orderkey"), col("asof.od").as("prev_date"))
        .orderBy(col("o_orderkey"))
    }),

    // ── A6: top-N per group (serving-layer ranking)
    "a6_topn_per_group" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val rev = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("o_custkey"))
        .agg(sum(dec("o_totalprice")).cast("double").as("revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("n_name")).orderBy(col("revenue").desc, col("o_custkey"))
      rev.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy(col("n_name"), col("rnk"))
    }),

    // ── Data-quality constraint report (Quality.violations): row-local
    // rules fold into ONE full scan (conditional sums — adding a rule
    // adds an expression, not a pass); unique = one key shuffle;
    // referential = tiered anti-probe. The two non-zero rows
    // (unique(l_orderkey) counts multi-line orders as duplicates) prove
    // the counting, the zero rows prove the fixture's invariants.
    "dq_violations" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      Quality.violations(li, Seq(
        Quality.NotNull("l_shipdate"),
        Quality.Range("l_quantity", 1, 50),
        Quality.Range("l_discount", 0.0, 0.1),
        Quality.Matches("l_returnflag", "^[ANR]$"),
        Quality.Unique(Seq("l_orderkey", "l_linenumber")),
        Quality.Unique(Seq("l_orderkey")),
        Quality.RefIntegrity("l_orderkey", Tables.orders(s, dir), "o_orderkey")))
        .orderBy(col("rule"))
    }),

    // ── DQ in-flight metrics via `Observation`: pre-filter row counts /
    // violation tallies / extrema ride the SAME action as the pipeline
    // (AggregatingAccumulator piggybacked on the scan) — at 100 TB the
    // alternative is a second full pass per metric set. The pipeline's
    // own output (kept-row count after the price filter) lands in the
    // same row, so the oracle cross-checks BOTH the observed metrics and
    // the downstream result against one parquet truth. Extrema and
    // integer tallies only — no double sums ride the compare.
    // ── DQ: robust outlier report — median/MAD (the 3σ rule that
    // doesn't break when the outliers ARE the contamination: mean/stddev
    // move with the tail, the median doesn't). Knife-edge-free across
    // engines by construction: prices → integer cents, medians doubled
    // into integers ((a+b)/2·2 = a+b exact in IEEE for ≤2^52 ints), the
    // flag compare 2·d > 3·mad2x2 all-integer — no float threshold can
    // disagree. Three keyed aggs + two broadcast joins back; the fact
    // table is scanned once per agg, never shuffled on a wide key.
    "dq_outliers_mad" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderpriority").as("g"),
        (dec("o_totalprice") * 100).cast("long").as("c"))
      val med = o.groupBy(col("g")).agg(
        (expr("percentile(c, 0.5)") * 2).cast("long").as("med2"))
      val d = o.join(broadcast(med), Seq("g"))
        .withColumn("d", abs(col("c") * 2 - col("med2")))
      val mad = d.groupBy(col("g")).agg(
        (expr("percentile(d, 0.5)") * 2).cast("long").as("mad2x2"))
      d.join(broadcast(mad), Seq("g"))
        .groupBy(col("g"), col("med2"), col("mad2x2"))
        .agg(count(lit(1)).as("n"),
          count(when(col("d") * 2 > col("mad2x2") * 3, 1)).as("outlier_ct"))
        .select(col("g"), col("n"), col("outlier_ct"), col("med2"),
          col("mad2x2"))
        .orderBy(col("g"))
    }),

    "dq_observe" -> ((s, dir) => {
      val obs = org.apache.spark.sql.Observation()
      val kept = Tables.orders(s, dir)
        .observe(obs,
          count(lit(1)).as("rows_seen"),
          sum(when(col("o_totalprice") <= lit(0.0), 1L).otherwise(0L))
            .as("nonpos_price"),
          sum(when(col("o_orderdate").isNull, 1L).otherwise(0L))
            .as("null_date"),
          truncate6(max(col("o_totalprice"))).as("max_price"),
          min(col("o_orderkey")).as("min_key"))
        .filter(col("o_totalprice") > lit(100000.0))
        .count() // the action that both answers the pipeline and fires the metrics
      val m = obs.get
      import s.implicits._
      Seq((m("rows_seen").asInstanceOf[Long],
        m("nonpos_price").asInstanceOf[Long],
        m("null_date").asInstanceOf[Long],
        m("max_price").asInstanceOf[Double],
        m("min_key").asInstanceOf[Long],
        kept))
        .toDF("rows_seen", "nonpos_price", "null_date", "max_price",
          "min_key", "kept_expensive")
    }),

    // ── F1 extension: JSON path extraction on the raw props string —
    // get_json_object is Spark's scan-side JSON accessor (no full parse,
    // no schema needed); the agg proves numeric round-trip parity.
    "f_json_path" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("ct"), sum(col("k")).as("k_sum"),
          sum(when(col("k") > 50, 1L).otherwise(0L)).as("k_hi"))
        .orderBy(col("event_type"))),

    // ── F-extension: VARIANT (Spark 4's open semi-structured type) —
    // the engine path for JSON whose schema drifts: parse ONCE to a
    // binary-encoded variant, extract typed fields lazily (no per-query
    // re-tokenization, shredded access at scan time). A nested document
    // is composed per row so path extraction, type coercion (long /
    // double / string arms) and a missing-path null all fire; the oracle
    // recomputes from the raw columns directly — the round-trip through
    // variant must be semantically invisible.
    "f_variant_json" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("value"),
          col("props"),
          parse_json(to_json(struct(
            struct(col("user_id").as("id"), col("value").as("v"))
              .as("user"),
            col("props").as("raw"), col("event_type").as("t")))).as("doc"))
        .select(col("event_type"),
          expr("variant_get(doc, '$.user.id', 'long')").as("uid"),
          expr("variant_get(doc, '$.user.v', 'double')").as("v"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
          expr("variant_get(doc, '$.missing.path', 'long')").as("mp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("ct"),
          count_distinct(col("uid")).as("users"),
          // decimal sum: v round-trips the variant encoding exactly
          // (shortest-repr JSON doubles), and the decimal makes the SUM
          // reassociation-proof
          sum(col("v").cast("decimal(18,2)")).cast("double").as("v_sum"),
          sum(col("k")).as("k_sum"),
          sum(when(col("mp").isNull, 1L).otherwise(0L)).as("mp_nulls"))
        .orderBy(col("event_type"))),

    // ── F-extension: error-safe arithmetic (try_divide / try_cast /
    // try_to_timestamp) — NULL instead of job-killing exceptions: the
    // posture for dirty data at 100 TB, where one malformed row must not
    // fail a 1000-executor stage. Each arm fires on real rows (qty==50 ⇒
    // divide-by-zero; a non-numeric prefix ⇒ cast failure; a malformed
    // date string ⇒ timestamp failure).
    "f_try_arith" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          try_divide(col("l_extendedprice"),
            col("l_quantity") - lit(50.0)).as("d"),
          expr("""try_cast(
            CASE WHEN l_orderkey % 3 = 0
                 THEN concat('x', cast(l_linenumber as string))
                 ELSE cast(l_linenumber as string) END AS bigint)""").as("n"),
          try_to_timestamp(
            when(col("l_orderkey") % 2 === 0, lit("not-a-date"))
              .otherwise(lit("2024-03-01 12:00:00"))).as("t"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("ct"),
          sum(col("d").isNull.cast("long")).as("div_nulls"),
          // per-term floor to millionths BEFORE the sum (the bm25/lm
          // fixed-point contract): the quotient is one IEEE division,
          // identical in both engines; the long sum cannot reassociate
          sum(when(col("d").isNotNull,
            floor(col("d") * lit(1000000.0)).cast("long")).otherwise(0L))
            .as("d_sum_us"),
          sum(col("n").isNull.cast("long")).as("num_nulls"),
          sum(col("n")).cast("long").as("n_sum"),
          sum(col("t").isNull.cast("long")).as("ts_nulls"))
        .orderBy(col("l_returnflag"))),

    // ── F-extension: calendar arithmetic (date_trunc / add_months /
    // last_day / datediff) — the ETL date surface beyond the reference's
    // toYMDhms family. add_months end-of-month clamping is the semantic
    // trap (Jan 31 + 1 month = Feb 29); both engines clamp, and the
    // oracle's INTERVAL arithmetic replays it. Everything reduces to
    // epoch-day/µs integers so the compare is representation-safe.
    "f_date_arith" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderpriority"),
          col("o_orderdate").cast("timestamp").as("d"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("ct"),
          count_distinct(date_trunc("month", col("d"))).as("months"),
          count_distinct(date_trunc("week", col("d"))).as("weeks"),
          min(unix_micros(date_trunc("quarter", col("d")))).as("min_q_us"),
          max(unix_micros(add_months(col("d"), 1).cast("timestamp")))
            .as("max_plus1m_us"),
          max(unix_micros(last_day(col("d")).cast("timestamp")))
            .as("max_eom_us"),
          sum(datediff(lit("2024-12-31").cast("date"), col("d").cast("date"))
            .cast("long")).as("days_to_eoy"))
        .orderBy(col("o_orderpriority"))),

    // ── F-extension: regexp_extract — first digit-run per document
    // (simple character-class pattern, identical semantics in Java regex
    // and RE2; both engines return '' on no-match).
    "f_regex_extract" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_extract(col("text"), "([0-9]+)", 1).as("first_num"))
        .orderBy(col("doc_id"))),

    // ── URL parsing for web corpora: host / path / query-param / fragment
    // via the codegen'd parse_url, plus the apex (registrable-ish) domain
    // — the provenance keys a crawl pipeline groups, filters and
    // mixes sources by. URLs are synthesized deterministically from the
    // documents table; the oracle re-extracts every part with regexes.
    "f_url_parse" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.org/"), col("lang"), lit("/doc/"),
          col("doc_id").cast("string"), lit("?ref=r"),
          pmod(col("doc_id"), lit(7L)).cast("string"), lit("&lang="),
          col("lang"), lit("#sec"),
          pmod(col("doc_id"), lit(3L)).cast("string")))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"),
          parse_url(col("url"), lit("REF")).as("frag"),
          substring_index(parse_url(col("url"), lit("HOST")), ".", -2)
            .as("apex"))
        .orderBy(col("doc_id"))),

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

    // ── A15: RANGE window frame — events within the trailing hour of
    // each event (peers by VALUE, not row position: ties in ts all join
    // the frame, so the result is deterministic under any tie order).
    // Output compacted to the per-user PEAK 1-hour burst. Scale shape:
    // one hash exchange on user_id + per-partition sort — same budget as
    // any analytic; the frame scan is linear per partition.
    "a15_range_frame" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("cnt_1h", count(lit(1)).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("cnt_1h")).as("peak_1h"))
        .orderBy(col("user_id"))
    }),

    // ── A14: best-row-per-group as a one-pass AGGREGATE — max_by with a
    // composite bigint sort key (acctbal exact cents, suppkey tiebreak)
    // instead of q2's window+filter: one partial-aggregating shuffle, no
    // sort at all — the cheapest "top supplier per nation" plan at any
    // scale. The bigint key makes tie-breaks identical across engines
    // (DuckDB arg_max accepts scalar keys only).
    "a14_argmax" -> ((s, dir) =>
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          max_by(col("s_name"),
            (col("s_acctbal").cast("decimal(15,2)") * 100).cast("long") * 1000000L
              - col("s_suppkey")).as("top_supplier"),
          max(col("s_acctbal")).cast("double").as("max_bal"))
        .orderBy(col("n_name"))),

    // ── A13: the full analytic-rank suite over one window — rank,
    // dense_rank, percent_rank, ntile in a single per-group sort pass
    // (Spark fuses same-window functions into ONE Window operator: one
    // key shuffle + one sort, however many functions ride it).
    // Fully tie-broken ordering keeps every function deterministic;
    // percent_rank is a single division of small exact ints →
    // bit-identical across engines.
    "a13_rank_suite" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val rev = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("o_custkey"))
        .agg(sum(dec("o_totalprice")).cast("double").as("revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("n_name")).orderBy(col("revenue").desc, col("o_custkey"))
      rev
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .withColumn("prnk", percent_rank().over(w))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .filter(col("rnk") <= 8)
        .orderBy(col("n_name"), col("rnk"), col("o_custkey"))
    }),

    // ── Set operations: INTERSECT / EXCEPT (distinct semantics) — both
    // compile to one aggregate + semi/anti join on the full row, one
    // shuffle each. Customers active in both halves of 1997 / only H1.
    "set_intersect" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val h1 = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_custkey"))
      val h2 = o.filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      h1.intersect(h2).orderBy(col("o_custkey"))
    }),

    "set_except" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val h1 = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_custkey"))
      val h2 = o.filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      h1.except(h2).orderBy(col("o_custkey"))
    }),

    // ── A7: rollup (region -> nation -> grand total in one pass)
    "a7_rollup" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(dec("o_totalprice")).cast("double").as("revenue"),
          count(lit(1)).as("order_ct"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // ── T4: gap-based sessionization (batch twin of session_window)
    "t4_sessionize" -> ((s, dir) =>
      Sessionize.sessionStats(Tables.events(s, dir), gapSec = 1800L)
        .orderBy(col("user_id"), col("session_id"))),

    // ── T5: per-key rate limiting (token bucket: cap 5, refill 1/tick,
    // day ticks) — a non-linear recurrence (the min cap), so no window
    // function expresses it: per key it folds the time-sorted event
    // array with an aggregate HOF in pure integer arithmetic, and the
    // oracle replays the SAME recurrence with a recursive CTE. The
    // admitted/rejected SETS are pinned via order-insensitive id
    // checksums. Both arms fire at every sf (the day tick makes real
    // bursts against the refill).
    "t5_rate_limit" -> ((s, dir) =>
      graft.operators.Quota.tokenBucket(
        Tables.events(s, dir).filter(col("event_id") % 37 === 0)
          .withColumn("k", pmod(col("user_id"), lit(2L))),
        col("k"), "ts", "event_id", "event_id",
        capacity = 5, refillPerTick = 1, tickSeconds = 86400L)
        .orderBy(col("k"))),

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

    // ── A8: exact percentiles (interpolated) per group; percentile_approx
    // (t-digest, one pass, mergeable) is the 100 TB path for the same call
    "a8_percentiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          truncate6(expr("percentile(l_extendedprice, 0.25)")).as("p25"),
          truncate6(expr("percentile(l_extendedprice, 0.5)")).as("p50"),
          truncate6(expr("percentile(l_extendedprice, 0.75)")).as("p75"),
          count(lit(1)).as("ct"))
        .orderBy(col("l_returnflag"))),

    // ── K7: SCD2 dim history from a changelog — unchanged consecutive
    // versions compact away; each change opens [ts, next change ts), the
    // last version per key is open-ended. Pairs with j6_asof_join for
    // time-travel enrichment; K4's upsert sink is the SCD1 twin.
    "k7_scd2_history" -> ((s, dir) =>
      graft.operators.Scd.scd2(Tables.events(s, dir),
          keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
          attrCols = Seq("event_type"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("effective_from")).as("from_us"),
          unix_micros(col("effective_to")).as("to_us"),
          col("is_current"))
        .orderBy(col("user_id"), col("from_us"), col("event_id"))),

    // ── S3/S4→P3→K4 END-TO-END as an oracle gate (VERDICT r10 stretch):
    // CDC envelopes built from the customer table — a full "create"
    // snapshot, then versioned updates, then poison deletes — staged as 3
    // real micro-batches through decode (S4, with the create→insert
    // rename), the delete filter (P3), payload routing (S3) and the
    // versioned dim upsert (K4, ods/Flink_CDCWithCustomerSchema_Ods.java:
    // 69-124 → func/DimSinkFunction.java:28-72). The final store state is
    // compared to the SQL-recomputed truth: a broken rename drops the
    // whole snapshot, a failed version compare keeps stale balances, and
    // a delete leaking past the filter lands a -999 poison balance — each
    // a hash mismatch, not a silent pass.
    "cdc_route_upsert" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      def env(df: DataFrame, typ: String): DataFrame =
        df.select(to_json(struct(
          lit("gmall").as("database"), lit("customer").as("tableName"),
          lit(null).cast("string").as("before"),
          to_json(struct(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("version"))).as("after"),
          lit(typ).as("type"))).as("value"))
      val inserts = env(cust.withColumn("version", lit(1L)), "create")
      val updates = env(cust.filter(pmod(col("c_custkey"), lit(7L)) === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
        .withColumn("version", lit(2L)), "update")
      val deletes = env(cust.filter(pmod(col("c_custkey"), lit(13L)) === 0)
        .withColumn("c_acctbal", lit(-999.0))
        .withColumn("version", lit(3L)), "delete")
      val payloadSchema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType),
        StructField("version", LongType)))
      val root = shmRoot
      val uniq = System.nanoTime()
      val stagePath = s"$root/graft-cdc-stage-$uniq"
      val routed = graft.streaming.Sources.cdcAfter(
        graft.operators.LogPipeline.dropDeletes(
          graft.streaming.Sources.cdcDecode(
            graft.streaming.Sources.stagedChunkStream(
              s, Seq(inserts, updates, deletes), Some(stagePath))),
          typeCol = "type"),
        "customer", payloadSchema)
      val dimPath = s"$root/graft-cdc-dim-$uniq"
      val ckptPath = s"$root/graft-cdc-ckpt-$uniq"
      // sweep the throwaway dirs even when the query or the dim read
      // throws — leaked tmpfs copies accumulate across failed trials
      try {
        val q = graft.streaming.Sinks.dimUpsert(routed, dimPath, "c_custkey",
          checkpoint = ckptPath,
          versionCol = Some("version"),
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
        // materialize before sweeping the throwaway store + checkpoint —
        // a lazy result would re-read files this deletes
        s.read.parquet(dimPath)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("version"))
          .orderBy(col("c_custkey"))
          .localCheckpoint(true)
      } finally {
        rmTree(dimPath); rmTree(ckptPath); rmTree(stagePath)
      }
    }),

    // ── CSV source round-trip: the engine's ingest edge is not only
    // parquet — write customer as headered CSV, read it back through the
    // declared schema, and aggregate. Doubles survive because Spark
    // emits shortest-round-trip reprs; the oracle runs on the ORIGINAL
    // parquet, so any quoting/header/type-inference drift in the CSV
    // path is a hash mismatch. Materialized so the tmpfs copy sweeps.
    "source_csv_roundtrip" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-csv-${System.nanoTime()}"
      try {
        val base = Tables.customer(s, dir)
        base.write.mode("overwrite").option("header", "true").csv(path)
        s.read.schema(base.schema).option("header", "true").csv(path)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("ct"),
            sum(dec("c_acctbal")).cast("double").as("bal_sum"),
            countDistinct(col("c_nationkey")).as("nations"))
          .orderBy(col("c_mktsegment"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── JSON-lines source round-trip: the reference's native log format
    // (HTTP collector → Kafka carries JSON lines). Timestamps are the
    // round-trip risk — the format is pinned to micros on BOTH write and
    // read, and the oracle (original parquet) compares exact epoch-µs
    // extrema per event type, so a truncated fraction or a timezone
    // shift fails the hash, not just a spot check.
    "source_jsonl_roundtrip" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-jsonl-${System.nanoTime()}"
      val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
      try {
        val base = Tables.events(s, dir)
        base.write.mode("overwrite").option("timestampFormat", fmt).json(path)
        s.read.schema(base.schema).option("timestampFormat", fmt).json(path)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("ct"),
            countDistinct(col("user_id")).as("users"),
            min(unix_micros(col("ts"))).as("min_us"),
            max(unix_micros(col("ts"))).as("max_us"))
          .orderBy(col("event_type"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── ORC source round-trip: the second columnar format a lakehouse
    // ingests (Hive-era estates are ORC). Same contract as the CSV/JSONL
    // twins — write orders as ORC, read back through the declared schema,
    // aggregate; the oracle runs on the ORIGINAL parquet, so any type or
    // timestamp drift through ORC's encoding is a hash mismatch (orders
    // carries int64/double/string/timestamp — the full primitive
    // surface). SourceFormatsSpec pins predicate pushdown reaches the
    // ORC scan, same as parquet.
    "source_orc_roundtrip" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-orc-${System.nanoTime()}"
      try {
        val base = Tables.orders(s, dir)
        base.write.mode("overwrite").orc(path)
        s.read.schema(base.schema).orc(path)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("ct"),
            sum(dec("o_totalprice")).cast("double").as("price_sum"),
            // o_orderdate surfaces as TIMESTAMP_NTZ (pyarrow default);
            // the session tz is pinned UTC, so the cast reinterprets the
            // wall-clock as the same UTC instant (Tables.normalizeEventTs
            // contract)
            min(unix_micros(col("o_orderdate").cast("timestamp")))
              .as("min_date_us"),
            max(unix_micros(col("o_orderdate").cast("timestamp")))
              .as("max_date_us"))
          .orderBy(col("o_orderpriority"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── XML source round-trip (Spark 4's built-in XML datasource — the
    // B2B/legacy-feed ingest edge): write customer as row-tagged XML,
    // read back through the declared schema, aggregate vs the
    // original-parquet oracle. Doubles survive because the writer emits
    // shortest-round-trip reprs (the CSV twin's contract); the string
    // column rides escaping.
    "source_xml_roundtrip" -> ((s, dir) => {
      val root = shmRoot
      val path = s"$root/graft-xml-${System.nanoTime()}"
      try {
        val base = Tables.customer(s, dir)
        base.write.mode("overwrite").option("rowTag", "customer").xml(path)
        s.read.schema(base.schema).option("rowTag", "customer").xml(path)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("ct"),
            sum(dec("c_acctbal")).cast("double").as("bal_sum"),
            countDistinct(col("c_nationkey")).as("nations"),
            max(length(col("c_name"))).cast("long").as("max_name_len"))
          .orderBy(col("c_mktsegment"))
          .localCheckpoint(true)
      } finally rmTree(path)
    }),

    // ── Schema evolution across parquet generations: a long-lived
    // dataset's early files lack columns later files carry. mergeSchema
    // unifies the footers at read time and back-fills nulls — the
    // no-rewrite evolution path (at 100 TB you cannot rewrite history to
    // add a column). Generation 1 = even orderkeys without priority;
    // generation 2 = odd WITH priority; the oracle replays the
    // generation rule, so a wrong null-fill or a dropped generation is a
    // hash mismatch.
    "source_schema_evolution" -> ((s, dir) => {
      val root = shmRoot
      val base = s"$root/graft-evo-${System.nanoTime()}"
      try {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$base/g1")
        o.filter(col("o_orderkey") % 2 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$base/g2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$base/g1", s"$base/g2")
          .groupBy(coalesce(col("o_orderpriority"), lit("PRE_SCHEMA"))
            .as("priority"))
          .agg(count(lit(1)).as("ct"),
            sum(dec("o_totalprice")).cast("double").as("price_sum"),
            min(col("o_orderkey")).as("min_key"))
          .orderBy(col("priority"))
          .localCheckpoint(true)
      } finally rmTree(base)
    }),

    // ── Hidden file-metadata columns (`_metadata.file_path`) — row-level
    // provenance without a provenance column: which physical file did
    // each row come from. The lakehouse debugging/audit primitive
    // (quarantine a bad file, attribute a corrupt row) and the zero-cost
    // lineage tier at 100 TB — the path rides the scan, no join, no
    // extra storage. Fixture writes two single-file generations with a
    // known key rule; the oracle replays the rule, so a wrong
    // row-to-file attribution is a hash mismatch.
    "source_file_metadata" -> ((s, dir) => {
      val root = shmRoot
      val base = s"$root/graft-meta-${System.nanoTime()}"
      try {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderkey") % 2 === 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$base/even")
        o.filter(col("o_orderkey") % 2 =!= 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$base/odd")
        s.read.parquet(s"$base/even", s"$base/odd")
          .select(col("o_orderkey"), col("o_totalprice"),
            regexp_extract(col("_metadata.file_path"),
              "/(even|odd)/", 1).as("gen"))
          .groupBy(col("gen"))
          .agg(count(lit(1)).as("ct"),
            sum(dec("o_totalprice")).cast("double").as("price_sum"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy(col("gen"))
          .localCheckpoint(true)
      } finally rmTree(base)
    }),

    // ── ANALYZE-style table profile: per-column counts/nulls/NDV/range
    // in ONE scan (single Aggregate; the unpivot to rows is a free
    // explode). The HLL NDV rides next to the exact NDV with a checked
    // 5·rsd verdict (a17 pattern) — at 100 TB the exact arm drops and
    // the sketch is the answer. Nulls injected on a derived column so
    // the null-counting arm actually fires. These stats are what a CBO
    // eats (join order, broadcast thresholds) — profiling IS an engine
    // feature, not a demo.
    "table_profile" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(
        col("c_custkey"),
        when(pmod(col("c_custkey"), lit(10L)) === 0,
          lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal"),
        col("c_name"), col("c_mktsegment"), col("c_nationkey"))
      graft.operators.Profile.profile(c,
          numeric = Seq("c_custkey", "bal", "c_nationkey"),
          strings = Seq("c_name", "c_mktsegment"))
        .orderBy(col("col_name"))
    }),

    // ── Snapshot → changelog derivation (the inverse of the CDC ingest
    // path): when upstream only ships nightly full dumps, the diff of
    // two snapshots IS the changelog. One full-outer key join; change
    // detection is the exact null-safe struct compare. Fixture derives
    // the new snapshot from customer (deletes %11, +50 updates %7,
    // key+1M inserts %13 — the %77 overlap lands in the delete arm), so
    // all three change types fire with disjoint keys. Oracle replays
    // the same mutation + FULL OUTER JOIN + IS DISTINCT FROM rule.
    "cdc_snapshot_diff" -> ((s, dir) => {
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val mutated = base.filter(pmod(col("c_custkey"), lit(11L)) =!= 0)
        .withColumn("c_acctbal",
          when(pmod(col("c_custkey"), lit(7L)) === 0, col("c_acctbal") + 50.0)
            .otherwise(col("c_acctbal")))
      val inserts = base.filter(pmod(col("c_custkey"), lit(13L)) === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          col("c_name"), col("c_acctbal"))
      graft.operators.Snapshot.diff(base, mutated.unionByName(inserts),
          "c_custkey", Seq("c_name", "c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // ── P5 as an ORACLE gate (spec-only until r12): config-driven column
    // pruning of routed payloads (reference intent:
    // func/TableProcessFunction.java:71-77). Envelopes for two routed
    // tables plus two poison families — a delete on a routed table (P3
    // must filter it) and an insert on an unrouted table (no-config drop)
    // — flow through route → pruneAfter; the gate re-opens each pruned
    // JSON payload and emits (per route) the sorted key set actually
    // present plus value aggregates THROUGH the pruned payload. An
    // unpruned column widens keys_csv, an over-pruned one nulls the
    // extracted values, a leaked poison row inflates ct — each a hash
    // mismatch against the DuckDB truth computed from the base tables.
    "p5_config_prune" -> ((s, dir) => {
      val cfg = s.createDataFrame(Seq(
        ("customer", "insert", "kafka", "dwd_customer", "c_custkey,c_name"),
        ("orders", "insert", "kafka", "dwd_orders", "o_orderkey,o_orderstatus")))
        .toDF("source_table", "operate_type", "sink_type", "sink_table",
          "sink_columns")
      def env(df: DataFrame, table: String, typ: String,
          after: org.apache.spark.sql.Column): DataFrame =
        df.select(lit(table).as("tableName"), lit(typ).as("type"),
          to_json(after).as("after"))
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
      val envelopes = env(cust, "customer", "insert",
          struct(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("c_nationkey")))
        .unionByName(env(ord, "orders", "insert",
          struct(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))))
        .unionByName(env(cust.limit(7), "customer", "delete",
          struct(col("c_custkey"), col("c_name"))))
        .unionByName(env(cust.limit(5), "part", "insert",
          struct(col("c_custkey"), col("c_name"))))
      val pruned = graft.gmall.DbRouter.pruneAfter(
        graft.gmall.DbRouter.route(envelopes, cfg))
      val m = from_json(col("after"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))
      pruned.select(col("sink_table"), m.as("m"))
        .select(col("sink_table"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
          coalesce(element_at(col("m"), "c_custkey"),
            element_at(col("m"), "o_orderkey")).cast("long").as("key_val"),
          coalesce(element_at(col("m"), "c_name"),
            element_at(col("m"), "o_orderstatus")).as("str_val"))
        .groupBy(col("sink_table"), col("keys_csv"))
        .agg(count(lit(1)).as("ct"), sum(col("key_val")).as("sum_key"),
          count_distinct(col("str_val")).as("distinct_vals"))
        .orderBy(col("sink_table"))
    }),

    // ── K5 as an ORACLE gate (spec-only until r12): auto-DDL + config
    // flip (reference intent: func/TableProcessFunction.java:87-148 —
    // first write to an absent dim table CREATEs it). Batch 1 routes
    // customer through a kafka-typed config (dim store untouched); the
    // config then flips sinkType to hbase and batch 2's FIRST write must
    // create dim_customer from the payload schema alone. The gate pins
    // the kafka-batch row count, the created table's contents (count +
    // key sum THROUGH the store), its column set, and that the store was
    // auto-created (absent before batch 2) — a failed auto-create throws,
    // a mis-rout leaves dim_ct/kafka_ct off by a cohort.
    "k5_auto_ddl" -> ((s, dir) => {
      val root = shmRoot
      val dimRoot = s"$root/graft-k5-dim-${System.nanoTime()}"
      def cfg(sinkType: String, sinkTable: String): DataFrame =
        s.createDataFrame(Seq(
          ("customer", "insert", sinkType, sinkTable, "c_custkey",
            "c_custkey,c_name")))
          .toDF("source_table", "operate_type", "sink_type", "sink_table",
            "sink_pk", "sink_columns")
      def env(df: DataFrame): DataFrame =
        df.select(lit("customer").as("tableName"), lit("insert").as("type"),
          to_json(struct(col("c_custkey"), col("c_name"))).as("after"))
      val cust = Tables.customer(s, dir)
      try {
        // batch 1: kafka-typed route — rows shape for the dynamic-topic
        // producer; materialize now so the batch runs BEFORE the flip
        val b1 = graft.gmall.DbRouter.writeBatch(
          graft.gmall.DbRouter.route(
            env(cust.filter(pmod(col("c_custkey"), lit(2L)) === 0)),
            cfg("kafka", "ods_customer")),
          dimRoot).localCheckpoint(true)
        val absentBefore = !new java.io.File(s"$dimRoot/dim_customer").exists()
        // batch 2: the config flipped sinkType — first hbase write
        // auto-creates the table from the payload schema
        graft.gmall.DbRouter.writeBatch(
          graft.gmall.DbRouter.route(
            env(cust.filter(pmod(col("c_custkey"), lit(2L)) === 1)),
            cfg("hbase", "dim_customer")),
          dimRoot).localCheckpoint(true)
        val dim = s.read.parquet(s"$dimRoot/dim_customer")
        // pruneAfter re-emits payload values as JSON strings (Map-typed
        // round trip), so the auto-created column is string — cast for
        // the numeric verdict
        val dimAgg = dim.agg(count(lit(1)).as("dim_ct"),
            sum(col("c_custkey").cast("long")).as("dim_sum_key"))
          .withColumn("dim_cols_csv", lit(dim.columns.sorted.mkString(",")))
        b1.agg(count(lit(1)).as("kafka_ct")).crossJoin(dimAgg)
          .select(col("kafka_ct"), col("dim_ct"), col("dim_sum_key"),
            col("dim_cols_csv"),
            lit(if (absentBefore) 1L else 0L).as("auto_created"))
          .localCheckpoint(true) // materialize before the finally sweep
      } finally rmTree(dimRoot)
    }),

    // ── A9: sliding (hopping) 60s/30s window — each event lands in two
    // overlapping windows; the oracle expands events with a k∈{0,1}
    // offset join and must agree window for window
    "a9_sliding_window" -> ((s, dir) =>
      Stats.slidingVisitorStats(Tables.events(s, dir))
        .orderBy(col("stt"), col("event_type"))),

    // ── A9 streaming twin: the same hopping windows through real
    // Structured Streaming state (complete mode — every window emits)
    "stream_a9_sliding_window" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.slidingVisitorStats(
          graft.streaming.Sources.eventsStream(s, dir)),
        outputMode = "complete")
        .orderBy(col("stt"), col("event_type"))),

    // ── A8 at 100 TB: approx_percentile (mergeable one-pass sketch) with
    // a CHECKED rank-error bound — each estimate must land inside the
    // exact quantile bracket at p ± 3/accuracy; the oracle pins the
    // verdict to 1 next to recomputed exact columns (same shape as the
    // HLL gate a1_product_stats_approx)
    "a8_percentiles_approx" -> ((s, dir) =>
      Stats.percentilesApproxChecked(Tables.lineitem(s, dir))
        .orderBy(col("l_returnflag"))),

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

    // ── K2: dynamic-topic producer shaping — per-row topic + JSON value
    // (the payload bytes the reference's KafkaSerializationSchema emits)
    "k2_dynamic_topic" -> ((s, dir) =>
      graft.streaming.Sinks.dynamicTopicRows(
        Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "signup"))
          .select(col("event_id"), col("user_id"),
            concat(lit("dwd_"), col("event_type")).as("t")),
        "t")
        .orderBy(col("topic"), col("value"))),

    // ── T1: new/old-visitor flag (first-event-per-key)
    "t1_new_old_flag" -> ((s, dir) =>
      Sessionize.newOldFlag(Tables.events(s, dir))
        .groupBy(col("is_new"))
        .agg(count(lit(1)).as("ct"), count_distinct(col("user_id")).as("user_ct"))
        .orderBy(col("is_new"))),

    // ── T2: UV daily dedup (first event per key per day)
    "t2_uv_dedup" -> ((s, dir) =>
      Sessionize.uvDedup(Tables.events(s, dir))
        .select(col("user_id"), col("dt"), col("event_id"))
        .orderBy(col("user_id"), col("dt"))),

    // ── CEP: generalized pattern matching (Flink CEP surface) — 3-step
    // strict funnel view→click→purchase within 2h; matches AND timed-out
    // partials (the CEP side output), batch-truth end-of-data semantics
    "cep_funnel" -> ((s, dir) =>
      graft.streaming.Cep.runBatch(Tables.events(s, dir), cepFunnelPattern)
        .select(col("user_id"), col("first_event_id"), col("last_event_id"),
          col("steps_matched"), col("matched").cast("int").as("matched_i"))
        .orderBy(col("user_id"), col("first_event_id"))),

    // ── CEP streaming: the same pattern through flatMapGroupsWithState
    // with event-time timeouts; open windows at the final watermark stay
    // pending (same cutoff rule as every stream_* gate)
    "stream_cep_funnel" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.Cep.run(
          graft.streaming.Sources.eventsStreamSplit(s, dir)
            .withWatermark("ts", "0 seconds"),
          cepFunnelPattern),
        // <=600 pattern-state rows: commit I/O dominates at width 8
        statePartitions = 2)
        .select(col("user_id"), col("first_event_id"), col("last_event_id"),
          col("steps_matched"), col("matched").cast("int").as("matched_i"))
        .orderBy(col("user_id"), col("first_event_id"))),

    // ── CEP relaxed: followedBy (skip non-matching) funnel over a 24h
    // window — the fixture COMPLETES this one (the 2h strict funnel above
    // only ever times out), so the matched=true completion arm of
    // Cep.advance is oracle-verified end-to-end here
    "cep_funnel_relaxed" -> ((s, dir) =>
      graft.streaming.Cep.runBatch(Tables.events(s, dir), cepRelaxedPattern)
        .select(col("user_id"), col("first_event_id"), col("last_event_id"),
          col("steps_matched"), col("matched").cast("int").as("matched_i"))
        .orderBy(col("user_id"), col("first_event_id"))),

    // ── CEP relaxed, streaming twin: completions emit on arrival of the
    // completing event; timeouts emit on in-advance expiry (a same-key
    // event past the deadline) or the final-watermark cutoff
    "stream_cep_funnel_relaxed" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.Cep.run(
          graft.streaming.Sources.eventsStreamSplit(s, dir)
            .withWatermark("ts", "0 seconds"),
          cepRelaxedPattern),
        statePartitions = 2)
        .select(col("user_id"), col("first_event_id"), col("last_event_id"),
          col("steps_matched"), col("matched").cast("int").as("matched_i"))
        .orderBy(col("user_id"), col("first_event_id"))),

    // ── CEP quantifier: begin(click).oneOrMore — reluctant unbounded loop
    // under strict (consecutive) contiguity. Emits every time-bounded
    // sub-run of each consecutive-click run; by construction there is no
    // timeout arm (the first repetition already satisfies the minimum, so
    // every live branch has emitted and expires silently) — the oracle is
    // the full gaps-and-islands pair set, all matched
    "cep_clicks_burst" -> ((s, dir) =>
      graft.streaming.Cep.runBatch(Tables.events(s, dir), cepBurstPattern)
        .select(col("user_id"), col("first_event_id"), col("last_event_id"),
          col("steps_matched"), col("matched").cast("int").as("matched_i"))
        .orderBy(col("user_id"), col("first_event_id"), col("last_event_id"))),

    // ── CEP quantifier, streaming twin: every emission is a completion at
    // event arrival (no timeout side at all), so the stream output equals
    // the batch output with NO watermark-cutoff clause in the oracle
    "stream_cep_clicks_burst" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.Cep.run(
          graft.streaming.Sources.eventsStreamSplit(s, dir)
            .withWatermark("ts", "0 seconds"),
          cepBurstPattern),
        statePartitions = 2)
        .select(col("user_id"), col("first_event_id"), col("last_event_id"),
          col("steps_matched"), col("matched").cast("int").as("matched_i"))
        .orderBy(col("user_id"), col("first_event_id"), col("last_event_id"))),

    // ── CEP optional step: view → click? → purchase over 24h. The middle
    // step may be skipped entirely (the purchase can complete straight
    // from the view); both timeout shapes (bare view, view+click) fire
    "cep_optional_funnel" -> ((s, dir) =>
      graft.streaming.Cep.runBatch(Tables.events(s, dir), cepOptionalPattern)
        .select(col("user_id"), col("first_event_id"), col("last_event_id"),
          col("steps_matched"), col("matched").cast("int").as("matched_i"))
        .orderBy(col("user_id"), col("first_event_id"))),

    // ── CEP optional step, streaming twin: completions emit on arrival;
    // timeouts on in-advance expiry or the final-watermark cutoff
    "stream_cep_optional_funnel" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.Cep.run(
          graft.streaming.Sources.eventsStreamSplit(s, dir)
            .withWatermark("ts", "0 seconds"),
          cepOptionalPattern),
        statePartitions = 2)
        .select(col("user_id"), col("first_event_id"), col("last_event_id"),
          col("steps_matched"), col("matched").cast("int").as("matched_i"))
        .orderBy(col("user_id"), col("first_event_id"))),

    // ── T3: bounce detection (no successor within 1800s)
    "t3_bounce" -> ((s, dir) =>
      Sessionize.bounces(Tables.events(s, dir), gapSec = 1800L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("bounce_ct"))
        .orderBy(col("user_id"))),

    // ── P1: JSON parse with dead-letter semantics (clean rows kept)
    "p1_json_parse" -> ((s, dir) =>
      LogPipeline.parseProps(Tables.events(s, dir))
        .filter(col("props_parsed").isNotNull && col("props_parsed.k").isNotNull)
        .groupBy(pmod(col("props_parsed.k"), lit(10L)).as("k_bucket"))
        .agg(count(lit(1)).as("ct"))
        .orderBy(col("k_bucket"))),

    // ── P4: multi-way stream split (branch counts)
    "p4_stream_split" -> ((s, dir) => {
      val (starts, pages, rest) = LogPipeline.threeWaySplit(Tables.events(s, dir))
      starts.select(lit("start").as("branch"))
        .unionByName(pages.select(lit("page").as("branch")))
        .unionByName(rest.select(lit("other").as("branch")))
        .groupBy(col("branch"))
        .agg(count(lit(1)).as("ct"))
        .orderBy(col("branch"))
    }),

    // ── P6: derived calendar columns
    "p6_derived_dates" -> ((s, dir) =>
      LogPipeline.derivedDates(
        Tables.orders(s, dir).withColumn("ts", col("o_orderdate")))
        .select(col("o_orderkey"), col("create_date"), col("create_hour"), col("create_ts"))
        .orderBy(col("o_orderkey"))),

    // ── S6: dimension point lookup
    "s6_dim_lookup" -> ((s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_custkey").between(1, 20))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    // ── F2-F13: scalar function pack
    "f_scalar_pack" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        split(col("o_orderpriority"), "-").getItem(0).as("prio_code"),
        substring(col("o_orderstatus"), 1, 1).as("status_c"),
        toYmdHms(col("o_orderdate")).as("od_str"),
        toTs(toYmdHms(col("o_orderdate"))).as("od_ms"),
        floor(datediff(lit("2024-12-31").cast("date"), col("o_orderdate")) / lit(365))
          .as("age_years"),
        toYyyymmdd(col("o_orderdate")).as("od_yyyymmdd"))
        .orderBy(col("o_orderkey"))),

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

    // ── Dedup: incremental ingestion through REAL Structured Streaming —
    // the incoming slice arrives as a stream and probes the static history
    // index with stream-static joins only (text rides the probe, so no
    // stream-stream join is needed); same oracle as the batch twin since
    // every emission happens at arrival
    "stream_dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val history = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0L)
      graft.streaming.StreamRunner.collect(
        Dedup.incrementalNearDupsStreamable(
          graft.streaming.Sources.documentsStream(s, dir)
            .filter(pmod(col("doc_id"), lit(5L)) === 0L),
          history, Dedup.minhashBandIndex(history)))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ── Pipeline streaming: ingestion-time decontamination — every
    // arriving corpus batch is scrubbed against the (static, broadcast)
    // eval gram set via foreachBatch; decontamination is per-doc pure, so
    // batch-local application is exact under any batch boundaries. Clean
    // survivors reported per language.
    "stream_pipe_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(pmod(col("doc_id"), lit(97L)) === 0 ||
        pmod(col("doc_id"), lit(101L)) === 0)
      val incoming = graft.streaming.Sources.documentsStream(s, dir)
        .filter(pmod(col("doc_id"), lit(97L)) =!= 0)
      graft.streaming.StreamRunner.collectBatches(incoming)(b =>
          Pretrain.decontaminate(b, evalSet))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs_clean"), sum(col("n_chars")).as("chars_clean"))
        .orderBy(col("lang"))
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

    // ── A1 at 100 TB: HLL distinct (approx_count_distinct) — constant
    // memory per group, associative merges. HLL estimates are
    // engine-specific, so the gate emits a per-group ERROR-BOUND verdict
    // (|hll - exact| <= max(2, 3*rsd*exact)) next to the exact columns;
    // the oracle asserts the verdict is 1 everywhere — a checked bound,
    // not a rows-only count (ApproxSpec pins the bound in-JVM too).
    "a1_product_stats_approx" -> ((s, dir) =>
      Stats.productStatsApproxChecked(Tables.events(s, dir))
        .orderBy(col("stt"), col("event_type"))),

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
        .orderBy(col("doc_id"))),

    // ── Streaming gate: the SAME operators through real Structured
    // Streaming execution (state stores, watermarks, event-time timeouts)
    // over a bounded file source with Trigger.AvailableNow. Proves the
    // streaming path — not just the batch twin — in the correctness gate.
    // Stateful gates read eventsStreamSplit (4 ts-contiguous chunk files,
    // maxFilesPerTrigger=1 ⇒ ≥4 micro-batches), so watermark advance,
    // state reload and timeout firing are exercised ACROSS batch
    // boundaries; the split preserves the single-batch result by
    // construction (see Sources.eventsStreamSplit), so each gate keeps
    // its oracle.

    // ── T1 streaming: flatMapGroupsWithState first-visit flag
    "stream_t1_new_old" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.StatefulStreams.newOldFlag(
          graft.streaming.Sources.eventsStreamSplit(s, dir)),
        // 1.5k per-user flags: tiny state, width 2
        statePartitions = 2)
        .groupBy(col("is_new"))
        .agg(count(lit(1)).as("ct"), count_distinct(col("user_id")).as("user_ct"))
        .orderBy(col("is_new"))),

    // ── T2 streaming: per-key last-date ValueState dedup
    "stream_t2_uv_dedup" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.StatefulStreams.uvDedup(
          graft.streaming.Sources.eventsStreamSplit(s, dir)),
        statePartitions = 2)
        .select(col("user_id"), col("dt"), col("event_id"))
        .orderBy(col("user_id"), col("dt"))),

    // ── Streaming exact dedup under at-least-once REPLAY: the staged
    // chunks re-deliver the ENTIRE previous chunk (chunk i = Eᵢ ∪ Eᵢ₋₁,
    // event_id mod 3 split — a transport redelivering a whole segment),
    // so cross-batch replays (state hit) and the first-arrival-wins rule
    // are exercised. Complements stream_dedup_wwm (same operator, natural
    // in-stream dup keys): here the duplicates are TRANSPORT artifacts —
    // every row is redelivered once — the failure mode exactly-once
    // pipelines actually face.
    // Delay 35d covers the 30-day fixture, so no key expires and the
    // result is EXACTLY one copy of every event — the oracle is the plain
    // per-type profile of the original table; a missed replay inflates
    // ct, an over-drop deflates it. In production the delay is sized to
    // the transport's max redelivery horizon, which is what bounds state
    // (see Dedup.streamExactDedup).
    "stream_dedup_replay" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def part(i: Int) = ev.filter(pmod(col("event_id"), lit(3L)) === i)
      val root = shmRoot
      val stage = s"$root/graft-replay-${System.nanoTime()}"
      try {
        val stream = graft.streaming.Sources.stagedChunkStream(s,
          Seq(part(0), part(1).unionByName(part(0)),
            part(2).unionByName(part(1))),
          Some(stage))
        graft.streaming.StreamRunner.collect(
          graft.operators.Dedup.streamExactDedup(
            stream, Seq("event_id"), "ts", "35 days"),
          // state is one tiny row per event_id: narrow width (AbDrift r12)
          statePartitions = 2)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("ct"),
            count_distinct(col("event_id")).as("ids"),
            count_distinct(col("user_id")).as("users"))
          .orderBy(col("event_type"))
          .localCheckpoint(true)
      } finally rmTree(stage)
    }),

    // ── Offline state-store introspection (Spark 4's `statestore` data
    // source): read a stopped stream's STATE — not its output — straight
    // from the checkpoint. The ops surface a production deployment needs
    // (debug a wedged key, audit state before a migration, verify a TTL
    // policy actually evicted) without replaying the stream. The gate
    // runs T2's uvDedup to completion, then reads its per-user
    // ValueState back: state holds the LAST deduped date per user, which
    // is exactly max(date) per user — an offline SQL truth, so the
    // oracle checks the state CONTENT, not just its shape.
    "stream_state_reader" -> ((s, dir) => {
      val ckpt = s"$shmRoot/graft-srckpt-${System.nanoTime()}"
      val sink = s"graft_sr_${System.nanoTime()}"
      val before = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        val q = graft.streaming.StatefulStreams.uvDedup(
          graft.streaming.Sources.eventsStreamSplit(s, dir))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.format("statestore").load(ckpt)
          .select(col("key.value").as("user_id"),
            col("value.groupState.value").as("last_dt"))
          .orderBy(col("user_id"))
          .localCheckpoint(true)
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", before)
        s.catalog.dropTempView(sink)
        rmTree(ckpt)
      }
    }),

    // ── T2 streaming under the RocksDB state store: byte-identical
    // semantics to stream_t2_uv_dedup (same oracle), run with the
    // big-state provider a production deployment uses once state
    // outgrows the executor heap — provider-independence proven through
    // the DuckDB gate, not just a spec.
    "stream_t2_uv_rocksdb" -> ((s, dir) => {
      withRocksDb(s) {
        graft.streaming.StreamRunner.collect(
          graft.streaming.StatefulStreams.uvDedup(
            graft.streaming.Sources.eventsStreamSplit(s, dir)),
          // RocksDB pays a per-store-instance open/commit premium; the
          // 1.5k-row state wants width 2, not 8 (AbDrift r12 tws arms)
          statePartitions = 2)
          .select(col("user_id"), col("dt"), col("event_id"))
          .orderBy(col("user_id"), col("dt"))
      }
    }),

    // ── T2 through Spark 4's transformWithState (the arbitrary-state
    // API succeeding FMGWS): named ValueState WITH the reference's 24h
    // TTL attached for real, vs the SAME oracle as stream_t2_uv_dedup.
    // The API requires RocksDB state stores, so the provider wraps the
    // run exactly like the rocksdb twin above — this gate is therefore
    // API-independence evidence (FMGWS vs tws) on top of that gate's
    // provider-independence.
    "stream_t2_uv_tws" -> ((s, dir) => {
      withRocksDb(s) {
        graft.streaming.StreamRunner.collect(
          graft.streaming.TwsStreams.uvDedup(
            graft.streaming.Sources.eventsStreamSplit(s, dir)
              .withWatermark("ts", "0 seconds")),
          statePartitions = 2)
          .select(col("user_id"), col("dt"), col("event_id"))
          .orderBy(col("user_id"), col("dt"))
      }
    }),

    // ── T5 streaming: the token-bucket rate limiter through the REAL
    // stateful path — one (tok, lastTick) pair per key in RocksDB state,
    // folded per batch in event-time order; the ts-contiguous source
    // makes the cross-batch order equal the batch operator's, so the
    // SAME recursive-CTE oracle pins the admitted/rejected sets.
    "stream_t5_rate_limit" -> ((s, dir) => {
      withRocksDb(s) {
        graft.streaming.StreamRunner.collect(
          graft.streaming.TwsStreams.rateLimit(
            graft.streaming.Sources.eventsStreamSplit(s, dir)
              .filter(col("event_id") % 37 === 0)
              .withWatermark("ts", "0 seconds"),
            e => e.user_id % 2,
            capacity = 5, refillPerTick = 1, tickSeconds = 86400L),
          statePartitions = 2)
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("accepted"), 1L).otherwise(0L)).as("n_acc"),
            sum(when(col("accepted"), 0L).otherwise(1L)).as("n_rej"),
            sum(when(col("accepted"), col("event_id")).otherwise(0L))
              .as("acc_sum"),
            sum(when(col("accepted"), 0L).otherwise(col("event_id")))
              .as("rej_sum"))
          .orderBy(col("k"))
      }
    }),

    // ── T3 through transformWithState: the bounce timeout as a REAL
    // registered event-time timer (registerTimer/handleExpiredTimer —
    // the reference's CEP within() side-output), vs the SAME oracle as
    // stream_t3_bounce. Both decision arms fire across the 4-batch split
    // source: data-path bounces (successor too late) and timer-path
    // bounces (watermark passes pending+gap mid-stream or at the flush).
    "stream_t3_bounce_tws" -> ((s, dir) => {
      withRocksDb(s) {
        graft.streaming.StreamRunner.collect(
          graft.streaming.TwsStreams.bounces(
            graft.streaming.Sources.eventsStreamSplit(s, dir)
              .withWatermark("ts", "0 seconds"),
            gapSec = 1800L),
          statePartitions = 2)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("bounce_ct"))
          .orderBy(col("user_id"))
      }
    }),

    // ── T6's session variant through transformWithState: merge-on-arrival
    // open-session state + an event-time timer at the session end — the
    // tws twin of the session_window operator gate (stream_t4_session),
    // vs the SAME oracle. The timer registers the end's ms-floor WITHOUT
    // the bounce twin's +1: session_window's emission cutoff is inclusive
    // (end_ms <= watermark_ms), exactly tws timers' own expiry compare.
    "stream_t4_session_tws" -> ((s, dir) => {
      withRocksDb(s) {
        graft.streaming.StreamRunner.collect(
          graft.streaming.TwsStreams.sessionStats(
            graft.streaming.Sources.eventsStreamSplit(s, dir)
              .withWatermark("ts", "0 seconds"),
            gapSec = 1800L),
          statePartitions = 2)
          .orderBy(col("user_id"), col("stt_us"))
      }
    }),

    // ── T8 as an ORACLE gate (spec-only until r10): checkpoint resume
    // across a process "restart". uvDedup runs over the first 2 chunk
    // files, STOPS, then a fresh query resumes from the same checkpoint
    // with chunks 3-4 staged. The result is the union of both
    // lifecycles' appended output vs the SINGLE-RUN oracle (same as
    // stream_t2_uv_dedup): failed offset recovery re-emits lifecycle 1's
    // rows, failed state reload re-emits already-seen users — both are
    // hash mismatches, so equality proves exactly-once resume itself.
    "stream_t8_checkpoint_resume" -> ((s, dir) =>
      graft.streaming.StreamRunner.collectResumed(
        graft.streaming.Sources.eventsSplitChunks(s, dir, parts = 4),
        splitAt = 2, statePartitions = 2)(stageDir =>
        graft.streaming.StatefulStreams.uvDedup(
          graft.streaming.Sources.eventsStreamStaged(s, stageDir)))
        .select(col("user_id"), col("dt"), col("event_id"))
        .orderBy(col("user_id"), col("dt"))),

    // ── J3 streaming twin: stream-static broadcast enrichment — the
    // live shape of the reference's dim lookup (each micro-batch joins
    // the static dims as a broadcast hash lookup; no state, no
    // watermark needed on the static side). Orders arrive as a bounded
    // stream; customer/nation are static tables.
    "stream_j3_enrich" -> ((s, dir) => {
      val sch = s.read.option("pathGlobFilter", "orders.parquet")
        .parquet(dir).schema
      val oStream = s.readStream.schema(sch)
        .option("pathGlobFilter", "orders.parquet").parquet(dir)
      val enriched = oStream
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("order_ct"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("amount"))
      graft.streaming.StreamRunner.collect(enriched, outputMode = "complete")
        .orderBy(col("n_name"))
    }),

    // ── J6 streaming twin: as-of enrichment per micro-batch — each batch
    // of arriving facts joins the FULL dimension history (time-correct
    // version pick), the semantics a point-lookup dim cache (the
    // reference's Redis path) silently gets wrong for late or replayed
    // events. Per-row pure against the static history, so batch-local
    // application is exact under any batching; oracle = the batch ASOF
    // truth, same as j6.
    "stream_j6_asof" -> ((s, dir) => {
      val sch = s.read.option("pathGlobFilter", "orders.parquet")
        .parquet(dir).schema
      val oStream = s.readStream.schema(sch)
        .option("pathGlobFilter", "orders.parquet").parquet(dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val history = Tables.orders(s, dir)
        .select(col("o_custkey").as("ck"), col("o_orderdate").as("od"))
      graft.streaming.StreamRunner.collectBatches(oStream)(b =>
        Joins.asOfJoin(b, history, "o_custkey", "ck", "o_orderdate", "od",
          payload = Seq("od"), strict = true)
          .select(col("o_orderkey"), col("asof.od").as("prev_date")))
        .orderBy(col("o_orderkey"))
    }),

    // ── K7 streaming: SCD2 dim maintenance from a CDC-style stream.
    // Each micro-batch merges into an accumulating changelog store
    // (StreamRunner.foldBatches — the foreachBatch dim-sink shape); the
    // SCD2 history derives from the final store, so the result is exact
    // at ANY batch boundary or arrival order. Deliberately NOT compacted
    // to the dim itself between batches: scd2(changed(prefix) ∪ batch)
    // drops rows a LATE out-of-order row can make significant again
    // (an unchanged row after a late insert re-opens a version), so the
    // maintained store is the raw changelog — dims are small by the K4
    // contract, and the per-batch recompute is the price of exactness
    // under out-of-order CDC.
    "stream_k7_scd2" -> ((s, dir) => {
      val stream = graft.streaming.Sources.eventsStreamSplit(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val changelog = graft.streaming.StreamRunner.foldBatches(stream)(
        (st, b) => st.map(_.unionByName(b)).getOrElse(b))
      graft.operators.Scd.scd2(changelog,
          keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
          attrCols = Seq("event_type"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("effective_from")).as("from_us"),
          unix_micros(col("effective_to")).as("to_us"),
          col("is_current"))
        .orderBy(col("user_id"), col("from_us"), col("event_id"))
    }),

    // ── Engine-native streaming dedup: dropDuplicates runs as the
    // dedicated StreamingDeduplicate physical operator (state = seen
    // keys), distinct from the FMGWS path stream_t2 exercises. Emitting
    // only the key columns makes "first arrival wins" deterministic;
    // unbounded key state is the documented cost (the watermarked
    // variant evicts, but its drop guarantee is then time-bounded —
    // wrong for an exact-result gate).
    "stream_dedup_ids" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.Sources.eventsStream(s, dir)
          .dropDuplicates("user_id", "event_type")
          .select(col("user_id"), col("event_type")))
        .orderBy(col("user_id"), col("event_type"))),

    // ── Engine-native WATERMARKED streaming dedup: the production
    // posture stream_dedup_ids' comment calls for — state is evicted
    // once the watermark passes first-arrival + delay, so memory is
    // bounded by the key-arrival rate × delay instead of all history.
    // Runs as the dedicated StreamingDeduplicateWithinWatermark
    // operator over the multi-batch split source (real watermark
    // advance between batches). The fixture spans 30 days and the
    // delay is 35 days, so ZERO evictions occur in-window and the
    // exact oracle is DISTINCT — while the eviction/re-admission
    // semantics (which no offline SQL oracle can express without
    // replaying batch boundaries) are pinned by WwmDedupSpec on a
    // staged 3-batch fixture.
    "stream_dedup_wwm" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.Sources.eventsStreamSplit(s, dir)
          .withWatermark("ts", "35 days")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select(col("user_id"), col("event_type")))
        .orderBy(col("user_id"), col("event_type"))),

    // ── T3 streaming: CEP bounce via event-time timeout. Keys whose final
    // event is within gapSec of the final watermark stay pending (live-
    // stream semantics); the oracle applies the same watermark cutoff.
    "stream_t3_bounce" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.StatefulStreams.bounces(
          graft.streaming.Sources.eventsStreamSplit(s, dir)
            .withWatermark("ts", "0 seconds"),
          gapSec = 1800L),
        statePartitions = 2)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("bounce_ct"))
        .orderBy(col("user_id"))),

    // ── T7 streaming: LATE-DATA DROP as an oracle gate (spec-only until
    // r10). The round-robin split (chunk = event_id mod 4) makes every
    // batch after the first carry rows behind the advanced watermark, so
    // Spark's drop rule actually fires; the oracle REPLAYS that rule
    // explicitly: wm before batch k = max event-time ms over batches < k
    // minus the 600 s delay (ms floor, exactly EventTimeStats); a row is
    // dropped when its window END (µs) <= wm*1000; a window emits (append
    // mode) when its end <= the FINAL wm. Hash equality therefore proves
    // the drop semantics themselves, batch vs stream.
    "stream_t7_late_drop" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.Sources.eventsStreamShuffled(s, dir)
          .withWatermark("ts", "600 seconds")
          .groupBy(window(col("ts"), "3600 seconds"), col("event_type"))
          .agg(count(lit(1)).as("ct")),
        // single tiny windowed-agg store; commit I/O dominates at width 8
        statePartitions = 2)
        .select(unix_micros(col("window.start")).as("stt_us"),
          col("event_type"), col("ct"))
        .orderBy(col("stt_us"), col("event_type"))),

    // ── A1 streaming: watermarked tumbling window agg, complete mode
    "stream_a1_product_stats" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.productStats(
          graft.streaming.Sources.eventsStreamSplit(s, dir)),
        outputMode = "complete")
        .orderBy(col("stt"), col("event_type"))),

    // ── Chained stateful aggregation (Spark 4 multiple stateful
    // operators): 60s pre-agg feeds a 600s re-agg in ONE streaming query —
    // the cascaded-rollup shape that cuts the coarse level's shuffle and
    // state to one row per (fine window, key). Append mode over 4 staged
    // micro-batches; the oracle is the direct 600s aggregate restricted to
    // windows the final watermark (max event-time ms, 0s delay) closed.
    "stream_chained_agg" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.chainedStats(
          graft.streaming.Sources.eventsStreamSplit(s, dir)),
        // two tiny windowed-agg stores; run narrow (commit I/O dominates)
        statePartitions = 2)
        .orderBy(col("stt"), col("event_type"))),

    // ── Chained dedup -> aggregation (the third multiple-stateful-operator
    // shape): the source is unioned with ITSELF — every event arrives
    // twice — and dropDuplicatesWithinWatermark collapses the copies
    // before a windowed count. The oracle is the plain single-copy
    // windowed count: the gate only passes if the dedup state caught
    // every duplicate across micro-batches (dedup passes the watermark
    // through undelayed, so the append cutoff is the raw end <= wm).
    "stream_dedup_agg_chain" -> ((s, dir) => {
      val a = graft.streaming.Sources.eventsStreamSplit(s, dir)
      val b = graft.streaming.Sources.eventsStreamSplit(s, dir)
      graft.streaming.StreamRunner.collect(
        a.unionByName(b)
          .withWatermark("ts", "0 seconds")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy(window(col("ts"), "3600 seconds"), col("event_type"))
          .agg(count(lit(1)).as("ct")),
        statePartitions = 2)
        .select(unix_micros(col("window.start")).as("stt_us"),
          col("event_type"), col("ct"))
        .orderBy(col("stt_us"), col("event_type"))
    }),

    // ── Chained agg -> argmax-agg: per-600s-window counts per event_type
    // feed a per-window top-1 pick (max_by on a count||type string key,
    // deterministic under ties) in the same query — streaming "trending
    // item per window" without a rank, which streaming disallows. The
    // identity re-window keeps the event-time column for the second
    // stateful aggregation.
    "stream_window_argmax" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.Sources.eventsStreamSplit(s, dir)
          .withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "600 seconds"), col("event_type"))
          .agg(count(lit(1)).as("ct"))
          .groupBy(window(col("window"), "600 seconds").as("w"))
          .agg(max(col("ct")).as("top_ct"),
            max_by(col("event_type"),
              concat(lpad(col("ct").cast("string"), 12, "0"),
                col("event_type"))).as("top_type")),
        statePartitions = 2)
        .select(unix_micros(col("w.start")).as("stt_us"),
          col("top_type"), col("top_ct"))
        .orderBy(col("stt_us"))),

    // ── Chained join -> aggregation (the second multiple-stateful-operator
    // shape): the J1 interval join's matched pairs feed a 3600s tumbling
    // count per event-hour INSIDE the same streaming query. Spark delays
    // the aggregation's watermark by the join's time-interval bound, so a
    // window only closes once no further pair can land in it — probed
    // empirically this round: with wm=4000s a [0,3600) window does NOT
    // emit, at wm=4300s it does, pinning cutoff = end <= wm - 600s where
    // wm is the MIN across the two branch watermarks. The oracle applies
    // exactly that delayed cutoff.
    "stream_chained_join_agg" -> ((s, dir) => {
      val ev = graft.streaming.Sources.eventsStreamSplit(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.intervalJoin(
            views, clicks, "v_user", "c_user", "v_ts", "c_ts",
            lowerSec = 0L, upperSec = 600L)
          .groupBy(window(col("v_ts"), "3600 seconds"))
          .agg(count(lit(1)).as("pair_ct")),
        statePartitions = 2)
        .select(unix_micros(col("window.start")).as("stt_us"),
          col("pair_ct"))
        .orderBy(col("stt_us"))
    }),

    // ── J1 streaming: stream-stream interval join (view -> click within
    // 600s per user), watermark-bounded state
    "stream_j1_interval_join" -> ((s, dir) => {
      val ev = graft.streaming.Sources.eventsStream(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.intervalJoin(
          views, clicks, "v_user", "c_user", "v_ts", "c_ts",
          lowerSec = 0L, upperSec = 600L),
        // 4 state stores x partitions x batches of pure commit I/O for
        // ~10 state rows: run narrow (AbDrift r12: j1_sp2 < j1_sp8)
        statePartitions = 2)
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("pair_ct"))
        .orderBy(col("user_id"))
    }),

    // ── J7 streaming: stream-stream LEFT OUTER interval join — matched
    // pairs emit on arrival; a view with no click in [v_ts, v_ts+600s]
    // emits null-padded once the watermark passes its window. The global
    // watermark is the MIN across the two branch watermarks (view max vs
    // click max event time), which the oracle's cutoff mirrors.
    "stream_j7_interval_left" -> ((s, dir) => {
      val ev = graft.streaming.Sources.eventsStream(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.intervalJoin(
          views, clicks, "v_user", "c_user", "v_ts", "c_ts",
          lowerSec = 0L, upperSec = 600L, joinType = "leftOuter"),
        statePartitions = 2)
        .groupBy(col("v_user").as("user_id"))
        .agg(count(col("c_ts")).as("pair_ct"),
          sum(when(col("c_ts").isNull, 1L).otherwise(0L)).as("unmatched_ct"))
        .orderBy(col("user_id"))
    }),

    // ── J7b streaming: stream-stream FULL OUTER interval join — the
    // remaining outer-join family member (j1 inner, j7 left). Matched
    // pairs emit on arrival; unmatched VIEWS null-pad once the watermark
    // passes v_ts + 600 s (the j7 rule); unmatched CLICKS null-pad once
    // the watermark passes c_ts itself (a click's last possible match is
    // a view at v_ts = c_ts, so its state closes at the symmetric
    // boundary — 0-second lower bound makes the two cutoffs asymmetric
    // by exactly the join band). The oracle mirrors both cutoffs at ms
    // precision (EventTimeStats floors µs→ms).
    "stream_j7b_interval_full" -> ((s, dir) => {
      val ev = graft.streaming.Sources.eventsStream(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.intervalJoin(
          views, clicks, "v_user", "c_user", "v_ts", "c_ts",
          lowerSec = 0L, upperSec = 600L, joinType = "fullOuter"),
        statePartitions = 2)
        .groupBy(coalesce(col("v_user"), col("c_user")).as("user_id"))
        .agg(
          sum(when(col("v_ts").isNotNull && col("c_ts").isNotNull, 1L)
            .otherwise(0L)).as("pair_ct"),
          sum(when(col("c_ts").isNull, 1L).otherwise(0L))
            .as("unmatched_view_ct"),
          sum(when(col("v_ts").isNull, 1L).otherwise(0L))
            .as("unmatched_click_ct"))
        .orderBy(col("user_id"))
    }),

    // ── T4 streaming: session_window agg. Sessions still open at the final
    // watermark stay pending (live-stream semantics; oracle mirrors the
    // cutoff).
    "stream_t4_session" -> ((s, dir) =>
      graft.streaming.StreamRunner.collect(
        graft.streaming.WindowedStreams.sessionStats(
          graft.streaming.Sources.eventsStream(s, dir), gapSec = 1800L),
        statePartitions = 2)
        .orderBy(col("user_id"), col("stt_us"))),

    // ── A4 streaming via the SQL path: spark.sql over a streaming temp
    // view (the Flink SQL job shape, SURVEY §3.2 — one Catalyst pipeline,
    // no Table/DataStream bridge). Exact distinct via collect_set
    // (COUNT(DISTINCT) is unsupported in streaming).
    "stream_a4_sql" -> ((s, dir) => {
      val view = s"ev_sql_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      graft.streaming.Sources.eventsStream(s, dir)
        .withWatermark("ts", "2 seconds")
        .createOrReplaceTempView(view)
      val out = graft.streaming.StreamRunner.collect(
        s.sql(
          s"""SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
             |       event_type, pmod(user_id, 4) AS cohort, count(*) AS pv,
             |       size(collect_set(user_id)) AS uv,
             |       cast(sum(cast(value AS decimal(18,2))) AS double) AS dur_sum
             |FROM $view
             |GROUP BY window(ts, '60 seconds'), event_type, pmod(user_id, 4)""".stripMargin),
        outputMode = "complete")
        .orderBy(col("stt"), col("event_type"), col("cohort"))
      // the bounded run is complete, so the streaming view is dead weight —
      // drop it to keep the catalog flat across repeated invocations
      s.catalog.dropTempView(view)
      out
    }),

    // ── K3/A5: serve over materialized stats (two-level agg)
    "k3_serving_reagg" -> ((s, dir) =>
      Stats.productStats(Tables.events(s, dir))
        .groupBy(col("event_type"))
        .agg(sum(col("ct")).as("total_ct"),
          max(col("user_ct")).as("max_win_users"),
          count(lit(1)).as("windows"))
        .orderBy(col("event_type")))
  )

  /** The gate CEP pattern: a strict 3-step conversion funnel. */
  private def cepFunnelPattern: graft.streaming.Cep.Pattern =
    graft.streaming.Cep.Pattern.begin("view")(_.event_type == "view")
      .next("click")(_.event_type == "click")
      .next("purchase")(_.event_type == "purchase")
      .within(7200L)

  /** Relaxed-contiguity funnel (Flink `followedBy`): each partial consumes
    * the FIRST in-window matching event per step and skips the rest. 24h
    * window because the fixture's median inter-event gap is hours — this
    * is the pattern the data can complete, making matched=true rows
    * oracle-checkable (the strict 2h funnel never completes on it). */
  private def cepRelaxedPattern: graft.streaming.Cep.Pattern =
    graft.streaming.Cep.Pattern.begin("view")(_.event_type == "view")
      .followedBy("click")(_.event_type == "click")
      .followedBy("purchase")(_.event_type == "purchase")
      .within(86400L)
      // the DuckDB oracle models UNBOUNDED concurrent partials; lift the
      // hot-key force-expiry guard far above any per-user view count so the
      // oracle's assumption is pinned by construction, not by fixture luck
      .copy(maxPartials = 1 << 20)

  /** Quantifier gate: reluctant unbounded loop (Flink `oneOrMore`) over a
    * strictly-consecutive click run — every time-bounded sub-run emits. */
  private def cepBurstPattern: graft.streaming.Cep.Pattern =
    graft.streaming.Cep.Pattern.begin("click")(_.event_type == "click")
      .oneOrMore.within(86400L)
      .copy(maxPartials = 1 << 20)

  /** Optional-step gate: view → click? → purchase (Flink `optional`) —
    * the purchase may complete straight from the view, skipping the
    * optional click position. */
  private def cepOptionalPattern: graft.streaming.Cep.Pattern =
    graft.streaming.Cep.Pattern.begin("view")(_.event_type == "view")
      .followedBy("click")(_.event_type == "click").optional
      .followedBy("purchase")(_.event_type == "purchase")
      .within(86400L)
      .copy(maxPartials = 1 << 20)

  /** The affine MinHash permutation family as a DuckDB VALUES list —
    * the SAME constants graft_minhash_bands_p bakes into its signatures
    * (HashFns.permutations), so the oracle recomputes identical sketches. */
  private def permValuesSql(numPerms: Int): String =
    graft.functions.HashFns.permutations(numPerms).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }
      .mkString(", ")

  /** Hyperplane-bucket SQL with the plane coordinates baked in as double
    * literals (Double.toString round-trips exactly; DuckDB's parser is
    * correctly rounded). The dot product is UNROLLED left-to-right so the
    * float accumulation order matches graft_dot's sequential loop. */
  private def bucketSql(planes: Seq[Array[Double]], emb: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zipWithIndex
        .map { case (v, d) => s"CAST($emb[${d + 1}] AS DOUBLE)*($v)" }
        .mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  /** One UNION-ALL branch per plane, via DuckDB's `list_dot_product`
    * kernel — sequential double accumulation, bit-identical to
    * `graft_dot` (the same kernel family the sim_topk cosine oracles
    * pin). An explicit `a+b+c+...` SQL chain is NOT equivalent: DuckDB
    * reassociates long addition chains and drifts a ulp. */
  private def projSql(planes: Seq[Array[Double]], emb: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      val arr = p.map(_.toString).mkString("[", ", ", "]")
      s"SELECT vec_id, CAST($i AS BIGINT) AS plane, " +
        s"floor(list_dot_product(CAST($emb AS DOUBLE[]), CAST($arr AS DOUBLE[])) " +
        "* 1e6) / 1e6 AS proj FROM embeddings"
    }.mkString("\nUNION ALL\n")

  /** DuckDB oracle SQL, column-name-aligned with `queries`. */
  def oracleSql: Map[String, String] = Map(

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

    // pruned payloads: per route, the key set present in the pruned JSON
    // and value aggregates extracted THROUGH it, vs base-table truth
    "p5_config_prune" ->
      """SELECT 'dwd_customer' AS sink_table, 'c_custkey,c_name' AS keys_csv,
        |  CAST(count(*) AS BIGINT) AS ct,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_key,
        |  CAST(count(DISTINCT c_name) AS BIGINT) AS distinct_vals
        |FROM customer
        |UNION ALL
        |SELECT 'dwd_orders', 'o_orderkey,o_orderstatus',
        |  CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT)
        |FROM orders
        |ORDER BY sink_table""".stripMargin,

    // config flip + auto-DDL: even-key rows went to the kafka batch,
    // odd-key rows landed in the auto-created dim table
    "k5_auto_ddl" ->
      """SELECT
        |  CAST(count(CASE WHEN c_custkey % 2 = 0 THEN 1 END) AS BIGINT)
        |    AS kafka_ct,
        |  CAST(count(CASE WHEN c_custkey % 2 = 1 THEN 1 END) AS BIGINT)
        |    AS dim_ct,
        |  CAST(sum(CASE WHEN c_custkey % 2 = 1 THEN c_custkey END) AS BIGINT)
        |    AS dim_sum_key,
        |  'c_custkey,c_name' AS dim_cols_csv,
        |  CAST(1 AS BIGINT) AS auto_created
        |FROM customer""".stripMargin,

    // final dim state after snapshot+update+delete envelopes: updates win
    // by version, deletes are filtered (reference drops them pre-route),
    // so balances are original except the %7 update cohort's +100
    "cdc_route_upsert" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
        |       ELSE c_acctbal END AS c_acctbal,
        |  CAST(CASE WHEN c_custkey % 7 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |    AS version
        |FROM customer ORDER BY c_custkey""".stripMargin,

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

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_order_revenue" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_date, o_orderpriority
        |ORDER BY revenue DESC, o_date, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_priority_semi" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q6_priority_anti" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey
        |                    AND l_shipdate <= o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q6f_filter_agg" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS ct
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY') OR
        |       (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "j8_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS ct,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q10_returned_customers" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT p_type, CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(3,2))) AS vol
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01')
        |SELECT
        |  COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol END)
        |    AS DOUBLE), 0) AS promo_revenue,
        |  CAST(SUM(vol) AS DOUBLE) AS total_revenue,
        |  100.0 * COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol END)
        |    AS DOUBLE), 0) / CAST(SUM(vol) AS DOUBLE) AS promo_share
        |FROM j""".stripMargin,

    "q19_or_brackets" ->
      """SELECT COUNT(*) AS ct,
        |  COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 0) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |          AND l_quantity BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |          AND l_quantity BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
        |          AND l_quantity BETWEEN 20 AND 30))""".stripMargin,

    "q13_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN (
        |    SELECT o_orderkey, o_custkey FROM orders
        |    WHERE o_orderpriority <> '1-URGENT') o
        |  ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q18_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice,
        |  CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_date, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q21_wait_suppliers" ->
      """SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q22_no_urgent" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |  AND CAST(c_acctbal AS DECIMAL(12,2)) * (
        |    SELECT COUNT(*) FROM customer
        |    WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
        |  > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer
        |    WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q8_market_share" ->
      """WITH j AS (
        |  SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(3,2))) AS vol
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'MEDIUM'
        |  JOIN orders ON l_orderkey = o_orderkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey)
        |SELECT o_year,
        |  COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol END)
        |    AS DOUBLE), 0) AS nation_volume,
        |  CAST(SUM(vol) AS DOUBLE) AS total_volume,
        |  COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol END)
        |    AS DOUBLE), 0) / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin,

    "stream_t2_uv_rocksdb" ->
      """WITH f AS (SELECT user_id,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt, event_id,
        |    row_number() OVER (PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT user_id, dt, event_id FROM f WHERE rn = 1 ORDER BY user_id, dt""".stripMargin,

    // same oracle again: the tws gate changes the state API, never the answer
    "stream_t2_uv_tws" ->
      """WITH f AS (SELECT user_id,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt, event_id,
        |    row_number() OVER (PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT user_id, dt, event_id FROM f WHERE rn = 1 ORDER BY user_id, dt""".stripMargin,

    "zorder_layout" -> {
      // the interleave spelled out: bit i of x → bit 2i, bit i of y →
      // bit 2i+1 (generated, so the oracle covers every bit position)
      val interleave = (0 until 10).flatMap(i => Seq(
        s"(((x >> $i) & 1) << ${2 * i})",
        s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"""WITH g AS (
         |  SELECT p_partkey, p_partkey % 1024 AS x,
         |    (p_partkey // 7) % 1024 AS y
         |  FROM part)
         |SELECT p_partkey, $interleave AS zval
         |FROM g ORDER BY p_partkey""".stripMargin
    },

    "freq_heavy_hitters" ->
      """WITH l AS (
        |  SELECT CASE WHEN l_orderkey % 16 < 8 THEN 0
        |              WHEN l_orderkey % 16 < 12 THEN 1
        |              ELSE l_orderkey % 16 - 10 END AS k
        |  FROM lineitem)
        |SELECT k, COUNT(*) AS cnt FROM l
        |GROUP BY k HAVING COUNT(*) * 8 > (SELECT COUNT(*) FROM l)
        |ORDER BY k""".stripMargin,

    "j8b_salted_hot" ->
      """WITH l AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 6 THEN 0
        |              ELSE l_orderkey % 10 END AS skew_k,
        |    l_extendedprice, l_tax
        |  FROM lineitem),
        |dim AS (
        |  SELECT skew_k,
        |    CAST(MIN(CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE) AS k_min_tax
        |  FROM l GROUP BY skew_k)
        |SELECT l.skew_k, COUNT(*) AS ct,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  MIN(d.k_min_tax) AS k_min_tax
        |FROM l JOIN dim d ON l.skew_k = d.skew_k
        |GROUP BY l.skew_k ORDER BY l.skew_k""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
        |  nfc_normalize(text) = text AS already_nfc
        |FROM documents ORDER BY doc_id""".stripMargin,

    "stream_j3_enrich" ->
      """SELECT n_name, COUNT(*) AS order_ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "dq_violations" ->
      """SELECT 'not_null(l_shipdate)' AS rule,
        |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM lineitem
        |UNION ALL SELECT 'range(l_quantity,1.0,50.0)',
        |  CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'range(l_discount,0.0,0.1)',
        |  CAST(SUM(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.1) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'matches(l_returnflag,^[ANR]$)',
        |  CAST(SUM(CASE WHEN l_returnflag IS NOT NULL AND NOT regexp_matches(l_returnflag, '^[ANR]$') THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'unique(l_orderkey,l_linenumber)',
        |  CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'unique(l_orderkey)',
        |  CAST(COUNT(*) - COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'ref(l_orderkey)',
        |  CAST(COUNT(*) AS BIGINT) FROM lineitem
        |  WHERE l_orderkey IS NOT NULL
        |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |ORDER BY rule""".stripMargin,

    // observed in-flight metrics AND the downstream filter's answer,
    // cross-checked against one parquet truth
    "dq_observe" ->
      """SELECT COUNT(*) AS rows_seen,
        |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_date,
        |  floor(MAX(o_totalprice)*1000000)/1000000 AS max_price,
        |  MIN(o_orderkey) AS min_key,
        |  (SELECT COUNT(*) FROM orders WHERE o_totalprice > 100000.0)
        |    AS kept_expensive
        |FROM orders""".stripMargin,

    // identical doubled-integer median/MAD arithmetic: quantile_cont's
    // interpolation of adjacent ints is (a+b)/2 — exact, so ·2 is a+b
    "dq_outliers_mad" ->
      """WITH o AS (SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |m AS (SELECT g, CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS med2
        |  FROM o GROUP BY g),
        |d AS (SELECT o.g, abs(c * 2 - med2) AS d, med2
        |  FROM o JOIN m ON o.g = m.g),
        |md AS (SELECT g, CAST(quantile_cont(d, 0.5) * 2 AS BIGINT) AS mad2x2
        |  FROM d GROUP BY g)
        |SELECT d.g, COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE d * 2 > mad2x2 * 3) AS outlier_ct,
        |  d.med2, md.mad2x2
        |FROM d JOIN md ON d.g = md.g
        |GROUP BY d.g, d.med2, md.mad2x2 ORDER BY d.g""".stripMargin,

    "f_json_path" ->
      """SELECT event_type, COUNT(*) AS ct,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS k_hi
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // calendar arms replayed in DuckDB interval arithmetic (both engines
    // clamp add-month at end-of-month; week truncation is Monday-start
    // in both)
    "f_date_arith" ->
      """SELECT o_orderpriority, COUNT(*) AS ct,
        |  COUNT(DISTINCT date_trunc('month', CAST(o_orderdate AS TIMESTAMP))) AS months,
        |  COUNT(DISTINCT date_trunc('week', CAST(o_orderdate AS TIMESTAMP))) AS weeks,
        |  MIN(epoch_us(date_trunc('quarter', CAST(o_orderdate AS TIMESTAMP)))) AS min_q_us,
        |  MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 MONTH)) AS max_plus1m_us,
        |  MAX(epoch_us(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP))) AS max_eom_us,
        |  CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-12-31')) AS BIGINT) AS days_to_eoy
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "f_url_parse" ->
      """WITH d AS (SELECT doc_id,
        |  'https://' || source || '.example.org/' || lang || '/doc/' || doc_id ||
        |  '?ref=r' || (doc_id % 7) || '&lang=' || lang || '#sec' || (doc_id % 3) AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref,
        |  regexp_extract(url, '#(.*)$', 1) AS frag,
        |  array_to_string((string_split(
        |    regexp_extract(url, '^https://([^/?#]+)', 1), '.'))[-2:], '.') AS apex
        |FROM d ORDER BY doc_id""".stripMargin,

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

    "f_regex_extract" ->
      """SELECT doc_id, regexp_extract(text, '([0-9]+)', 1) AS first_num
        |FROM documents ORDER BY doc_id""".stripMargin,

    "a15_range_frame" ->
      """WITH f AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (SELECT user_id,
        |    COUNT(*) OVER (PARTITION BY user_id ORDER BY us
        |                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS cnt_1h
        |  FROM f)
        |SELECT user_id, MAX(cnt_1h) AS peak_1h
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a14_argmax" ->
      """SELECT n_name,
        |  arg_max(s_name, CAST(CAST(s_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT) * 1000000 - s_suppkey) AS top_supplier,
        |  CAST(MAX(s_acctbal) AS DOUBLE) AS max_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "a13_rank_suite" ->
      """WITH rev AS (
        |  SELECT n_name, o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, o_custkey),
        |r AS (
        |  SELECT n_name, o_custkey, revenue,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    percent_rank() OVER w AS prnk, ntile(4) OVER w AS quartile
        |  FROM rev WINDOW w AS (PARTITION BY n_name ORDER BY revenue DESC, o_custkey))
        |SELECT * FROM r WHERE rnk <= 8
        |ORDER BY n_name, rnk, o_custkey""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,

    "set_except" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_custkey""".stripMargin,

    "stream_dedup_ids" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "stream_dedup_wwm" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "j9_bloom_join" ->
      """SELECT o_orderpriority, COUNT(*) AS ct,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "j10_range_join" ->
      """WITH pts AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p
        |  FROM lineitem),
        |rng AS (
        |  SELECT o_orderkey AS range_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) % 10000000 AS lo
        |  FROM orders)
        |SELECT range_id, COUNT(*) AS ct, CAST(SUM(p) AS DOUBLE) AS psum
        |FROM pts JOIN rng ON p >= lo AND p < lo + 500
        |GROUP BY range_id ORDER BY range_id""".stripMargin,

    "source_csv_roundtrip" ->
      """SELECT c_mktsegment, COUNT(*) AS ct,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
        |  COUNT(DISTINCT c_nationkey) AS nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "source_jsonl_roundtrip" ->
      """SELECT event_type, COUNT(*) AS ct,
        |  COUNT(DISTINCT user_id) AS users,
        |  MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS min_us,
        |  MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_us
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // round-trip truth is the ORIGINAL parquet — drift through ORC's
    // encoding (types, timestamps) breaks the hash
    "source_orc_roundtrip" ->
      """SELECT o_orderpriority, COUNT(*) AS ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  MIN(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS min_date_us,
        |  MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS max_date_us
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // provenance truth: replay the even/odd file rule — a row attributed
    // to the wrong file breaks the hash
    "source_file_metadata" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END AS gen,
        |  COUNT(*) AS ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY 1 ORDER BY gen""".stripMargin,

    // evolution truth: replay the generation rule over the one table —
    // wrong null-fill or a dropped generation breaks the hash
    "source_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'PRE_SCHEMA'
        |            ELSE o_orderpriority END AS priority,
        |  COUNT(*) AS ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  MIN(o_orderkey) AS min_key
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin,

    // XML round-trip truth is the ORIGINAL parquet (csv twin's contract)
    "source_xml_roundtrip" ->
      """SELECT c_mktsegment, COUNT(*) AS ct,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
        |  COUNT(DISTINCT c_nationkey) AS nations,
        |  MAX(length(c_name)) AS max_name_len
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "table_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS ndv,
           |  1 AS ndv_approx_ok,
           |  CAST(MIN($c) AS DOUBLE) AS min_d, CAST(MAX($c) AS DOUBLE) AS max_d,
           |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
           |FROM c""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS ndv,
           |  1 AS ndv_approx_ok,
           |  CAST(NULL AS DOUBLE) AS min_d, CAST(NULL AS DOUBLE) AS max_d,
           |  MIN($c) AS min_s, MAX($c) AS max_s
           |FROM c""".stripMargin
      s"""WITH c AS (SELECT c_custkey,
         |  CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS bal,
         |  c_name, c_mktsegment, c_nationkey FROM customer)
         |SELECT * FROM (
         |${Seq(num("c_custkey"), num("bal"), num("c_nationkey"),
                str("c_name"), str("c_mktsegment")).mkString("\n UNION ALL\n")}
         |) ORDER BY col_name""".stripMargin
    },

    "cdc_snapshot_diff" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |n AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50.0
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM base WHERE c_custkey % 11 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal
        |  FROM base WHERE c_custkey % 13 = 0),
        |d AS (
        |  SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
        |    CASE WHEN o.c_custkey IS NULL THEN 'insert'
        |         WHEN n.c_custkey IS NULL THEN 'delete'
        |         WHEN (o.c_name IS DISTINCT FROM n.c_name)
        |           OR (o.c_acctbal IS DISTINCT FROM n.c_acctbal) THEN 'update'
        |    END AS change_type,
        |    n.c_name AS c_name, n.c_acctbal AS c_acctbal
        |  FROM base o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey)
        |SELECT c_custkey, change_type, c_name, c_acctbal FROM d
        |WHERE change_type IS NOT NULL ORDER BY c_custkey""".stripMargin,

    "j11_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS ct,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q2_top_supplier" ->
      """SELECT n_name, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
        |                   WHERE s2.s_nationkey = supplier.s_nationkey)
        |ORDER BY n_name, s_name""".stripMargin,

    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q11_important_parts" ->
      """WITH pp AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(3,2)))) AS value_dec
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value FROM pp
        |WHERE value_dec * (SELECT COUNT(*) FROM pp)
        |      > (SELECT SUM(value_dec) FROM pp)
        |ORDER BY value DESC, l_partkey""".stripMargin,

    "q12_priority_lines" ->
      """SELECT l_linestatus AS shipmode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag = 'N'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY shipmode ORDER BY shipmode""".stripMargin,

    "q15_top_revenue_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(3,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%5')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_qty_revenue" ->
      """SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 0)
        |    AS DOUBLE) / 7.0 AS avg_yearly,
        |  CAST(COUNT(*) AS BIGINT) AS ct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND p_brand = 'Brand#23'
        |WHERE l_quantity * 5 *
        |    (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        |  < (SELECT SUM(l_quantity) FROM lineitem l2
        |     WHERE l2.l_partkey = part.p_partkey)""".stripMargin,

    "q20_dominant_suppliers" ->
      """WITH lp AS (
        |  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
        |  JOIN part ON l_partkey = p_partkey WHERE p_name LIKE '%bolt%'),
        |spq AS (
        |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sp_qty
        |  FROM lp GROUP BY l_partkey, l_suppkey)
        |SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_nationkey < 13
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM spq s1
        |  WHERE sp_qty = (SELECT MAX(s2.sp_qty) FROM spq s2
        |                  WHERE s2.l_partkey = s1.l_partkey))
        |ORDER BY s_name""".stripMargin,

    "a12_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p1_urgent,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p2_high,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p3_medium,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p4_notspec,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p5_low
        |FROM orders GROUP BY o_year ORDER BY o_year""".stripMargin,

    "a17_hll_reagg" ->
      """SELECT n_name, COUNT(DISTINCT o_custkey) AS exact_ct, 1 AS ok
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "a12b_unpivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CASE o_orderpriority
        |    WHEN '1-URGENT' THEN 'p1_urgent' WHEN '2-HIGH' THEN 'p2_high'
        |    WHEN '3-MEDIUM' THEN 'p3_medium'
        |    WHEN '4-NOT SPECIFIED' THEN 'p4_notspec'
        |    WHEN '5-LOW' THEN 'p5_low' END AS priority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_year, priority
        |ORDER BY o_year, priority""".stripMargin,

    // Spark's skewness/kurtosis are POPULATION moments; DuckDB's skewness
    // is bias-corrected (×√(n(n−1))/(n−2)) and its kurtosis_pop is the
    // population excess — the oracle inverts the skew correction
    // algebraically and uses kurtosis_pop directly.
    "a16_moments" ->
      """SELECT l_returnflag,
        |  floor(stddev_samp(l_quantity)*1000000)/1000000 AS sd_qty,
        |  floor(var_samp(l_quantity)*1000000)/1000000 AS var_qty,
        |  floor((skewness(l_quantity) * (COUNT(*)-2) / sqrt(COUNT(*)*(COUNT(*)-1.0)))*1000000)/1000000 AS skew_qty,
        |  floor(kurtosis_pop(l_quantity)*1000000)/1000000 AS kurt_qty,
        |  floor(corr(l_quantity, l_extendedprice)*1000000)/1000000 AS corr_qp,
        |  floor(covar_samp(l_quantity, l_extendedprice)*1000000)/1000000 AS covar_qp,
        |  COUNT(*) AS ct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a21_regression" ->
      """SELECT l_returnflag,
        |  floor(regr_slope(l_extendedprice, l_quantity)*1000000)/1000000 AS slope_pq,
        |  floor(regr_intercept(l_extendedprice, l_quantity)*1000000)/1000000 AS icept_pq,
        |  floor(regr_r2(l_extendedprice, l_quantity)*1000000)/1000000 AS r2_pq,
        |  floor(regr_avgx(l_extendedprice, l_quantity)*1000000)/1000000 AS avgx_q,
        |  floor(regr_avgy(l_extendedprice, l_quantity)*1000000)/1000000 AS avgy_p,
        |  regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a18_stringagg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS ct
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "a10_cube" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS o_year,
        |  COUNT(*) AS ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderpriority, year(o_orderdate))
        |ORDER BY priority, o_year""".stripMargin,

    // identical recursion replayed (// is DuckDB's integer division)
    "sql_recursive_cte" ->
      """WITH RECURSIVE d(k, depth, bal) AS (
        |  SELECT c_custkey, 0, CAST(c_acctbal AS DECIMAL(18,2))
        |  FROM customer WHERE c_custkey = 0
        |  UNION ALL
        |  SELECT c.c_custkey, d.depth + 1, CAST(c.c_acctbal AS DECIMAL(18,2))
        |  FROM customer c JOIN d ON (c.c_custkey - 1) // 2 = d.k
        |  WHERE c.c_custkey >= 1)
        |SELECT depth, CAST(COUNT(*) AS BIGINT) AS ct,
        |  CAST(SUM(k) AS BIGINT) AS key_sum,
        |  CAST(SUM(bal) AS DOUBLE) AS bal_sum
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin,

    // Same sequential fold, same (ts, event_id) order: list_reduce's
    // first lambda arg is the accumulator, seeded with the first element
    // exactly like the Spark side's aggregate(slice(...), seq[0], ...)
    "a25_ema" ->
      """WITH seq AS (SELECT user_id, COUNT(*) AS n_events,
        |    list(value ORDER BY CAST(ts AS TIMESTAMP), event_id) AS vals
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc) AS ema
        |FROM seq ORDER BY user_id""".stripMargin,

    // DuckDB's IGNORE NULLS rides inside the function call; same
    // full-frame spec, same (ts, event_id) total order
    "a24_window_nav" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |         ELSE CAST(json_extract_string(props, '$.k') AS BIGINT)
        |    END AS k
        |  FROM events)
        |SELECT DISTINCT user_id,
        |  first_value(k IGNORE NULLS) OVER w AS first_k,
        |  last_value(k IGNORE NULLS) OVER w AS last_k,
        |  nth_value(k, 2 IGNORE NULLS) OVER w AS second_k,
        |  CAST(COUNT(k) OVER w AS BIGINT) AS nonnull_ct
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin,

    "a23_grouping_sets" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  COUNT(*) AS ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |                        (o_orderpriority), (o_orderstatus))
        |ORDER BY priority, status""".stripMargin,

    "f_array_hofs" ->
      """WITH arr AS (
        |  SELECT l_orderkey,
        |    list_sort(list(CAST(l_linenumber AS BIGINT))) AS ls,
        |    list_sort(list(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))) AS qs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(list_sum(qs) AS BIGINT) AS q_sum,
        |  length(list_filter(qs, x -> x >= 2500)) AS n_big,
        |  CAST(list_contains(qs, 100) AS INT) AS has_one,
        |  array_to_string(list_transform(ls, x -> CAST(x * 2 AS VARCHAR)), ',') AS ls2_csv
        |FROM arr ORDER BY l_orderkey""".stripMargin,

    // the map is built from the same two sorted lists, so the lambdas
    // replay over parallel lists via an index range — no map type needed
    "f_map_hofs" ->
      """WITH arr AS (
        |  SELECT l_orderkey,
        |    list_sort(list(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))) AS qs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  -- DuckDB's array_to_string returns NULL on an empty list where
        |  -- Spark's concat_ws returns '' — coalesce to the Spark contract
        |  COALESCE(array_to_string(
        |    list_transform(
        |      list_filter(range(1, length(qs) + 1), i -> qs[i] * 2 >= 5000),
        |      i -> CAST(i AS VARCHAR) || ':' || CAST(qs[i] * 2 AS VARCHAR)),
        |    ','), '') AS big_entries,
        |  CAST(length(qs) AS BIGINT) AS n_entries
        |FROM arr ORDER BY l_orderkey""".stripMargin,

    // bitmap re-agg must return EXACTLY the distinct count — no sketch
    // tolerance anywhere
    "a22_bitmap_reagg" ->
      """SELECT n_name, COUNT(DISTINCT o_custkey) AS exact_distinct
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // the variant round-trip must be semantically invisible: the oracle
    // recomputes every extracted field from the raw columns
    "f_variant_json" ->
      """SELECT event_type, COUNT(*) AS ct,
        |  COUNT(DISTINCT user_id) AS users,
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS v_sum,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  COUNT(*) AS mp_nulls
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // every try_* arm recomputed via CASE — the quotient is one IEEE
    // division on identical operands, floored to millionths per term
    "f_try_arith" ->
      """SELECT l_returnflag, COUNT(*) AS ct,
        |  CAST(SUM(CASE WHEN l_quantity = 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS div_nulls,
        |  CAST(SUM(CASE WHEN l_quantity = 50 THEN 0
        |    ELSE CAST(FLOOR(l_extendedprice / (l_quantity - 50.0) * 1000000)
        |      AS BIGINT) END) AS BIGINT) AS d_sum_us,
        |  CAST(SUM(CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS num_nulls,
        |  CAST(SUM(CASE WHEN l_orderkey % 3 = 0 THEN 0 ELSE l_linenumber END)
        |    AS BIGINT) AS n_sum,
        |  CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS ts_nulls
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "cbo_join_order" ->
      """SELECT n_name, COUNT(*) AS ct,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "k8_partition_backfill" ->
      s"""SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS dt,
         |  event_type, COUNT(*) AS ct,
         |  CASE WHEN CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '2024-01-09'
         |       THEN 0 ELSE COUNT(DISTINCT user_id) END AS users
         |FROM events
         |GROUP BY 1, 2, CAST(CAST(ts AS TIMESTAMP) AS DATE)
         |ORDER BY dt, event_type""".stripMargin,

    // DuckDB runs the SAME correlated form — engine-vs-engine on the
    // decorrelation itself
    "j15_lateral_topn" ->
      """SELECT o.o_orderkey,
        |  CAST(SUM(CAST(l.price AS DECIMAL(18,2))) AS DOUBLE) AS top2_sum,
        |  COUNT(*) AS ct
        |FROM orders o,
        |LATERAL (SELECT l_extendedprice AS price FROM lineitem
        |         WHERE l_orderkey = o.o_orderkey
        |         ORDER BY l_extendedprice DESC LIMIT 2) l
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin,

    // brute-force truth: length-banded cross join + exact levenshtein —
    // the blocking must lose nothing against the unblocked answer
    "j16_fuzzy_join" ->
      """WITH k AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS w
        |    FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT a.w AS w1, b.w AS w2 FROM k a JOIN k b
        |  ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
        |  AND levenshtein(a.w, b.w) = 1
        |ORDER BY w1, w2""".stripMargin,

    // time-correct version pick replayed as a CASE on the version rule
    "j14_temporal_join" ->
      """SELECT CAST(CASE WHEN CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1998-01-01'
        |            AND c_custkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS version,
        |  COUNT(*) AS ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  CAST(SUM(CAST(CASE WHEN CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1998-01-01'
        |            AND c_custkey % 3 = 0 THEN c_acctbal + 100.0
        |            ELSE c_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY version""".stripMargin,

    // same truth as j14: execution mode must not change the answer
    "stream_j14_temporal" ->
      """SELECT CAST(CASE WHEN CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1998-01-01'
        |            AND c_custkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS version,
        |  COUNT(*) AS ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  CAST(SUM(CAST(CASE WHEN CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1998-01-01'
        |            AND c_custkey % 3 = 0 THEN c_acctbal + 100.0
        |            ELSE c_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY version""".stripMargin,

    // null-to-null must MATCH (one more key value), not drop
    "j13_nullsafe_join" ->
      """WITH o AS (SELECT CASE WHEN o_custkey % 49 = 0 THEN NULL
        |    ELSE o_custkey % 1000 END AS k, o_totalprice FROM orders),
        |  c AS (SELECT CASE WHEN c_custkey % 25 = 0 THEN NULL
        |    ELSE c_custkey % 1000 END AS k, c_acctbal FROM customer)
        |SELECT COALESCE(CAST(o.k AS VARCHAR), 'NULLKEY') AS k,
        |  COUNT(*) AS pairs,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
        |GROUP BY 1 ORDER BY k""".stripMargin,

    // pruning must not change the answer: truth = the plain date filter
    "j12_dpp" ->
      """SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS dt,
        |  event_type, COUNT(*) AS ct, COUNT(DISTINCT user_id) AS users
        |FROM events
        |WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) <= DATE '2024-01-05'
        |GROUP BY 1, 2 ORDER BY dt, event_type""".stripMargin,

    // survivors = everyone outside the target predicate; untouched_ok is
    // pinned to 1 (15/16 partitions byte-identical)
    "k10_targeted_delete" ->
      """SELECT event_type, COUNT(*) AS ct,
        |  COUNT(DISTINCT user_id) AS users,
        |  CAST(1 AS BIGINT) AS untouched_ok
        |FROM events
        |WHERE NOT (user_id % 16 = 3 AND user_id % 5 = 0)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // compaction must preserve rows byte-exactly: truth is the ORIGINAL
    // parquet, not the fragmented copy
    "k9_compaction" ->
      """SELECT o_orderpriority, COUNT(*) AS ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // replays all three MERGE arms over the raw table: changed keys leave,
    // updates and inserts come back as the source's version; untouched_ok
    // is the pinned partition-churn verdict
    "k11_merge_upsert" ->
      """WITH t AS (SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderpriority,
        |    o_orderkey % 8 AS bucket FROM orders),
        |u AS (SELECT o_orderkey, o_custkey,
        |    CAST(price*2 AS DECIMAL(18,2)) AS price, o_orderpriority, bucket
        |  FROM t WHERE bucket = 2 AND o_orderkey % 3 = 0),
        |d AS (SELECT o_orderkey FROM t WHERE bucket = 5 AND o_orderkey % 3 = 1),
        |i AS (SELECT o_orderkey + 80000000 AS o_orderkey, o_custkey, price,
        |    o_orderpriority, bucket
        |  FROM t WHERE bucket = 2 AND o_orderkey % 3 = 2),
        |allkeys AS (SELECT o_orderkey FROM u UNION ALL SELECT o_orderkey FROM d
        |  UNION ALL SELECT o_orderkey FROM i),
        |merged AS (
        |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM allkeys)
        |  UNION ALL SELECT * FROM u
        |  UNION ALL SELECT * FROM i)
        |SELECT bucket, COUNT(*) AS ct,
        |  CAST(SUM(price) AS DOUBLE) AS price_sum,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  COUNT(*) FILTER (WHERE o_orderkey > 80000000) AS inserted_ct,
        |  CAST(1 AS BIGINT) AS untouched_ok
        |FROM merged GROUP BY bucket ORDER BY bucket""".stripMargin,

    // full recompute over ALL orders — equality proves the incremental
    // state-merge path reproduces the from-scratch aggregate
    "k12_incremental_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)
        |    AS price_avg,
        |  MIN(strftime(o_orderdate, '%Y-%m-%d')) AS dt_min,
        |  MAX(strftime(o_orderdate, '%Y-%m-%d')) AS dt_max
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // byte length and md5 recomputed from the raw table (md5 of the
    // UTF-8 bytes — the portable-hash contract the fingerprint gates pin)
    "source_binary_files" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS length,
        |  md5(text) AS content_md5
        |FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""".stripMargin,

    // survivors recomputed with the same cutoff; the 9 dropped days and
    // the no-rewrite verdict are pinned constants
    "k13_retention_expire" ->
      """WITH e AS (SELECT event_type,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt FROM events)
        |SELECT event_type, COUNT(*) AS ct, MIN(dt) AS dt_min,
        |  COUNT(DISTINCT dt) AS days,
        |  CAST(1 AS BIGINT) AS kept_untouched,
        |  CAST(9 AS BIGINT) AS dropped_days
        |FROM e WHERE dt >= '2024-01-10'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the pruned read must answer exactly like the predicate over the
    // whole table; the file-skipping booleans are pinned true
    "k14_manifest_prune" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS v_fp,
        |  TRUE AS pruned_ok, TRUE AS equal_ok
        |FROM events
        |WHERE user_id >= 0
        |  AND user_id <= (SELECT MAX(user_id) // 4 FROM events)""".stripMargin,

    // replays the whole CMS: same d×w table, same md5("r:key") buckets,
    // same min-over-rows estimate — full equality plus the ≥-truth pin
    "freq_cms_point" ->
      """WITH q AS (SELECT DISTINCT l_partkey AS key FROM lineitem
        |    WHERE l_partkey % 37 = 0
        |  UNION ALL
        |  SELECT DISTINCT l_partkey + 1000000000 FROM lineitem
        |    WHERE l_partkey % 37 = 0),
        |rb AS (SELECT r, CAST(md5_number_lower(CONCAT(CAST(r AS VARCHAR), ':',
        |      CAST(l_partkey AS VARCHAR))) % 1024 AS BIGINT) AS b
        |  FROM lineitem CROSS JOIN (SELECT unnest(range(3)) AS r)),
        |cms AS (SELECT r, b, COUNT(*) AS c FROM rb GROUP BY 1, 2),
        |qrb AS (SELECT key, r, CAST(md5_number_lower(CONCAT(CAST(r AS VARCHAR),
        |      ':', CAST(key AS VARCHAR))) % 1024 AS BIGINT) AS b
        |  FROM q CROSS JOIN (SELECT unnest(range(3)) AS r)),
        |est AS (SELECT key, MIN(COALESCE(c, 0)) AS cms_est
        |  FROM qrb LEFT JOIN cms USING (r, b) GROUP BY key),
        |ex AS (SELECT l_partkey AS key, COUNT(*) AS exact FROM lineitem
        |  GROUP BY 1)
        |SELECT est.key, COALESCE(ex.exact, 0) AS exact, est.cms_est,
        |  CAST(est.cms_est >= COALESCE(ex.exact, 0) AS BIGINT) AS ge_ok
        |FROM est LEFT JOIN ex ON est.key = ex.key
        |ORDER BY est.key""".stripMargin,

    // same truth as a batch refresh would have: the micro-batch fold
    // must reproduce the from-scratch aggregate exactly
    "stream_k12_incremental" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)
        |    AS value_avg,
        |  MIN(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS dt_min,
        |  MAX(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS dt_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // replays the KMV estimator end to end per set pair: md5-lower-64
    // hashes folded into 2^40, bottom-256 distinct, θ from the k-th order
    // statistic, (k-1)/θ (exact size below k), union sketch = bottom-k of
    // the merged samples, intersection = Jaccard over the union sketch ×
    // the union estimate — identical arithmetic, so equality is bit-exact
    "a26_kmv_setops" -> {
      def pairSql(pair: String, aFrom: String, bFrom: String): String =
        s"""WITH a_keys AS (SELECT DISTINCT kx FROM (SELECT $aFrom)),
           |b_keys AS (SELECT DISTINCT kx FROM (SELECT $bFrom)),
           |ha AS (SELECT DISTINCT CAST(md5_number_lower(CAST(kx AS VARCHAR))
           |    % 1099511627776 AS BIGINT) AS hk FROM a_keys),
           |hb AS (SELECT DISTINCT CAST(md5_number_lower(CAST(kx AS VARCHAR))
           |    % 1099511627776 AS BIGINT) AS hk FROM b_keys),
           |ska AS (SELECT hk FROM ha ORDER BY hk LIMIT 256),
           |skb AS (SELECT hk FROM hb ORDER BY hk LIMIT 256),
           |sku AS (SELECT hk FROM (SELECT hk FROM ska UNION SELECT hk FROM skb)
           |  ORDER BY hk LIMIT 256),
           |stats AS (SELECT
           |    (SELECT COUNT(*) FROM ska) AS na, (SELECT MAX(hk) FROM ska) AS ma,
           |    (SELECT COUNT(*) FROM skb) AS nb, (SELECT MAX(hk) FROM skb) AS mb,
           |    (SELECT COUNT(*) FROM sku) AS nu, (SELECT MAX(hk) FROM sku) AS mu,
           |    (SELECT COUNT(*) FROM sku
           |      WHERE hk IN (SELECT hk FROM ska)
           |        AND hk IN (SELECT hk FROM skb)) AS nmatch),
           |ests AS (SELECT nmatch, nu,
           |    CASE WHEN na < 256 THEN CAST(na AS DOUBLE)
           |      ELSE 255.0 * 1099511627776 / (ma + 1) END AS est_a,
           |    CASE WHEN nb < 256 THEN CAST(nb AS DOUBLE)
           |      ELSE 255.0 * 1099511627776 / (mb + 1) END AS est_b,
           |    CASE WHEN nu < 256 THEN CAST(nu AS DOUBLE)
           |      ELSE 255.0 * 1099511627776 / (mu + 1) END AS est_u
           |  FROM stats)
           |SELECT '$pair' AS pair,
           |  (SELECT COUNT(*) FROM a_keys) AS exact_a,
           |  (SELECT COUNT(*) FROM b_keys) AS exact_b,
           |  (SELECT COUNT(*) FROM (SELECT kx FROM a_keys UNION SELECT kx FROM b_keys)) AS exact_union,
           |  (SELECT COUNT(*) FROM (SELECT kx FROM a_keys INTERSECT SELECT kx FROM b_keys)) AS exact_inter,
           |  floor(est_a*1000000)/1000000 AS est_a_t,
           |  floor(est_b*1000000)/1000000 AS est_b_t,
           |  floor(est_u*1000000)/1000000 AS est_union_t,
           |  floor(CAST(nmatch AS DOUBLE)/CAST(nu AS DOUBLE)*est_u*1000000)/1000000 AS est_inter_t
           |FROM ests""".stripMargin
      val cust = pairSql("cust_priority",
        "o_custkey AS kx FROM orders WHERE o_orderpriority = '1-URGENT'",
        "o_custkey AS kx FROM orders WHERE o_orderpriority = '2-HIGH'")
      val flag = pairSql("flag_orders",
        "l_orderkey AS kx FROM lineitem WHERE l_returnflag = 'R'",
        "l_orderkey AS kx FROM lineitem WHERE l_returnflag = 'A'")
      s"SELECT * FROM ($cust) UNION ALL SELECT * FROM ($flag) ORDER BY pair"
    },

    "graph_pagerank" -> {
      // three unrolled rounds of the SAME integer arithmetic the
      // operator runs: contribution = rank div outdeg, update =
      // base + 85·Σ div 100 (DuckDB // is floor division; all values
      // are positive, so it matches Spark's div exactly)
      val rounds = (1 to 3).map { k =>
        s"""c$k AS (
           |  SELECT dir.dst AS node, SUM(r${k - 1}.rank_u6 // od.outdeg) AS s
           |  FROM dir JOIN r${k - 1} ON dir.src = r${k - 1}.node
           |       JOIN od ON od.src = dir.src
           |  GROUP BY dir.dst),
           |r$k AS (
           |  SELECT nodes.node,
           |    150000 // (SELECT n FROM nn)
           |      + (85 * COALESCE(c$k.s, 0)) // 100 AS rank_u6
           |  FROM nodes LEFT JOIN c$k ON c$k.node = nodes.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT l_orderkey % 300 AS s0, l_partkey % 300 AS d0 FROM lineitem),
         |e AS (
         |  SELECT DISTINCT LEAST(s0, d0) AS a, GREATEST(s0, d0) AS b
         |  FROM raw WHERE s0 <> d0),
         |dir AS (SELECT a AS src, b AS dst FROM e
         |        UNION ALL SELECT b AS src, a AS dst FROM e),
         |od AS (SELECT src, COUNT(*) AS outdeg FROM dir GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM dir),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |r0 AS (SELECT node, 1000000 // (SELECT n FROM nn) AS rank_u6
         |       FROM nodes),
         |$rounds
         |SELECT node, CAST(rank_u6 AS BIGINT) AS rank_u6 FROM r3
         |ORDER BY node""".stripMargin
    },

    "graph_triangles" ->
      """WITH raw AS (
        |  SELECT l_orderkey % 300 AS s, l_partkey % 300 AS d FROM lineitem),
        |e AS (
        |  SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
        |  FROM raw WHERE s <> d),
        |tri AS (
        |  SELECT COUNT(*) AS triangles
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |deg AS (
        |  SELECT node, COUNT(*) AS degree FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        |  GROUP BY node),
        |w AS (
        |  SELECT CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS wedges,
        |    COUNT(*) AS nodes FROM deg),
        |ec AS (SELECT COUNT(*) AS edges FROM e)
        |SELECT triangles, wedges, nodes, edges FROM tri, w, ec""".stripMargin,

    "a19_retention_cohorts" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events),
        |c AS (SELECT user_id, MIN(d) AS cohort_d FROM days GROUP BY user_id)
        |SELECT strftime(c.cohort_d, '%Y-%m-%d') AS cohort_dt,
        |  date_diff('day', c.cohort_d, days.d) AS offset_d,
        |  COUNT(DISTINCT days.user_id) AS users
        |FROM days JOIN c ON days.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a20_event_transitions" ->
      """WITH f AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY us, event_id) AS prev_type
        |  FROM f)
        |SELECT prev_type, event_type, COUNT(*) AS ct,
        |  COUNT(DISTINCT user_id) AS users
        |FROM g WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin,

    "a11_event_deltas" ->
      """WITH f AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (SELECT user_id,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
        |  FROM f)
        |SELECT user_id, COUNT(*) AS gap_ct,
        |  CAST(SUM(gap_us) AS BIGINT) AS gap_sum_us,
        |  MAX(gap_us) AS gap_max_us,
        |  CAST(CAST(SUM(gap_us) AS BIGINT) AS DOUBLE) / (1000000.0 * COUNT(*)) AS avg_gap_sec
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

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

    "a27_frequent_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS support
        |FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY p1, p2""".stripMargin,

    "a28_gapfill_locf" ->
      """WITH b AS (SELECT CAST(min(ts) AS DATE) AS mn, CAST(max(ts) AS DATE) AS mx
        |  FROM events),
        |days AS (SELECT CAST(unnest(generate_series(mn::TIMESTAMP, mx::TIMESTAMP,
        |  INTERVAL 1 DAY)) AS DATE) AS dt FROM b),
        |spine AS (SELECT g.grp, d.dt
        |  FROM (SELECT unnest(range(0,10)) AS grp) g CROSS JOIN days d),
        |daily AS (SELECT user_id % 10 AS grp, CAST(ts AS DATE) AS dt,
        |    COUNT(*) AS ct
        |  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
        |f AS (SELECT s.grp, s.dt, d.ct
        |  FROM spine s LEFT JOIN daily d ON s.grp = d.grp AND s.dt = d.dt)
        |SELECT CAST(grp AS BIGINT) AS grp, strftime(dt, '%Y-%m-%d') AS dt,
        |  COALESCE(ct, 0) AS ct0,
        |  COALESCE(last_value(ct IGNORE NULLS) OVER (PARTITION BY grp
        |    ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
        |    AS locf
        |FROM f ORDER BY grp, dt""".stripMargin,

    "a29_rolling_pctl" ->
      """SELECT event_id, event_type,
        |  floor(quantile_cont(value, 0.5) OVER w * 1000000)/1000000 AS p50_t,
        |  floor(quantile_cont(value, 0.95) OVER w * 1000000)/1000000 AS p95_t
        |FROM events WHERE event_id % 11 = 0
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |  ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // two-pass histogram replayed: per-group bounds join back, the same
    // IEEE bucket expression, sparse emission (GROUP BY drops empties)
    "a30_histogram" ->
      """WITH b AS (SELECT event_type, min(value) AS mn, max(value) AS mx
        |  FROM events GROUP BY event_type),
        |x AS (SELECT e.event_type,
        |    CASE WHEN mx = mn THEN 0
        |      ELSE least(CAST(floor((value - mn) * 10 / (mx - mn)) AS BIGINT), 9)
        |    END AS bucket, value
        |  FROM events e JOIN b ON e.event_type = b.event_type)
        |SELECT event_type, bucket, COUNT(*) AS ct,
        |  floor(min(value) * 1000000.0)/1000000.0 AS lo_t,
        |  floor(max(value) * 1000000.0)/1000000.0 AS hi_t
        |FROM x GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    // identical fixed-point weighted-sum arithmetic: values in integer
    // millionths, holding interval from lead(), HUGEINT product sum
    "a31_twa" ->
      """WITH s AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP))//1000000 AS sec, event_id,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS vu FROM events),
        |d AS (SELECT event_type, vu,
        |    lead(sec) OVER (PARTITION BY event_type ORDER BY sec, event_id)
        |      - sec AS dt
        |  FROM s)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(dt) AS BIGINT) AS held_s,
        |  CASE WHEN SUM(dt) > 0 THEN
        |    floor((CAST(SUM(CAST(vu AS HUGEINT) * dt) AS DOUBLE)
        |      / (CAST(SUM(dt) AS BIGINT) * 1000000.0)) * 1000000.0)/1000000.0
        |  END AS twa_t
        |FROM d WHERE dt IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // identical fixed-point p·ln-term arithmetic (floor to millionths
    // pre-sum), margins re-aggregated from the same cell table
    "a34_mutual_info" ->
      """WITH c AS (SELECT event_type AS x, user_id % 5 AS y, COUNT(*) AS nxy
        |  FROM events GROUP BY 1, 2),
        |nx AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM c GROUP BY 1),
        |ny AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM c GROUP BY 1),
        |t AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM c),
        |mi AS (SELECT CAST(SUM(CAST(floor(
        |      (CAST(nxy AS DOUBLE) / n) *
        |      ln(CAST(n AS DOUBLE) * nxy / (CAST(nx.nx AS DOUBLE) * ny.ny)) *
        |      1000000.0) AS BIGINT)) AS BIGINT) AS mi_fp
        |  FROM c JOIN nx USING (x) JOIN ny USING (y) CROSS JOIN t),
        |hx AS (SELECT CAST(SUM(CAST(floor(
        |      (-(CAST(nx AS DOUBLE) / n)) * ln(CAST(nx AS DOUBLE) / n) *
        |      1000000.0) AS BIGINT)) AS BIGINT) AS hx_fp
        |  FROM nx CROSS JOIN t),
        |hy AS (SELECT CAST(SUM(CAST(floor(
        |      (-(CAST(ny AS DOUBLE) / n)) * ln(CAST(ny AS DOUBLE) / n) *
        |      1000000.0) AS BIGINT)) AS BIGINT) AS hy_fp
        |  FROM ny CROSS JOIN t)
        |SELECT n, CAST(mi_fp AS DOUBLE)/1000000.0 AS mi_t,
        |  CAST(hx_fp AS DOUBLE)/1000000.0 AS hx_t,
        |  CAST(hy_fp AS DOUBLE)/1000000.0 AS hy_t,
        |  CASE WHEN least(hx_fp, hy_fp) > 0 THEN
        |    floor((CAST(mi_fp AS DOUBLE) / CAST(least(hx_fp, hy_fp) AS DOUBLE))
        |      * 1000000.0)/1000000.0
        |  END AS nmi_t
        |FROM t CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,

    // every token replayed via md5_number_lower (HUGEINT digits == the
    // decimal(20,0) string), join re-executed ON the tokens
    "k15_pseudonymize" ->
      """WITH c AS (SELECT
        |    CAST(md5_number_lower('s3cret:' || CAST(c_custkey AS VARCHAR))
        |      AS VARCHAR) AS ck,
        |    CAST(md5_number_lower('s3cret:' || c_name) AS VARCHAR) AS nm,
        |    c_mktsegment
        |  FROM customer),
        |o AS (SELECT
        |    CAST(md5_number_lower('s3cret:' || CAST(o_custkey AS VARCHAR))
        |      AS VARCHAR) AS ok
        |  FROM orders)
        |SELECT c_mktsegment, COUNT(*) AS orders,
        |  COUNT(DISTINCT nm) AS name_tokens, MIN(nm) AS min_token
        |FROM o JOIN c ON ok = ck
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "dq_k_anonymity" ->
      """WITH g AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
        |  FROM customer GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_groups,
        |  CAST(COALESCE(SUM(CASE WHEN sz < 10 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS groups_below_k,
        |  CAST(COALESCE(SUM(CASE WHEN sz < 10 THEN sz ELSE 0 END), 0)
        |    AS BIGINT) AS rows_at_risk,
        |  MIN(sz) AS min_group, MAX(sz) AS max_group
        |FROM g""".stripMargin,

    // exhaustive pairwise truth over the same formula points — the grid
    // join must find exactly the all-pairs-within-ε set
    "j18_spatial_join" ->
      """WITH p AS (SELECT event_id AS id,
        |    CAST(md5_number_lower(CONCAT('x:', CAST(event_id AS VARCHAR)))
        |      % 10000 AS BIGINT) AS x,
        |    CAST(md5_number_lower(CONCAT('y:', CAST(event_id AS VARCHAR)))
        |      % 10000 AS BIGINT) AS y
        |  FROM events WHERE event_id % 3 = 0)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 3600
        |ORDER BY id_a, id_b""".stripMargin,

    // identical arithmetic: exact HUGEINT cell products, the same single
    // division per cell floor-truncated pre-sum, IEEE sqrt for V
    "a35_chi2" ->
      """WITH c AS (SELECT event_type AS x, user_id % 5 AS y, COUNT(*) AS nxy
        |  FROM events GROUP BY 1, 2),
        |nx AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM c GROUP BY 1),
        |ny AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM c GROUP BY 1),
        |t AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n,
        |    COUNT(DISTINCT x) AS cx, COUNT(DISTINCT y) AS cy FROM c),
        |g AS (SELECT nx.x, ny.y, nx.nx, ny.ny, COALESCE(c.nxy, 0) AS nxy0
        |  FROM nx CROSS JOIN ny LEFT JOIN c ON c.x = nx.x AND c.y = ny.y),
        |chi AS (SELECT CAST(SUM(CAST(floor(
        |      CAST(CAST(nxy0 AS HUGEINT) * n - CAST(nx AS HUGEINT) * ny
        |        AS DOUBLE)
        |      * (CAST(CAST(nxy0 AS HUGEINT) * n - CAST(nx AS HUGEINT) * ny
        |          AS DOUBLE)
        |        / CAST(CAST(n AS HUGEINT) * nx * ny AS DOUBLE))
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS chi_fp
        |  FROM g CROSS JOIN t)
        |SELECT n, CAST(chi_fp AS DOUBLE)/1000000.0 AS chi2_t,
        |  CAST((cx - 1) * (cy - 1) AS BIGINT) AS dof,
        |  CASE WHEN (least(cx, cy) - 1) * n > 0 THEN
        |    floor(sqrt(CAST(chi_fp AS DOUBLE)/1000000.0
        |      / CAST((least(cx, cy) - 1) * n AS DOUBLE)) * 1000000.0)/1000000.0
        |  END AS cramers_v_t
        |FROM t CROSS JOIN chi""".stripMargin,

    // Welch from exact arm sums: the same (Σv² − n·mean²)/(n−1) and
    // Welch–Satterthwaite formulas over identical operands, same op order
    "a33_welch_ttest" ->
      """WITH v AS (SELECT event_type, user_id % 2 AS variant,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS vu FROM events),
        |a AS (SELECT event_type,
        |    COUNT(*) FILTER (WHERE variant = 0) AS n_a,
        |    COUNT(*) FILTER (WHERE variant = 1) AS n_b,
        |    CAST(SUM(vu) FILTER (WHERE variant = 0) AS BIGINT) AS s_a,
        |    CAST(SUM(vu) FILTER (WHERE variant = 1) AS BIGINT) AS s_b,
        |    SUM(CAST(vu AS HUGEINT) * vu) FILTER (WHERE variant = 0) AS s2_a,
        |    SUM(CAST(vu AS HUGEINT) * vu) FILTER (WHERE variant = 1) AS s2_b
        |  FROM v GROUP BY event_type),
        |m AS (SELECT *,
        |    CAST(s_a AS DOUBLE) / n_a / 1000000.0 AS ma,
        |    CAST(s_b AS DOUBLE) / n_b / 1000000.0 AS mb,
        |    ((CAST(s2_a AS DOUBLE) / 1000000000000.0
        |      - n_a * (CAST(s_a AS DOUBLE) / n_a / 1000000.0)
        |            * (CAST(s_a AS DOUBLE) / n_a / 1000000.0)) / (n_a - 1))
        |      / n_a AS sea,
        |    ((CAST(s2_b AS DOUBLE) / 1000000000000.0
        |      - n_b * (CAST(s_b AS DOUBLE) / n_b / 1000000.0)
        |            * (CAST(s_b AS DOUBLE) / n_b / 1000000.0)) / (n_b - 1))
        |      / n_b AS seb
        |  FROM a)
        |SELECT event_type, n_a, n_b,
        |  floor(ma * 1000000.0)/1000000.0 AS mean_a_t,
        |  floor(mb * 1000000.0)/1000000.0 AS mean_b_t,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND sea + seb > 0 THEN
        |    floor(((ma - mb) / sqrt(sea + seb)) * 1000000.0)/1000000.0
        |  END AS t_t,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND sea + seb > 0 THEN
        |    floor(((sea + seb) * (sea + seb)
        |      / (sea * sea / (n_a - 1) + seb * seb / (n_b - 1)))
        |      * 1000000.0)/1000000.0
        |  END AS df_t
        |FROM m ORDER BY event_type""".stripMargin,

    // two-level skew rollup; hot key via the same composite arg_max key
    "dq_skew_report" ->
      """WITH c AS (SELECT event_type, user_id, COUNT(*) AS ct
        |  FROM events GROUP BY event_type, user_id)
        |SELECT event_type, CAST(SUM(ct) AS BIGINT) AS total,
        |  COUNT(*) AS n_keys, MAX(ct) AS max_ct,
        |  arg_max(user_id, ct * 100000000000 - user_id) AS hot_key,
        |  floor((MAX(ct) * COUNT(*) / CAST(SUM(ct) AS DOUBLE)) * 1000000.0)
        |    /1000000.0 AS skew_t
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the deny-list exclusion replayed as a plain predicate — execution
    // mode (streaming anti join) must not change the answer
    "stream_j17_anti" ->
      """SELECT event_type, COUNT(*) AS ct, COUNT(DISTINCT user_id) AS users
        |FROM events WHERE user_id % 7 <> 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a1_product_stats" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//10000000)*10000000 AS us,
        |                  event_type, value, user_id FROM events)
        |SELECT strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(make_timestamp(us + 10000000), '%Y-%m-%d %H:%M:%S') AS edt,
        |       event_type, COUNT(*) AS ct,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount,
        |       COUNT(DISTINCT user_id) AS user_ct
        |FROM w GROUP BY us, event_type ORDER BY us, event_type""".stripMargin,

    // The HLL twin's checked bound: the oracle recomputes every EXACT
    // column and asserts within_bound = 1 for every group — if any HLL
    // estimate drifts outside 3x its configured standard error, the
    // engine emits 0 there and the gate hash-fails.
    "a1_product_stats_approx" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//10000000)*10000000 AS us,
        |                  event_type, value, user_id FROM events)
        |SELECT strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS stt,
        |       event_type, COUNT(*) AS ct,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount,
        |       COUNT(DISTINCT user_id) AS user_ct,
        |       CAST(1 AS INT) AS within_bound
        |FROM w GROUP BY us, event_type ORDER BY us, event_type""".stripMargin,

    "a2_visitor_stats" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//60000000)*60000000 AS us,
        |                  event_type, value, user_id FROM events)
        |SELECT strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS stt,
        |       event_type, user_id % 4 AS cohort, COUNT(*) AS pv,
        |       COUNT(DISTINCT user_id) AS uv,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
        |FROM w GROUP BY us, event_type, cohort ORDER BY us, event_type, cohort""".stripMargin,

    "a3_keyword_stats" ->
      """SELECT keyword, COUNT(*) AS ct
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS keyword FROM documents)
        |WHERE keyword <> '' GROUP BY keyword ORDER BY keyword""".stripMargin,

    "a3_keyword_lateral" ->
      """SELECT keyword, COUNT(*) AS ct
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS keyword FROM documents)
        |WHERE keyword <> '' GROUP BY keyword ORDER BY keyword""".stripMargin,

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

    "a4_province_stats" ->
      """SELECT n_name, COUNT(DISTINCT o_orderkey) AS order_ct,
        |       COUNT(DISTINCT o_custkey) AS cust_ct,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "a5_gmv" ->
      """SELECT strftime(o_orderdate, '%Y%m%d') AS dt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
        |       COUNT(*) AS order_ct
        |FROM orders GROUP BY dt ORDER BY dt""".stripMargin,

    "j1_interval_join" ->
      """SELECT l_returnflag, COUNT(*) AS ct,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM orders JOIN lineitem
        |  ON o_orderkey = l_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "j2_interval_join_asym" ->
      """SELECT o_orderpriority, COUNT(*) AS ct,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND o_orderdate >= l_shipdate - INTERVAL 15 DAY
        | AND o_orderdate <= l_shipdate
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "j3_dim_enrich" ->
      """SELECT p_brand, s_name, COUNT(*) AS ct,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |LEFT JOIN part ON l_partkey = p_partkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_name ORDER BY p_brand, s_name""".stripMargin,

    "j4_union_stats" ->
      """SELECT dt, CAST(SUM(pv) AS BIGINT) AS pv, CAST(SUM(cv) AS BIGINT) AS cv
        |FROM (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt, 1 AS pv, 0 AS cv
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d'), 0, 1
        |  FROM events WHERE event_type = 'click')
        |GROUP BY dt ORDER BY dt""".stripMargin,

    "j5_config_route" ->
      """WITH config(source_table, operate_type, sink_table) AS (VALUES
        |  ('purchase', 'insert', 'dwd_purchase'), ('signup', 'insert', 'dwd_signup'))
        |SELECT sink_table, COUNT(*) AS ct
        |FROM events JOIN config
        |  ON event_type = source_table AND operate_type = 'insert'
        |GROUP BY sink_table ORDER BY sink_table""".stripMargin,

    "j6_asof_join" ->
      """SELECT o1.o_orderkey, o2.o_orderdate AS prev_date
        |FROM orders o1 ASOF LEFT JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey AND o1.o_orderdate > o2.o_orderdate
        |ORDER BY o1.o_orderkey""".stripMargin,

    "stream_j6_asof" ->
      """SELECT o1.o_orderkey, o2.o_orderdate AS prev_date
        |FROM orders o1 ASOF LEFT JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey AND o1.o_orderdate > o2.o_orderdate
        |ORDER BY o1.o_orderkey""".stripMargin,

    "a6_topn_per_group" ->
      """WITH rev AS (
        |  SELECT n_name, o_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, o_custkey),
        |r AS (SELECT *, row_number() OVER (PARTITION BY n_name
        |        ORDER BY revenue DESC, o_custkey) AS rnk FROM rev)
        |SELECT n_name, o_custkey, revenue, rnk FROM r WHERE rnk <= 3
        |ORDER BY n_name, rnk""".stripMargin,

    "a7_rollup" ->
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS order_ct
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "t4_sessionize" ->
      """WITH f AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS nw
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |h AS (SELECT user_id, event_id, us,
        |    CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MAX(us) - MIN(us) AS span_us, MIN(event_id) AS first_event
        |FROM h GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    // the identical integer token-bucket recurrence, replayed row-by-row
    // through a recursive CTE (rn+1 per step; first event sees a full
    // bucket, Δtick refill is min-capped, 1 token per admit)
    "t5_rate_limit" -> rateLimitOracleSql,

    // execution mode must not change admission: the streaming run (keyed
    // RocksDB state, per-batch event-time folds) answers to the same
    // recursive-CTE truth
    "stream_t5_rate_limit" -> rateLimitOracleSql,

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
        |s0 AS (SELECT word, wct, list_transform(range(1, length(word)+1),
        |    i -> substr(word, i, 1)) AS syms FROM v0),
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
        |s0 AS (SELECT word, wct, list_transform(range(1, length(word)+1),
        |    i -> substr(word, i, 1)) AS syms FROM v0),
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

    "a8_percentiles" ->
      """SELECT l_returnflag,
        |  floor(quantile_cont(l_extendedprice, 0.25)*1000000)/1000000 AS p25,
        |  floor(quantile_cont(l_extendedprice, 0.5)*1000000)/1000000 AS p50,
        |  floor(quantile_cont(l_extendedprice, 0.75)*1000000)/1000000 AS p75,
        |  COUNT(*) AS ct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // change-compact then interval: only rows whose tracked attribute
    // moved survive; lead() over the survivors closes each version
    // identical truth to k7: the streaming path only changes HOW the
    // changelog accumulates, never the derived history
    "stream_k7_scd2" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events),
        |v AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
        |f AS (SELECT user_id, event_id, event_type, us AS from_us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_us
        |  FROM v)
        |SELECT user_id, event_id, event_type, from_us, to_us,
        |  CASE WHEN to_us IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM f ORDER BY user_id, from_us, event_id""".stripMargin,

    "k7_scd2_history" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events),
        |v AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
        |f AS (SELECT user_id, event_id, event_type, us AS from_us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_us
        |  FROM v)
        |SELECT user_id, event_id, event_type, from_us, to_us,
        |  CASE WHEN to_us IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM f ORDER BY user_id, from_us, event_id""".stripMargin,

    // hopping-window expansion: every event belongs to the two 30s-aligned
    // 60s windows covering it — floor(t/30s)*30s and the one before
    "a9_sliding_window" ->
      """WITH k AS (SELECT unnest(range(0, 2)) AS k),
        |w AS (SELECT ((epoch_us(CAST(ts AS TIMESTAMP))//30000000) - k.k)*30000000 AS us,
        |             event_type, user_id, value
        |      FROM events, k)
        |SELECT strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(make_timestamp(us + 60000000), '%Y-%m-%d %H:%M:%S') AS edt,
        |       event_type, COUNT(*) AS pv, COUNT(DISTINCT user_id) AS uv,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
        |FROM w GROUP BY us, event_type ORDER BY us, event_type""".stripMargin,

    "stream_a9_sliding_window" ->
      """WITH k AS (SELECT unnest(range(0, 2)) AS k),
        |w AS (SELECT ((epoch_us(CAST(ts AS TIMESTAMP))//30000000) - k.k)*30000000 AS us,
        |             event_type, user_id, value
        |      FROM events, k)
        |SELECT strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(make_timestamp(us + 60000000), '%Y-%m-%d %H:%M:%S') AS edt,
        |       event_type, COUNT(*) AS pv, COUNT(DISTINCT user_id) AS uv,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
        |FROM w GROUP BY us, event_type ORDER BY us, event_type""".stripMargin,

    // the sketch twin's checked bound: exact columns recomputed, verdict
    // pinned to 1 — if any approx_percentile estimate leaves its exact
    // p ± 3/accuracy rank bracket the engine emits 0 and the hash fails
    "a8_percentiles_approx" ->
      """SELECT l_returnflag,
        |  floor(quantile_cont(l_extendedprice, 0.25)*1000000)/1000000 AS p25,
        |  floor(quantile_cont(l_extendedprice, 0.5)*1000000)/1000000 AS p50,
        |  floor(quantile_cont(l_extendedprice, 0.75)*1000000)/1000000 AS p75,
        |  COUNT(*) AS ct, CAST(1 AS INT) AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

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

    // session_window cutoff: a session emits once the final watermark (ms,
    // 0s delay → floor(max_us/1000)) is at or past its end (last + gap)
    "stream_t4_session" ->
      """WITH f AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |mx AS (SELECT max(us) AS mu FROM f),
        |g AS (SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS nw
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |h AS (SELECT user_id, us,
        |    SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (SELECT user_id, sid, MIN(us) AS stt_us, MAX(us) AS last_us,
        |         COUNT(*) AS n_events
        |  FROM h GROUP BY user_id, sid)
        |SELECT user_id, stt_us, n_events FROM sess, mx
        |WHERE (last_us + 1800000000)//1000 <= mu//1000
        |ORDER BY user_id, stt_us""".stripMargin,

    // same oracle again: the tws session twin changes the state API
    // (ValueState + timer vs the session_window operator), not the answer
    "stream_t4_session_tws" ->
      """WITH f AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |mx AS (SELECT max(us) AS mu FROM f),
        |g AS (SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS nw
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |h AS (SELECT user_id, us,
        |    SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (SELECT user_id, sid, MIN(us) AS stt_us, MAX(us) AS last_us,
        |         COUNT(*) AS n_events
        |  FROM h GROUP BY user_id, sid)
        |SELECT user_id, stt_us, n_events FROM sess, mx
        |WHERE (last_us + 1800000000)//1000 <= mu//1000
        |ORDER BY user_id, stt_us""".stripMargin,

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

    "pipe_decontaminate_sem" ->
      """WITH ev AS (SELECT CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 17 = 0),
        |tr AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 17 <> 0),
        |m AS (SELECT tr.vec_id, tr.label,
        |    max(list_cosine_similarity(tr.v, ev.v)) AS mc
        |  FROM tr, ev GROUP BY tr.vec_id, tr.label)
        |SELECT vec_id, label FROM m WHERE mc < 0.42 ORDER BY vec_id""".stripMargin,

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

    "k2_dynamic_topic" ->
      """SELECT 'dwd_' || event_type AS topic,
        |  CAST(json_object('event_id', event_id, 'user_id', user_id) AS VARCHAR) AS value
        |FROM events WHERE event_type IN ('purchase', 'signup')
        |ORDER BY topic, value""".stripMargin,

    "t1_new_old_flag" ->
      """WITH f AS (SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_new, COUNT(*) AS ct,
        |       COUNT(DISTINCT user_id) AS user_ct
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "t2_uv_dedup" ->
      """WITH f AS (SELECT user_id,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt, event_id,
        |    row_number() OVER (PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT user_id, dt, event_id FROM f WHERE rn = 1 ORDER BY user_id, dt""".stripMargin,

    "t3_bounce" ->
      """WITH f AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (SELECT user_id, us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        |  FROM f)
        |SELECT user_id, COUNT(*) AS bounce_ct FROM g
        |WHERE nxt IS NULL OR nxt - us > 1800000000
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Strict contiguity means step j must match the j-th FOLLOWING event,
    // so the whole DFA collapses to lead() shifts. Each start event has
    // exactly one outcome: full match; timeout after 1 step (no successor
    // or successor beyond the window); timeout after 2; or silent death
    // (an in-window successor that fails its step) — the branches below
    // are mutually exclusive.
    "cep_funnel" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (SELECT user_id, event_id, us, event_type,
        |    lead(event_type,1) OVER w AS t1, lead(event_id,1) OVER w AS id1,
        |    lead(us,1) OVER w AS us1,
        |    lead(event_type,2) OVER w AS t2, lead(event_id,2) OVER w AS id2,
        |    lead(us,2) OVER w AS us2
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |m AS (
        |  SELECT user_id, event_id AS first_event_id, id2 AS last_event_id,
        |         3 AS steps_matched, 1 AS matched_i
        |  FROM g WHERE event_type='view' AND t1='click' AND us1-us <= 7200000000
        |          AND t2='purchase' AND us2-us <= 7200000000
        |  UNION ALL
        |  SELECT user_id, event_id, event_id, 1, 0
        |  FROM g WHERE event_type='view' AND (us1 IS NULL OR us1-us > 7200000000)
        |  UNION ALL
        |  SELECT user_id, event_id, id1, 2, 0
        |  FROM g WHERE event_type='view' AND t1='click' AND us1-us <= 7200000000
        |          AND (us2 IS NULL OR us2-us > 7200000000))
        |SELECT user_id, first_event_id, last_event_id, steps_matched, matched_i
        |FROM m ORDER BY user_id, first_event_id""".stripMargin,

    // Streaming twin: identical except the no-successor timeouts only emit
    // once the final watermark (floor(max_us/1000), 0s delay) passes the
    // partial's deadline; beyond-window successors emit unconditionally
    // (their arrival already advanced the watermark past the deadline).
    "stream_cep_funnel" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |mx AS (SELECT max(us) AS mu FROM f),
        |g AS (SELECT user_id, event_id, us, event_type,
        |    lead(event_type,1) OVER w AS t1, lead(event_id,1) OVER w AS id1,
        |    lead(us,1) OVER w AS us1,
        |    lead(event_type,2) OVER w AS t2, lead(event_id,2) OVER w AS id2,
        |    lead(us,2) OVER w AS us2
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |m AS (
        |  SELECT user_id, event_id AS first_event_id, id2 AS last_event_id,
        |         3 AS steps_matched, 1 AS matched_i
        |  FROM g WHERE event_type='view' AND t1='click' AND us1-us <= 7200000000
        |          AND t2='purchase' AND us2-us <= 7200000000
        |  UNION ALL
        |  SELECT g.user_id, event_id, event_id, 1, 0
        |  FROM g, mx WHERE event_type='view'
        |   AND ((us1 IS NULL AND (us + 7200000000)//1000 < mu//1000)
        |     OR (us1 IS NOT NULL AND us1-us > 7200000000))
        |  UNION ALL
        |  SELECT g.user_id, event_id, id1, 2, 0
        |  FROM g, mx WHERE event_type='view' AND t1='click' AND us1-us <= 7200000000
        |   AND ((us2 IS NULL AND (us + 7200000000)//1000 < mu//1000)
        |     OR (us2 IS NOT NULL AND us2-us > 7200000000)))
        |SELECT user_id, first_event_id, last_event_id, steps_matched, matched_i
        |FROM m ORDER BY user_id, first_event_id""".stripMargin,

    // Relaxed contiguity: each view-partial consumes the FIRST in-window
    // click after it, then the FIRST in-window purchase after that click
    // (noSkip: every view opens its own independent partial, so per-view
    // LATERAL lookups are exact). "After" is the DFA's processing order:
    // (us, event_id) lexicographic. Window is measured from the view.
    "cep_funnel_relaxed" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT * FROM f WHERE event_type='view'),
        |m AS (
        |  SELECT v.user_id, v.event_id AS first_event_id, v.us AS vus,
        |         c.cid, p.pid
        |  FROM v
        |  LEFT JOIN LATERAL (
        |    SELECT c.event_id AS cid, c.us AS cus FROM f c
        |    WHERE c.user_id = v.user_id AND c.event_type = 'click'
        |      AND (c.us > v.us OR (c.us = v.us AND c.event_id > v.event_id))
        |      AND c.us - v.us <= 86400000000
        |    ORDER BY c.us, c.event_id LIMIT 1) c ON true
        |  LEFT JOIN LATERAL (
        |    SELECT p.event_id AS pid FROM f p
        |    WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
        |      AND (p.us > c.cus OR (p.us = c.cus AND p.event_id > c.cid))
        |      AND p.us - v.us <= 86400000000
        |    ORDER BY p.us, p.event_id LIMIT 1) p ON true)
        |SELECT user_id, first_event_id,
        |  CASE WHEN pid IS NOT NULL THEN pid
        |       WHEN cid IS NOT NULL THEN cid ELSE first_event_id END AS last_event_id,
        |  CASE WHEN pid IS NOT NULL THEN 3
        |       WHEN cid IS NOT NULL THEN 2 ELSE 1 END AS steps_matched,
        |  CASE WHEN pid IS NOT NULL THEN 1 ELSE 0 END AS matched_i
        |FROM m ORDER BY user_id, first_event_id""".stripMargin,

    // T7 late-data drop, replayed explicitly: chunk = event_id mod 4 (the
    // round-robin split). Spark runs TWO watermarks per trigger
    // (SPARK-24588 lineage): late-row DROPS use the PREVIOUS trigger's
    // watermark (eventTimeWatermarkForLateEvents — verified empirically:
    // batch 1 drops 0 rows despite an advanced current wm), while state
    // EVICTION / append emission uses the current one. So the drop wm for
    // batch k is max event-time ms over chunks <= k-2 minus 600000
    // (EventTimeStats floors µs→ms; batches 0 and 1 drop nothing); a row
    // is dropped when its hour-window END (µs) <= dropWm*1000; a window
    // emits when its end <= the FINAL wm. The lag also guarantees no
    // evicted window is ever re-created (eviction wm of batch k == drop
    // wm of batch k+1), so append never duplicates. Integer math end to
    // end.
    "stream_t7_late_drop" ->
      """WITH f AS (SELECT event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    event_id % 4 AS chunk FROM events),
        |cm AS (SELECT chunk, MAX(us // 1000) AS mx_ms FROM f GROUP BY chunk),
        |wm AS (SELECT chunk,
        |    MAX(mx_ms) OVER (ORDER BY chunk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) - 600000
        |      AS wm_ms
        |  FROM cm),
        |kept AS (
        |  SELECT (f.us // 3600000000) * 3600000000 AS stt_us, f.event_type
        |  FROM f JOIN wm ON f.chunk = wm.chunk
        |  WHERE wm.wm_ms IS NULL
        |     OR ((f.us // 3600000000) * 3600000000 + 3600000000)
        |        > wm.wm_ms * 1000),
        |fin AS (SELECT (MAX(us // 1000) - 600000) * 1000 AS fwm_us FROM f)
        |SELECT stt_us, event_type, COUNT(*) AS ct
        |FROM kept, fin
        |WHERE stt_us + 3600000000 <= fwm_us
        |GROUP BY stt_us, event_type
        |ORDER BY stt_us, event_type""".stripMargin,

    // Streaming twin: completions always emit (on arrival); a timed-out
    // partial emits iff some same-key event lands past its deadline
    // (in-advance expiry inside Cep.advance) OR the final watermark
    // (floor(max_us/1000) ms, 0s delay) passed the deadline.
    "stream_cep_funnel_relaxed" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |mx AS (SELECT max(us) AS mu FROM f),
        |v AS (SELECT * FROM f WHERE event_type='view'),
        |m AS (
        |  SELECT v.user_id, v.event_id AS first_event_id, v.us AS vus,
        |         c.cid, p.pid
        |  FROM v
        |  LEFT JOIN LATERAL (
        |    SELECT c.event_id AS cid, c.us AS cus FROM f c
        |    WHERE c.user_id = v.user_id AND c.event_type = 'click'
        |      AND (c.us > v.us OR (c.us = v.us AND c.event_id > v.event_id))
        |      AND c.us - v.us <= 86400000000
        |    ORDER BY c.us, c.event_id LIMIT 1) c ON true
        |  LEFT JOIN LATERAL (
        |    SELECT p.event_id AS pid FROM f p
        |    WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
        |      AND (p.us > c.cus OR (p.us = c.cus AND p.event_id > c.cid))
        |      AND p.us - v.us <= 86400000000
        |    ORDER BY p.us, p.event_id LIMIT 1) p ON true)
        |SELECT m.user_id, m.first_event_id,
        |  CASE WHEN pid IS NOT NULL THEN pid
        |       WHEN cid IS NOT NULL THEN cid ELSE first_event_id END AS last_event_id,
        |  CASE WHEN pid IS NOT NULL THEN 3
        |       WHEN cid IS NOT NULL THEN 2 ELSE 1 END AS steps_matched,
        |  CASE WHEN pid IS NOT NULL THEN 1 ELSE 0 END AS matched_i
        |FROM m, mx
        |WHERE pid IS NOT NULL
        |   OR EXISTS (SELECT 1 FROM f e WHERE e.user_id = m.user_id
        |              AND e.us > m.vus + 86400000000)
        |   OR (m.vus + 86400000000)//1000 < mu//1000
        |ORDER BY m.user_id, m.first_event_id""".stripMargin,

    // oneOrMore over strict contiguity = gaps-and-islands: every pair
    // (a, b) inside one consecutive-click island with b no more than 24h
    // after a is an emitted sub-run (reluctant loop + noSkip seeds); there
    // is no timeout arm, so batch and stream share this oracle
    "cep_clicks_burst" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events),
        |c AS (SELECT user_id, event_id, us, rn,
        |    rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
        |  FROM f WHERE event_type = 'click')
        |SELECT a.user_id, a.event_id AS first_event_id, b.event_id AS last_event_id,
        |       CAST(b.rn - a.rn + 1 AS INT) AS steps_matched,
        |       CAST(1 AS INT) AS matched_i
        |FROM c a JOIN c b
        |  ON a.user_id = b.user_id AND a.isl = b.isl AND b.rn >= a.rn
        |  AND b.us - a.us <= 86400000000
        |ORDER BY a.user_id, first_event_id, last_event_id""".stripMargin,

    "stream_cep_clicks_burst" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events),
        |c AS (SELECT user_id, event_id, us, rn,
        |    rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
        |  FROM f WHERE event_type = 'click')
        |SELECT a.user_id, a.event_id AS first_event_id, b.event_id AS last_event_id,
        |       CAST(b.rn - a.rn + 1 AS INT) AS steps_matched,
        |       CAST(1 AS INT) AS matched_i
        |FROM c a JOIN c b
        |  ON a.user_id = b.user_id AND a.isl = b.isl AND b.rn >= a.rn
        |  AND b.us - a.us <= 86400000000
        |ORDER BY a.user_id, first_event_id, last_event_id""".stripMargin,

    // optional middle step, deterministic first-match semantics: the first
    // click-or-purchase within the window decides the path — a purchase
    // completes straight from the view (steps 2), a click advances to the
    // optional position and awaits a purchase (steps 3 / timeout 2)
    "cep_optional_funnel" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT * FROM f WHERE event_type='view'),
        |m AS (
        |  SELECT v.user_id, v.event_id AS first_event_id, v.us AS vus,
        |         e1.e1id, e1.e1type, e1.e1us, p2.pid
        |  FROM v
        |  LEFT JOIN LATERAL (
        |    SELECT e.event_id AS e1id, e.event_type AS e1type, e.us AS e1us
        |    FROM f e
        |    WHERE e.user_id = v.user_id AND e.event_type IN ('click','purchase')
        |      AND (e.us > v.us OR (e.us = v.us AND e.event_id > v.event_id))
        |      AND e.us - v.us <= 86400000000
        |    ORDER BY e.us, e.event_id LIMIT 1) e1 ON true
        |  LEFT JOIN LATERAL (
        |    SELECT p.event_id AS pid FROM f p
        |    WHERE p.user_id = v.user_id AND e1.e1type = 'click'
        |      AND p.event_type = 'purchase'
        |      AND (p.us > e1.e1us OR (p.us = e1.e1us AND p.event_id > e1.e1id))
        |      AND p.us - v.us <= 86400000000
        |    ORDER BY p.us, p.event_id LIMIT 1) p2 ON true)
        |SELECT user_id, first_event_id,
        |  CASE WHEN e1type = 'purchase' THEN e1id
        |       WHEN pid IS NOT NULL THEN pid
        |       WHEN e1id IS NOT NULL THEN e1id ELSE first_event_id END AS last_event_id,
        |  CASE WHEN e1type = 'purchase' THEN 2
        |       WHEN pid IS NOT NULL THEN 3
        |       WHEN e1id IS NOT NULL THEN 2 ELSE 1 END AS steps_matched,
        |  CASE WHEN e1type = 'purchase' OR pid IS NOT NULL THEN 1 ELSE 0 END AS matched_i
        |FROM m ORDER BY user_id, first_event_id""".stripMargin,

    // streaming twin: completions always emit; a timed-out partial emits
    // iff some same-key event lands past its deadline (in-advance expiry
    // inside Cep.advance) OR the final watermark passed the deadline
    "stream_cep_optional_funnel" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |mx AS (SELECT max(us) AS mu FROM f),
        |v AS (SELECT * FROM f WHERE event_type='view'),
        |m AS (
        |  SELECT v.user_id, v.event_id AS first_event_id, v.us AS vus,
        |         e1.e1id, e1.e1type, e1.e1us, p2.pid
        |  FROM v
        |  LEFT JOIN LATERAL (
        |    SELECT e.event_id AS e1id, e.event_type AS e1type, e.us AS e1us
        |    FROM f e
        |    WHERE e.user_id = v.user_id AND e.event_type IN ('click','purchase')
        |      AND (e.us > v.us OR (e.us = v.us AND e.event_id > v.event_id))
        |      AND e.us - v.us <= 86400000000
        |    ORDER BY e.us, e.event_id LIMIT 1) e1 ON true
        |  LEFT JOIN LATERAL (
        |    SELECT p.event_id AS pid FROM f p
        |    WHERE p.user_id = v.user_id AND e1.e1type = 'click'
        |      AND p.event_type = 'purchase'
        |      AND (p.us > e1.e1us OR (p.us = e1.e1us AND p.event_id > e1.e1id))
        |      AND p.us - v.us <= 86400000000
        |    ORDER BY p.us, p.event_id LIMIT 1) p2 ON true)
        |SELECT m.user_id, m.first_event_id,
        |  CASE WHEN e1type = 'purchase' THEN e1id
        |       WHEN pid IS NOT NULL THEN pid
        |       WHEN e1id IS NOT NULL THEN e1id ELSE first_event_id END AS last_event_id,
        |  CASE WHEN e1type = 'purchase' THEN 2
        |       WHEN pid IS NOT NULL THEN 3
        |       WHEN e1id IS NOT NULL THEN 2 ELSE 1 END AS steps_matched,
        |  CASE WHEN e1type = 'purchase' OR pid IS NOT NULL THEN 1 ELSE 0 END AS matched_i
        |FROM m, mx
        |WHERE e1type = 'purchase' OR pid IS NOT NULL
        |   OR EXISTS (SELECT 1 FROM f e WHERE e.user_id = m.user_id
        |              AND e.us > m.vus + 86400000000)
        |   OR (m.vus + 86400000000)//1000 < mu//1000
        |ORDER BY m.user_id, m.first_event_id""".stripMargin,

    "stream_t1_new_old" ->
      """WITH f AS (SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_new, COUNT(*) AS ct,
        |       COUNT(DISTINCT user_id) AS user_ct
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // replays collapse to exactly one copy of every event (35d delay
    // covers the 30-day fixture, so no dedup key expires mid-run)
    "stream_dedup_replay" ->
      """SELECT event_type, COUNT(*) AS ct,
        |  COUNT(DISTINCT event_id) AS ids,
        |  COUNT(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the state CONTENT is an offline truth: last deduped date per user
    // = max(date) per user
    "stream_state_reader" ->
      """SELECT user_id,
        |  max(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS last_dt
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "stream_t2_uv_dedup" ->
      """WITH f AS (SELECT user_id,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt, event_id,
        |    row_number() OVER (PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT user_id, dt, event_id FROM f WHERE rn = 1 ORDER BY user_id, dt""".stripMargin,

    // Bounce emission = (a) successor observed with gap > 1800s, or
    // (b) event-time timeout: watermark (ms, = floor(max_us/1000) with 0s
    // delay) passed ts + gap. Trailing events inside the horizon stay
    // pending — mirrored here by the mu cutoff.
    "stream_t3_bounce" ->
      """WITH f AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |mx AS (SELECT max(us) AS mu FROM f),
        |g AS (SELECT user_id, us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        |  FROM f)
        |SELECT user_id, COUNT(*) AS bounce_ct FROM g, mx
        |WHERE (nxt IS NOT NULL AND nxt - us > 1800000000)
        |   OR (nxt IS NULL AND (us + 1800000000)//1000 < mu//1000)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // same oracle again: timers-and-TTL API twin, identical bounce rule
    "stream_t3_bounce_tws" ->
      """WITH f AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |mx AS (SELECT max(us) AS mu FROM f),
        |g AS (SELECT user_id, us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        |  FROM f)
        |SELECT user_id, COUNT(*) AS bounce_ct FROM g, mx
        |WHERE (nxt IS NOT NULL AND nxt - us > 1800000000)
        |   OR (nxt IS NULL AND (us + 1800000000)//1000 < mu//1000)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "stream_a1_product_stats" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//10000000)*10000000 AS us,
        |                  event_type, value, user_id FROM events)
        |SELECT strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS stt,
        |       strftime(make_timestamp(us + 10000000), '%Y-%m-%d %H:%M:%S') AS edt,
        |       event_type, COUNT(*) AS ct,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount,
        |       COUNT(DISTINCT user_id) AS user_ct
        |FROM w GROUP BY us, event_type ORDER BY us, event_type""".stripMargin,

    "stream_a4_sql" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//60000000)*60000000 AS us,
        |                  event_type, value, user_id FROM events)
        |SELECT strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS stt,
        |       event_type, user_id % 4 AS cohort, COUNT(*) AS pv,
        |       COUNT(DISTINCT user_id) AS uv,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
        |FROM w GROUP BY us, event_type, cohort ORDER BY us, event_type, cohort""".stripMargin,

    "stream_chained_agg" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//600000000)*600000000 AS us,
        |                  event_type, value FROM events),
        |fin AS (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))//1000)*1000 AS wm_us
        |        FROM events)
        |SELECT strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS stt,
        |       event_type, COUNT(*) AS ct,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amount
        |FROM w, fin
        |WHERE us + 600000000 <= wm_us
        |GROUP BY us, event_type ORDER BY us, event_type""".stripMargin,

    "stream_dedup_agg_chain" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//3600000000)*3600000000 AS us,
        |                  event_type FROM events),
        |fin AS (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))//1000)*1000 AS wm_us
        |        FROM events)
        |SELECT us AS stt_us, event_type, COUNT(*) AS ct
        |FROM w, fin WHERE us + 3600000000 <= wm_us
        |GROUP BY us, event_type ORDER BY us, event_type""".stripMargin,

    "stream_window_argmax" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//600000000)*600000000 AS us,
        |                  event_type FROM events),
        |fin AS (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))//1000)*1000 AS wm_us
        |        FROM events),
        |cts AS (SELECT us, event_type, COUNT(*) AS ct FROM w
        |        GROUP BY us, event_type)
        |SELECT us AS stt_us,
        |  arg_max(event_type, lpad(CAST(ct AS VARCHAR), 12, '0') || event_type)
        |    AS top_type,
        |  MAX(ct) AS top_ct
        |FROM cts, fin WHERE us + 600000000 <= wm_us
        |GROUP BY us ORDER BY us""".stripMargin,

    "stream_chained_join_agg" ->
      """WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS c_ts
        |      FROM events WHERE event_type = 'click'),
        |fin AS (SELECT LEAST(
        |    (SELECT MAX(epoch_us(v_ts) // 1000) FROM v),
        |    (SELECT MAX(epoch_us(c_ts) // 1000) FROM c)) * 1000 AS wm_us),
        |p AS (SELECT epoch_us(v.v_ts) AS v_us
        |  FROM v JOIN c ON v.user_id = c.user_id
        |   AND c.c_ts >= v.v_ts AND c.c_ts <= v.v_ts + INTERVAL 600 SECOND)
        |SELECT (v_us // 3600000000) * 3600000000 AS stt_us,
        |       COUNT(*) AS pair_ct
        |FROM p, fin
        |WHERE (v_us // 3600000000) * 3600000000 + 3600000000
        |      <= wm_us - 600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "stream_j1_interval_join" ->
      """SELECT v.user_id, COUNT(*) AS pair_ct
        |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS c_ts FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id
        | AND c.c_ts >= v.v_ts AND c.c_ts <= v.v_ts + INTERVAL 600 SECOND
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,

    // matched pairs always emit; a null-padded row requires the view's
    // window end to be strictly behind the final MIN-of-branches watermark
    "stream_j7_interval_left" ->
      """WITH v AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS vus
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS cus
        |      FROM events WHERE event_type = 'click'),
        |mx AS (SELECT LEAST((SELECT max(vus) FROM v), (SELECT max(cus) FROM c)) AS mu),
        |j AS (SELECT v.user_id, v.vus, c.cus
        |      FROM v LEFT JOIN c ON v.user_id = c.user_id
        |        AND c.cus >= v.vus AND c.cus <= v.vus + 600000000),
        |e AS (SELECT user_id,
        |        CASE WHEN cus IS NOT NULL THEN 1 ELSE 0 END AS m,
        |        CASE WHEN cus IS NULL
        |          AND (vus + 600000000)//1000 < (SELECT mu//1000 FROM mx)
        |          THEN 1 ELSE 0 END AS u
        |      FROM j)
        |SELECT user_id, CAST(SUM(m) AS BIGINT) AS pair_ct,
        |       CAST(SUM(u) AS BIGINT) AS unmatched_ct
        |FROM e GROUP BY user_id HAVING SUM(m) > 0 OR SUM(u) > 0
        |ORDER BY user_id""".stripMargin,

    // Checkpoint resume re-derives the SINGLE-RUN dedup truth: the union
    // of the two lifecycles must equal it exactly (see the gate comment).
    "stream_t8_checkpoint_resume" ->
      """WITH f AS (SELECT user_id,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt, event_id,
        |    row_number() OVER (PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
        |                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT user_id, dt, event_id FROM f WHERE rn = 1 ORDER BY user_id, dt""".stripMargin,

    // Full-outer twin of j7: both null-pad cutoffs replayed — views
    // close at vus+600s (their last possible click), clicks at cus (their
    // last possible view, 0-second lower bound); ms-floored like Spark's
    // EventTimeStats. Groups whose every row is unclosed never emit.
    "stream_j7b_interval_full" ->
      """WITH v AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS vus
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS cus
        |      FROM events WHERE event_type = 'click'),
        |mx AS (SELECT LEAST((SELECT max(vus) FROM v), (SELECT max(cus) FROM c)) AS mu),
        |j AS (SELECT COALESCE(v.user_id, c.user_id) AS user_id, v.vus, c.cus
        |      FROM v FULL OUTER JOIN c ON v.user_id = c.user_id
        |        AND c.cus >= v.vus AND c.cus <= v.vus + 600000000),
        |e AS (SELECT user_id,
        |        CASE WHEN vus IS NOT NULL AND cus IS NOT NULL THEN 1 ELSE 0 END AS m,
        |        CASE WHEN cus IS NULL
        |          AND (vus + 600000000)//1000 < (SELECT mu//1000 FROM mx)
        |          THEN 1 ELSE 0 END AS uv,
        |        CASE WHEN vus IS NULL
        |          AND cus//1000 < (SELECT mu//1000 FROM mx)
        |          THEN 1 ELSE 0 END AS uc
        |      FROM j)
        |SELECT user_id, CAST(SUM(m) AS BIGINT) AS pair_ct,
        |       CAST(SUM(uv) AS BIGINT) AS unmatched_view_ct,
        |       CAST(SUM(uc) AS BIGINT) AS unmatched_click_ct
        |FROM e GROUP BY user_id
        |HAVING SUM(m) > 0 OR SUM(uv) > 0 OR SUM(uc) > 0
        |ORDER BY user_id""".stripMargin,

    "p1_json_parse" ->
      """SELECT CAST(regexp_extract(props, '\d+') AS BIGINT) % 10 AS k_bucket, COUNT(*) AS ct
        |FROM events WHERE regexp_extract(props, '\d+') <> ''
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "p4_stream_split" ->
      """SELECT CASE WHEN event_type = 'signup' THEN 'start'
        |            WHEN event_type IN ('view','click') THEN 'page'
        |            ELSE 'other' END AS branch, COUNT(*) AS ct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "p6_derived_dates" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS create_date,
        |       strftime(o_orderdate, '%H') AS create_hour,
        |       (epoch_us(o_orderdate)//1000000)*1000 AS create_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "s6_dim_lookup" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey BETWEEN 1 AND 20 ORDER BY c_custkey""".stripMargin,

    "f_scalar_pack" ->
      """SELECT o_orderkey,
        |  string_split(o_orderpriority, '-')[1] AS prio_code,
        |  substr(o_orderstatus, 1, 1) AS status_c,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od_str,
        |  (epoch_us(o_orderdate)//1000000)*1000 AS od_ms,
        |  CAST(floor(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-12-31')/365.0) AS BIGINT) AS age_years,
        |  strftime(o_orderdate, '%Y%m%d') AS od_yyyymmdd
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin,

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

    // The streaming run is batch-local foreachBatch decontamination —
    // per-doc pure, so it shares the batch formulation's truth: same
    // eval set, clean-side survivors per language.
    "stream_pipe_decontaminate" ->
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
        |bad AS (SELECT DISTINCT trg.doc_id FROM trg JOIN ev USING (g))
        |SELECT tr.lang, COUNT(*) AS docs_clean,
        |       CAST(SUM(tr.n_chars) AS BIGINT) AS chars_clean
        |FROM tr LEFT JOIN bad ON tr.doc_id = bad.doc_id
        |WHERE bad.doc_id IS NULL
        |GROUP BY tr.lang ORDER BY tr.lang""".stripMargin,

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

    "dedup_ngram_jaccard" -> ngramJaccardOracleSql,

    // the prefix-filtered variant must find EXACTLY the same pair set —
    // the oracle (exhaustive pairwise Jaccard) IS the no-false-negative
    // proof of the prefix filter
    "dedup_ngram_prefix" -> ngramJaccardOracleSql,

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

    // same portable sketch family; candidates restricted to incoming
    // (doc_id%5=0) × history (doc_id%5<>0) band collisions. The streaming
    // twin emits everything at arrival (stream-static inner joins only),
    // so it shares this oracle verbatim.
    "stream_dedup_incremental" ->
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
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_incremental" ->
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
        |ORDER BY doc_a, doc_b""".stripMargin,

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

    "sim_topk_ivf" ->
      """SELECT vec_id AS query_id,
        |  CAST(5 AS BIGINT) AS n_results, CAST(5 AS BIGINT) AS n_distinct,
        |  CAST(5 AS BIGINT) AS n_ranks, CAST(5 AS BIGINT) AS n_valid,
        |  CAST(4 AS BIGINT) AS n_ordered
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin,

    // append == one-shot rebuild (n_match), every cosine exact (n_valid)
    "sim_ivf_append" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results,
        |  CAST(5 AS BIGINT) AS n_match, CAST(5 AS BIGINT) AS n_valid
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

    "mm_binary_meta" ->
      """SELECT doc_id, 'text' AS kind, strlen(text) AS n_bytes, 'utf-8' AS codec
        |FROM documents ORDER BY doc_id""".stripMargin,

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

    "mm_frame_sample" ->
      """SELECT doc_id,
        |  greatest((strlen(text)-1)//16, 0) + 1 AS n_frames,
        |  16*greatest((strlen(text)-1)//16, 0) AS last_offset,
        |  array_to_string([16*i for i in range(0, greatest((strlen(text)-1)//16, 0) + 1)], ',') AS offsets_csv
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

    // the stub feature is a 16-bin byte histogram of the utf-8 payload, so
    // dim == 16 and sum(bins) == byte length — both engine-independent
    "mm_features" ->
      """SELECT doc_id, CAST(16 AS BIGINT) AS feature_dim,
        |  CAST(strlen(text) AS BIGINT) AS feature_sum
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

    "k3_serving_reagg" ->
      """WITH w AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP))//10000000)*10000000 AS us,
        |                  event_type, user_id FROM events),
        |a AS (SELECT us, event_type, COUNT(*) AS ct, COUNT(DISTINCT user_id) AS user_ct
        |      FROM w GROUP BY us, event_type)
        |SELECT event_type, CAST(SUM(ct) AS BIGINT) AS total_ct,
        |       MAX(user_ct) AS max_win_users, COUNT(*) AS windows
        |FROM a GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
