package graft.operators

import graft.functions.TimeFns._
import graft.functions.TextFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DWS-layer aggregations, re-expressed over the harness star schema.
  *
  * Reference semantics (SURVEY.md §2.5):
  *  - A1 ProductStats (dws/ProductStatsApp.java:202-241): 10s tumbling
  *    event-time window keyed by entity, summed counters + exact distinct
  *    id counts (HashSet in the reference → count_distinct/collect_set here;
  *    approx_count_distinct is the documented 100 TB path).
  *  - A2 VisitorStats (dws/VisitorStatsApp.java:108-141): 10s window over a
  *    multi-key cube cell.
  *  - A3 KeywordStats (dws/KeywordStatsApp.java:56-61): tokenize + count.
  *  - A4 ProvinceStats (dws/ProvinceStatsSqlApp.java:44-52): geo rollup with
  *    distinct order count + money sum.
  *  - A5 GMV serving query (gmall-publisher mapper/ProductStatsMapper.java:10).
  *
  * All are single hash-aggregations: partial (map-side) + final agg, one
  * shuffle on the group keys — the minimal plan shape; survives any scale
  * by growing shuffle partitions.
  */
object Stats {

  /** A1: 10s tumbling window per event_type — counters, exact money sum
    * (decimal; double sums are not reproducible across partitionings),
    * exact distinct users. */
  def productStats(events: DataFrame, windowSec: Int = 10): DataFrame =
    events
      .groupBy(
        stt(col("ts"), windowSec).as("stt"),
        edt(col("ts"), windowSec).as("edt"),
        col("event_type"))
      .agg(
        count(lit(1)).as("ct"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("amount"),
        count_distinct(col("user_id")).as("user_ct"))

  /** A1 at 100 TB: identical shape with HLL distinct — one pass, merges
    * associatively across executors, constant memory per group. */
  def productStatsApprox(events: DataFrame, windowSec: Int = 10): DataFrame =
    events
      .groupBy(stt(col("ts"), windowSec).as("stt"), col("event_type"))
      .agg(
        count(lit(1)).as("ct"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("amount"),
        approx_count_distinct(col("user_id")).as("user_ct_approx"))

  /** The HLL twin's correctness gate: computes the exact distinct
    * ALONGSIDE the sketch (exact is the in-gate anchor; the deployed 100 TB
    * operator is [[productStatsApprox]], which never pays for exact) and
    * emits a per-group error-bound verdict. The DuckDB oracle recomputes
    * the exact columns and asserts `within_bound = 1`, so a silent HLL
    * regression (wrong hash, lost sketch merge, rsd drift) hash-fails the
    * gate instead of hiding behind a rows-only check. Bound: 3x the
    * configured standard error (rsd), floored at 2 absolute for tiny
    * groups where the sparse encoding is exact. */
  def productStatsApproxChecked(events: DataFrame, windowSec: Int = 10,
      rsd: Double = 0.05): DataFrame =
    events
      .groupBy(stt(col("ts"), windowSec).as("stt"), col("event_type"))
      .agg(
        count(lit(1)).as("ct"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("amount"),
        count_distinct(col("user_id")).as("user_ct"),
        approx_count_distinct(col("user_id"), rsd).as("__approx"))
      .select(col("stt"), col("event_type"), col("ct"), col("amount"),
        col("user_ct"),
        (abs(col("__approx") - col("user_ct")).cast("double") <=
          greatest(lit(2.0), lit(3 * rsd) * col("user_ct").cast("double")))
          .cast("int").as("within_bound"))

  /** A8's 100 TB path with a CHECKED bound: `approx_percentile` (one-pass
    * mergeable quantile sketch, constant memory per group) next to the
    * exact interpolated percentiles. The sketch guarantees rank error
    * ≤ n/accuracy, so each estimate must land inside the exact quantile
    * bracket at p ± 3/accuracy — the 3x slack absorbs the ≤1-rank wiggle
    * between interpolation conventions at the bracket edges, mirroring
    * the HLL twin's 3·rsd rule. The gate oracle recomputes the exact
    * columns and pins within_bound = 1 everywhere. */
  def percentilesApproxChecked(lineitem: DataFrame,
      accuracy: Int = 1000): DataFrame = {
    val ps = Seq(0.25, 0.5, 0.75)
    val eps = 3.0 / accuracy
    def arr(qs: Seq[Double]) = qs.mkString("array(", ",", ")")
    val checked = ps.indices.map { i =>
      element_at(col("__ap"), i + 1) >= element_at(col("__lo"), i + 1) &&
        element_at(col("__ap"), i + 1) <= element_at(col("__hi"), i + 1)
    }.reduce(_ && _)
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"percentile(l_extendedprice, ${arr(ps)})").as("__ex"),
        expr(s"percentile(l_extendedprice, ${arr(ps.map(_ - eps))})").as("__lo"),
        expr(s"percentile(l_extendedprice, ${arr(ps.map(_ + eps))})").as("__hi"),
        expr(s"approx_percentile(l_extendedprice, ${arr(ps)}, $accuracy)").as("__ap"),
        count(lit(1)).as("ct"))
      .select(col("l_returnflag"),
        graft.functions.TextFns.truncate6(element_at(col("__ex"), 1)).as("p25"),
        graft.functions.TextFns.truncate6(element_at(col("__ex"), 2)).as("p50"),
        graft.functions.TextFns.truncate6(element_at(col("__ex"), 3)).as("p75"),
        col("ct"), checked.cast("int").as("within_bound"))
  }

  /** Sliding (hopping) windows: each event lands in window/slide
    * overlapping windows — Spark's `window(ts, win, slide)` expands rows
    * BEFORE the aggregation, so shuffle volume multiplies by the overlap
    * factor. At 100 TB keep slide ≥ window/4 (or aggregate per-slide
    * tumbling panes first and roll panes up into windows — the pane trick
    * — when a fine slide over a wide window is genuinely needed). */
  def slidingVisitorStats(events: DataFrame, windowSec: Int = 60,
      slideSec: Int = 30): DataFrame =
    events
      .groupBy(window(col("ts"), s"$windowSec seconds", s"$slideSec seconds"),
        col("event_type"))
      .agg(
        count(lit(1)).as("pv"),
        count_distinct(col("user_id")).as("uv"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("dur_sum"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("event_type"), col("pv"), col("uv"), col("dur_sum"))

  /** A2: multi-key visitor cube cell (window x type x user bucket). */
  def visitorStats(events: DataFrame, windowSec: Int = 60): DataFrame =
    events
      .groupBy(
        stt(col("ts"), windowSec).as("stt"),
        col("event_type"),
        pmod(col("user_id"), lit(4L)).as("cohort"))
      .agg(
        count(lit(1)).as("pv"),
        count_distinct(col("user_id")).as("uv"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("dur_sum"))

  /** A3: keyword stats — tokenize, explode, count. The filter-before-
    * tokenize order is kept from the reference (KeywordStatsApp.java:40-45);
    * the tokenizer is a deterministic builtin composition so Catalyst may
    * still push the outer filter into the scan. */
  def keywordStats(documents: DataFrame): DataFrame =
    documents
      // same tokens as TextFns.tokensWs, but the empty-token drop is a ROW
      // filter after the explode rather than an array-lambda filter:
      // higher-order functions are interpreted in Spark, so this keeps the
      // whole explode→filter→partial-agg pipeline inside one
      // WholeStageCodegen span (measured 1.4× faster, cold and warm)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("keyword"))
      .filter(col("keyword") =!= "")
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as("ct"))

  /** A4: province-stats analogue — orders rolled up to nation/region with
    * distinct order count and exact money sum. Dims (customer/nation) are
    * broadcast: orders is the only large input, so the plan is
    * scan(orders) -> BHJ -> BHJ -> partial agg -> exchange -> final agg. */
  def provinceStats(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count_distinct(col("o_orderkey")).as("order_ct"),
        count_distinct(col("o_custkey")).as("cust_ct"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("order_amount"))

  /** A5: GMV serving query — daily sum over the stats table. */
  def gmv(orders: DataFrame): DataFrame =
    orders
      .groupBy(toYyyymmdd(col("o_orderdate")).as("dt"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("gmv"),
        count(lit(1)).as("order_ct"))
}
