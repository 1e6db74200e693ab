package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the degree/triangle family.
  *
  * Triangle counting is the canonical "joins explode if you're naive"
  * graph workload: the textbook 3-way self-join enumerates every wedge
  * (Σ deg²), which a single hub node turns quadratic. The fix is DEGREE
  * ORIENTATION (Ortmann/Brandes, also the GraphX/Cohen MapReduce
  * recipe): orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher one, enumerate wedges only from each node's
  * OUT-neighbors (out-degree is O(√E) after orientation — a hub's edges
  * point INTO it), and close each wedge against the oriented edge set.
  * Every triangle has exactly one source node under a total order, so
  * counts are exact with no ×6 overcount and the wedge fan-out is
  * O(E^1.5) worst-case instead of Σ deg².
  *
  * Shuffles: degree agg (one), two orientation joins keyed on the
  * endpoints (broadcast when the degree table is small), the wedge
  * self-join on the source, and the closing semi-join on (v, w) — all
  * hash-keyed equi joins; nothing is ever cartesian. Skew = hubs, and
  * orientation is precisely the hub guard.
  *
  * Edges are canonicalized first (undirected: (min, max), distinct,
  * loops dropped), so multi-edges and direction in the input don't
  * change the answer.
  */
object Graph {

  /** Canonical undirected edge list: a < b, distinct, no self-loops. */
  def canonicalEdges(df: DataFrame, src: String, dst: String): DataFrame =
    df.select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()

  /** Node degrees of a canonical edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))

  /** Exact global triangle count + wedge count (one row:
    * triangles, wedges, nodes, edges). Wedges use the closed form
    * Σ d(d−1)/2 off the degree table — no enumeration. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    // orient a→b when (deg_a, a) < (deg_b, b): a total order, so each
    // undirected edge gets exactly one direction
    val withDeg = edges
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("degree", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("degree", "db"), "b")
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges from each source's out-neighbors, ordered by the SAME total
    // order so the closing edge's orientation is known to be v→w
    val deg2 = deg.select(col("node"), col("degree"))
    val out = oriented
      .join(deg2.withColumnRenamed("node", "v").withColumnRenamed("degree", "dv"), "v")
    val l = out.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val r = out.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedgePairs = l.join(r, "u")
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .select(col("x").as("u"), col("y").as("v"))
    val triangles = wedgePairs.join(oriented, Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("triangles"))
    val wedges = deg.agg(
      sum(expr("degree * (degree - 1) div 2")).as("wedges"),
      count(lit(1)).as("nodes"))
    val edgeCt = edges.agg(count(lit(1)).as("edges"))
    triangles.crossJoin(broadcast(wedges)).crossJoin(broadcast(edgeCt))
      .select(col("triangles"), col("wedges"), col("nodes"), col("edges"))
  }

  /** PageRank over the undirected graph (each canonical edge walks both
    * ways), `iters` synchronous iterations — the ITERATIVE driver-loop
    * family (Lloyd's in Similarity.trainCentroids is its k-means twin):
    * per iteration one contribution join keyed on the source and one
    * destination-keyed aggregation; the rank frame is checkpointed each
    * round so lineage stays flat.
    *
    * All arithmetic is INTEGER micro-units (`rank_u6`, millionths):
    * contribution = rank div outdeg, update = base + 85·Σ div 100 with
    * base = 150000 div N. Floor-truncating at every step makes the
    * result bit-exact and replayable on any engine (the text_lm_score
    * fixed-point contract) — summation order, the classic double-sum
    * nondeterminism, cannot matter for longs. The truncated mass is
    * ≤ 1e-6·outdeg per node per round — ranking fidelity at 1e-6
    * resolution, exactness by construction. Undirected graphs have no
    * dangling nodes (every node has out-edges), so no dangling-mass
    * term is needed. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val directed = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    val outDeg = directed.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    val nodes = directed.select(col("src").as("node")).distinct()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val base = 150000L / n
    var ranks = nodes
      .withColumn("rank_u6", lit(1000000L / n))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contribs = directed
        .join(ranks, directed("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst").as("node"),
          expr("rank_u6 div outdeg").as("c"))
      ranks = nodes
        .join(contribs.groupBy(col("node")).agg(sum(col("c")).as("s")),
          Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100"))
            .as("rank_u6"))
        .localCheckpoint(true)
    }
    ranks
  }
}
