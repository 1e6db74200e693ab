package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Degree-oriented triangle counting: exactness on known shapes, parity
  * with the naive enumeration on random graphs, and canonicalization of
  * messy input (direction, multi-edges, loops). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val r = Graph.triangleStats(
      Graph.canonicalEdges(edges.toDF("s", "d"), "s", "d")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("known shapes: K4 has 4 triangles, a star none, a path none") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(stats(k4) === ((4L, 12L, 4L, 6L)))
    val star = (1L to 6L).map(i => (0L, i))
    assert(stats(star)._1 === 0L)
    assert(stats(star)._2 === 15L) // C(6,2) wedges through the hub
    val path = (0L until 5L).map(i => (i, i + 1))
    assert(stats(path) === ((0L, 4L, 6L, 5L)))
  }

  test("canonicalization: direction, duplicates and self-loops don't " +
      "change the answer") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val messy = tri ++ tri.map(_.swap) ++ Seq((1L, 1L), (2L, 2L), (1L, 2L))
    assert(stats(messy) === stats(tri))
    assert(stats(tri)._1 === 1L)
  }

  test("degree orientation == naive wedge closure on random graphs " +
      "(incl. a hub)") {
    val rnd = new scala.util.Random(29)
    val edges = (Seq.fill(600)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      ++ (1L to 40L).map(i => (0L, i))) // hub node 0
    val canon = Graph.canonicalEdges(edges.toDF("s", "d"), "s", "d")
    val fast = Graph.triangleStats(canon).head().getLong(0)
    // naive: a<b<c three-way join on the canonical list
    val e = canon.select(col("a"), col("b"))
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    assert(fast === naive)
    assert(fast > 0, "fixture should contain triangles")
  }

  test("pageRank: hand-computed fixed-point values on a star; symmetric " +
      "graphs stay uniform; hubs outrank leaves") {
    import org.apache.spark.sql.DataFrame
    def pr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
      Graph.pageRank(
          Graph.canonicalEdges(edges.toDF("s", "d"), "s", "d"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // star 0-(1,2,3): n=4, r0=250000, base=37500; after one round the
    // hub gets 37500 + 85·750000 div 100 = 675000, each leaf
    // 37500 + 85·(250000 div 3) div 100 = 108333
    val star = pr(Seq((0L, 1L), (0L, 2L), (0L, 3L)), iters = 1)
    assert(star(0L) === 675000L)
    assert(star(1L) === 108333L && star(2L) === 108333L && star(3L) === 108333L)
    // a 2-node path is symmetric: both nodes keep rank 500000 forever
    val path2 = pr(Seq((1L, 2L)), iters = 3)
    assert(path2 === Map(1L -> 500000L, 2L -> 500000L))
    // hub outranks leaves after several rounds too
    val star3 = pr(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)), iters = 3)
    assert(star3(0L) > star3(1L))
  }

  test("pageRank is partition-count invariant (integer arithmetic — " +
      "summation order cannot matter)") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val canon = Graph.canonicalEdges(edges.toDF("s", "d"), "s", "d")
    def run(parts: Int): Seq[(Long, Long)] =
      Graph.pageRank(canon.repartition(parts), iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(1) === run(13))
  }

  test("the wedge join fans out from oriented out-degrees, never a " +
      "cartesian (the one-row stat merge is the only nested-loop)") {
    val edges = (1 to 400).map(i => (i.toLong % 40, (i * 7).toLong % 40))
    val plan = Graph.triangleStats(
        Graph.canonicalEdges(edges.toDF("s", "d"), "s", "d"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the semi-join that closes wedges must be a hash join on (u, v)
    assert(plan.contains("LeftSemi"), plan.take(1500))
  }
}
