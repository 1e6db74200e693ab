package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial proximity self-join — "all pairs within ε" (geo near-matching,
  * sensor co-location, embedding-2D dedup after projection) via uniform
  * grid bucketing: each point lands in an (⌊x/ε⌋, ⌊y/ε⌋) cell, any pair
  * within ε lives in equal-or-adjacent cells, so candidates come from ONE
  * equi-join of the probe side against the build side exploded to its
  * 3×3 cell neighborhood — never the n² cross product. The exact
  * (dx²+dy² ≤ ε²) filter is all-integer, so an oracle replays it
  * bit-for-bit.
  *
  * Scale shape: one shuffle on the cell key; the 9× build expansion is
  * the classic space/shuffle trade (9 small rows beat a cross join at
  * any scale). A degenerate cell (mass-duplicate coordinates) is the
  * same skew class the dedup family guards; callers with adversarial
  * data should pre-aggregate exact-duplicate points first (they are by
  * definition within ε of each other). Coordinates are integer units
  * (micro-degrees, millimeters — caller's choice); ε in the same units. */
object Spatial {

  def proximityJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, eps: Long): DataFrame = {
    require(eps >= 1, s"eps must be >= 1, got $eps")
    // integer floor division for the cell index: x − pmod(x, ε) is the
    // exact ε-aligned floor (pmod is non-negative), so the quotient is
    // exact at ANY magnitude — a double division would mis-bucket
    // coordinates beyond 2^53 and silently drop true pairs
    def cellOf(c: Column): Column = ((c - pmod(c, lit(eps)))
      .cast("decimal(20,0)") / lit(eps)).cast("long")
    val p = points.select(col(idCol).as("id"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val probe = p.select(col("id"), col("x"), col("y"),
      cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"))
    val offsets = for { i <- -1 to 1; j <- -1 to 1 }
      yield struct(lit(i.toLong).as("di"), lit(j.toLong).as("dj"))
    val build = probe
      .select(col("id").as("idb"), col("x").as("xb"), col("y").as("yb"),
        explode(array(offsets: _*)).as("o"),
        col("cx").as("bcx"), col("cy").as("bcy"))
      .select(col("idb"), col("xb"), col("yb"),
        (col("bcx") + col("o.di")).as("cx"),
        (col("bcy") + col("o.dj")).as("cy"))
    val d2 = (col("x") - col("xb")) * (col("x") - col("xb")) +
      (col("y") - col("yb")) * (col("y") - col("yb"))
    // no dedup needed: the probe row has ONE cell, the build side's 9
    // neighbor cells are pairwise distinct (at most one offset matches),
    // and the reverse direction is cut by id < idb — each qualifying
    // pair joins exactly once
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id") < col("idb"))
      .filter(d2 <= eps * eps)
      .select(col("id").as("id_a"), col("idb").as("id_b"), d2.as("dist2"))
  }
}
