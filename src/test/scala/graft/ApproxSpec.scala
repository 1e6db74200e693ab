package graft

import org.apache.spark.sql.functions._

/** Error-bound pins for the documented 100 TB approximation paths: the
  * switch from exact to sketch must be a bounded-error trade, and these
  * tests are the bound. */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL) lands within 5% of exact per group") {
    val e = Tables.events(spark, dir)
    val both = e.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getAs[String]("event_type")}: exact=$exact approx=$approx")
    }
  }

  test("percentile_approx (t-digest) lands within 1% of exact interpolation") {
    val l = Tables.lineitem(spark, dir)
    val r = l.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx")).head()
    val exact = r.getAs[Double]("exact")
    val approx = r.getAs[Double]("approx")
    assert(math.abs(approx - exact) / exact < 0.01, s"exact=$exact approx=$approx")
  }

  test("productStatsApprox mirrors productStats on everything but the distinct") {
    val e = Tables.events(spark, dir)
    // per-window comparison: window amounts are exact (decimal-summed);
    // a cross-window double re-sum would be order-dependent by design
    val exact = graft.operators.Stats.productStats(e)
      .select(col("stt"), col("event_type"), col("ct"), col("amount"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val approx = graft.operators.Stats.productStatsApprox(e)
      .select(col("stt"), col("event_type"), col("ct"), col("amount"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(exact === approx)
  }
}
