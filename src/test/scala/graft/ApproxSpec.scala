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

  test("percentilesApproxChecked: verdict 1 everywhere at accuracy 1000; " +
    "exact columns match the exact gate; the bracket is non-vacuous") {
    val l = Tables.lineitem(spark, dir)
    val out = graft.operators.Stats.percentilesApproxChecked(l).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("within_bound") == 1))
    // the exact columns agree with the plain exact gate query
    val exact = l.groupBy(col("l_returnflag"))
      .agg(graft.functions.TextFns.truncate6(
        expr("percentile(l_extendedprice, 0.5)")).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach(r => assert(r.getAs[Double]("p50") === exact(r.getString(0))))
    // the bracket does real work: on 10k distinct uniform values the
    // p±3/1000 window spans only ~60 of them, so verdict=1 certifies the
    // estimate to ~0.6% of the value range — not a vacuous bound
    import spark.implicits._
    val uni = (1 to 10000).map(_.toDouble)
      .toDF("l_extendedprice").withColumn("l_returnflag", lit("X"))
    val tight = graft.operators.Stats.percentilesApproxChecked(uni).collect()
    assert(tight.length == 1 && tight.head.getAs[Int]("within_bound") == 1)
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
