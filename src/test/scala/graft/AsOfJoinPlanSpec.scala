package graft

import graft.operators.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The custom physical as-of join (graft.plans.AsOfJoinExec): semantics
  * against hand-computed rows and the composed `Joins.asOfJoin`, plus the
  * plan shape that makes it the 100 TB tier (one merge exec, SMJ-style
  * shuffles, no generic join fallback, no cartesian). */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String = {
    df.collect() // resolve AQE before reading the final plan
    val full = df.queryExecution.executedPlan.toString
    // AQE prints "== Final Plan ==" then "== Initial Plan ==": keep the
    // final section only, else every exchange is counted twice.
    full.split("== Initial Plan ==").head
  }

  test("asOfJoinExec: latest right at-or-before; strict excludes equal ts") {
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 100L, "r@100"), (1L, 150L, "r@150"), (1L, 300L, "r@300"))
      .toDF("rk", "rt", "rv")

    val incl = Joins.asOfJoinExec(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("lv"), col("rv")).as[(String, String)].collect().toMap
    assert(incl === Map("l1" -> "r@100", "l2" -> "r@150", "l3" -> null))

    val strict = Joins.asOfJoinExec(left, right, Seq("k" -> "rk"), "t", "rt",
      strict = true)
      .select(col("lv"), col("rv")).as[(String, String)].collect().toMap
    assert(strict === Map("l1" -> null, "l2" -> "r@150", "l3" -> null))
  }

  test("asOfJoinExec: inner join drops non-matching lefts") {
    val left = Seq((1L, 100L, "a"), (2L, 100L, "b")).toDF("k", "t", "lv")
    val right = Seq((1L, 50L, "r")).toDF("rk", "rt", "rv")
    val out = Joins.asOfJoinExec(left, right, Seq("k" -> "rk"), "t", "rt",
      joinType = "inner")
      .select(col("lv"), col("rv")).as[(String, String)].collect().toMap
    assert(out === Map("a" -> "r"))
  }

  test("asOfJoinExec: tolerance bounds the lookback window") {
    val left = Seq((1L, 100L, "near"), (1L, 500L, "far")).toDF("k", "t", "lv")
    val right = Seq((1L, 90L, "r@90")).toDF("rk", "rt", "rv")
    val out = Joins.asOfJoinExec(left, right, Seq("k" -> "rk"), "t", "rt",
      tolerance = Some(50L))
      .select(col("lv"), col("rv")).as[(String, String)].collect().toMap
    // near: 100-90=10 <= 50 matches; far: 500-90=410 > 50 nulls out
    assert(out === Map("near" -> "r@90", "far" -> null))
  }

  test("asOfJoinExec: null keys and null times never match; null-time " +
      "rights are consumed without becoming the candidate") {
    val left = Seq((Some(1L), Some(100L), "a"), (None, Some(100L), "nullkey"),
      (Some(1L), None, "nullts")).toDF("k", "t", "lv")
    val right = Seq((Some(1L), Some(50L), "r"), (Some(1L), None, "rnullts"),
      (None, Some(10L), "rnullkey")).toDF("rk", "rt", "rv")
    val out = Joins.asOfJoinExec(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("lv"), col("rv")).as[(String, String)].collect().toMap
    assert(out === Map("a" -> "r", "nullkey" -> null, "nullts" -> null))
  }

  test("asOfJoinExec: multi-key equi-conjuncts partition the match space") {
    val left = Seq((1L, "x", 100L, "l1"), (1L, "y", 100L, "l2"))
      .toDF("k1", "k2", "t", "lv")
    val right = Seq((1L, "x", 50L, "rx"), (1L, "y", 60L, "ry"))
      .toDF("rk1", "rk2", "rt", "rv")
    val out = Joins.asOfJoinExec(left, right,
      Seq("k1" -> "rk1", "k2" -> "rk2"), "t", "rt")
      .select(col("lv"), col("rv")).as[(String, String)].collect().toMap
    assert(out === Map("l1" -> "rx", "l2" -> "ry"))
  }

  test("asOfJoinExec == composed asOfJoin on random data with a unique " +
      "(key, ts) right side, inclusive and strict") {
    val rnd = new scala.util.Random(13)
    val left = Seq.fill(500)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "t", "lid")
    val right = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"p$k-$t") }.toDF("rk", "rt", "rv")
    for (strict <- Seq(false, true)) {
      val exec = Joins.asOfJoinExec(left, right, Seq("k" -> "rk"), "t", "rt",
        strict = strict)
        .select(col("lid"), col("rv"))
      val composed = Joins.asOfJoin(left, right, "k", "rk", "t", "rt",
        Seq("rv"), strict = strict)
        .select(col("lid"), col("asof.rv").as("rv"))
      val a = exec.collect().map(_.toString).sorted
      val b = composed.collect().map(_.toString).sorted
      assert(a === b, s"strict=$strict")
    }
  }

  test("plan shape: AsOfJoinExec node, no generic join fallback, no " +
      "cartesian; two key shuffles at most") {
    val left = (1 to 2000).map(i => ((i % 7).toLong, i.toLong)).toDF("k", "t")
    val right = (1 to 1000).map(i => ((i % 7).toLong, (i * 2).toLong, s"v$i"))
      .toDF("rk", "rt", "rv")
    val df = Joins.asOfJoinExec(left, right, Seq("k" -> "rk"), "t", "rt")
    val p = planOf(df)
    assert(p.contains("AsOfJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(1200))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"expected <=2 key shuffles, got $shuffles\n${p.take(2000)}")
  }

  test("pre-partitioned inputs skip the exchange entirely (the bucketed-" +
      "layout path at scale)") {
    val left = (1 to 2000).map(i => ((i % 7).toLong, i.toLong)).toDF("k", "t")
      .repartition(4, col("k"))
    val right = (1 to 1000).map(i => ((i % 7).toLong, (i * 2).toLong, s"v$i"))
      .toDF("rk", "rt", "rv").repartition(4, col("rk"))
    val df = Joins.asOfJoinExec(left, right, Seq("k" -> "rk"), "t", "rt")
    val p = planOf(df)
    // the only exchanges are the explicit repartitions themselves — the
    // as-of node added none (its required distribution is already met)
    assert(!p.contains("ENSURE_REQUIREMENTS"), p.take(2000))
    assert(p.contains("AsOfJoin"), p.take(1200))
  }

  test("the marker fails loudly if it ever reaches execution (strategy " +
      "declines: non-equi extra conjunct)") {
    val left = Seq((1L, 100L, 5L)).toDF("k", "t", "lv")
    val right = Seq((1L, 50L, 1L)).toDF("rk", "rt", "rv")
    graft.expressions.GraftExtensions.ensureRegistered(spark)
    val cond = left("k") === right("rk") &&
      left("lv") > right("rv") && // non-equi conjunct: strategy declines
      call_function("graft_asof_on", left("t"), right("rt"), lit(false), lit(null))
    val ex = intercept[Exception] {
      left.join(right, cond, "left").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("graft_asof_on")), ex.toString)
  }

  test("pure-SQL surface: graft_asof_on in a JOIN ... ON clause plans " +
      "into AsOfJoinExec") {
    graft.expressions.GraftExtensions.ensureRegistered(spark)
    Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t", "lv").createOrReplaceTempView("asof_l")
    Seq((1L, 100L, "r@100"), (1L, 150L, "r@150"), (1L, 300L, "r@300"))
      .toDF("rk", "rt", "rv").createOrReplaceTempView("asof_r")
    val df = spark.sql(
      """SELECT lv, rv FROM asof_l LEFT JOIN asof_r
        |ON k = rk AND graft_asof_on(t, rt, false, NULL)""".stripMargin)
    val out = df.as[(String, String)].collect().toMap
    assert(out === Map("l1" -> "r@100", "l2" -> "r@150", "l3" -> null))
    assert(planOf(df).contains("AsOfJoin"))
    spark.catalog.dropTempView("asof_l")
    spark.catalog.dropTempView("asof_r")
  }

  test("date-typed time columns work, with tolerance in days") {
    val left = Seq(("2021-08-10", 1L), ("2021-09-30", 2L)).toDF("d", "id")
      .select(col("d").cast("date").as("d"), col("id"))
    val right = Seq(("2021-08-01", "early")).toDF("rd", "tag")
      .select(col("rd").cast("date").as("rd"), col("tag"))
      .withColumn("rk", lit(0L))
    val l = left.withColumn("k", lit(0L))
    val out = Joins.asOfJoinExec(l, right, Seq("k" -> "rk"), "d", "rd",
      tolerance = Some(30L)) // days: DateType is int-days internally
      .select(col("id"), col("tag")).as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "early", 2L -> null))
  }
}
