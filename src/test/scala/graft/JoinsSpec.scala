package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain-join result on skewed keys") {
    // 10k rows all sharing one hot key + a long tail
    val left = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong + 1, i.toLong))).toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"dim_$i")).toDF("k", "rv")
    val plain = left.join(right, "k")
    val salted = Joins.saltedJoin(left, right, "k", buckets = 8)
    assert(salted.count() === plain.count())
    val a = salted.select("k", "lv", "rv").collect().map(_.toString).sorted
    val b = plain.select("k", "lv", "rv").collect().map(_.toString).sorted
    assert(a === b)
  }

  test("salt actually spreads a hot key across buckets") {
    val left = (1 to 1000).map(_ => (1L, "x")).toDF("k", "v")
    val salts = left.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(8)).cast("int"))
      .select(count_distinct(col("__salt"))).as[Long].head()
    assert(salts > 1) // the hot key no longer lands on a single reducer
  }

  test("bloomPreFilteredJoin == plain join; the bloom actually drops non-matching rows") {
    val fact = (1L to 20000L).map(i => (i, i * 2)).toDF("fk", "v")
    // selective build: 1% of the fact keys
    val build = (1L to 200L).map(i => (i * 100, s"b$i")).toDF("bk", "name")
    val plain = fact.join(build, col("fk") === col("bk"))
    val bloomed = Joins.bloomPreFilteredJoin(fact, build, "fk", "bk",
      expectedKeys = 1000L)
    assert(bloomed.select("fk", "v", "name").collect().map(_.toString).sorted
      === plain.select("fk", "v", "name").collect().map(_.toString).sorted)
    // the pre-filter alone keeps ~matches + fp: far fewer than the fact
    val bf = build.stat.bloomFilter("bk", 1000L, 0.01)
    val mc = udf((k: Long) => bf.mightContainLong(k))
    val kept = fact.filter(mc(col("fk"))).count()
    assert(kept < 2000L, s"bloom kept $kept of 20000 — no selectivity")
    assert(kept >= 200L) // never drops a true match
  }

  test("bloomPreFilteredJoin handles string keys") {
    val fact = (1 to 5000).map(i => (s"k$i", i)).toDF("fk", "v")
    val build = (1 to 50).map(i => (s"k${i * 100}", i)).toDF("bk", "b")
    val plain = fact.join(build, col("fk") === col("bk"))
    val bloomed = Joins.bloomPreFilteredJoin(fact, build, "fk", "bk",
      expectedKeys = 100L)
    assert(bloomed.select("fk", "v", "b").collect().map(_.toString).sorted
      === plain.select("fk", "v", "b").collect().map(_.toString).sorted)
  }

  test("bloomPreFilteredJoin routes narrow integral keys through the long " +
    "hash space (no silent string-cast false-negatives)") {
    // int keys: before the type fix these fell into the string UDF path,
    // probing string hashes against a long-hashed filter -> empty join
    val fact = (1 to 20000).map(i => (i, i * 2L)).toDF("fk", "v")
    val build = (1 to 200).map(i => (i * 100, s"b$i")).toDF("bk", "name")
    val plain = fact.join(build, col("fk") === col("bk"))
    val bloomed = Joins.bloomPreFilteredJoin(fact, build, "fk", "bk",
      expectedKeys = 1000L)
    assert(plain.count() === 200L)
    assert(bloomed.select("fk", "v", "name").collect().map(_.toString).sorted
      === plain.select("fk", "v", "name").collect().map(_.toString).sorted)
  }

  test("bloomPreFilteredJoin throws on unsupported or mismatched key classes") {
    val longFact = Seq((1L, 1)).toDF("fk", "v")
    val strBuild = Seq(("1", 1)).toDF("bk", "b")
    val dblFact = Seq((1.0, 1)).toDF("fk", "v")
    val longBuild = Seq((1L, 1)).toDF("bk", "b")
    intercept[IllegalArgumentException] {
      Joins.bloomPreFilteredJoin(longFact, strBuild, "fk", "bk")
    }
    intercept[IllegalArgumentException] {
      Joins.bloomPreFilteredJoin(dblFact, longBuild, "fk", "bk")
    }
  }

  test("bloom pre-filter is a native codegen'd expression, not a UDF barrier") {
    // spark.range, not toDF: a LocalRelation fact side would let
    // ConvertToLocalRelation evaluate the (deterministic) probe at
    // optimization time and drop the Filter from the physical plan
    val fact = spark.range(1L, 1001L)
      .select(col("id").as("fk"), col("id").as("v"))
    val build = (1L to 10L).map(i => (i * 50, i)).toDF("bk", "b")
    val df = Joins.bloomPreFilteredJoin(fact, build, "fk", "bk",
      expectedKeys = 100L)
    df.collect() // materialize so AQE finalizes its codegen'd stages
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_might_contain"),
      s"native bloom probe missing from plan:\n$plan")
    // the Filter carrying the probe must sit INSIDE a whole-stage-codegen
    // span (simpleString prefixes codegen'd nodes with "*(n)"); inspect
    // only AQE's Final Plan — the Initial Plan echo is never annotated
    val finalPlan = plan.split("== Initial Plan ==").head
    val filterLines = finalPlan.linesIterator
      .filter(_.contains("graft_might_contain")).toSeq
    assert(filterLines.nonEmpty && filterLines.forall(_.contains("*(")),
      s"bloom probe filter not codegen'd:\n$plan")
    assert(!plan.contains("UDF"), s"UDF survived in plan:\n$plan")
  }

  test("saltedJoinTargeted == plain join; only hot-key right rows replicate") {
    // key 1: 10k rows (hot); keys 2..101: 10 rows each (cold tail)
    val left = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (for (k <- 2 to 101; i <- 1 to 10) yield (k.toLong, i.toLong)))
      .toDF("k", "lv")
    val right = (1 to 120).map(i => (i.toLong, s"dim_$i")).toDF("k", "rv")
    val plain = left.join(right, "k")
    // sampleFraction=1.0 -> exact histogram, deterministic hot set
    val out = Joins.saltedJoinTargeted(left, right, "k", buckets = 8,
      sampleFraction = 1.0, hotMinSampleCount = 1000L)
    assert(out.select("k", "lv", "rv").collect().map(_.toString).sorted
      === plain.select("k", "lv", "rv").collect().map(_.toString).sorted)

    val hot = Joins.hotKeys(left, "k", 1.0, 1000L, 100)
    assert(hot.toSeq === Seq(1L)) // only the hot key qualifies
    // replication is confined to the hot key: the salted right leg holds
    // |right ∩ hot| x buckets rows, NOT |right| x buckets like saltedJoin
    val (_, hotRight) = Joins.saltedLegs(left, right, "k", 8, hot)
    assert(hotRight.count() === 8L)
    // and the hot left leg actually spreads over several salt buckets
    val (hotLeft, _) = Joins.saltedLegs(left, right, "k", 8, hot)
    assert(hotLeft.select(count_distinct(col("__salt"))).as[Long].head() > 1)
  }

  test("saltedJoinTargeted with no hot keys degrades to the plain join " +
    "(and null keys match nothing either way)") {
    val left = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "n")).toDF("k", "lv")
    val right = Seq((Some(1L), "r1"), (None, "rn")).toDF("k", "rv")
    val plain = left.join(right, "k")
    val out = Joins.saltedJoinTargeted(left, right, "k", buckets = 4,
      sampleFraction = 1.0, hotMinSampleCount = 100L)
    assert(out.collect().map(_.toString).sorted
      === plain.collect().map(_.toString).sorted)
    // with a threshold of 1 every key is hot: still the plain-join result
    val allHot = Joins.saltedJoinTargeted(left, right, "k", buckets = 4,
      sampleFraction = 1.0, hotMinSampleCount = 1L)
    assert(allHot.collect().map(_.toString).sorted
      === plain.collect().map(_.toString).sorted)
  }

  test("hotKeys throws when the threshold flags more than maxHotKeys") {
    val left = (1 to 100).flatMap(k => Seq.fill(5)((k.toLong, k))).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Joins.hotKeys(left, "k", 1.0, 1L, maxHotKeys = 10)
    }
  }

  test("enrich keeps unmatched fact rows (left join, not the reference's drop)") {
    val facts = Seq((1L, 10.0), (2L, 20.0)).toDF("dim_id", "amount")
    val dim = Seq((1L, "known")).toDF("dim_id", "name")
    val out = Joins.enrich(facts, Seq((dim, Seq("dim_id"))))
    assert(out.count() === 2)
    assert(out.filter(col("name").isNull).count() === 1)
  }

  test("asOfJoin: latest right at-or-before, strictly-before, and no-match null") {
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 100L, "r@100"), (1L, 150L, "r@150"), (1L, 300L, "r@300"))
      .toDF("rk", "rt", "rv")

    val incl = Joins.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .select(col("lv"), col("asof.rv")).as[(String, String)].collect().toMap
    assert(incl === Map("l1" -> "r@100", "l2" -> "r@150", "l3" -> null))

    val strict = Joins.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("rv"),
      strict = true)
      .select(col("lv"), col("asof.rv")).as[(String, String)].collect().toMap
    assert(strict === Map("l1" -> null, "l2" -> "r@150", "l3" -> null))
  }

  test("asOfJoin: rights tying on (key, ts) resolve deterministically (struct max)") {
    val left = Seq((1L, 10L, "l")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "a"), (1L, 5L, "z"), (1L, 5L, "m")).toDF("rk", "rt", "rv")
    val out = Joins.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .select(col("asof.rv")).as[String].collect()
    assert(out.toSeq === Seq("z"))
  }

  test("asOfJoin: null keys/timestamps never match (SQL join semantics)") {
    val left = Seq((Some(1L), Some(100L), "a"), (None, Some(100L), "nullkey"),
      (Some(1L), None, "nullts")).toDF("k", "t", "lv")
    val right = Seq((Some(1L), Some(50L), "r"), (None, Some(10L), "rnull"))
      .toDF("rk", "rt", "rv")
    val out = Joins.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .select(col("lv"), col("asof.rv")).as[(String, String)].collect().toMap
    assert(out === Map("a" -> "r", "nullkey" -> null, "nullts" -> null))
  }

  test("asOfJoin matches the equi-join+max_by formulation on random data") {
    val rnd = new scala.util.Random(11)
    val left = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "t", "lid")
    val right = Seq.fill(200)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"p$k-$t") }.toDF("rk", "rt", "rv")
    val fast = Joins.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("rt", "rv"))
      .select(col("lid"), col("asof.rv").as("rv"))
    val naive = left.join(right, col("k") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy(col("lid"))
      .agg(max_by(col("rv"), struct(col("rt"), col("rv"))).as("rv"))
    val a = fast.collect().map(_.toString).sorted
    val b = naive.collect().map(_.toString).sorted
    assert(a === b)
  }

  test("rangeJoinBinned == naive containment join, incl. negatives and " +
      "boundary points, each match emitted exactly once") {
    val rnd = new scala.util.Random(7)
    val pts = (Seq(-25L, -20L, -1L, 0L, 19L, 20L, 39L) ++
      Seq.fill(400)(rnd.nextInt(2000).toLong - 1000L))
      .zipWithIndex.map { case (p, i) => (p, i.toLong) }.toDF("p", "pid")
    val rng = (Seq((-20L, 0L), (0L, 20L), (20L, 20L), (5L, 4L)) ++
      Seq.fill(150)((rnd.nextInt(2000).toLong - 1000L, rnd.nextInt(60).toLong)))
      .zipWithIndex.map { case ((lo, span), i) => (lo, lo + span, i.toLong) }
      .toDF("lo", "hi", "rid")
    val fast = Joins.rangeJoinBinned(pts, rng, "p", "lo", "hi", binWidth = 16L)
      .select(col("pid"), col("rid"))
    val naive = pts.join(rng, col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("pid"), col("rid"))
    val a = fast.collect().map(_.toString).sorted
    val b = naive.collect().map(_.toString).sorted
    assert(a === b)
    assert(a.length === a.distinct.length)
  }

  test("rangeJoinBinned plans an equi hash/merge join on the bin key, " +
      "never a nested loop or cartesian") {
    val pts = (1 to 500).map(i => i.toLong * 3).toDF("p")
    val rng = (1 to 200).map(i => (i.toLong * 7, i.toLong * 7 + 10))
      .toDF("lo", "hi")
    val j = Joins.rangeJoinBinned(pts, rng, "p", "lo", "hi", binWidth = 10L)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(j.count() > 0)
  }

  test("rangeJoinBinned raises in-plan on a range wider than maxBinsPerRange") {
    val pts = Seq(5L).toDF("p")
    val rng = Seq((0L, 1000000L)).toDF("lo", "hi")
    val e = intercept[Exception] {
      Joins.rangeJoinBinned(pts, rng, "p", "lo", "hi", binWidth = 10L,
        maxBinsPerRange = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxBinsPerRange")), e.toString)
  }

  test("null-safe equi-join (<=>): stays a hash join (no nested loop), " +
    "and null keys MATCH instead of dropping (j13's plan claim)") {
    val l = spark.range(100).select(
      when(col("id") % 10 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 7).as("k"), col("id"))
    val r = spark.range(50).select(
      when(col("id") % 5 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 7).as("k"), col("id").as("rid"))
    val j = l.join(r, l("k") <=> r("k"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    // 10 null-keyed lefts x 10 null-keyed rights: one more key value
    assert(j.filter(l("k").isNull).count() === 100L)
    // and a plain equi-join drops that arm entirely
    assert(l.join(r, l("k") === r("k")).filter(l("k").isNull).count() === 0L)
  }

  test("temporal (validity-interval) join: the equi key drives a hash " +
    "join, the interval is residual — no nested loop (j14's plan claim)") {
    val dim = Seq((1L, 10L, null.asInstanceOf[java.lang.Long], "v1"),
      (2L, 0L, 50L.asInstanceOf[java.lang.Long], "v1"),
      (2L, 50L, null.asInstanceOf[java.lang.Long], "v2"))
      .toDF("k", "from_s", "to_s", "ver")
    val facts = Seq((1L, 20L), (2L, 40L), (2L, 60L), (3L, 5L))
      .toDF("k", "ft")
    val j = facts.join(dim,
      facts("k") === dim("k") && col("ft") >= col("from_s") &&
        (col("to_s").isNull || col("ft") < col("to_s")))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    // time-correct picks: fact@40 sees v1, fact@60 sees v2, unkeyed drops
    val got = j.select(facts("k"), col("ft"), col("ver"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((1L, 20L, "v1"), (2L, 40L, "v1"), (2L, 60L, "v2")))
  }

  test("fuzzy edit-distance-1 join: substitutions, inserts, deletes in; " +
    "transpositions and identicals out") {
    val words = Seq("ab", "abc", "abd", "abcd", "ba").toDF("w")
    val got = graft.operators.Fuzzy.editDistance1Pairs(words, "w")
      .as[(String, String)].collect().toSet
    assert(got === Set(("ab", "abc"), ("ab", "abd"), ("abc", "abd"),
      ("abc", "abcd"), ("abcd", "abd"))) // lexicographic: "abcd" < "abd"
  }

  test("fuzzy join equals the brute-force cross product on random words") {
    val rnd = new scala.util.Random(11)
    val words = (1 to 300)
      .map(_ => (1 to (3 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      .distinct.toDF("w")
    val fast = graft.operators.Fuzzy.editDistance1Pairs(words, "w")
      .as[(String, String)].collect().toSet
    val brute = words.as("a").crossJoin(words.as("b"))
      .filter(col("a.w") < col("b.w") &&
        levenshtein(col("a.w"), col("b.w")) === 1)
      .select(col("a.w"), col("b.w")).as[(String, String)].collect().toSet
    assert(fast === brute)
    assert(fast.nonEmpty) // the fixture must exercise the match arm
    // the blocked join is equi on the variant — never a cartesian
    val p = graft.operators.Fuzzy.editDistance1Pairs(words, "w")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(800))
  }
}
