package graft

import org.apache.spark.sql.functions._
import graft.operators.Frequency

/** Heavy hitters: the two-pass Misra-Gries + recount shape must return
  * EXACTLY the keys above N/(capacity+1) with exact counts — the sketch
  * only bounds the candidate set, never the answer. */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  test("misraGries survivors are a superset of keys above n/(capacity+1), " +
      "and never exceed capacity") {
    val rnd = new scala.util.Random(3)
    // adversarial stream: heavy keys scattered through noise, heavy mass
    // arriving both early and late
    val heavy = Seq.fill(400)(1L) ++ Seq.fill(300)(2L)
    val noise = Seq.fill(800)(rnd.nextInt(500).toLong + 10L)
    val stream = rnd.shuffle(noise.take(400)) ++ heavy.take(350) ++
      rnd.shuffle(noise.drop(400)) ++ heavy.drop(350)
    val cap = 4
    val survivors = Frequency.misraGries(stream.iterator, cap).toSet
    assert(survivors.size <= cap)
    val n = stream.size
    val trueHeavy = stream.groupBy(identity).collect {
      case (k, occ) if occ.size.toLong * (cap + 1) > n => k
    }.toSet
    assert(trueHeavy.subsetOf(survivors),
      s"missing ${trueHeavy -- survivors} from $survivors")
  }

  test("heavyHitters == GROUP BY + HAVING truth on skewed data, across " +
      "partitionings") {
    val rnd = new scala.util.Random(17)
    // key 0 ~ 45%, key 1 ~ 22%, long uniform tail
    val rows = Seq.fill(20000) {
      val r = rnd.nextInt(100)
      if (r < 45) 0L else if (r < 67) 1L else rnd.nextInt(5000).toLong + 10L
    }
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("k").repartition(parts)
      val cap = 6
      val got = Frequency.heavyHitters(df, "k", cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val n = rows.size.toLong
      val want = rows.groupBy(identity).collect {
        case (k, occ) if occ.size.toLong * (cap + 1) > n =>
          (k, occ.size.toLong)
      }.toSeq.sorted
      assert(got === want, s"parts=$parts")
    }
  }

  test("heavyHitters threshold is strict (> N/(k+1)), null keys excluded " +
      "from N and from the answer") {
    // 8 rows: key 5 appears 4× (4*2 > 8 false → excluded at cap=1);
    // with cap=3, 4*4 > 8 → included. Nulls must not inflate N.
    val df = Seq[java.lang.Long](5L, 5L, 5L, 5L, 6L, 7L, 8L, 9L, null, null)
      .toDF("k")
    val cap1 = Frequency.heavyHitters(df, "k", 1).collect()
    assert(cap1.isEmpty, cap1.mkString(","))
    val cap3 = Frequency.heavyHitters(df, "k", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cap3.toSeq === Seq((5L, 4L)))
  }

  test("recount aggregation keys on the candidate set, not the raw key " +
      "space (no full-key shuffle)") {
    val df = (1 to 5000).map(_.toLong % 7).toDF("k")
    val plan = Frequency.heavyHitters(df, "k", 3)
      .queryExecution.executedPlan.toString
    // the only wide exchange in the recount is the tiny bucket agg; the
    // raw-key groupBy shape would hash-partition on __k itself
    assert(plan.contains("__bucket") || plan.contains("CASE WHEN"),
      plan.take(1500))
  }

  test("CMS: estimate >= truth for every key, exact when no collision, " +
    "0-capable for absent keys") {
    val rnd = new scala.util.Random(5)
    val data = (1 to 5000).map(_ => rnd.nextInt(300).toLong).toDF("k")
    val (w, d) = (512, 3)
    val cms = Frequency.cmsBuild(data, col("k"), w, d)
    val truth = data.groupBy(col("k")).count().as[(Long, Long)].collect().toMap
    val qs = (0L to 350L).toDF("k") // 300..350 absent
    val est = Frequency.cmsEstimate(cms, qs, col("k"), w, d)
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"key $k: est ${est(k)} < true $c") }
    (300L to 350L).foreach(k => assert(est(k) >= 0))
    // with w >> distinct keys most cells are collision-free: the bulk of
    // estimates should be exact
    val exactHits = truth.count { case (k, c) => est(k) == c }
    assert(exactHits > truth.size * 0.8, s"only $exactHits/${truth.size} exact")
  }

  test("CMS merges cell-wise: sketch(a ++ b) == sketch(a) + sketch(b)") {
    val a = (1 to 500).map(i => (i % 40).toLong).toDF("k")
    val b = (1 to 300).map(i => (i % 25).toLong).toDF("k")
    val (w, d) = (128, 3)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Long, Long)].collect().map { case (r, bk, c) => (r, bk) -> c }.toMap
    val whole = cells(Frequency.cmsBuild(a.unionAll(b), col("k"), w, d))
    val ca = cells(Frequency.cmsBuild(a, col("k"), w, d))
    val cb = cells(Frequency.cmsBuild(b, col("k"), w, d))
    val merged = (ca.keySet ++ cb.keySet).map(k =>
      k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
    assert(whole === merged)
  }
}
