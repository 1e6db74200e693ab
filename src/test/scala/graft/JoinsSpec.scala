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

  test("enrich keeps unmatched fact rows (left join, not the reference's drop)") {
    val facts = Seq((1L, 10.0), (2L, 20.0)).toDF("dim_id", "amount")
    val dim = Seq((1L, "known")).toDF("dim_id", "name")
    val out = Joins.enrich(facts, Seq((dim, Seq("dim_id"))))
    assert(out.count() === 2)
    assert(out.filter(col("name").isNull).count() === 1)
  }
}
