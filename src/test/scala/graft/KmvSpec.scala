package graft

import graft.functions.Kmv
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64
  private def kmv = udaf(Kmv.agg(k), Encoders.scalaLong)

  private def hashed(ids: Seq[Long]) =
    ids.toDF("id").select(Kmv.hashKey(col("id").cast("string")).as("hk"))

  test("sketch is the bottom-k distinct hashes, stable under repartition") {
    val ids = (1L to 5000L) ++ (1L to 5000L) // duplicates must not matter
    val brute = hashed(ids.distinct).distinct()
      .orderBy(col("hk")).limit(k).as[Long].collect().toSeq
    val viaAgg = hashed(ids).agg(kmv(col("hk"))).as[Seq[Long]].head()
    val viaAggRepart = hashed(ids).repartition(17)
      .agg(kmv(col("hk"))).as[Seq[Long]].head()
    assert(viaAgg === brute)
    assert(viaAggRepart === brute)
  }

  test("below k the sketch IS the set and the estimate is exact") {
    val ids = (1L to 40L)
    val df = hashed(ids).agg(kmv(col("hk")).as("sk"))
    val (sz, est) = df.select(size(col("sk")), Kmv.estimate(col("sk"), k))
      .as[(Int, Double)].head()
    assert(sz === 40)
    assert(est === 40.0)
  }

  test("at scale the (k-1)/theta estimate lands within the 3-sigma band") {
    val n = 50000L
    val df = hashed(1L to n).agg(kmv(col("hk")).as("sk"))
    val est = df.select(Kmv.estimate(col("sk"), k)).as[Double].head()
    val relErr = math.abs(est - n) / n.toDouble
    assert(relErr < 3.0 / math.sqrt(k - 2.0), s"est=$est relErr=$relErr")
  }

  test("union sketch equals the sketch of the union (closure)") {
    val a = 1L to 3000L
    val b = 2000L to 6000L
    val ska = hashed(a).agg(kmv(col("hk")).as("sk")).as[Seq[Long]].head()
    val skb = hashed(b).agg(kmv(col("hk")).as("sk")).as[Seq[Long]].head()
    val direct = hashed((a ++ b).distinct).agg(kmv(col("hk")).as("sk"))
      .as[Seq[Long]].head()
    val viaUnion = Seq((ska, skb)).toDF("a", "b")
      .select(Kmv.unionSketch(col("a"), col("b"), k)).as[Seq[Long]].head()
    assert(viaUnion === direct)
  }

  test("intersection estimate is exact when both sets are below k") {
    val a = 1L to 30L
    val b = 20L to 50L // true intersection = 11
    val ska = hashed(a).agg(kmv(col("hk")).as("sk")).as[Seq[Long]].head()
    val skb = hashed(b).agg(kmv(col("hk")).as("sk")).as[Seq[Long]].head()
    val est = Seq((ska, skb)).toDF("a", "b")
      .select(Kmv.intersectEstimate(col("a"), col("b"), k)).as[Double].head()
    // (match/|U|)·|U| — one divide-multiply round trip, so allow 1 ulp-ish
    assert(math.abs(est - 11.0) < 1e-9, s"est=$est")
  }
}
