package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Query-level observability — the production surface for "did this
  * pipeline actually process what we think it did" without a second
  * scan. `observe` attaches named aggregates that are computed WITH the
  * query (zero extra passes, zero extra shuffles) and surfaced through
  * listener callbacks: the batch path via `Observation`, the streaming
  * path via `StreamingQueryListener` progress events. At 100 TB an
  * unobserved pipeline is undebuggable — row-count/invariant drift must
  * come from the run itself, not a follow-up audit query. */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("batch observe: metrics ride the query — no second scan, exact counts") {
    val obs = new org.apache.spark.sql.Observation("q1_metrics")
    val df = Tables.lineitem(spark, dir)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("ct"))
    val out = df.collect()
    val metrics = obs.get
    // the observed row count equals an independent count of the input
    assert(metrics("rows_in") === Tables.lineitem(spark, dir).count())
    // data-quality invariant: no non-positive quantities in the fixture
    assert(metrics("bad_qty") === 0L)
    assert(out.map(_.getLong(1)).sum === metrics("rows_in"))
  }

  test("streaming observe: per-batch metrics arrive via the listener") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val om = e.progress.observedMetrics
        if (om.containsKey("stream_metrics"))
          seen.add(om.get("stream_metrics").getAs[Long]("rows_in"))
      }
    }
    spark.streams.addListener(listener)
    try {
      val out = graft.streaming.StreamRunner.collect(
        graft.streaming.Sources.eventsStream(spark, dir)
          .observe("stream_metrics", count(lit(1)).as("rows_in"))
          .select(col("event_id"), col("user_id")))
      val total = Tables.events(spark, dir).count()
      assert(out.count() === total)
      // listener events are delivered asynchronously post-termination
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (seen.asScala.sum < total && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(seen.asScala.sum === total,
        s"observed ${seen.asScala.toList} vs input $total")
    } finally spark.streams.removeListener(listener)
  }

  private implicit class QAsScala[A](q: java.util.Queue[A]) {
    def asScala: Iterable[A] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toList
    }
  }
}
