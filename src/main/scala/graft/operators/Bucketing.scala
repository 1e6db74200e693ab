package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) table layout: the exchange-free join path.
  *
  * A big×big equi join normally pays one shuffle per side, every time it
  * runs. Writing both sides `bucketBy(n, key)` pays that shuffle ONCE at
  * write time: each side lands in n hash(key)-addressed bucket files, and
  * every later join on the bucket key reads matching buckets co-located —
  * Catalyst plans a SortMergeJoin with ZERO Exchange nodes (PlanSpec pins
  * this). At 100 TB this is the difference between re-shuffling the fact
  * table per query and never shuffling it again; it is the batch/table
  * analogue of the reference's keyed-stream partitioning (keyBy before
  * every stateful stage — SURVEY.md §2.4), where the partitioning is
  * likewise established once and reused by everything downstream.
  *
  * The reference has no bucketed storage (Kafka topics are its only
  * keyed layout); this is the Spark-native posture SCALE.md's shuffle
  * budget calls for: "bucketed/pre-partitioned inputs that skip the
  * exchange entirely".
  *
  * Mechanics: `bucketBy` + `sortBy` + `saveAsTable` with an explicit
  * `path` — an EXTERNAL parquet table whose bucket spec lives in the
  * session catalog (no Hive needed). Bucket counts must match across the
  * two sides (or divide evenly with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`); `sortBy` lets
  * the merge join skip or cheapen its sort when buckets are single-file.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table. The one-off
    * write shuffles nothing itself (each task hashes rows to bucket files
    * locally); the cost is one pass over the data. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, numBuckets: Int): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Equi-join two bucketed tables on their bucket keys, forcing the
    * shuffle-merge strategy (a broadcast would also skip the exchange,
    * but then the gate would not be demonstrating the bucketed path —
    * and at real scale neither side fits in a broadcast). With both
    * sides bucketed on their join key at equal counts, the planned
    * SortMergeJoin has no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Drop the catalog entry (the external files are the caller's to
    * sweep — the catalog never owns them). */
  def drop(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    ()
  }
}
