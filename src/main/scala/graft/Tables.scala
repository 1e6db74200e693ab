package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog over the driver-provided parquet star schema (TESTDATA.md).
  *
  * Every accessor is a plain parquet scan so Catalyst keeps full pushdown:
  * filters and column pruning reach the scan (`PushedFilters`/`ReadSchema`
  * in `.explain`). Nothing is cached here — at 100 TB the tables don't fit,
  * and the scan-time pruning is what makes queries cheap.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every query path enters through here: make sure the native graft_*
    // functions exist even on sessions not built by Sessions.tuned
    graft.expressions.GraftExtensions.ensureRegistered(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS,false) which Spark's
    * parquet reader rejects outright. We read nanos as raw longs
    * (`nanosAsLong`) and floor to microseconds — the same truncation DuckDB
    * applies when casting its TIMESTAMP_NS to TIMESTAMP, so event-time
    * results stay oracle-comparable.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      // integer floor division: double division loses precision above 2^53
      // (epoch-nanos ~1.6e18), which could shift event times by ±1µs
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "documents")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "embeddings")

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
}
