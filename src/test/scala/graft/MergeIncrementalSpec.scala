package graft

import graft.operators.{Incremental, Merge}
import org.apache.spark.sql.functions._

class MergeIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val root = if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
    else System.getProperty("java.io.tmpdir")
    s"$root/graft-spec-$tag-${System.nanoTime()}"
  }

  private def rm(p: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(go)
      f.delete(); ()
    }
    go(new java.io.File(p))
  }

  private def store(rows: (Long, String, Long)*) =
    rows.toDF("k", "v", "bucket")

  test("Merge.into applies update, delete, insert; untouched partition keeps its files") {
    val path = tmpDir("merge")
    try {
      store((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L), (4L, "d", 1L))
        .write.partitionBy("bucket").parquet(path)
      def filesOf(bucket: Int): Set[(String, Long)] =
        Option(new java.io.File(s"$path/bucket=$bucket").listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => f.getName -> f.length()).toSet
      val b1Before = filesOf(1)
      val source = Seq(
        (1L, "a2", 0L, "U"), // matched update
        (2L, "",   0L, "D"), // matched delete
        (9L, "z",  0L, "I")) // not matched insert
        .toDF("k", "v", "bucket", "op")
      val affected = Merge.into(spark, path, "bucket", "k", source)
      assert(affected.map(String.valueOf).toSet === Set("0"))
      val after = spark.read.parquet(path)
        .select(col("k"), col("v")).as[(Long, String)].collect().toSet
      assert(after === Set((1L, "a2"), (9L, "z"), (3L, "c"), (4L, "d")))
      assert(filesOf(1) === b1Before, "partition outside the source churned")
    } finally rm(path)
  }

  test("a delete-only merge that empties a partition sweeps its directory") {
    val path = tmpDir("merge-empty")
    try {
      store((1L, "a", 0L), (2L, "b", 1L)).write.partitionBy("bucket").parquet(path)
      Merge.into(spark, path, "bucket", "k",
        Seq((2L, "", 1L, "D")).toDF("k", "v", "bucket", "op"))
      assert(!new java.io.File(s"$path/bucket=1").exists(),
        "emptied partition directory must be swept")
      val left = spark.read.parquet(path).select(col("k")).as[Long].collect().toSeq
      assert(left === Seq(1L))
    } finally rm(path)
  }

  test("Merge.into rejects a NULL partition value loudly") {
    val path = tmpDir("merge-null")
    try {
      store((1L, "a", 0L)).write.partitionBy("bucket").parquet(path)
      val bad = Seq((2L, "x", "I")).toDF("k", "v", "op")
        .withColumn("bucket", lit(null).cast("bigint"))
      val e = intercept[IllegalArgumentException] {
        Merge.into(spark, path, "bucket", "k", bad)
      }
      assert(e.getMessage.contains("NULL"))
    } finally rm(path)
  }

  private def facts(rows: (String, Double, String)*) =
    rows.toDF("g", "x", "d")

  test("incremental state+merge+finalize equals the from-scratch aggregate") {
    val all = facts(("a", 1.5, "2024-01-01"), ("a", 2.5, "2024-03-01"),
      ("b", 10.0, "2024-02-01"), ("a", 4.0, "2024-02-15"), ("b", 1.0, "2023-12-31"))
    val (h, d) = (all.filter(col("d") < "2024-02-01"),
      all.filter(col("d") >= "2024-02-01"))
    val merged = Incremental.merge(Seq(
      Incremental.state(h, Seq("g"), Seq("x"), Seq("d")),
      Incremental.state(d, Seq("g"), Seq("x"), Seq("d"))), Seq("g"))
    val out = Incremental.finalizeState(merged)
      .select(col("g"), col("cnt"), col("sum_x").cast("double"),
        col("avg_x"), col("min_d"), col("max_d"))
      .as[(String, Long, Double, Double, String, String)].collect().toSet
    assert(out === Set(
      ("a", 3L, 8.0, 8.0 / 3, "2024-01-01", "2024-03-01"),
      ("b", 2L, 11.0, 5.5, "2023-12-31", "2024-02-01")))
  }

  test("state merge is associative: ((s1+s2)+s3) == (s1+(s2+s3))") {
    val s = Seq(
      facts(("a", 1.0, "2024-01-01"), ("b", 2.0, "2024-01-02")),
      facts(("a", 3.0, "2024-01-03")),
      facts(("b", 4.0, "2024-01-04"), ("c", 5.0, "2024-01-05")))
      .map(f => Incremental.state(f, Seq("g"), Seq("x"), Seq("d")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      Incremental.finalizeState(df)
        .select(col("g"), col("cnt"), col("sum_x").cast("double"),
          col("min_d"), col("max_d"))
        .as[(String, Long, Double, String, String)].collect().toSet
    val left = Incremental.merge(
      Seq(Incremental.merge(Seq(s(0), s(1)), Seq("g")), s(2)), Seq("g"))
    val right = Incremental.merge(
      Seq(s(0), Incremental.merge(Seq(s(1), s(2)), Seq("g"))), Seq("g"))
    assert(rows(left) === rows(right))
  }

  test("the refresh plan reads the state store and delta only — never history") {
    val histPath = tmpDir("incr-hist")
    val statePath = tmpDir("incr-state")
    try {
      facts(("a", 1.0, "2024-01-01"), ("b", 2.0, "2024-01-02"))
        .write.parquet(histPath)
      val hist = spark.read.parquet(histPath)
      Incremental.state(hist, Seq("g"), Seq("x"), Seq("d"))
        .write.parquet(statePath)
      val delta = facts(("a", 3.0, "2024-01-03"))
      val refresh = Incremental.merge(Seq(
        spark.read.parquet(statePath),
        Incremental.state(delta, Seq("g"), Seq("x"), Seq("d"))), Seq("g"))
      val inputs = refresh.inputFiles.toSeq
      assert(inputs.exists(_.contains(new java.io.File(statePath).getName)))
      assert(!inputs.exists(_.contains(new java.io.File(histPath).getName)),
        "refresh must not rescan history")
    } finally { rm(histPath); rm(statePath) }
  }
}
