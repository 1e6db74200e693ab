package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** File-maintenance mechanics the k9/orc gates rely on but cannot express
  * through a row oracle: output file COUNTS (the compaction contract) and
  * predicate pushdown reaching the ORC scan (the format is only useful if
  * it prunes like parquet). */
class FileMaintenanceSpec extends SparkSpec {
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

  test("Manifest: per-file envelopes are exact, range planning selects " +
    "only intersecting files, pruned read == full predicate") {
    import graft.operators.Manifest
    val path = tmpDir("manifest")
    try {
      // 4 files with disjoint known key ranges (one range per partition —
      // repartitionByRange is avoided on purpose: explicit placement)
      (0 until 4).foreach { b =>
        spark.range(b * 100, b * 100 + 100)
          .select(col("id").as("k"), (col("id") * 2).as("v"))
          .coalesce(1).write.mode("append").parquet(path)
      }
      val m = Manifest.build(spark, path, "k")
      val rows = m.select("mn", "mx", "rows")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows === (0 until 4).map(b =>
        (b * 100L, b * 100L + 99L, 100L)).toSet)
      // range [150, 249] intersects exactly files 1 and 2
      val files = Manifest.filesForRange(m, 150L, 249L)
      assert(files.size === 2)
      val got = Manifest.prunedRead(spark, path, files, "k", 150L, 249L)
        .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
      assert(got === ((100L, (150L to 249L).map(_ * 2).sum)))
      // a range outside every envelope plans ZERO files and answers
      // with an EMPTY frame of the store's schema — not an exception
      val none = Manifest.filesForRange(m, 5000L, 6000L)
      assert(none.isEmpty)
      val empty = Manifest.prunedRead(spark, path, none, "k", 5000L, 6000L)
      assert(empty.count() === 0L)
      assert(empty.columns.toSet === Set("k", "v"))
    } finally rm(path)
  }

  test("Manifest Bloom tier: zero false negatives on every present key, " +
    "false-positive file reads within the fpp budget, probe-compatible " +
    "with envelope planning") {
    import graft.operators.Manifest
    val path = tmpDir("mbloom")
    try {
      // 8 files of EVEN keys 0..15998 laid out by id%8, so each file's
      // [mn, mx] spans ~the whole range (envelopes cannot prune an
      // equality probe) but every key lives in exactly ONE file (the
      // Bloom should find it); odd keys sit INSIDE every envelope yet in
      // no file — the pure false-positive probe
      spark.range(0, 8000)
        .select((col("id") * 2).as("k"), (col("id") * 3).as("v"),
          pmod(col("id"), lit(8L)).as("b"))
        .repartition(8, col("b")).drop("b")
        .write.mode("overwrite").parquet(path)
      // sizing matters: 8000 rows over >=4 files is up to 2000/file; an
      // undersized sketch (e.g. 1000) silently runs at ~16% fpp instead
      // of 1% — the "size to maxPartitionBytes/rowWidth" scaladoc rule
      val m = Manifest.buildWithBloom(spark, path, "k",
        expectedPerFile = 4000L, fpp = 0.01).localCheckpoint(true)
      // hash partitioning may collapse residue classes; what matters is
      // several files, each key in exactly one of them
      val nFiles = m.count()
      assert(nFiles >= 4L)
      // present keys: planned set contains the true file, pruned read
      // answers exactly (no false negatives — the Bloom guarantee)
      val present = Seq(10L, 1234L, 4320L, 15998L)
      present.foreach { k =>
        val fb = Manifest.filesForPoint(m, k)
        val fe = Manifest.filesForRange(m, k, k)
        assert(fb.nonEmpty && fb.toSet.subsetOf(fe.toSet))
        val got = Manifest.prunedRead(spark, path, fb, "k", k, k)
          .select("k", "v").as[(Long, Long)].collect()
        assert(got === Array((k, k / 2 * 3)), s"key $k")
      }
      // fpp budget: odd keys are inside every envelope but in no file, so
      // every planned file is a pure Bloom false positive; at fpp=1%
      // expect nFiles × 200 probes × 0.01 ≈ 16 hits — allow 5× slack
      val absents = (1L until 400L by 2L)
      val hits = absents.map(k => Manifest.filesForPoint(m, k).size).sum
      assert(hits <= 5 * nFiles * absents.size / 100,
        s"absent-key file hits $hits exceed the fpp budget")
      // and the envelope tier alone reads EVERYTHING for a mid-range
      // point — the degeneration the Bloom column exists to fix
      assert(Manifest.filesForRange(m, 4000L, 4000L).size === nFiles)
    } finally rm(path)
  }

  test("plannedFiles: ceil(bytes/target), floor 1") {
    assert(Compaction.plannedFiles(0L, 100L) === 1)
    assert(Compaction.plannedFiles(1L, 100L) === 1)
    assert(Compaction.plannedFiles(100L, 100L) === 1)
    assert(Compaction.plannedFiles(101L, 100L) === 2)
    assert(Compaction.plannedFiles(1000L, 100L) === 10)
    intercept[IllegalArgumentException](Compaction.plannedFiles(10L, 0L))
  }

  test("compact: sizes output file count from input bytes and preserves " +
    "every row") {
    val frag = tmpDir("frag"); val out = tmpDir("compact")
    try {
      spark.range(0, 10000).select(col("id"), (col("id") * 7).as("v"))
        .repartition(32).write.mode("overwrite").parquet(frag)
      val (bytes, nIn) = Compaction.dataFileStats(spark, frag)
      assert(nIn === 32)
      val n = Compaction.compact(spark, frag, out, targetBytes = bytes / 4)
      val (_, nOut) = Compaction.dataFileStats(spark, out)
      assert(nOut === n, s"planned $n files, wrote $nOut")
      assert(n < nIn, s"compaction must reduce the file count ($n vs $nIn)")
      // byte-exact row survival: same ids, same payload
      val back = spark.read.parquet(out)
      assert(back.count() === 10000L)
      assert(back.agg(sum(col("v"))).as[Long].head ===
        (0L until 10000L).map(_ * 7).sum)
    } finally { rm(frag); rm(out) }
  }

  test("dynamic partition pruning: the dim filter becomes a runtime " +
    "partition filter on the fact scan (j12_dpp's plan claim)") {
    val dir = tmpDir("dpp")
    try {
      spark.range(0, 300)
        .select(col("id"),
          date_add(lit("2024-01-01").cast("date"),
            (col("id") % 30).cast("int")).as("dt"))
        .write.mode("overwrite").partitionBy("dt").parquet(dir)
      val fact = spark.read.parquet(dir)
      val dim = spark.range(0, 30)
        .select(date_add(lit("2024-01-01").cast("date"),
          col("id").cast("int")).as("dt"), (col("id") + 1).as("day_no"))
        .filter(col("day_no") <= 5)
      val q = fact.join(dim, "dt").groupBy(col("dt"))
        .agg(count(lit(1)).as("ct"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"fact scan must carry a dynamicpruning partition filter:\n" +
          plan.take(1500))
      assert(q.count() === 5L)
    } finally rm(dir)
  }

  test("Erasure.deleteKeys: fully-erased partition directory is swept " +
    "(dynamic overwrite alone would silently keep its files), " +
    "untouched partitions keep their exact files") {
    val store = tmpDir("erase")
    try {
      spark.range(0, 300)
        .select(col("id").as("user_id"), (col("id") % 3).as("bucket"),
          (col("id") * 7).as("v"))
        .write.mode("overwrite").partitionBy("bucket").parquet(store)
      def files(sub: String): Set[(String, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
              .toSeq.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(store, sub))
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => f.getPath -> f.length()).toSet
      }
      val b0Before = files("bucket=0")
      // targets: EVERY key of bucket 1, plus a slice of bucket 2
      val targets = spark.range(0, 300)
        .select(col("id").as("user_id"), (col("id") % 3).as("bucket"))
        .filter(col("bucket") === 1 ||
          (col("bucket") === 2 && col("id") < 100))
      val affected = operators.Erasure.deleteKeys(
        spark, store, "bucket", "user_id", targets)
      assert(affected.toSet === Set(1L, 2L))
      // bucket 1 erased entirely -> its directory must be GONE
      assert(!new java.io.File(store, "bucket=1").exists())
      // bucket 0 untouched byte-for-byte; bucket 2 partially kept
      assert(files("bucket=0") === b0Before)
      val back = spark.read.parquet(store)
      assert(back.filter(col("bucket") === 1).count() === 0L)
      assert(back.count() === 300L - 100L - 33L) // bucket1=100, b2 slice=33
      // survivors' payload intact
      assert(back.filter(col("user_id") === 299).select(col("v"))
        .head().getLong(0) === 299L * 7)
    } finally rm(store)
  }

  test("Erasure.deleteKeys: escaped string partition values sweep the " +
    "REAL directory (region=US%20East), and null partition targets are " +
    "rejected loudly instead of silently surviving") {
    val store = tmpDir("erase-esc")
    try {
      spark.range(0, 60)
        .select(col("id").as("user_id"),
          when(col("id") % 2 === 0, lit("EU:West")).otherwise(lit("US East"))
            .as("region"))
        .write.mode("overwrite").partitionBy("region").parquet(store)
      // the writer escapes the colon: the directory is region=EU%3AWest
      assert(new java.io.File(store, "region=EU%3AWest").exists())
      // erase EVERY key of "EU:West" — the swept dir must be the ESCAPED
      // name (building the path from the raw value would miss it)
      val targets = spark.range(0, 60).filter(col("id") % 2 === 0)
        .select(col("id").as("user_id"), lit("EU:West").as("region"))
      operators.Erasure.deleteKeys(spark, store, "region", "user_id", targets)
      assert(!new java.io.File(store, "region=EU%3AWest").exists(),
        "fully-erased escaped partition must be swept")
      assert(spark.read.parquet(store).count() === 30L)
      val nullTargets = spark.range(0, 3)
        .select(col("id").as("user_id"),
          lit(null).cast("string").as("region"))
      val e = intercept[IllegalArgumentException](
        operators.Erasure.deleteKeys(spark, store, "region", "user_id",
          nullTargets))
      assert(e.getMessage.contains("NULL region"), e.getMessage)
    } finally rm(store)
  }

  test("expirePartitions: strictly-below-cutoff dirs dropped, boundary kept, " +
    "escaped values compared unescaped, kept files untouched") {
    val dir = tmpDir("ttl")
    try {
      Seq((1L, "2024-01-05"), (2L, "2024-01-10"), (3L, "2024-01-20"),
        (4L, "2024 01 02")) // space → escaped dir name, sorts below cutoff
        .toDF("id", "dt").write.partitionBy("dt").parquet(dir)
      def files() = Option(new java.io.File(s"$dir/dt=2024-01-20").listFiles())
        .getOrElse(Array.empty[java.io.File]).map(f => f.getName -> f.length()).toSet
      val before = files()
      val dropped = graft.operators.Erasure
        .expirePartitions(spark, dir, "dt", "2024-01-10")
      assert(dropped.toSet === Set("2024-01-05", "2024 01 02"))
      assert(files() === before, "kept partition files must not churn")
      val left = spark.read.parquet(dir).select(col("id"))
        .as[Long].collect().toSet
      assert(left === Set(2L, 3L)) // boundary value (== cutoff) survives
    } finally rm(dir)
  }

  test("ORC scan prunes like parquet: filter lands in PushedFilters, " +
    "projection narrows the read schema") {
    val dir = tmpDir("orc")
    try {
      spark.range(0, 1000)
        .select(col("id"), (col("id") % 10).as("bucket"),
          concat(lit("name-"), col("id")).as("name"))
        .write.mode("overwrite").orc(dir)
      val q = spark.read.orc(dir).filter(col("bucket") === 3)
        .select(col("id"))
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pushed = plan.linesIterator
        .find(_.contains("PushedFilters")).getOrElse("")
      assert(pushed.contains("bucket"), plan.take(1200))
      val readSchema = plan.linesIterator
        .find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("name"),
        s"projection must prune the unused string column: $readSchema")
      assert(q.count() === 100L)
    } finally rm(dir)
  }
}
