package graft

import org.apache.spark.sql.functions._

/** Manifest-metadata-at-file-scale evidence (r17 verdict task 5): how
  * does versioned-store POINT-PROBE latency grow with the manifest's
  * file count? A 100 TB store holds 10⁵–10⁶ files; the probe planner
  * must stay metadata-cheap there or `AS OF` point lookups stop being
  * interactive.
  *
  * The pre-r18 planner collected EVERY manifest row's stats — min/max
  * plus the ~10 KB serialized Bloom sketch — to the driver per probe:
  * one row per (file, partition value) is "bounded metadata", but at
  * 120k rows that is >1 GB of sketch bytes per point lookup, linear in
  * the TABLE, not the answer. The r18 planner ([[graft.operators
  * .Versioned]] pruneFiles) runs the envelope+Bloom filter INSIDE the
  * distributed manifest scan and collects surviving file NAMES only —
  * driver traffic sized by the probe's true file set + fpp.
  *
  * This harness builds stores at growing file counts (orders keyed into
  * F hash buckets, one file per bucket — Bloom stats on k), then times
  * the SAME point probes two ways per store: the shipped planner
  * (readPoint → count) and a faithful inline replica of the pre-r18
  * driver-side collect (select stats → collect → filter on the driver),
  * so the banked table prices the seam itself at every size. Stores
  * build untimed; each probe set runs once untimed (JIT), then timed.
  * Prints a SCALE.md-ready markdown table. */
object ManifestScale {
  def main(args: Array[String]): Unit = {
    // sf0.1 by default: the ≥100k tier needs ≥100k distinct keys
    // (one file per key-hash bucket; orders sf0.1 carries 150k)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sizes = sys.env.get("SPARK_GRAFT_MS_SIZES")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(3000, 12000, 48000, 120000))
    val probesPerRun = 8
    val spark = Sessions.tuned("local[32]", "32")
    import graft.operators.Versioned

    val root = {
      val r = if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
        else System.getProperty("java.io.tmpdir")
      s"$r/graft-manifestscale-${System.nanoTime()}"
    }
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val raw = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      .localCheckpoint(true)
    val keys = raw.select(col("k")).orderBy(col("k")).limit(2048)
      .collect().map(_.getLong(0))
    println("| manifest rows | build s | probe med s (r18 plan) | " +
      "probe med s (pre-r18 collect) | batched s/key (readPoints) | " +
      "files probed | driver stat bytes (pre-r18) |")
    println("|---|---|---|---|---|---|---|")

    sizes.foreach { f =>
      val path = s"$root/store-$f"
      val (tBuild, _) = timed {
        Versioned.init(spark, path,
          "bucket", raw.withColumn("bucket", pmod(col("k"), lit(f.toLong))),
          statsCol = Some("k"))
      }
      // NOT cached: both probe shapes must pay the manifest read per
      // probe, exactly as the real planner does (the pre-r18 planner
      // also read the manifest parquet fresh per readPoint call)
      def m = spark.read.parquet(Versioned.manifestDir(path, 1L))
      val mRows = m.count()
      // deterministic probe keys spread over the key range
      val probeKeys = (0 until probesPerRun).map(i =>
        keys((i * 251) % keys.length))

      def newProbe(): (Double, Long) = {
        var filesProbed = 0L
        val (t, _) = timed {
          probeKeys.foreach { k =>
            val df = Versioned.readPoint(spark, path, "k", k)
            filesProbed += df.inputFiles.length
            assert(df.count() >= 1L, s"probe $k lost its row")
          }
        }
        (t / probesPerRun, filesProbed)
      }
      // the pre-r18 planner, replicated faithfully: collect (file, mn,
      // mx, bloom) for EVERY manifest row, filter on the driver, then
      // read the surviving files via the normal snapshot-filter path
      def oldProbe(): (Double, Long) = {
        var statBytes = 0L
        val (t, _) = timed {
          probeKeys.foreach { k =>
            val rows = m.select(col("file"),
                element_at(col("stats"), lit("k")).getField("mn").as("mn"),
                element_at(col("stats"), lit("k")).getField("mx").as("mx"),
                element_at(col("stats"), lit("k")).getField("bloom")
                  .as("bloom"))
              .collect()
            statBytes += rows.map(r =>
              16L + (if (r.isNullAt(3)) 0L
                     else r.getAs[Array[Byte]](3).length.toLong)).sum
            val files = rows.filter { r =>
              !r.isNullAt(1) && r.getLong(1) <= k && r.getLong(2) >= k &&
                (r.isNullAt(3) || graft.functions.BloomAgg
                  .readFrom(r.getAs[Array[Byte]](3)).mightContainLong(k))
            }.map(_.getString(0)).distinct.toIndexedSeq
            // harness-owned store path — no glob metacharacters to escape
            val n = spark.read.parquet(files: _*)
              .filter(col("k") === k).count()
            assert(n >= 1L, s"old-shape probe $k lost its row")
          }
        }
        (t / probesPerRun, statBytes / probesPerRun)
      }

      // the amortizing batch: ALL probe keys against ONE manifest scan
      // (readPoints) — reported per key, comparable to the per-key
      // probe columns
      def batchProbe(): Double = {
        val (t, _) = timed {
          val df = Versioned.readPoints(spark, path, "k", probeKeys)
          assert(df.count() >= probesPerRun.toLong,
            "batched probe lost rows")
        }
        t / probesPerRun
      }
      newProbe(); oldProbe(); batchProbe() // untimed warmup of all shapes
      val (tNew, probed) = newProbe()
      val (tOld, bytes) = oldProbe()
      val tBatch = batchProbe()
      println(f"| $mRows | $tBuild%.1f | $tNew%.3f | $tOld%.3f | " +
        f"$tBatch%.3f | ${probed / probesPerRun} | $bytes |")
      GateSupport.rmTree(path)
    }
    GateSupport.rmTree(root)
    spark.stop()
  }
}
