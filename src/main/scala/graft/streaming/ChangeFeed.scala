package graft.streaming

import graft.operators.Versioned
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The versioned store's committed transaction log as a FIRST-CLASS
  * streaming CDF source (the `readChangeFeed` idea of the lakehouse
  * formats, reference analogue: the CDC tail the dim pipeline consumes —
  * SURVEY §2 S3/S4 — pointed at our own store instead of a database
  * binlog).
  *
  * Mechanics: a plain file stream source TAILS `store/_log` — each
  * committed version is exactly one manifest parquet file (the commit
  * point is that file's atomic rename), so the log IS streamable with no
  * side channel, and Spark's own file-source offsets make version
  * delivery EXACTLY-ONCE across restarts: committed batches never
  * redeliver, the one in-flight batch redelivers with the SAME batchId.
  * Each micro-batch maps its arriving manifest paths back to version
  * numbers and hands the consumer ONE change-feed frame for the batch's
  * contiguous version interval (computed by [[Versioned.changes]] /
  * [[Versioned.changesWithPreImages]] — churned-partition files only,
  * never the table).
  *
  * The consumer contract is Spark's standard foreachBatch one: `fold`
  * must be idempotent on `batchId` (a crash AFTER the fold but BEFORE
  * the batch commit redelivers the same interval under the same id —
  * dedup by id, or by the interval's `toV`, which is equivalent here
  * since a version belongs to exactly one batch). Deltas across batches
  * should commute or the consumer should run `maxFilesPerTrigger = 1`:
  * the source orders files by modification time, which matches commit
  * order, but a pre-existing backlog's larger batches only guarantee
  * within-batch ordering via the interval itself.
  *
  * At 100 TB this is the O(changed files) consumption path the
  * stream_k21/k22 gates proved, made reusable and RESTART-SAFE: the
  * checkpoint is a real durable one (caller-owned, never swept here),
  * and a consumer killed mid-log resumes from its last committed batch
  * (gate stream_k25_cdf_resume kills one mid-fold and hash-matches the
  * resumed result against the full recompute). */
object ChangeFeed {

  /** Drain everything currently committed in `store`'s log through
    * `fold(cdf, fromV, toV, batchId)` and return (Trigger.AvailableNow —
    * the bounded-run shape; a live deployment would swap the trigger,
    * nothing else changes). Versions <= `startingVersion` are skipped —
    * the caller seeds its state from `read(store, startingVersion)`,
    * the one-time build. `checkpoint` must be DURABLE storage owned by
    * the caller: it is the resume token. */
  def run(spark: SparkSession, store: String, keyCol: String,
      checkpoint: String, startingVersion: Long = 1L,
      withPreImages: Boolean = true, maxFilesPerTrigger: Int = 1,
      durableGuard: Boolean = true)
      (fold: (DataFrame, Long, Long, Long) => Unit): Unit = {
    // A rename-protocol store's log is one manifest dir per version —
    // tail its parquet. A CAS-protocol store's commit point is the
    // pointer FILE `_log/v=N.ptr` (the manifest dir `m-<token>` carries
    // no version in its path), so there the stream tails the pointer
    // files as text: same file-source exactly-once offsets, one file per
    // version either way.
    val cas = Versioned.casMode(store)
    // only the path matters; one column keeps the probe scan trivial
    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType)))
    val tail =
      if (cas)
        spark.readStream
          .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
          .text(s"$store/_log/*.ptr")
          .select(col("_metadata.file_path").as("path"))
      else spark.readStream.schema(probeSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .parquet(s"$store/_log/*")
        .select(col("_metadata.file_path").as("path"))
    // Cross-batch ordering guard: the file source orders by modification
    // time, which matches commit order except when two manifests land in
    // the same mtime tick. Rather than trust mtime, remember the last
    // folded toV and refuse a batch that isn't the next contiguous
    // interval — an inversion fails loudly instead of folding intervals
    // out of order. The high-water mark is DURABLE (a sidecar in the
    // caller-owned checkpoint dir, written atomically after each fold):
    // a per-run var would reset on restart, and the standard
    // fail-then-restart response to the guard's own kill would let the
    // inverted interval fold on the fresh run's unchecked first batch —
    // corruption converted into fail-once-then-succeed-corrupted. With
    // the sidecar, a restart seeds the guard and the inversion stays
    // fatal until the log is repaired. The sidecar stores the exact
    // LAST FOLDED INTERVAL, not just its high end: the one legitimate
    // non-fresh delivery is an IDENTICAL redelivery of that interval
    // (crash after the sidecar write, before the offset commit —
    // file-source batch content is deterministic per batchId); any
    // other interval at-or-below the mark is an inversion, including
    // the skipped-version batch a mere high-water mark would wave
    // through. Interval dedup on redelivery remains the caller's
    // documented contract (toV-keyed state).
    // `durableGuard = false` is the MEASUREMENT seam (AbDrift arms
    // cdf_sidecar vs cdf_memguard — pricing the sidecar read+write
    // against the pre-r17 in-memory-only guard): the ordering check
    // still runs per batch, but the mark neither seeds from nor writes
    // the sidecar, so it resets on restart. Production callers keep the
    // default — an in-memory-only guard converts an inversion into
    // fail-once-then-succeed-corrupted across the restart (above).
    val hwmFile = new java.io.File(checkpoint, "_graft_cdf_hwm")
    var lastFolded: Option[(Long, Long)] =
      if (durableGuard && hwmFile.isFile) {
        val txt = new String(
          java.nio.file.Files.readAllBytes(hwmFile.toPath),
          java.nio.charset.StandardCharsets.UTF_8).trim
        val parts = txt.split(":")
        require(parts.length == 2,
          s"ChangeFeed: corrupt guard sidecar '$txt' under $checkpoint")
        Some((parts(0).toLong, parts(1).toLong))
      } else None
    def writeHwm(lo: Long, hi: Long): Unit = {
      val tmp = new java.io.File(checkpoint, s".hwm-${System.nanoTime()}")
      tmp.getParentFile.mkdirs()
      java.nio.file.Files.write(tmp.toPath,
        s"$lo:$hi".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp.toPath, hwmFile.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }
    val q = tail.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val vs = b.select(col("path")).collect()
          .flatMap { r =>
            // the LAST v=N segment is the manifest's own (the one
            // adjacent to _log); a store rooted under .../v=3/... must
            // not resolve every manifest to that constant version. CAS
            // pointer files carry the version in their own basename.
            val rx = if (cas) "/v=(\\d+)\\.ptr$".r else "/v=(\\d+)/".r
            rx.findAllMatchIn(r.getString(0))
              .toList.lastOption.map(_.group(1).toLong)
          }
          .distinct.sorted.filter(_ > startingVersion)
        if (vs.nonEmpty) {
          val (lo, hi) = (vs.head, vs.last)
          // one manifest file per version and the source delivers every
          // file exactly once, so a gap inside a batch means the log was
          // tampered with (or a manifest was vacuumed mid-tail) — the
          // interval CDF would silently skip those versions' changes
          require(vs.length.toLong == hi - lo + 1,
            s"ChangeFeed: batch $batchId delivered a non-contiguous " +
              s"version set $vs under $store/_log — a manifest is " +
              "missing; refuse to fold a gapped interval")
          // accept: the next contiguous interval (fresh), or an EXACT
          // redelivery of the last folded interval (the crash window
          // between the sidecar write and the offset commit). Everything
          // else — gaps, inversions, the skipped-version batch — fails
          // loudly, durably, across restarts.
          lastFolded.foreach { case (plo, phi) =>
            require(lo == phi + 1 || (lo == plo && hi == phi),
              s"ChangeFeed: batch $batchId delivers v=[$lo,$hi] but the " +
                s"log already folded through v=[$plo,$phi] — out-of-order " +
                "or gapped delivery (same-mtime manifests); refuse to fold")
          }
          val cdf =
            if (withPreImages)
              Versioned.changesWithPreImages(spark, store, lo - 1, hi, keyCol)
            else Versioned.changes(spark, store, lo - 1, hi, keyCol)
          fold(cdf, lo - 1, hi, batchId)
          if (!lastFolded.contains((lo, hi))) {
            if (durableGuard) writeHwm(lo, hi)
            lastFolded = Some((lo, hi))
          }
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
