package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE retryable failure of the versioned store: another writer
  * committed the version this attempt targeted. Subclasses
  * IllegalStateException (callers that treated the race as ISE keep
  * working) but is its own type so [[Versioned.mergeRetry]] retries
  * NOTHING else — a stopped SparkContext, a broken invariant, or an
  * environmental rename failure must surface on attempt 1, not after
  * five sleeps mislabeled "contention exceeds the retry budget". */
final class ConcurrentCommitException(msg: String, cause: Throwable)
  extends IllegalStateException(msg, cause)

/** Snapshot-versioned copy-on-write table — MERGE with time travel (the
  * lakehouse log idea, reference analogue: the dim store's key-addressed
  * upsert generalized to versioned MERGE; on Delta/Iceberg this slot is
  * the transaction log + `VERSION AS OF`).
  *
  * Layout under `dir`:
  *   - `data/v=N-<token>/…parquet` — files WRITTEN BY an attempt at
  *     version N (append-only: once written, never rewritten or deleted
  *     by later merges). The token is writer-unique, so concurrent
  *     attempts never mix files; manifests reference files by absolute
  *     path, so the dir name carries no read semantics.
  *   - `_log/v=N/…parquet` — version N's manifest: (file, part, rows
  *     [, mn, mx, bloom]), one row per (data file, partition value) it
  *     serves, plus the committed `_schema.json` sidecar. A snapshot IS
  *     its manifest's file set; untouched files are carried into the
  *     next manifest BY REFERENCE, so a merge writes only churned
  *     partitions' rows plus one tiny manifest. The manifest dir is
  *     staged and RENAMED into place atomically — the single commit
  *     point: of N racing writers exactly one commits version N, the
  *     rest throw and retry against the new latest (optimistic
  *     concurrency, the Delta log-store contract on a local FS).
  *     A `cas`-protocol store ([[init]] opt-in, for object stores where
  *     rename is a non-atomic copy) instead keeps the staged dir at its
  *     final name `_log/m-<token>` and commits by atomically CREATING
  *     the pointer file `_log/v=N.ptr` — put-if-absent, the S3/GCS
  *     conditional-write contract ([[commitPointerCas]]).
  *
  * `read(dir, v)` plans from the manifest (file-count-sized, like every
  * index probe here) and scans exactly that snapshot's files — old
  * versions stay readable because COW never mutates data files; space is
  * reclaimed by an explicit vacuum of files no retained manifest
  * references, on the maintenance schedule (the k13 TTL-expiry
  * economics), never by the write path.
  *
  * At 100 TB the merge cost is the k11 contract unchanged: churned
  * partitions only — the manifest tells the planner which FILES hold an
  * affected partition, those rows rewrite, every other file is one
  * manifest row copied.
  */
object Versioned {

  private def logRoot(dir: String) = s"$dir/_log"

  /** Recursive delete — the one shared copy (commit-race cleanup, no-op
    * dv reclamation, vacuum drops, recover sweeps all use it). */
  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(rmTree)
    f.delete(); ()
  }

  /** Store-level commit-protocol marker (a committed property of the
    * store, written once by [[init]]): absent = `rename` (atomic
    * directory rename — POSIX/HDFS), present = `cas` (put-if-absent
    * pointer commit — the object-store posture, where rename is a
    * non-atomic copy and the Delta LogStore contract applies). */
  private def casMarker(dir: String) =
    new java.io.File(s"${logRoot(dir)}/_commit_protocol.json")

  private[graft] def casMode(dir: String): Boolean = casMarker(dir).isFile

  /** Resolve version `v`'s committed manifest DIRECTORY. Rename-mode
    * stores commit the directory at `_log/v=N` itself; CAS-mode stores
    * commit a pointer FILE `_log/v=N.ptr` whose one-line content names
    * the writer-unique, never-renamed staged dir `_log/m-<token>`. Every
    * read path resolves through here, so the two protocols share one
    * read stack. */
  private[graft] def manifestDir(dir: String, v: Long): String = {
    val direct = new java.io.File(s"${logRoot(dir)}/v=$v")
    if (direct.isDirectory) direct.getPath
    else {
      val ptr = new java.io.File(s"${logRoot(dir)}/v=$v.ptr")
      require(ptr.isFile,
        s"Versioned: version $v is not committed under $dir " +
          "(neither a manifest dir nor a pointer file)")
      val tok = new String(java.nio.file.Files.readAllBytes(ptr.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      require(tok.nonEmpty && !tok.contains("/") && !tok.contains(".."),
        s"Versioned: corrupt pointer for v=$v under $dir: '$tok'")
      s"${logRoot(dir)}/$tok"
    }
  }

  /** WRITER-UNIQUE data dir for an attempted commit of version `v`. The
    * token makes concurrent writers collision-free on the data side
    * (two racing merges never mix files in one dir — manifests reference
    * files by absolute path, so the dir name carries no read semantics);
    * the COMMIT POINT is the atomic manifest rename in
    * [[commitManifest]], and a losing attempt's data dir becomes an
    * unreferenced orphan that [[recover]]/[[vacuum]] reclaims. */
  private def newDataDir(dir: String, v: Long) =
    s"$dir/data/v=$v-${System.nanoTime()}"

  /** Commit version `v`: the manifest (plus the committed `_schema.json`
    * sidecar) is written to a temp dir inside the log and RENAMED into
    * place atomically — the Delta-style single commit point. Exactly one
    * of N racing writers wins the rename; losers get a loud
    * IllegalStateException and retry against the new latest (their data
    * dirs are token-unique orphans, reclaimed by maintenance). Local-FS
    * rename is atomic; an object-store deployment would slot a log-store
    * CAS here, exactly like Delta's LogStore abstraction. */
  private def commitManifest(spark: SparkSession, dir: String, v: Long,
      manifest: DataFrame,
      schema: Option[org.apache.spark.sql.types.StructType],
      txn: Option[(String, Long)] = None): Unit = {
    val cas = casMode(dir)
    // CAS staging dirs are FINAL locations (never renamed — on an object
    // store a dir "rename" is a non-atomic copy); rename-mode staging
    // dirs move to _log/v=N at commit. Both are writer-unique.
    val stagedName =
      if (cas) s"m-$v-${System.nanoTime()}-" +
        java.util.UUID.randomUUID().toString.take(8)
      else s".tmp-v=$v-${System.nanoTime()}"
    val tmp = s"${logRoot(dir)}/$stagedName"
    manifest.coalesce(1).write.mode("errorifexists").parquet(tmp)
    schema.foreach(s0 => writeSchemaFile(new java.io.File(tmp), s0))
    // the MANIFEST's own schema rides the commit too: every manifest
    // read can then pass an explicit schema and skip the parquet
    // schema-inference job — one fewer driver-coordinated job per
    // manifest open, on a path hit several times per commit and once
    // per probe (r18; the data sidecar above serves the same role for
    // snapshot scans)
    java.nio.file.Files.write(
      new java.io.File(tmp, "_manifest_schema.json").toPath,
      manifest.schema.json
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // commit wall-time rides the atomic rename with everything else —
    // the TIMESTAMP AS OF resolution source ([[readAsOf]])
    java.nio.file.Files.write(
      new java.io.File(tmp, "_commit.json").toPath,
      s"""{"version": $v, "ts_millis": ${System.currentTimeMillis()}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // application-transaction sidecar (the Delta txnAppId/txnVersion
    // idea): the (app_id, txn_version) fact rides the SAME atomic commit
    // as the manifest, so "did batch N land?" is answerable from the log
    // alone and an idempotent writer ([[mergeIdempotent]]) never
    // double-applies a replayed micro-batch
    txn.foreach { case (app, tv) =>
      // validate HERE — the single choke point every txn-writing path
      // (mergeIdempotent, public merge(txn = Some(...))) funnels through.
      // The id is interpolated into this JSON sidecar (regex-parsed, `.`
      // stops at line terminators) and vacuum's \n-separated TSV rollup;
      // a newline or quote would produce a sidecar the readers silently
      // fail to parse, voiding idempotence with no error.
      require(app.nonEmpty && app.forall(c =>
        c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
        s"Versioned: txn appId must match [A-Za-z0-9._-]+: '$app'")
      java.nio.file.Files.write(
        new java.io.File(tmp, "_txn.json").toPath,
        s"""{"app_id": "$app", "txn_version": $tv}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    if (cas) { commitPointerCas(dir, v, stagedName); return }
    val src = java.nio.file.Paths.get(tmp)
    val dst = java.nio.file.Paths.get(s"${logRoot(dir)}/v=$v")
    try {
      java.nio.file.Files.move(src, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    } catch {
      // Only a LOST RACE becomes ConcurrentCommitException: the two
      // destination-occupied exception types, or any other filesystem
      // failure where the destination verifiably exists (someone
      // committed it). Environmental failures — AccessDenied,
      // AtomicMoveNotSupported on a non-atomic mount, cross-device —
      // leave dst absent and RETHROW as themselves, staging dir kept
      // for diagnosis (recover() reclaims `.tmp-v=*` later). Calling a
      // permission error "committed by a concurrent writer" would send
      // mergeRetry into five doomed retries masking the real cause.
      case e: java.nio.file.FileSystemException =>
        if (!lostRace(e, dst)) throw e
        rmTree(new java.io.File(tmp))
        throw new ConcurrentCommitException(
          s"Versioned: version $v was committed by a concurrent writer — " +
            "re-read latest() and retry the operation", e)
    }
  }

  /** PUT-IF-ABSENT pointer commit — the object-store protocol (r16
    * verdict task 5). The staged manifest dir `_log/m-<token>` is fully
    * written at its FINAL location; the commit point is the atomic
    * creation of the pointer file `_log/v=N.ptr` (content: the token),
    * which exactly one racing writer wins. The local-FS simulation of a
    * conditional PUT is a hard-link create — atomic, content fully
    * visible at link time, `FileAlreadyExistsException` when the name is
    * taken; a real object-store deployment maps this one call to
    * `PUT if-none-match:*` (S3/GCS conditional write) with identical
    * semantics. Losers' staged dirs are unreferenced orphans that
    * [[recover]] reclaims. NOTHING here relies on rename atomicity. */
  private def commitPointerCas(dir: String, v: Long,
      stagedName: String): Unit = {
    val ptrTmp = java.nio.file.Paths.get(s"${logRoot(dir)}/.ptr-$stagedName")
    java.nio.file.Files.write(ptrTmp,
      stagedName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val dst = java.nio.file.Paths.get(s"${logRoot(dir)}/v=$v.ptr")
    try {
      java.nio.file.Files.createLink(dst, ptrTmp)
      java.nio.file.Files.deleteIfExists(ptrTmp)
      ()
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        // lost the race — reclaim this attempt's staging eagerly (the
        // data dir stays an orphan for recover, same as rename mode)
        rmTree(new java.io.File(s"${logRoot(dir)}/$stagedName"))
        java.nio.file.Files.deleteIfExists(ptrTmp)
        throw new ConcurrentCommitException(
          s"Versioned: version $v was committed by a concurrent writer " +
            "(pointer already present) — re-read latest() and retry", e)
      // any other failure is environmental (permissions, quota, link
      // across devices): rethrow as itself, staging kept for diagnosis
    }
  }

  /** The commit-race CLASSIFIER behind [[commitManifest]]'s catch,
    * extracted so VersionedSpec can pin the discrimination table
    * directly: the two destination-occupied exception types are races
    * by definition; any OTHER filesystem failure is a race only if the
    * destination verifiably exists (someone committed it). Everything
    * else — AccessDenied, AtomicMoveNotSupported on a non-atomic
    * mount, a missing parent — is environmental and must NOT retry. */
  private[graft] def lostRace(e: java.nio.file.FileSystemException,
      dst: java.nio.file.Path): Boolean =
    e.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
      e.isInstanceOf[java.nio.file.DirectoryNotEmptyException] ||
      java.nio.file.Files.exists(dst)

  /** Column-mapping key: a logical column's PHYSICAL (on-disk) name,
    * carried as StructField metadata inside the committed sidecar schema
    * (one sidecar, no second mapping file — schema.json round-trips
    * metadata). Absent key = identity. A RENAME commits a new sidecar
    * whose field keeps the old physical name — zero data files move; a
    * read at any version answers in that version's own logical names. */
  private val PhysKey = "graft.physical"

  private def physName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  /** logical name -> physical name (identity entries included). */
  private def mapping(schema: Option[org.apache.spark.sql.types.StructType])
      : Map[String, String] =
    schema.map(_.fields.map(f => f.name -> physName(f)).toMap)
      .getOrElse(Map.empty)

  private def physicalSchema(logical: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      logical.fields.map(f =>
        org.apache.spark.sql.types.StructField(physName(f), f.dataType,
          f.nullable)))

  /** Re-attach physical-name metadata onto a plain (post-projection)
    * logical schema before committing it — `select(... .as(name))` strips
    * field metadata, and losing the mapping would orphan every
    * renamed-column data file. */
  private def withPhysMeta(logical: org.apache.spark.sql.types.StructType,
      m: Map[String, String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(logical.fields.map { f =>
      m.get(f.name).filter(_ != f.name) match {
        case Some(p) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putString(PhysKey, p).build())
        case None => f
      }
    })

  /** Union two manifest frames whose stats columns may differ (a stats
    * manifest carried into a stats-less commit or vice versa): missing
    * columns fill with NULL — and a NULL envelope means "unknown, always
    * read", so mixed manifests stay CORRECT, just less prunable. */
  private def alignUnion(a: DataFrame, b: DataFrame): DataFrame = {
    val aT = a.schema.map(f => f.name -> f.dataType)
    val bT = b.schema.map(f => f.name -> f.dataType)
    val a2 = bT.filterNot { case (n, _) => a.columns.contains(n) }
      .foldLeft(a) { case (d, (n, t)) => d.withColumn(n, lit(null).cast(t)) }
    val b2 = aT.filterNot { case (n, _) => b.columns.contains(n) }
      .foldLeft(b) { case (d, (n, t)) => d.withColumn(n, lit(null).cast(t)) }
    a2.unionByName(b2.select(a2.columns.map(col): _*))
  }

  /** Per-file Bloom sizing CEILING for stats-carrying manifests (the
    * k16 file-skipping tier): sketches size to each (file, part)
    * group's ACTUAL distinct count ([[graft.functions.BloomAgg
    * adaptive]]) and only a group past this cap pays the full
    * ~1.2·cap bytes at 1% fpp. In a manifest the sketch bytes are the
    * bulk of every probe's scan, so right-sizing the small-file tail
    * shrinks the per-lookup manifest read, not just storage
    * (ManifestScale banks the curvature). */
  private val StatsBloomExpected = 1L << 13
  private val StatsBloomFpp = 0.01

  /** Committed versions, ascending (directory listing of the log — one
    * entry per version, no file reads). */
  def versions(dir: String): Seq[Long] =
    Option(new java.io.File(logRoot(dir)).listFiles())
      .getOrElse(Array.empty)
      .collect {
        case f if f.isDirectory && f.getName.startsWith("v=") =>
          f.getName.stripPrefix("v=").toLong
        case f if f.isFile && f.getName.startsWith("v=") &&
            f.getName.endsWith(".ptr") =>
          f.getName.stripPrefix("v=").stripSuffix(".ptr").toLong
      }.distinct.sorted.toIndexedSeq

  def latest(dir: String): Long = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"Versioned: no committed versions under $dir")
    vs.last
  }

  /** (file, part, rows[, mn, mx, bloom]) for every data file under
    * `path` — the manifest rows for a freshly-written version. One
    * narrow scan of the new files only (`partCol` is stored IN the data,
    * so no directory inference is involved). With `statsCol` (PHYSICAL
    * name) the same scan also collects the per-(file, part) min/max
    * envelope and Bloom sketch of that column — the Iceberg/Delta
    * data-file-stats idea committed INTO the snapshot's manifest, so
    * point/range reads at `AS OF` can prune files before planning the
    * scan ([[readPoint]]/[[readRange]]). Stats columns ride as longs
    * (the column must cast); collection cost is the same single narrow
    * scan, widened by one column. */
  // `dataSchema` (when the caller just WROTE the files and knows it)
  // skips the parquet schema-inference job — one fewer driver round per
  // commit; the directory-level PartDir column is appended by partition
  // discovery either way and dropped
  private def fileParts(spark: SparkSession, path: String,
      partCol: String, statsCols: Seq[String],
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val rd = dataSchema.fold(spark.read)(s0 => spark.read.schema(s0))
    filePartsOf(rd.parquet(path).drop(PartDir), partCol, statsCols)
  }

  /** The manifest-row aggregation of [[fileParts]] over an ALREADY-OPEN
    * frame (physical column names) — shared with [[backfillStats]],
    * which recomputes stats for files that already belong to a
    * committed snapshot instead of freshly-written ones. */
  private def filePartsOf(df: DataFrame,
      partCol: String, statsCols: Seq[String]): DataFrame = {
    val base = df
      .groupBy(input_file_name().as("file"),
        col(partCol).cast("string").as("part"))
    statsCols match {
      case Seq() => base.agg(count(lit(1)).as("rows"))
      case cols =>
        // one agg per stats column, all riding the SAME single narrow
        // scan. The head column also writes the legacy flat fields
        // (mn/mx/bloom + stats_col naming WHICH physical column they
        // describe — a probe on any OTHER column must not prune with
        // them) so pre-r16 readers of single-column manifests keep
        // working; the full set lands in the `stats` map, keyed by
        // physical column name, which [[pruneFiles]] probes first.
        val bloom = udaf(graft.functions.BloomAgg.adaptive(
          StatsBloomExpected, StatsBloomFpp))
        val aggs = cols.zipWithIndex.flatMap { case (c, j) =>
          Seq(min(col(c).cast("long")).as(s"__mn_$j"),
            max(col(c).cast("long")).as(s"__mx_$j"),
            bloom(col(c).cast("long")).as(s"__bloom_$j"))
        }
        val agged = base.agg(count(lit(1)).as("rows"), aggs: _*)
        val mapEntries = cols.zipWithIndex.flatMap { case (c, j) =>
          Seq(lit(c), struct(col(s"__mn_$j").as("mn"),
            col(s"__mx_$j").as("mx"), col(s"__bloom_$j").as("bloom")))
        }
        agged.select(col("file"), col("part"), col("rows"),
          col("__mn_0").as("mn"), col("__mx_0").as("mx"),
          col("__bloom_0").as("bloom"), lit(cols.head).as("stats_col"),
          map(mapEntries: _*).as("stats"))
    }
  }

  /** DELETION-VECTOR application (the Delta/Iceberg DV idea, key-based):
    * a small targeted delete commits TOMBSTONES — (file, key_col, key)
    * rows under `dir/dv/...` — instead of rewriting gigabyte files for a
    * handful of rows; the manifest row of an affected file gains the
    * tombstone path in its `dv` array, and every snapshot read
    * anti-joins the scan against the referenced tombstones. `key_col`
    * is the PHYSICAL column name (stable across renames); `nameOf`
    * translates it into the frame's namespace (identity for physical
    * scans, physical→logical for readFiles output). Tombstones are
    * deletion-sized (broadcast): bulk deletes belong on the COW rewrite
    * path ([[merge]] with op "D"), this tier exists so a 10-row GDPR
    * erase does not rewrite 10 GB. Rewrites MATERIALIZE DVs away: a
    * merge/compact that rewrites a DV'd file applies its tombstones and
    * emits fresh dv-less manifest rows. */
  private def applyDv(spark: SparkSession, rows: DataFrame,
      dvPaths: Seq[String], nameOf: String => String): DataFrame =
    if (dvPaths.isEmpty) rows
    else {
      val tomb = spark.read.parquet(dvPaths.map(Manifest.unglob): _*)
      val keyCols = tomb.select(col("key_col")).distinct()
        .collect().map(_.getString(0))
      val tagged = rows.withColumn("__f", input_file_name())
      keyCols.foldLeft(tagged) { (df, pk) =>
        val t = broadcast(tomb.filter(col("key_col") === pk)
          .select(col("file").as("__tf"), col("key").as("__tk")))
        df.join(t, df.col("__f") === t.col("__tf") &&
          df.col(nameOf(pk)).cast("string") === t.col("__tk"), "left_anti")
      }.drop("__f")
    }

  /** The dv paths a manifest references for `files` (all files when
    * None) — empty for stores that never took a DV delete. */
  private def dvPathsOf(mDf: DataFrame,
      files: Option[Set[String]] = None): Seq[String] =
    if (!mDf.columns.contains("dv")) Seq.empty
    else {
      val scoped = files.fold(mDf)(fs =>
        if (fs.isEmpty) mDf.filter(lit(false))
        else mDf.filter(col("file").isin(fs.toSeq: _*)))
      scoped.select(explode(col("dv")).as("p")).distinct()
        .collect().map(_.getString(0)).toIndexedSeq
    }

  /** physical→logical translator for [[applyDv]] over readFiles output. */
  private def logicalNameOf(
      sch: Option[org.apache.spark.sql.types.StructType])
      : String => String = {
    val rev = mapping(sch).map(_.swap)
    pk => rev.getOrElse(pk, pk)
  }

  /** Reserved directory-level name for the partition value. The value is
    * ALSO kept as a regular data column, so manifest-listed files can be
    * read directly with no partition-discovery coupling to the layout
    * (directory inference across version levels is exactly the kind of
    * name-collision trap a payload column called "v" would spring). */
  private val PartDir = "__part"

  /** Write `df` as an attempted version's data under `path` (a
    * [[newDataDir]]): one directory per partition value keeps the
    * file↔partition mapping exact BY CONSTRUCTION (a file can only ever
    * serve one partition value, so a merge never drags unaffected rows
    * into a rewrite), independent of task count or AQE partition
    * coalescing. */
  private def writeData(df: DataFrame, path: String, partCol: String): Unit =
    df.withColumn(PartDir, col(partCol)).repartition(col(partCol))
      .write.partitionBy(PartDir).mode("errorifexists")
      .parquet(path)

  /** Create version 1 from `df`. `statsCol` opts the store into
    * stats-carrying manifests: every commit's manifest rows then carry
    * the per-(file, part) min/max envelope + Bloom sketch of that column
    * (cast to long), and [[readPoint]]/[[readRange]] prune files from the
    * manifest BEFORE the scan. `statsCols` extends the same treatment to
    * FURTHER columns (production predicates skip on several — order key
    * AND customer key AND date): every named column gets its own
    * envelope + Bloom in the manifest's `stats` map, collected by the
    * SAME single narrow scan, and a probe on ANY of them prunes. Pass
    * the SAME stats columns to every subsequent [[merge]]/[[compact]] —
    * a commit without them carries NULL stats for its fresh files
    * (correct, unprunable).
    *
    * `commitProtocol` is a committed property of the store: `rename`
    * (default — atomic directory rename, POSIX/HDFS) or `cas`
    * (put-if-absent pointer commit, the object-store posture where
    * rename is a non-atomic copy; see [[commitPointerCas]]). Every
    * later merge/compact/evolution commit follows the store's own
    * protocol automatically. */
  def init(spark: SparkSession, dir: String, partCol: String,
      df: DataFrame, statsCol: Option[String] = None,
      statsCols: Seq[String] = Nil,
      commitProtocol: String = "rename"): Long = {
    require(versions(dir).isEmpty, s"Versioned: $dir already initialized")
    require(partCol != PartDir && !df.columns.contains(PartDir),
      s"Versioned: column name $PartDir is reserved")
    require(commitProtocol == "rename" || commitProtocol == "cas",
      s"Versioned: unknown commitProtocol '$commitProtocol'")
    if (commitProtocol == "cas") {
      val f = casMarker(dir)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath,
        """{"protocol": "cas"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val dataPath = newDataDir(dir, 1L)
    writeData(df, dataPath, partCol)
    commitManifest(spark, dir, 1L,
      fileParts(spark, dataPath, partCol,
        (statsCol.toSeq ++ statsCols).distinct, Some(df.schema)),
      Some(df.schema))
    1L
  }

  /** The snapshot SCHEMA lives in the log, not in data-file footers —
    * the lakehouse contract: reading a 100 TB snapshot must not open N
    * footers to discover columns (parquet `mergeSchema` inference), and
    * a version's schema is a COMMITTED fact, not whatever the reader
    * infers. Stored as an underscore-prefixed sidecar inside the
    * version's manifest directory (Spark's file readers ignore `_`
    * paths, so the manifest parquet scan is unaffected). Pre-evolution
    * stores have no sidecar and fall back to inference. */
  private def schemaFile(dir: String, v: Long) =
    new java.io.File(manifestDir(dir, v), "_schema.json")

  private def writeSchemaFile(manifestDir: java.io.File,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val f = new java.io.File(manifestDir, "_schema.json")
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath,
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** Open version `v`'s manifest. When the commit carried a
    * `_manifest_schema.json` sidecar (every post-r18 commit does), the
    * bounded-metadata rows are decoded DRIVER-LOCALLY
    * ([[ManifestLocal]], r19) and answered as a LocalRelation — every
    * downstream collect/filter/distinct over the manifest then runs
    * job-free in the optimizer, deleting one driver-scheduled Spark job
    * from every store open (a path hit hundreds of times per bench).
    * Any decode surprise, and pre-sidecar manifests, fall back to the
    * distributed reader (with the explicit sidecar schema when present,
    * skipping the inference job). Underscore-prefixed sidecars are
    * invisible to the parquet scan itself. */
  private def readManifest(spark: SparkSession, dir: String,
      v: Long): DataFrame = {
    val md = manifestDir(dir, v)
    val f = new java.io.File(md, "_manifest_schema.json")
    if (!f.exists()) spark.read.parquet(md)
    else {
      val sch = org.apache.spark.sql.types.DataType.fromJson(
        new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      (if (sys.props.contains("graft.manifest.nolocal")) None
       else ManifestLocal.readRows(md, sch)) match {
        case Some(rows) => spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), sch)
        case None => spark.read.schema(sch).parquet(md)
      }
    }
  }

  /** The (file, dv) resolution frame of the latest manifest — exposed
    * only for the r19 plan-artifact dump (PlansR19). */
  private[graft] def manifestFdPlan(spark: SparkSession,
      dir: String): DataFrame =
    readManifest(spark, dir, latest(dir)).select(col("file"), col("dv"))

  private def readSchema(dir: String,
      v: Long): Option[org.apache.spark.sql.types.StructType] = {
    val f = schemaFile(dir, v)
    if (!f.exists()) None
    else Some(org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Read a set of manifest-listed data files, answering in the
    * committed schema's LOGICAL names: the scan runs under the PHYSICAL
    * schema (renamed columns keep their on-disk name — the column-mapping
    * contract, so renames never rewrite data), then projects physical →
    * logical. Any inferred directory column is dropped defensively. */
  private def readFiles(spark: SparkSession, dir: String,
      files: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema match {
      case Some(sch) =>
        spark.read.schema(physicalSchema(sch))
          .parquet(files.map(Manifest.unglob): _*)
          .select(sch.fields.map(f => col(physName(f)).as(f.name)).toSeq: _*)
      case None =>
        spark.read.parquet(files.map(Manifest.unglob): _*).drop(PartDir)
    }

  /** Schema-correct EMPTY frame for a snapshot (logical names). */
  private def emptyFrame(spark: SparkSession,
      sch: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(sch.fields.map(f =>
        f.copy(metadata = org.apache.spark.sql.types.Metadata.empty))))

  /** Scan snapshot `version` (defaults to the latest): exactly the files
    * its manifest lists, nothing newer, nothing vacuumed-in-place —
    * `AS OF` semantics. Under schema evolution the committed sidecar
    * schema drives the scan: files written BEFORE a column existed fill
    * it with NULLs (by-name parquet resolution), and a read at an OLD
    * version answers in that version's own (narrower) schema. */
  def read(spark: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latest(dir) else version
    require(versions(dir).contains(v),
      s"Versioned: version $v not in ${versions(dir)}")
    val mDf = readManifest(spark, dir, v)
    // ONE narrow (file, dv) collect answers both the file list and the
    // dv resolution — the second manifest scan (dvPathsOf) was one more
    // job on every snapshot read; sketches stay out of the projection
    val hasDv = mDf.columns.contains("dv")
    val fd = (if (hasDv) mDf.select(col("file"), col("dv"))
      else mDf.select(col("file"),
        lit(null).cast("array<string>").as("dv"))).collect()
    val files = fd.map(_.getString(0)).distinct
    val dvPaths = fd.iterator
      .flatMap(r => Option(r.getSeq[String](1)).getOrElse(Seq.empty))
      .toSeq.distinct
    val sch = readSchema(dir, v)
    applyDv(spark, readFiles(spark, dir, files.toIndexedSeq, sch),
      dvPaths, logicalNameOf(sch))
  }

  /** Commit wall-time of version `v` in epoch millis (from the
    * `_commit.json` committed atomically with the manifest; legacy
    * pre-r15 versions fall back to the manifest dir's mtime). */
  def commitTime(dir: String, v: Long): Long = {
    val md = manifestDir(dir, v)
    val f = new java.io.File(md, "_commit.json")
    if (!f.exists()) new java.io.File(md).lastModified()
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      """"ts_millis"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
        .getOrElse(new java.io.File(md).lastModified())
    }
  }

  /** TIMESTAMP AS OF: scan the snapshot that was CURRENT at `tsMillis` —
    * the greatest committed version whose commit time is <= the ask
    * (Delta's timestamp time travel). Commit times are monotone by
    * construction (a version commits strictly after its predecessor);
    * asking for a time before the first commit fails loudly. */
  def readAsOf(spark: SparkSession, dir: String, tsMillis: Long): DataFrame = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"Versioned: no committed versions under $dir")
    val eligible = vs.filter(v => commitTime(dir, v) <= tsMillis)
    require(eligible.nonEmpty,
      s"Versioned.readAsOf: $tsMillis predates the first commit " +
        s"(${commitTime(dir, vs.head)}) — nothing was current then")
    read(spark, dir, eligible.max)
  }

  /** The files a probe on PHYSICAL column `probeCol` must scan: every
    * (file, part) row whose stats PASS `keep(mn, mx, bloom)`, plus every
    * row whose stats describe a DIFFERENT column or no column at all
    * (stats-less commits, pre-stats_col manifests) — unknown = always
    * read: mis-attributed envelopes would prune away true matches, a
    * silent wrong answer.
    *
    * The filter runs INSIDE the manifest scan (distributed), and only
    * the SURVIVING file names collect to the driver. The pre-r18 shape
    * collected every row's stats — including the ~10 KB Bloom sketch —
    * driver-side per probe: one row per (file, partition value) is
    * bounded metadata, but at 10⁵–10⁶ manifest rows that is GBs of
    * sketch bytes per point lookup (measured: ManifestScale banked the
    * curvature). Post-prune the driver holds file names only, sized by
    * the ANSWER (the probe's true file set + fpp), not the table. */
  // takes the already-loaded manifest frame: the probe paths read the
  // manifest ONCE and share it between stats pruning and dv resolution
  // (a second read+collect per probe doubled hot-path manifest I/O).
  // Returns (surviving files, their dv paths): the surviving rows'
  // narrow (file, dv) projection rides the SAME distributed scan, so
  // the probe paths no longer pay a second manifest job (dvPathsOf) to
  // resolve tombstones — r18, one job per probe instead of two.
  private def pruneFiles(m: DataFrame, probeCol: String,
      keep: (Column, Column, Column) => Column)
      : (IndexedSeq[String], Seq[String]) = {
    val hasMap = m.columns.contains("stats")
    val hasLegacy = m.columns.contains("mn") && m.columns.contains("stats_col")
    val dvCol =
      if (m.columns.contains("dv")) col("dv")
      else lit(null).cast("array<string>").as("dv")
    def collectFd(rows: DataFrame): (IndexedSeq[String], Seq[String]) = {
      val fd = rows.collect()
      (fd.map(_.getString(0)).distinct.toIndexedSeq,
        fd.iterator
          .flatMap(r => Option(r.getSeq[String](1)).getOrElse(Seq.empty))
          .toSeq.distinct)
    }
    if (!hasMap && !hasLegacy)
      collectFd(m.select(col("file"), dvCol))
    else {
      // per ROW, not per manifest: a long history unions multi-column
      // rows, single-column rows, and stats-less rows (alignUnion
      // NULL-fills) — each row answers from its richest available form:
      // the stats map keyed by physical column first, then the legacy
      // flat fields when they describe the probed column
      val fromMap =
        if (hasMap) element_at(col("stats"), lit(probeCol))
        else lit(null).cast("struct<mn:bigint,mx:bigint,bloom:binary>")
      def pick(mapField: String, legacyName: String): Column = {
        val primary = when(fromMap.isNotNull, fromMap.getField(mapField))
        if (hasLegacy)
          primary.when(col("stats_col") === lit(probeCol), col(legacyName))
        else primary
      }
      val pmn = pick("mn", "mn")
      val pmx = pick("mx", "mx")
      collectFd(m.filter(pmn.isNull || pmx.isNull ||
          keep(pmn, pmx, pick("bloom", "bloom")))
        .select(col("file"), dvCol))
    }
  }

  /** Bloom might-contain over the manifest's serialized sketch column —
    * the point-probe tier of [[pruneFiles]], evaluated executor-side so
    * the sketch bytes never travel to the driver. A NULL sketch is
    * "unknown = read". Deserialization is per surviving manifest row,
    * once per probe — manifest-scale, not data-scale. */
  private val bloomMightContain =
    udf((bloom: Array[Byte], key: Long) =>
      graft.functions.BloomAgg.readFrom(bloom).mightContainLong(key))

  /** Batched might-contain for [[readPoints]]: ONE sketch
    * deserialization per manifest row answers the whole key batch.
    * `keys` arrives sorted — binary search to the first key inside the
    * row's [mn, mx] envelope, then test only the in-envelope run (the
    * envelope already rejected everything outside). */
  private val bloomAnyContain =
    udf((bloom: Array[Byte], mn: Long, mx: Long,
        keys: scala.collection.Seq[Long]) => {
      val f = graft.functions.BloomAgg.readFrom(bloom)
      // lower bound: first index with keys(i) >= mn
      var lo = 0
      var hi = keys.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (keys(mid) < mn) lo = mid + 1 else hi = mid
      }
      var hit = false
      while (!hit && lo < keys.length && keys(lo) <= mx) {
        hit = f.mightContainLong(keys(lo))
        lo += 1
      }
      hit
    })

  /** Schema-correct empty frame for snapshot `v` when a probe prunes
    * EVERY file: straight from the committed sidecar when one exists;
    * a pre-sidecar store derives it from any manifest-listed file — and
    * a pre-sidecar store whose manifest is ALSO empty (an all-deletes
    * merge retired every file before any sidecar committed) fails
    * loudly instead of letting the zero-path parquet read throw its
    * unhelpful inference error (the same guard [[changesImpl]] carries;
    * these two probe paths previously lacked it). */
  private def emptySnapshot(spark: SparkSession, dir: String, v: Long,
      sch: Option[org.apache.spark.sql.types.StructType]): DataFrame =
    sch match {
      case Some(s0) => emptyFrame(spark, s0)
      case None =>
        val files = readManifest(spark, dir, v)
          .select(col("file")).distinct()
          .collect().map(_.getString(0))
        require(files.nonEmpty,
          s"Versioned: version $v has an empty manifest and no committed " +
            "_schema.json sidecar to derive the snapshot schema from " +
            "(pre-evolution store) — re-commit any version to " +
            "materialize the sidecar")
        readFiles(spark, dir, files.toIndexedSeq, None).filter(lit(false))
    }

  /** Range read `lo <= keyCol <= hi` at snapshot `version`, planning its
    * file list FROM the manifest: a file is scanned only if SOME of its
    * (file, part) envelopes intersects the range (NULL stats = unknown =
    * always read). The answer is exactly `read(v).filter(...)` — the
    * envelope over-approximates and the residual filter is exact — but at
    * 100 TB the plan reads the matching files, not the snapshot. This is
    * the reference's dim point-lookup pattern (util/DimUtil.java:30-32,
    * `select * where id = ?`) done at lakehouse scale, composed with
    * time travel. */
  def readRange(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latest(dir) else version
    require(versions(dir).contains(v),
      s"Versioned: version $v not in ${versions(dir)}")
    val sch = readSchema(dir, v)
    val probePhys = sch.flatMap(_.fields.find(_.name == keyCol))
      .map(physName).getOrElse(keyCol)
    val mDf = readManifest(spark, dir, v)
    val (files, dvs) = pruneFiles(mDf, probePhys,
      (mn, mx, _) => mx >= lo && mn <= hi)
    val base =
      if (files.nonEmpty) applyDv(spark,
        readFiles(spark, dir, files, sch),
        dvs, logicalNameOf(sch))
      else emptySnapshot(spark, dir, v, sch)
    base.filter(col(keyCol).cast("long") >= lo &&
      col(keyCol).cast("long") <= hi)
  }

  /** Point read `keyCol = key` at snapshot `version` — the envelope
    * check first (free), then each surviving (file, part) row's Bloom
    * sketch: a file is scanned only if it MIGHT contain the key. No
    * false negatives (the Bloom guarantee), fpp bounds the extra files.
    * Under a partition layout uncorrelated with the key (the common
    * hash-bucket case) every envelope spans the key range and min/max
    * pruning degenerates — the Bloom tier is what keeps a point lookup
    * at `AS OF` from scanning the snapshot. */
  def readPoint(spark: SparkSession, dir: String, keyCol: String,
      key: Long, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latest(dir) else version
    require(versions(dir).contains(v),
      s"Versioned: version $v not in ${versions(dir)}")
    val sch = readSchema(dir, v)
    val probePhys = sch.flatMap(_.fields.find(_.name == keyCol))
      .map(physName).getOrElse(keyCol)
    val mDf = readManifest(spark, dir, v)
    val (files, dvs) = pruneFiles(mDf, probePhys,
      (mn, mx, bloom) => mn <= key && mx >= key &&
        (bloom.isNull || bloomMightContain(bloom, lit(key))))
    val base =
      if (files.nonEmpty) applyDv(spark,
        readFiles(spark, dir, files, sch),
        dvs, logicalNameOf(sch))
      else emptySnapshot(spark, dir, v, sch)
    base.filter(col(keyCol).cast("long") === key)
  }

  /** Batched point probe `keyCol IN keys` at snapshot `version` — N
    * keys amortized over ONE distributed manifest scan and ONE data
    * read of the union file set, where N [[readPoint]] calls pay N
    * manifest scans (ManifestScale prices a scan at seconds per probe
    * at the 10⁵-file tier, so the batch is the difference between a
    * key-list lookup that costs one probe and one that costs N). Plan:
    * per manifest row, the envelope rejects the whole batch span first,
    * then ONE sketch deserialization answers the in-envelope keys
    * ([[bloomAnyContain]]). Same guarantees as readPoint per key — no
    * false negatives, fpp-bounded extra files — and the planned set is
    * exactly the union of the per-key plans (sketches are
    * deterministic). Keys ship into the scan as a literal array:
    * thousands of keys, not millions — past that the probe stops being
    * a point lookup and belongs to `read(...).join(keys)`. */
  def readPoints(spark: SparkSession, dir: String, keyCol: String,
      keys: Seq[Long], version: Long = -1L): DataFrame = {
    require(keys.nonEmpty, "Versioned.readPoints: empty key batch")
    val ks = keys.distinct.sorted
    val v = if (version < 0) latest(dir) else version
    require(versions(dir).contains(v),
      s"Versioned: version $v not in ${versions(dir)}")
    val sch = readSchema(dir, v)
    val probePhys = sch.flatMap(_.fields.find(_.name == keyCol))
      .map(physName).getOrElse(keyCol)
    val mDf = readManifest(spark, dir, v)
    val kArr = typedlit(ks)
    val (files, dvs) = pruneFiles(mDf, probePhys,
      (mn, mx, bloom) => mn <= ks.last && mx >= ks.head &&
        (bloom.isNull || bloomAnyContain(bloom, mn, mx, kArr)))
    val base =
      if (files.nonEmpty) applyDv(spark,
        readFiles(spark, dir, files, sch),
        dvs, logicalNameOf(sch))
      else emptySnapshot(spark, dir, v, sch)
    base.filter(col(keyCol).cast("long").isInCollection(ks))
  }

  /** MERGE `source` into the latest snapshot, committing a NEW version
    * (same arms as [[Merge.into]]: op "D" deletes matched keys, anything
    * else upserts). Data files of prior versions are never touched: the
    * affected-partition files' surviving rows and the upserts land under
    * `data/v=next`, every untouched file is carried into the next
    * manifest by reference. Returns the committed version.
    *
    * CONTRACT: `keyCol` must determine `partCol` — a key never moves
    * between partition values across versions. The churned-partitions-only
    * rewrite depends on it: the anti-join that retires stale rows runs
    * only over source-affected partitions, so a key arriving under a NEW
    * partition value would leave its old row alive elsewhere (duplicate
    * key). `checkKeyMoves=true` verifies the contract per merge by
    * semi-joining source keys against the UNTOUCHED files' key column
    * (a key-column-only projected scan — correct but proportional to
    * table keys, so it is an opt-in audit lever, not the default path;
    * at 100 TB run it on the maintenance schedule, not per commit). */
  def merge(spark: SparkSession, dir: String, partCol: String,
      keyCol: String, source: DataFrame, opCol: String = "op",
      checkKeyMoves: Boolean = false, mergeSchema: Boolean = false,
      statsCol: Option[String] = None, statsCols: Seq[String] = Nil,
      txn: Option[(String, Long)] = None,
      parentVersion: Option[Long] = None): Long = {
    // parentVersion PINS the snapshot this merge derives from AND the
    // version it will commit (parent+1): a caller whose correctness
    // depends on what it read BEFORE the merge (mergeIdempotent's txn
    // check) must pin, so any interleaving commit turns into a loud
    // ConcurrentCommitException instead of a silent re-derive against a
    // newer latest. Unpinned callers keep the read-latest behavior.
    val v = parentVersion.getOrElse(latest(dir))
    require(versions(dir).contains(v),
      s"Versioned.merge: parentVersion $v is not a committed version")
    val next = v + 1
    val mDf = readManifest(spark, dir, v)
    val mSchema = mDf.schema
    val mRows = mDf.collect()
    val (fIdx, pIdx) = (mSchema.fieldIndex("file"), mSchema.fieldIndex("part"))
    val manifest = mRows.map(r => (r.getString(fIdx), r.getString(pIdx)))
    // the manifest rows are already on the driver — resolve dv paths from
    // them instead of re-scanning the manifest per file set (dvPathsOf's
    // distinct+collect was one more job per merge on the commit hot path)
    val dvIdx =
      if (mSchema.fieldNames.contains("dv")) Some(mSchema.fieldIndex("dv"))
      else None
    def dvOf(fs: Set[String]): Seq[String] = dvIdx match {
      case None => Seq.empty
      case Some(i) => mRows.iterator
        .filter(r => fs(r.getString(fIdx)))
        .flatMap(r => Option(r.getSeq[String](i)).getOrElse(Seq.empty))
        .toSeq.distinct
    }
    // ONE distinct-partition collect does double duty: the NULL-partition
    // guard and the affected set (the guard used to be its own full
    // source computation — one extra job per merge; a NULL partition
    // value surfaces here as a NULL in the distinct set)
    val affectedRaw = source.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0))
    require(!affectedRaw.contains(null),
      s"Versioned.merge: source carries NULL $partCol values — fix the " +
        "partition derivation upstream")
    val affected = affectedRaw.toSet
    val touched = manifest.filter { case (_, p) => affected(p) }
      .map(_._1).toSet
    if (checkKeyMoves) {
      val untouched = manifest.filter { case (f, _) => !touched(f) }
        .map(_._1).distinct.toIndexedSeq
      if (untouched.nonEmpty) {
        val uSch = readSchema(dir, v)
        val moved = applyDv(spark,
            readFiles(spark, dir, untouched, uSch),
            dvOf(untouched.toSet), logicalNameOf(uSch))
          .select(col(keyCol))
          .join(source.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
          .limit(5).collect()
        require(moved.isEmpty,
          s"Versioned.merge: source keys ${moved.map(_.get(0)).mkString(", ")}" +
            " already live under a DIFFERENT partition value — a key must " +
            s"determine its $partCol (the merge would otherwise leave the " +
            "old row alive and commit duplicate keys). Fix the partition " +
            "derivation upstream, or route the move as a delete under the " +
            "old partition plus an insert under the new one.")
      }
    }
    // rewrite all rows of touched files. With partitionBy layout a file
    // serves exactly one partition value; after recluster() a tile file
    // can span MANY partition values, so the rewrite granularity is the
    // whole touched file, not just the merged partitions (the file-level
    // touched-set logic below handles both — VersionedSpec documents the
    // granularity cost on reclustered stores)
    // DV'd touched files apply their tombstones here, so the rewrite
    // MATERIALIZES the deletes: tombstoned rows never reach the fresh
    // files, whose manifest rows carry no dv
    val slice =
      if (touched.isEmpty) read(spark, dir, v).filter(lit(false))
      else {
        val tSch = readSchema(dir, v)
        applyDv(spark,
          readFiles(spark, dir, touched.toIndexedSeq, tSch),
          dvOf(touched), logicalNameOf(tSch))
      }
    val kept = slice.join(
      source.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    val upserts = source.filter(col(opCol) =!= "D").drop(opCol)
    // Schema evolution (opt-in, the Delta/Iceberg mergeSchema contract):
    // source columns the snapshot lacks JOIN the schema; prior files are
    // never rewritten for it — they fill the new column with NULLs at
    // read time via the committed sidecar schema. Without the flag, the
    // historical behavior stands: the source is projected onto the
    // snapshot's columns (extra source columns dropped), and a source
    // MISSING a snapshot column fails the projection loudly.
    val out =
      if (!mergeSchema)
        kept.unionByName(upserts.select(kept.columns.map(col): _*))
      else {
        val keptTypes = kept.schema.map(f => f.name -> f.dataType)
        val srcTypes = upserts.schema.map(f => f.name -> f.dataType)
        val added = srcTypes.filterNot { case (n, _) =>
          kept.columns.contains(n) }
        val missing = keptTypes.filterNot { case (n, _) =>
          upserts.columns.contains(n) }
        val keptW = added.foldLeft(kept) { case (d, (n, t)) =>
          d.withColumn(n, lit(null).cast(t)) }
        val upsW = missing.foldLeft(upserts) { case (d, (n, t)) =>
          d.withColumn(n, lit(null).cast(t)) }
        keptW.unionByName(upsW.select(keptW.columns.map(col): _*))
      }
    // write PHYSICAL column names: `out` is logical (the slice read
    // projected physical -> logical), but data files always carry the
    // physical namespace — the column-mapping contract that lets a rename
    // commit move zero bytes. Columns added by mergeSchema map identity.
    val prevMap = mapping(readSchema(dir, v))
    val outPhys = out.select(out.columns.map(n =>
      col(n).as(prevMap.getOrElse(n, n))).toIndexedSeq: _*)
    val physPart = prevMap.getOrElse(partCol, partCol)
    val dataPath = newDataDir(dir, next)
    writeData(outPhys, dataPath, physPart)
    // an all-deletes merge writes no data files at all — the new
    // manifest is then just the carryover (the schema is pinned so the
    // empty case still commits a readable manifest)
    val manifestSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("part",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("rows",
        org.apache.spark.sql.types.LongType, nullable = true)))
    def anyParquet(f: java.io.File): Boolean =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .exists(anyParquet)
      else f.getName.endsWith(".parquet")
    val fresh =
      if (anyParquet(new java.io.File(dataPath)))
        fileParts(spark, dataPath, physPart,
          (statsCol.toSeq ++ statsCols).distinct
            .map(c => prevMap.getOrElse(c, c)), Some(outPhys.schema))
      else spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        manifestSchema)
    // carry untouched files' manifest rows VERBATIM (stats included —
    // their files are byte-identical, so their envelopes/sketches stay
    // exact forever); alignUnion NULL-fills when the two sides' stats
    // columns differ (stats added or dropped mid-history)
    val carried = mRows.filter(r => !touched(r.getString(fIdx)))
    val carriedDf = spark.createDataFrame(
      java.util.Arrays.asList(carried.toIndexedSeq: _*), mSchema)
    commitManifest(spark, dir, next, alignUnion(carriedDf, fresh),
      Some(withPhysMeta(out.schema, prevMap)), txn)
    next
  }

  /** DELETE by key WITHOUT rewriting data files — the deletion-vector
    * commit (see [[applyDv]]). One scan of the affected partitions'
    * files finds which FILES hold the keys; their (file, key) tombstones
    * land under `dir/dv/` and the new manifest's rows for exactly those
    * files gain the tombstone path in their `dv` array — every other
    * manifest row carries verbatim, zero data files move. Reads at the
    * new version anti-join the tombstones; prior versions still answer
    * with the rows (time travel holds — tombstones are referenced
    * per-version, never applied retroactively); the next [[merge]] or
    * [[compact]] that rewrites a DV'd file materializes the delete and
    * drops the dv. `keys` must carry `keyCol` and `partCol` (the same
    * key-determines-partition contract as [[merge]]).
    *
    * At 100 TB this is the GDPR-erase shape: deleting 1,000 users from
    * a petabyte table costs one partition-pruned scan plus a tombstone
    * file, not a terabyte rewrite. Tombstones are deletion-sized and
    * broadcast at read; BULK deletes (a partition's worth) belong on
    * the COW rewrite path ([[merge]] op "D"). Returns the committed
    * version. */
  def deleteKeysDv(spark: SparkSession, dir: String, partCol: String,
      keyCol: String, keys: DataFrame,
      checkKeyMoves: Boolean = false): Long = {
    val v = latest(dir)
    val next = v + 1
    val sch = readSchema(dir, v)
    val m = mapping(sch)
    val mDf = readManifest(spark, dir, v)
    val affected = keys.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val touched = mDf
      .filter(col("part").isin(affected.toSeq: _*))
      .select(col("file")).distinct().collect().map(_.getString(0)).toSet
    // same contract as merge: keys must live under the partition values
    // the `keys` frame claims, or the pruned scan never sees them and
    // the erase "succeeds" while the rows survive — the silent failure
    // mode a GDPR path cannot afford. `checkKeyMoves=true` is the same
    // opt-in audit lever as merge's: semi-join requested keys against
    // the UNTOUCHED files' live key column (key-column-pruned scan,
    // proportional to table keys — run it on the audit schedule).
    if (checkKeyMoves) {
      val all = mDf.select(col("file")).distinct()
        .collect().map(_.getString(0)).toSet
      val untouched = (all -- touched).toIndexedSeq
      if (untouched.nonEmpty) {
        val stray = applyDv(spark,
            readFiles(spark, dir, untouched, sch),
            dvPathsOf(mDf, Some(untouched.toSet)), logicalNameOf(sch))
          .select(col(keyCol))
          .join(keys.select(col(keyCol)).distinct(), Seq(keyCol),
            "left_semi")
          .limit(5).collect()
        require(stray.isEmpty,
          s"Versioned.deleteKeysDv: keys ${stray.map(_.get(0)).mkString(", ")}" +
            s" live under a DIFFERENT $partCol than the keys frame " +
            "claims — the pruned delete would miss them. Fix the " +
            "partition derivation (or delete under the true partitions).")
      }
    }
    if (touched.isEmpty) { // keys hit no live partition: commit a no-op
      commitManifest(spark, dir, next, mDf, sch)
      return next
    }
    // one partition-pruned scan attributes each deleted key to the
    // FILE(s) holding it — tombstones reference physical column names
    // (stable across renames) and stringified key values (both sides
    // cast at apply time)
    val physKey = m.getOrElse(keyCol, keyCol)
    // tag the source file SCAN-SIDE (input_file_name is single-source
    // only), then let prior tombstones apply above it — a re-delete on
    // an already-DV'd file attributes against its LIVE rows
    val tagged = readFiles(spark, dir, touched.toIndexedSeq, sch)
      .withColumn("__srcf", input_file_name())
    val live = applyDv(spark, tagged,
      dvPathsOf(mDf, Some(touched)), logicalNameOf(sch))
    val tomb = live
      .join(broadcast(keys.select(col(keyCol)).distinct()), Seq(keyCol))
      .select(col("__srcf").as("file"), lit(physKey).as("key_col"),
        col(keyCol).cast("string").as("key"))
    val dvPath = s"$dir/dv/v=$next-${System.nanoTime()}"
    tomb.coalesce(1).write.mode("errorifexists").parquet(dvPath)
    val dvFiles = spark.read.parquet(dvPath)
      .select(col("file")).distinct().collect().map(_.getString(0)).toSet
    if (dvFiles.isEmpty) { // keys absent from the live rows: no-op
      rmTree(new java.io.File(dvPath))
      commitManifest(spark, dir, next, mDf, sch)
      return next
    }
    val withDv =
      if (mDf.columns.contains("dv")) mDf
      else mDf.withColumn("dv", lit(null).cast("array<string>"))
    val updated = withDv.withColumn("dv",
      when(col("file").isin(dvFiles.toSeq: _*),
        array_union(coalesce(col("dv"),
          array().cast("array<string>")), array(lit(dvPath))))
        .otherwise(col("dv")))
    commitManifest(spark, dir, next, updated, sch)
    next
  }

  /** MATERIALIZE deletion vectors — the DV lifecycle's maintenance half
    * (Delta's PURGE / Iceberg's rewrite-position-deletes idea).
    * [[deleteKeysDv]] makes the DELETE cheap by deferring the rewrite;
    * every read after it pays the tombstone anti-join (~2× on a
    * post-delete full read, A/B-banked) until something rewrites the
    * DV'd files. Before this op the only absorption paths were a full
    * [[compact]] or a merge that happened to touch the DV'd partitions;
    * this rewrites ONLY files whose tombstone fraction exceeds
    * `threshold`, as a normal commit.
    *
    * Per qualifying file the rewrite is 1:1 — one source file, one
    * fresh file holding exactly its live rows (the `__bin` = source-file
    * trick, all files in ONE job) — so compact's bin-packing and
    * recluster's tiling survive materialization untouched: the file
    * keeps its row set minus the tombstones. Files at or below the
    * threshold keep answering through their DVs (their manifest rows
    * carry verbatim); fully-tombstoned files simply disappear from the
    * new manifest. Time travel holds: prior versions still reference
    * the old files + tombstones.
    *
    * Costs: the decision reads only the manifest plus the
    * deletion-sized tombstone files (driver-side, O(DV'd files) rows);
    * the rewrite scans only the qualifying files. At 100 TB this is the
    * scheduled sweep that bounds the DV read tax: with threshold t, a
    * read pays at most a t-fraction anti-join per file, and the sweep's
    * write amplification is capped by how much garbage a file may
    * accumulate before it rewrites. `threshold = 0.0` materializes
    * every DV'd file. Returns the committed version, or the CURRENT
    * version unchanged when no file qualifies (a scheduled no-op must
    * not pollute history with empty commits). */
  def materializeDvs(spark: SparkSession, dir: String, partCol: String,
      threshold: Double = 0.0, statsCol: Option[String] = None,
      statsCols: Seq[String] = Nil): Long = {
    require(threshold >= 0.0 && threshold < 1.0,
      s"Versioned.materializeDvs: threshold in [0, 1), got $threshold")
    val v = latest(dir)
    val sch = readSchema(dir, v)
    val prevMap = mapping(sch)
    val mDf = readManifest(spark, dir, v)
    if (!mDf.columns.contains("dv")) return v
    val mSchema = mDf.schema
    val mRows = mDf.collect()
    val fIdx = mSchema.fieldIndex("file")
    val rIdx = mSchema.fieldIndex("rows")
    val dvIdx = mSchema.fieldIndex("dv")
    val dvd: Set[String] = mRows
      .filter(r => !r.isNullAt(dvIdx) && r.getSeq[String](dvIdx).nonEmpty)
      .map(_.getString(fIdx)).toSet
    if (dvd.isEmpty) return v
    // physical (pre-DV) row count per file — a file may map several
    // (file, part) manifest rows after compact/recluster
    val physRows: Map[String, Long] = mRows.groupBy(_.getString(fIdx))
      .view.mapValues(_.map(_.getLong(rIdx)).sum).toMap
    // tombstone count per DV'd file. Structural invariant (deleteKeysDv):
    // a live file's dv array lists EVERY tombstone path carrying rows for
    // it, so grouping the union of the candidates' paths by file
    // attributes exactly. Tombstones are deletion-sized — this read is
    // the cheap half of the decision.
    val dvPaths = dvPathsOf(mDf, Some(dvd))
    val tombCounts: Map[String, Long] =
      spark.read.parquet(dvPaths.map(Manifest.unglob): _*)
        .select(col("file"), col("key_col"), col("key")).distinct()
        .groupBy(col("file")).agg(count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rewrite = dvd.filter { f =>
      tombCounts.getOrElse(f, 0L).toDouble >
        threshold * physRows(f).toDouble
    }.toIndexedSeq.sorted
    if (rewrite.isEmpty) return v
    val next = v + 1
    val physSch = sch.map(physicalSchema)
    require(!physSch.exists(_.fieldNames.contains("__bin")),
      "Versioned: column name __bin is reserved (materialization bin dirs)")
    val dataPath = newDataDir(dir, next)
    def norm(uri: String): String =
      try new org.apache.hadoop.fs.Path(new java.net.URI(uri)).toString
      catch { case _: java.net.URISyntaxException => uri }
    val binOf: Map[String, Int] = rewrite.zipWithIndex
      .flatMap { case (f, i) => Seq(f -> i, norm(f) -> i) }.toMap
    val binUdf = udf((f: String) => binOf.get(f).orElse(binOf.get(norm(f))))
    val reader = physSch.fold(spark.read)(spark.read.schema)
    // physical scan of ONLY the qualifying files; the anti-join rides the
    // same scan (physical key_col — no translation), one output file per
    // source file so the existing layout survives
    val liveScan = applyDv(spark,
      reader.parquet(rewrite.map(Manifest.unglob): _*)
        .withColumn("__bin", coalesce(binUdf(input_file_name()),
          raise_error(concat(
            lit("Versioned.materializeDvs: scanned a file outside the " +
              "rewrite set (file→bin normalization drift): "),
            input_file_name())).cast("int"))),
      dvPathsOf(mDf, Some(rewrite.toSet)), identity)
    liveScan
      .repartition(rewrite.size, col("__bin"))
      .write.partitionBy("__bin").mode("errorifexists").parquet(dataPath)
    val rewriteSet = rewrite.toSet
    val carried = mRows.filter(r => !rewriteSet(r.getString(fIdx)))
    val carriedDf = spark.createDataFrame(
      java.util.Arrays.asList(carried.toIndexedSeq: _*), mSchema)
    // a fully-tombstoned rewrite set writes no parquet at all — the new
    // manifest is just the carried rows (the dead files vanish)
    def hasParquet(f: java.io.File): Boolean =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).exists(hasParquet)
      else f.getName.endsWith(".parquet")
    val manifest =
      if (!hasParquet(new java.io.File(dataPath))) carriedDf
      else {
        val physPart = prevMap.getOrElse(partCol, partCol)
        val fresh = fileParts(spark, dataPath, physPart,
          (statsCol.toSeq ++ statsCols).distinct
            .map(c => prevMap.getOrElse(c, c)))
        alignUnion(carriedDf, fresh)
      }
    commitManifest(spark, dir, next, manifest, sch)
    next
  }

  /** Bin-pack the latest snapshot's SMALL files into fewer, larger
    * files, committed as a NEW version (the lakehouse OPTIMIZE /
    * rewrite-data-files maintenance pass). A long-lived store's merge
    * history leaves each churned partition one file per commit and many
    * tiny partitions one tiny file each; nothing else can retire that
    * tail without breaking `AS OF`. Compaction can, because it commits:
    * the new manifest references the packed files, every PRIOR manifest
    * still references the fragments (old versions read byte-identically
    * until [[vacuum]] reclaims them), and the data files a packed file
    * replaced are never mutated.
    *
    * Packing is greedy by ascending row count into bins of at most
    * `maxGroupRows` rows; only bins holding >= 2 files rewrite (a
    * singleton bin is already compact — carried by reference). A packed
    * file may serve MULTIPLE partition values; the manifest maps
    * (file, part) pairs, and [[merge]] already rewrites whole touched
    * files, so a later merge on any packed partition simply re-splits
    * that file — correctness is unchanged, the rewrite just spans the
    * bin. Pass the store's `statsCol` to keep the packed files'
    * envelopes/sketches prunable.
    *
    * At 100 TB: the plan is driver-side over the manifest (file-count
    * rows); ALL bins rewrite in ONE job — every fragment is scanned
    * once, tagged with its bin from a broadcast file→bin map on
    * `input_file_name()`, and hash-repartitioned on the bin id so each
    * bin's rows land in exactly one task writing exactly one packed
    * file. The pre-r16 shape (one `coalesce(1)` job per bin, submitted
    * serially from the driver) had a wall-clock floor of
    * bins × scheduling-latency — thousands of SEQUENTIAL driver-
    * coordinated jobs at production file counts; the single job's wall
    * is the actual I/O, and parallelism is the executor pool's, not the
    * driver loop's. Returns the committed version. */
  def compact(spark: SparkSession, dir: String, partCol: String,
      statsCol: Option[String] = None, maxGroupRows: Long = 1L << 20,
      statsCols: Seq[String] = Nil): Long = {
    val v = latest(dir)
    val next = v + 1
    val sch = readSchema(dir, v)
    val prevMap = mapping(sch)
    val mDf = readManifest(spark, dir, v)
    val mSchema = mDf.schema
    val mRows = mDf.collect()
    val (fIdx, rIdx) = (mSchema.fieldIndex("file"), mSchema.fieldIndex("rows"))
    val mnIdx =
      if (mSchema.fieldNames.contains("mn")) Some(mSchema.fieldIndex("mn"))
      else None
    // Pack order decides post-compact SKIPPING quality: packing by size
    // scrambles key ranges, so a packed file's envelope spans everything
    // and readPoint/readRange degrade to scanning every bin. With stats
    // present, pack by ascending key envelope instead — bins then hold
    // CONTIGUOUS key ranges and the packed files stay as prunable as the
    // fragments were (files with NULL stats sort last, packed together).
    val fileRows = mRows.groupBy(_.getString(fIdx)).view
      .mapValues { rs =>
        val n = rs.map(_.getLong(rIdx)).sum
        val mn = mnIdx.flatMap(i => rs.flatMap(r =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))).minOption)
        (n, mn)
      }.toSeq
      .sortBy { case (f, (n, mn)) => (mn.getOrElse(Long.MaxValue), n, f) }
      .map { case (f, (n, _)) => (f, n) }
    val groups = Vector.newBuilder[Vector[String]]
    var cur = Vector.empty[String]
    var curRows = 0L
    for ((f, n) <- fileRows) {
      if (cur.nonEmpty && curRows + n > maxGroupRows) {
        groups += cur; cur = Vector(f); curRows = n
      } else { cur :+= f; curRows += n }
    }
    if (cur.nonEmpty) groups += cur
    val rewrite = groups.result().filter(_.size >= 2)
    require(rewrite.nonEmpty,
      s"Versioned.compact: nothing to compact under $dir — every bin " +
        s"holds a single file at maxGroupRows=$maxGroupRows (raise it, " +
        "or the store is already compact)")
    val physSch = sch.map(physicalSchema)
    require(!physSch.exists(_.fieldNames.contains("__bin")),
      "Versioned: column name __bin is reserved (compaction bin dirs)")
    val dataPath = newDataDir(dir, next)
    // file → bin, keyed by the normalized path form input_file_name()
    // reports (manifest entries were themselves recorded from
    // input_file_name(), so both sides normalize identically)
    def norm(uri: String): String =
      try new org.apache.hadoop.fs.Path(new java.net.URI(uri)).toString
      catch { case _: java.net.URISyntaxException => uri }
    // both raw and normalized key forms: input_file_name() re-reports
    // the manifest's own recorded string when scanning the same files,
    // so the raw hash hit is the per-row hot path — the URI parse in
    // norm() only runs for a form drift that in practice never happens
    val binOf: Map[String, Int] = rewrite.zipWithIndex
      .flatMap { case (g, i) => g.flatMap(f => Seq(f -> i, norm(f) -> i)) }
      .toMap
    val binUdf = udf((f: String) => binOf.get(f).orElse(binOf.get(norm(f))))
    // physical read, physical write: compaction moves bytes between
    // files, never through the logical namespace — and reading under
    // the committed physical schema NULL-fills columns the oldest
    // fragments predate (schema evolution), exactly like any read
    val reader = physSch.fold(spark.read)(spark.read.schema)
    // DV'd fragments materialize their tombstones during the pack (the
    // anti-join rides the same scan — __bin and the dv file tag are both
    // computed scan-side, below the join); the packed files' fresh
    // manifest rows carry no dv. The scan is PHYSICAL, so the tombstone
    // key_col (physical by construction) applies with no translation.
    val packedScan = applyDv(spark,
      reader.parquet(rewrite.flatten.map(Manifest.unglob): _*)
        .withColumn("__bin", coalesce(binUdf(input_file_name()),
          raise_error(concat(
            lit("Versioned.compact: scanned a file outside the rewrite " +
              "set (file→bin normalization drift): "),
            input_file_name())).cast("int"))),
      dvPathsOf(mDf, Some(rewrite.flatten.toSet)), identity)
    packedScan
      .repartition(rewrite.size, col("__bin"))
      .write.partitionBy("__bin").mode("errorifexists").parquet(dataPath)
    val physPart = prevMap.getOrElse(partCol, partCol)
    val fresh = fileParts(spark, dataPath, physPart,
      (statsCol.toSeq ++ statsCols).distinct
        .map(c => prevMap.getOrElse(c, c)))
    val packed = rewrite.flatten.toSet
    val carried = mRows.filter(r => !packed(r.getString(fIdx)))
    val carriedDf = spark.createDataFrame(
      java.util.Arrays.asList(carried.toIndexedSeq: _*), mSchema)
    commitManifest(spark, dir, next, alignUnion(carriedDf, fresh), sch)
    next
  }

  /** RE-CLUSTER the latest snapshot along a space-filling curve — the
    * Delta `OPTIMIZE ZORDER BY` lifecycle as a store maintenance commit
    * (init-time layout only helps tables born clustered; real tables
    * accrete under an ingest partitioning and get their layout HERE).
    * One job rewrites every live row into curve-range tiles (top
    * `tileBits` bits of the `bits`-per-dim index over `dims`; rows
    * sorted by the full index inside each tile, so parquet row groups
    * inherit the locality too), commits fresh manifests with multi-dim
    * stats on `dims` — point/range probes on ANY dim then prune files
    * the way [[compact]]'s key-adjacent packing prunes its one key.
    *
    * Everything rides the existing contracts: DV'd files materialize
    * their tombstones during the rewrite; the schema is untouched (the
    * tile is directory layout, not a column — same `__bin` trick as
    * compact); time travel keeps prior versions in their old layout;
    * and the change feed across the recluster emits ZERO rows (the
    * key-diff drops rewritten-but-unchanged rows, exactly the compact
    * argument). `curve` is "hilbert" (default — unit-step locality) or
    * "zorder". At 100 TB this is the scheduled maintenance rewrite; its
    * cost is one full COW pass, amortized over every probe after it. */
  def recluster(spark: SparkSession, dir: String, partCol: String,
      dims: Seq[String], bits: Int, tileBits: Int = 5,
      curve: String = "hilbert", statsCols: Seq[String] = Nil): Long = {
    require(dims.size >= 2,
      s"Versioned.recluster: need >= 2 dims, got $dims")
    require(curve == "hilbert" || curve == "zorder",
      s"Versioned.recluster: unknown curve '$curve'")
    // tiles are partition DIRECTORIES and shuffle partitions: 2^20 is
    // already beyond any sane layout, and the cap keeps `1 << tileBits`
    // safely inside Int (a 31+ shift would wrap the partition count)
    require(tileBits >= 1 && tileBits <= math.min(20, dims.size * bits),
      s"Versioned.recluster: tileBits in [1, " +
        s"${math.min(20, dims.size * bits)}]")
    val v = latest(dir)
    val next = v + 1
    val sch = readSchema(dir, v)
    val prevMap = mapping(sch)
    val mDf = readManifest(spark, dir, v)
    val files = mDf.select(col("file")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    require(files.nonEmpty,
      s"Versioned.recluster: $dir has no data files at v$v")
    val physSch = sch.map(physicalSchema)
    require(!physSch.exists(s0 => s0.fieldNames.contains("__tile") ||
      s0.fieldNames.contains("__cidx")),
      "Versioned: column names __tile/__cidx are reserved (recluster)")
    val physDims = dims.map(d => prevMap.getOrElse(d, d)).map(col)
    val fn = if (curve == "hilbert") "graft_hilbert" else "graft_zvalue"
    val idx = call_function(fn, (lit(bits) +: physDims): _*)
    val reader = physSch.fold(spark.read)(spark.read.schema)
    val scan = applyDv(spark,
      reader.parquet(files.map(Manifest.unglob): _*),
      dvPathsOf(mDf, Some(files.toSet)), identity)
    val dataPath = newDataDir(dir, next)
    scan
      .withColumn("__cidx", idx)
      .withColumn("__tile",
        shiftright(col("__cidx"), dims.size * bits - tileBits))
      .repartition(1 << tileBits, col("__tile"))
      .sortWithinPartitions(col("__tile"), col("__cidx"))
      .drop("__cidx") // projection — the established order survives
      .write.partitionBy("__tile").mode("errorifexists").parquet(dataPath)
    val physPart = prevMap.getOrElse(partCol, partCol)
    val fresh = fileParts(spark, dataPath, physPart,
      (dims ++ statsCols).distinct.map(c => prevMap.getOrElse(c, c)))
    commitManifest(spark, dir, next, fresh, sch)
    next
  }

  /** RESTORE: roll the table back to `toVersion` by committing a NEW
    * version whose manifest (and sidecar schema) equal the old one's —
    * the Delta RESTORE contract. History is never rewritten: the bad
    * versions stay readable (audit), the restore is itself a commit
    * (concurrency-safe through the same protocol, visible in the change
    * feed as the inverse of what it undoes — [[changes]] across the
    * restore emits exactly the rows that revert), and zero data files
    * move (COW files of the restored version still exist unless
    * vacuumed past — a vacuumed target fails loudly at read, not
    * silently empty). Returns the committed version. */
  def restore(spark: SparkSession, dir: String, toVersion: Long): Long = {
    val v = latest(dir)
    require(versions(dir).contains(toVersion),
      s"Versioned.restore: version $toVersion not in ${versions(dir)}")
    require(toVersion < v,
      s"Versioned.restore: $toVersion is not a PRIOR version (latest $v)")
    val next = v + 1
    commitManifest(spark, dir, next,
      readManifest(spark, dir, toVersion),
      readSchema(dir, toVersion))
    next
  }

  /** SHALLOW CLONE: commit `dst`'s version 1 as a ZERO-COPY fork of
    * `src` at `version` (default latest) — the Delta SHALLOW CLONE
    * contract. The manifest is copied BY REFERENCE: every row keeps its
    * absolute path into `src`'s immutable data files (stats included —
    * the files are byte-identical, so their envelopes stay exact), the
    * committed sidecar schema rides along, and zero data bytes move.
    * Later writes to the clone COW into the CLONE's own data dir:
    * [[merge]] rewrites only churned partitions (into `dst/data/...`)
    * and carries untouched `src` files by reference until the clone
    * churns them — the fork pays only for its own divergence, which at
    * 100 TB is the difference between an experiment costing gigabytes
    * and one costing the table.
    *
    * CAVEAT (the same one Delta documents): the clone references
    * `src`'s files but `src`'s [[vacuum]] does not know about clones —
    * vacuuming `src` past the cloned version breaks the clone's
    * un-diverged partitions. Pin `src` retention at (or compact the
    * clone fully after) the fork point. `vacuum(dst)` is always safe:
    * its orphan walk deletes only under `dst/data`, never `src`'s
    * files. Returns the clone's committed version (1). */
  def shallowClone(spark: SparkSession, src: String, dst: String,
      version: Long = -1L, commitProtocol: String = "rename"): Long = {
    require(versions(dst).isEmpty, s"Versioned: $dst already initialized")
    require(commitProtocol == "rename" || commitProtocol == "cas",
      s"Versioned: unknown commitProtocol '$commitProtocol'")
    val v = if (version < 0) latest(src) else version
    require(versions(src).contains(v),
      s"Versioned: version $v not in ${versions(src)}")
    if (commitProtocol == "cas") {
      val f = casMarker(dst)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath,
        """{"protocol": "cas"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    commitManifest(spark, dst, 1L,
      readManifest(spark, src, v), readSchema(src, v))
    1L
  }

  /** BACKFILL stats manifests for the latest snapshot — the write-path
    * knob behind stats-on-maintenance-only stores (r16 verdict task 1):
    * a write-heavy path merges with NO stats (each commit's manifest
    * scan is count-only), and this pass — scheduled with [[compact]] /
    * [[vacuum]] — commits a NEW version whose manifest carries the full
    * min/max + Bloom envelope for every `statsCols` column (logical
    * names) across EVERY file of the snapshot, with zero data movement.
    * Files already carrying the requested stats are recomputed anyway
    * (one pass, uniform manifest — the scan is the cost either way and
    * the envelopes come out identical because data files are immutable).
    * Point/range reads at the new version prune exactly as if every
    * commit had carried stats; prior versions keep their own manifests.
    *
    * At 100 TB this is one column-pruned scan of the snapshot's stats
    * columns — strictly cheaper than a compaction rewrite, amortized
    * across the merges that skipped per-commit stats collection. */
  def backfillStats(spark: SparkSession, dir: String, partCol: String,
      statsCols: Seq[String]): Long = {
    require(statsCols.nonEmpty,
      "Versioned.backfillStats: no stats columns requested")
    val v = latest(dir)
    val next = v + 1
    val sch = readSchema(dir, v)
    val m = mapping(sch)
    val mDf = readManifest(spark, dir, v)
    val files = mDf.select(col("file")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    val physPart = m.getOrElse(partCol, partCol)
    val fresh =
      if (files.isEmpty) mDf // all-deletes tail: nothing to describe
      else {
        // raw PHYSICAL read of the snapshot's files (stats describe
        // physical columns; [[pruneFiles]] probes by physical name)
        val raw = sch match {
          case Some(s0) => spark.read.schema(physicalSchema(s0))
            .parquet(files.map(Manifest.unglob): _*)
          case None =>
            spark.read.parquet(files.map(Manifest.unglob): _*).drop(PartDir)
        }
        val stats = filePartsOf(raw, physPart,
          statsCols.map(c => m.getOrElse(c, c)).distinct)
        // deletion vectors MUST carry forward: a backfilled manifest
        // without the prior rows' dv arrays would resurrect tombstoned
        // rows (the recomputed envelopes still cover deleted keys — a
        // valid over-approximation; the dv is the correctness bit)
        if (!mDf.columns.contains("dv")) stats
        else stats.join(
          mDf.select(col("file"), col("dv")).distinct(), Seq("file"), "left")
      }
    commitManifest(spark, dir, next, fresh, sch)
    next
  }

  /** RENAME a column — a metadata-only commit (the Delta column-mapping
    * contract): the new version's sidecar schema carries the new LOGICAL
    * name while the field keeps its on-disk PHYSICAL name, the manifest
    * is copied by reference, and ZERO data files are touched. A read at
    * any PRIOR version still answers in that version's own names (each
    * sidecar is a committed fact); a later [[merge]]'s fresh files keep
    * writing the physical name, so one physical schema spans the whole
    * history. Returns the committed version. */
  def renameColumn(spark: SparkSession, dir: String, from: String,
      to: String): Long = {
    val v = latest(dir)
    val next = v + 1
    val sch = readSchema(dir, v).getOrElse(throw new IllegalArgumentException(
      s"Versioned.renameColumn: $dir has no committed _schema.json " +
        "sidecar (pre-evolution store) — commit any merge first"))
    require(sch.fieldNames.contains(from),
      s"Versioned.renameColumn: no column $from in ${sch.fieldNames.toSeq}")
    require(!sch.fieldNames.contains(to),
      s"Versioned.renameColumn: column $to already exists")
    require(to != PartDir, s"Versioned: column name $PartDir is reserved")
    val newSch = org.apache.spark.sql.types.StructType(sch.fields.map { f =>
      if (f.name != from) f
      else {
        val phys = physName(f)
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        val md = (if (phys != to) mb.putString(PhysKey, phys)
                  else mb.remove(PhysKey)).build()
        org.apache.spark.sql.types.StructField(to, f.dataType, f.nullable, md)
      }
    })
    commitManifest(spark, dir, next,
      readManifest(spark, dir, v), Some(newSch))
    next
  }

  /** DROP a column — metadata-only, like [[renameColumn]]: the new
    * sidecar schema simply omits the field; data files keep the bytes
    * (prior versions still read them) until their files churn out of
    * later manifests naturally. Do NOT drop the partition or merge-key
    * column — later merges need both (the store does not record them, so
    * this cannot be validated here). */
  def dropColumn(spark: SparkSession, dir: String, name: String): Long = {
    val v = latest(dir)
    val next = v + 1
    val sch = readSchema(dir, v).getOrElse(throw new IllegalArgumentException(
      s"Versioned.dropColumn: $dir has no committed _schema.json sidecar"))
    require(sch.fieldNames.contains(name),
      s"Versioned.dropColumn: no column $name in ${sch.fieldNames.toSeq}")
    require(sch.fields.length >= 2,
      "Versioned.dropColumn: refusing to drop the last column")
    val mDf = readManifest(spark, dir, v)
    // dropping the column live deletion vectors KEY ON would brick the
    // snapshot: every read applies the dvs by that (physical) column,
    // which the post-drop projection no longer carries — refuse loudly
    // (rewrite the dvs away first: any merge/compact of the DV'd files
    // materializes them). The check reads key_col from the handful of
    // referenced tombstone files — deletion-sized, not table-sized.
    val phys = sch.fields.find(_.name == name).map(physName).getOrElse(name)
    val dvs = dvPathsOf(mDf)
    if (dvs.nonEmpty) {
      // unglob like every other DV read (applyDv, recluster): manifest
      // paths are raw strings, and glob metacharacters or spaces in the
      // store path would otherwise make this guard throw path-not-found
      val dvKeyCols = spark.read.parquet(dvs.map(Manifest.unglob): _*)
        .select(col("key_col")).distinct()
        .collect().map(_.getString(0)).toSet
      require(!dvKeyCols.contains(phys),
        s"Versioned.dropColumn: live deletion vectors key on '$name' " +
          s"(physical '$phys') — every read at the new version would " +
          "fail to apply them. Materialize the tombstones first " +
          "(compact, or merge the affected partitions), then drop.")
    }
    commitManifest(spark, dir, next, mDf,
      Some(org.apache.spark.sql.types.StructType(
        sch.fields.filter(_.name != name))))
    next
  }

  /** Row-level CHANGE FEED between two committed versions (the
    * lakehouse CDF idea): every key inserted ("I"), updated ("U"), or
    * deleted ("D") going `fromV` → `toV`, with the surviving row's
    * values (the retired row's for "D").
    *
    * The COW layout makes this cheap at 100 TB: files shared by both
    * manifests are byte-identical (append-only store), so their rows
    * CANNOT differ — only files unique to either manifest participate.
    * The diff therefore reads ~the churned partitions of the interval,
    * never the table; rewritten-but-unchanged rows (kept rows inside a
    * churned partition) compare equal and are excluded. Under schema
    * evolution both slices read through `toV`'s committed schema, so a
    * column added in the interval shows as NULL-before. */
  def changes(spark: SparkSession, dir: String, fromV: Long, toV: Long,
      keyCol: String): DataFrame = changesImpl(spark, dir, fromV, toV,
        keyCol, withPreImages = false)

  /** [[changes]] with UPDATE PRE-IMAGES (the full Delta-CDF row
    * contract): an updated key emits TWO rows — op "U_pre" carrying the
    * retired values and "U_post" the surviving ones — alongside "I" and
    * "D". This is the shape an incremental consumer needs to maintain a
    * downstream AGGREGATE without recompute: sum the payload with sign
    * +1 for I/U_post and -1 for D/U_pre and the delta applies in one
    * pass, in any order (addition commutes — see the stream_k21_cdf
    * gate). Same churned-partitions-only file pruning as [[changes]]. */
  def changesWithPreImages(spark: SparkSession, dir: String, fromV: Long,
      toV: Long, keyCol: String): DataFrame =
    changesImpl(spark, dir, fromV, toV, keyCol, withPreImages = true)

  private def changesImpl(spark: SparkSession, dir: String, fromV: Long,
      toV: Long, keyCol: String, withPreImages: Boolean): DataFrame = {
    require(fromV < toV, s"Versioned.changes: need fromV < toV, got $fromV >= $toV")
    val vs = versions(dir)
    require(vs.contains(fromV) && vs.contains(toV),
      s"Versioned.changes: versions ($fromV, $toV) must both be in $vs")
    // identity is (file, dv signature): a DV delete changes no file but
    // MUST churn the slice — the file re-reads on both sides, old
    // tombstones vs new, and the key diff emits exactly the newly
    // tombstoned rows as "D" (a compaction-style rewrite stays invisible
    // exactly as before: rewritten-but-unchanged rows drop out)
    def manifestEntries(v: Long): Map[String, Seq[String]] = {
      val m = readManifest(spark, dir, v)
      val hasDv = m.columns.contains("dv")
      val sel =
        if (hasDv) m.select(col("file"), col("dv")).distinct()
        else m.select(col("file"),
          lit(null).cast("array<string>").as("dv")).distinct()
      sel.collect().map { r =>
        val dv = if (r.isNullAt(1)) Seq.empty[String]
          else r.getSeq[String](1).toIndexedSeq
        r.getString(0) -> dv
      }.groupBy(_._1).view
        .mapValues(_.flatMap(_._2).distinct.sorted.toIndexedSeq)
        .toMap
    }
    val (e1, e2) = (manifestEntries(fromV), manifestEntries(toV))
    val (m1, m2) = (e1.keySet, e2.keySet)
    val id1 = e1.toSet
    val id2 = e2.toSet
    val schema = readSchema(dir, toV)
    def slice(files: Set[String]): DataFrame =
      if (files.isEmpty) schema match {
        // schema-correct empty frame straight from the committed sidecar
        // — robust even when toV's own manifest is EMPTY (an all-deletes
        // merge that retired every file), where a zero-path parquet read
        // would throw instead of answering with an empty feed
        case Some(sch) => spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), sch)
        case None =>
          require(m2.nonEmpty,
            s"Versioned.changes: version $toV has an empty manifest and " +
              "no committed _schema.json sidecar to derive the change-feed " +
              "schema from (pre-evolution store) — re-commit any version " +
              "to materialize the sidecar")
          readFiles(spark, dir, m2.toIndexedSeq, schema).filter(lit(false))
      }
      else readFiles(spark, dir, files.toIndexedSeq, schema)
    def dvSlice(churned: Set[String], dvs: Map[String, Seq[String]])
        : DataFrame =
      applyDv(spark, slice(churned),
        churned.toSeq.flatMap(f => dvs.getOrElse(f, Seq.empty)).distinct,
        logicalNameOf(schema))
    val oldChurned = (id1 -- id2).map(_._1)
    val newChurned = (id2 -- id1).map(_._1)
    val oldS = dvSlice(oldChurned, e1)
    val newS = dvSlice(newChurned, e2)
    val cols = newS.columns.toSeq
    val payload = cols.filterNot(_ == keyCol)
    val o = oldS.select(col(keyCol),
      struct(payload.map(col): _*).as("__o"))
    val n = newS.select(col(keyCol),
      struct(payload.map(col): _*).as("__n"))
    val diffed = o.join(n, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("__o").isNull, "I")
          .when(col("__n").isNull, "D")
          .when(!(col("__o") <=> col("__n")), "U"))
      .filter(col("op").isNotNull) // rewritten-but-unchanged drops out
    if (!withPreImages)
      diffed.select(Seq(col("op"), col(keyCol)) ++ payload.map(c =>
        // U/I carry the NEW row's values (even where the new value is
        // NULL — coalesce would wrongly resurrect the old one); D
        // carries the retired row's
        when(col("op") === "D", col(s"__o.$c"))
          .otherwise(col(s"__n.$c")).as(c)): _*)
    else
      // an update fans out into its pre/post pair scan-side (one
      // explode, no second diff pass)
      diffed.select(col(keyCol), col("__o"), col("__n"),
          explode(when(col("op") === "U",
            array(lit("U_pre"), lit("U_post")))
            .otherwise(array(col("op")))).as("op"))
        .select(Seq(col("op"), col(keyCol)) ++ payload.map(c =>
          when(col("op").isin("D", "U_pre"), col(s"__o.$c"))
            .otherwise(col(s"__n.$c")).as(c)): _*)
  }

  /** [[merge]] with the optimistic-concurrency RETRY LOOP a contended
    * writer needs: on losing a commit race (the IllegalStateException
    * the atomic rename throws), re-run the whole merge against the NEW
    * latest — correct by construction because [[merge]] re-reads
    * `latest(dir)` and re-derives its slice on every attempt, so the
    * retry sees (and preserves) the winner's rows. Source semantics must
    * be retry-safe the way MERGE sources are: the same upsert applied
    * against a newer snapshot (our arms are; a read-modify-write source
    * computed OUTSIDE the merge would need re-derivation by the caller).
    * `maxAttempts` exhaustion rethrows the last loss. */
  def mergeRetry(spark: SparkSession, dir: String, partCol: String,
      keyCol: String, source: DataFrame, opCol: String = "op",
      checkKeyMoves: Boolean = false, mergeSchema: Boolean = false,
      statsCol: Option[String] = None, maxAttempts: Int = 5,
      statsCols: Seq[String] = Nil): Long = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    var last: ConcurrentCommitException = null
    while (attempt < maxAttempts) {
      attempt += 1
      // retry ONLY the commit race — any other IllegalStateException
      // (broken invariant, stopped context) propagates on attempt 1
      try return merge(spark, dir, partCol, keyCol, source, opCol,
        checkKeyMoves, mergeSchema, statsCol, statsCols)
      catch {
        case e: ConcurrentCommitException =>
          last = e
          Thread.sleep(10L * attempt)
      }
    }
    throw new ConcurrentCommitException(
      s"Versioned.mergeRetry: lost the commit race $maxAttempts times " +
        s"under $dir — contention exceeds the retry budget", last)
  }

  /** The LAST txn_version application `appId` committed into this
    * store's log, or None if it never wrote one. Scans versions
    * newest-first and stops at the first `_txn.json` naming `appId` —
    * commits are linear, so the first hit IS the app's latest. Cost is
    * O(versions since the app's last write): one tiny sidecar read per
    * version walked, no data or manifest scan. At 100 TB the walk is
    * bounded the way Delta bounds it — an app that writes every batch
    * finds its record within one interleaving window; a log checkpoint
    * would fold these into one file, and the sidecar-per-version layout
    * is exactly the shape such a fold consumes. */
  def txnVersion(dir: String, appId: String): Option[Long] = {
    val live = versions(dir).reverse.iterator.map { v =>
      readTxnSidecar(new java.io.File(manifestDir(dir, v), "_txn.json"))
        .collect { case (app, tv) if app == appId => tv }
    }.collectFirst { case Some(tv) => tv }
    // a live hit is committed at a HIGHER version than anything a vacuum
    // rolled up, and txn versions are monotonic per app — so it wins;
    // the rollup answers only for apps idle past the retention window
    live.orElse(txnRollup(dir).get(appId))
  }

  /** EXACTLY-ONCE writer entry point: [[merge]] that skips — commits
    * NOTHING, not even an empty version — when `(appId, txnVer)` is
    * already recorded in the log at `txnVer` or later. The txn fact
    * rides the same atomic commit as the manifest, so the check-then-
    * commit race resolves itself: two replayed writers of the same
    * batch both pass the check, exactly one wins the version commit,
    * and the loser's retry re-reads the log, finds the txn recorded,
    * and skips. This is what makes a Structured Streaming foreachBatch
    * restart safe ([[upsertSink]]): a crash AFTER the store commit but
    * BEFORE the checkpoint's offset commit redelivers the batch under
    * the same batchId, and the redelivery lands here as a no-op.
    * Returns (version, committed): the store's latest after the call,
    * and whether THIS call committed it. `txnVer` must be monotonic per
    * app (batchIds are); a lower-than-recorded value is treated as the
    * same replay shape and skipped.
    *
    * SOUNDNESS: the txn check and the commit are made effectively
    * atomic by PINNING the parent version — the merge derives from and
    * commits exactly (checked-latest)+1, so ANY commit interleaving
    * between the check and ours (the other replica of this very batch
    * included) collides on the version and surfaces as the commit race,
    * never as a silent re-derive against a newer latest that would
    * double-apply the batch. */
  def mergeIdempotent(spark: SparkSession, dir: String, partCol: String,
      keyCol: String, source: DataFrame, appId: String, txnVer: Long,
      opCol: String = "op", mergeSchema: Boolean = false,
      statsCol: Option[String] = None, statsCols: Seq[String] = Nil,
      maxAttempts: Int = 5): (Long, Boolean) = {
    // the id round-trips through a JSON sidecar (regex-parsed, `.` stops
    // at line terminators) and a \n-separated vacuum rollup — restrict
    // to a token alphabet so a malformed id fails HERE, not as a
    // never-matching sidecar that silently voids idempotence
    require(appId.nonEmpty && appId.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"Versioned.mergeIdempotent: appId must match [A-Za-z0-9._-]+: '$appId'")
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    var last: ConcurrentCommitException = null
    while (attempt < maxAttempts) {
      attempt += 1
      val parent = latest(dir)
      if (txnVersion(dir, appId).exists(_ >= txnVer))
        return (latest(dir), false)
      try return (merge(spark, dir, partCol, keyCol, source, opCol,
        checkKeyMoves = false, mergeSchema = mergeSchema,
        statsCol = statsCol, statsCols = statsCols,
        txn = Some((appId, txnVer)), parentVersion = Some(parent)), true)
      catch {
        case e: ConcurrentCommitException =>
          last = e
          Thread.sleep(10L * attempt)
      }
    }
    throw new ConcurrentCommitException(
      s"Versioned.mergeIdempotent: lost the commit race $maxAttempts " +
        s"times under $dir — contention exceeds the retry budget", last)
  }

  /** A foreachBatch function that upserts each micro-batch into the
    * store EXACTLY ONCE across query restarts — the streaming-ingest
    * sink (Delta's txnAppId/txnVersion contract, re-expressed): wire it
    * as `stream.writeStream.foreachBatch(Versioned.upsertSink(...))`
    * with a DURABLE checkpoint. Spark's contract makes batch content
    * deterministic per batchId for replayable sources, so `batchId` is
    * the txn version; a post-commit-pre-checkpoint crash redelivers the
    * batch and [[mergeIdempotent]] skips it. The store must already be
    * initialized — batch data cannot init it idempotently (init has no
    * txn seat) and a sink that silently creates tables hides deployment
    * mistakes. */
  def upsertSink(spark: SparkSession, dir: String, partCol: String,
      keyCol: String, appId: String, opCol: String = "op")
      : (DataFrame, Long) => Unit = {
    require(versions(dir).nonEmpty,
      s"Versioned.upsertSink: store $dir must be initialized before " +
        "streaming into it (Versioned.init)")
    (batch: DataFrame, batchId: Long) => {
      mergeIdempotent(spark, dir, partCol, keyCol, batch, appId, batchId,
        opCol)
      ()
    }
  }

  /** [[deleteKeysDv]] with the same optimistic-concurrency retry loop as
    * [[mergeRetry]] — correct for the same reason: every attempt
    * re-reads `latest(dir)` and re-derives its tombstones against the
    * winner's snapshot (a file the winner rewrote no longer holds the
    * key, or holds it in a fresh file the re-derived scan attributes
    * correctly). Retries ONLY the commit race. */
  def deleteKeysDvRetry(spark: SparkSession, dir: String, partCol: String,
      keyCol: String, keys: DataFrame, maxAttempts: Int = 5): Long = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    var last: ConcurrentCommitException = null
    while (attempt < maxAttempts) {
      attempt += 1
      try return deleteKeysDv(spark, dir, partCol, keyCol, keys)
      catch {
        case e: ConcurrentCommitException =>
          last = e
          Thread.sleep(10L * attempt)
      }
    }
    throw new ConcurrentCommitException(
      s"Versioned.deleteKeysDvRetry: lost the commit race $maxAttempts " +
        s"times under $dir — contention exceeds the retry budget", last)
  }

  /** Reclaim CRASHED and LOST-RACE commit attempts: every attempt
    * writes its data under a token-unique dir and only the atomic
    * manifest rename commits it, so a writer that died mid-attempt (or
    * lost the race) leaves a data dir no manifest references — invisible
    * to reads, never blocking (the next attempt takes a fresh token),
    * just occupying space. This deletes every data dir with ZERO files
    * referenced by any committed manifest, plus any stranded `.tmp-v=*`
    * manifest staging dirs, and returns the removed data-dir names. Run
    * it like [[vacuum]] — from the maintenance schedule with writers
    * quiesced; an IN-FLIGHT attempt looks exactly like a crash from
    * here. */
  def recover(spark: SparkSession, dir: String): Seq[String] = {
    val referenced = versions(dir).flatMap { v =>
      readManifest(spark, dir, v)
        .select(col("file")).distinct()
        .collect().map(r => new java.io.File(
          new org.apache.hadoop.fs.Path(
            new java.net.URI(r.getString(0))).toUri.getPath).getCanonicalPath)
    }.toSet
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .toSeq.flatMap(files)
      else Seq(f)
    val orphaned = Option(new java.io.File(s"$dir/data").listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        !files(d).exists(f => f.getName.endsWith(".parquet") &&
          referenced(f.getCanonicalPath)))
      .map(_.getName).sorted.toIndexedSeq
    orphaned.foreach(n => rmTree(new java.io.File(s"$dir/data/$n")))
    // stranded staging: rename-mode `.tmp-v=*` dirs, CAS-mode `.ptr-*`
    // temp files, and CAS staged manifest dirs no committed pointer
    // references (a lost race that crashed before its own cleanup)
    val pointed = versions(dir)
      .map(v => new java.io.File(manifestDir(dir, v)).getName).toSet
    Option(new java.io.File(logRoot(dir)).listFiles())
      .getOrElse(Array.empty)
      .filter { f =>
        (f.isDirectory && f.getName.startsWith(".tmp-v=")) ||
          (f.isFile && f.getName.startsWith(".ptr-")) ||
          (f.isDirectory && f.getName.startsWith("m-") && !pointed(f.getName))
      }
      .foreach(rmTree)
    orphaned
  }

  /** Reclaim history: drop manifests BELOW `retainFrom` and delete every
    * data file no retained manifest references. The explicit maintenance
    * pass the scaladoc promises (k13 economics) — never the write path;
    * after it, `read` at any retained version is unchanged (its files
    * were all referenced, hence kept) and older versions are gone.
    * Returns the deleted data-file count. */
  def vacuum(spark: SparkSession, dir: String, retainFrom: Long): Int = {
    val (drop, keep) = versions(dir).partition(_ < retainFrom)
    require(keep.nonEmpty,
      s"Versioned.vacuum: retainFrom=$retainFrom would drop every version")
    val referenced = keep.flatMap { v =>
      readManifest(spark, dir, v)
        .select(col("file")).distinct()
        .collect().map(r => new java.io.File(
          new org.apache.hadoop.fs.Path(
            new java.net.URI(r.getString(0))).toUri.getPath).getCanonicalPath)
    }.toSet
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .toSeq.flatMap(walk)
      else Seq(f)
    val orphans = walk(new java.io.File(s"$dir/data"))
      .filter(f => f.getName.endsWith(".parquet") &&
        !referenced(f.getCanonicalPath))
    orphans.foreach(_.delete())
    // deletion-vector economics ride the same pass: tombstone dirs no
    // retained manifest's dv array references are reclaimed with their
    // versions (a dv referenced by ANY retained manifest must survive
    // or reads there would resurrect deleted rows)
    val dvRoot = new java.io.File(s"$dir/dv")
    if (dvRoot.isDirectory) {
      val keptDvs = keep.flatMap { v =>
        dvPathsOf(readManifest(spark, dir, v))
      }.map(p => new java.io.File(p).getCanonicalPath).toSet
      Option(dvRoot.listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && !keptDvs(d.getCanonicalPath))
        .foreach(rmTree)
    }
    // carry dropped txn facts forward BEFORE any manifest dies: an
    // idempotent app idle longer than the retention window must still
    // find its last txn_version, or a replayed batch double-applies.
    // The max-merge of (existing rollups + dropping manifests' txns) is
    // written as a NEW rollup first, old rollups deleted after — a crash
    // between the two leaves duplicates, which max-merge absorbs.
    // (Single-maintenance-writer assumption, same as vacuum itself.)
    val oldRollups = txnRollupFiles(dir)
    val carried = scala.collection.mutable.Map[String, Long]()
    txnRollup(dir).foreach { case (a, tv) => carried(a) = tv }
    drop.foreach { v =>
      readTxnSidecar(new java.io.File(manifestDir(dir, v), "_txn.json"))
        .foreach { case (a, tv) =>
          if (carried.getOrElse(a, Long.MinValue) < tv) carried(a) = tv }
    }
    if (carried.nonEmpty) {
      val body = carried.toSeq.sortBy(_._1)
        .map { case (a, tv) => s"$a\t$tv" }.mkString("\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          s"${logRoot(dir)}/_txns-$retainFrom-${System.nanoTime()}.tsv"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      oldRollups.foreach(f => { f.delete(); () })
    }
    drop.foreach { v =>
      // resolve BEFORE deleting the pointer: a CAS version is a pointer
      // file + its staged manifest dir, a rename version just the dir
      val md = new java.io.File(manifestDir(dir, v))
      rmTree(md)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"${logRoot(dir)}/v=$v.ptr"))
      ()
    }
    orphans.size
  }

  private def txnRollupFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(logRoot(dir)).listFiles())
      .getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && f.getName.startsWith("_txns-") &&
        f.getName.endsWith(".tsv"))

  /** Max-merged txn facts from every vacuum rollup under the log —
    * the VACUUMED history's contribution to [[txnVersion]]. */
  private def txnRollup(dir: String): Map[String, Long] =
    txnRollupFiles(dir).flatMap { f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty).map { line =>
          val i = line.lastIndexOf('\t')
          (line.substring(0, i), line.substring(i + 1).toLong)
        }
    }.groupBy(_._1).map { case (a, vs) => a -> vs.map(_._2).max }

  private def readTxnSidecar(f: java.io.File): Option[(String, Long)] =
    if (!f.isFile) None
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val re = """\{"app_id": "(.*)", "txn_version": (-?\d+)\}""".r
      txt.trim match {
        case re(app, tv) => Some((app, tv.toLong))
        case _ => None
      }
    }
}

