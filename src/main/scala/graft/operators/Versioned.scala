package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned copy-on-write table — MERGE with time travel (the
  * lakehouse log idea, reference analogue: the dim store's key-addressed
  * upsert generalized to versioned MERGE; on Delta/Iceberg this slot is
  * the transaction log + `VERSION AS OF`).
  *
  * Layout under `dir`:
  *   - `data/v=N/…parquet` — files WRITTEN BY version N (append-only:
  *     once written, never rewritten or deleted by later merges)
  *   - `_log/v=N/…parquet` — version N's manifest: (file, part, rows),
  *     one row per (data file, partition value) it serves. A snapshot
  *     IS its manifest's file set; untouched files are carried into the
  *     next manifest BY REFERENCE, so a merge writes only churned
  *     partitions' rows plus one tiny manifest.
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
  private def dataDir(dir: String, v: Long) = s"$dir/data/v=$v"

  /** Committed versions, ascending (directory listing of the log — one
    * entry per version, no file reads). */
  def versions(dir: String): Seq[Long] =
    Option(new java.io.File(logRoot(dir)).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong).sorted.toIndexedSeq

  def latest(dir: String): Long = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"Versioned: no committed versions under $dir")
    vs.last
  }

  /** (file, part, rows) for every data file under `path` — the manifest
    * rows for a freshly-written version. One narrow scan of the new
    * files only (`partCol` is stored IN the data, so no directory
    * inference is involved). */
  private def fileParts(spark: SparkSession, path: String,
      partCol: String): DataFrame =
    spark.read.parquet(path).drop(PartDir)
      .groupBy(input_file_name().as("file"),
        col(partCol).cast("string").as("part"))
      .agg(count(lit(1)).as("rows"))

  /** Reserved directory-level name for the partition value. The value is
    * ALSO kept as a regular data column, so manifest-listed files can be
    * read directly with no partition-discovery coupling to the layout
    * (directory inference across version levels is exactly the kind of
    * name-collision trap a payload column called "v" would spring). */
  private val PartDir = "__part"

  /** Write `df` as version `v`'s data: one directory per partition value
    * keeps the file↔partition mapping exact BY CONSTRUCTION (a file can
    * only ever serve one partition value, so a merge never drags
    * unaffected rows into a rewrite), independent of task count or AQE
    * partition coalescing. */
  private def writeData(df: DataFrame, dir: String, v: Long,
      partCol: String): Unit =
    df.withColumn(PartDir, col(partCol)).repartition(col(partCol))
      .write.partitionBy(PartDir).mode("errorifexists")
      .parquet(dataDir(dir, v))

  /** Create version 1 from `df`. */
  def init(spark: SparkSession, dir: String, partCol: String,
      df: DataFrame): Long = {
    require(versions(dir).isEmpty, s"Versioned: $dir already initialized")
    require(partCol != PartDir && !df.columns.contains(PartDir),
      s"Versioned: column name $PartDir is reserved")
    writeData(df, dir, 1L, partCol)
    fileParts(spark, dataDir(dir, 1L), partCol)
      .coalesce(1).write.mode("errorifexists")
      .parquet(s"${logRoot(dir)}/v=1")
    writeSchema(dir, 1L, df.schema)
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
    new java.io.File(s"${logRoot(dir)}/v=$v/_schema.json")

  private def writeSchema(dir: String, v: Long,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val f = schemaFile(dir, v)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath,
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  private def readSchema(dir: String,
      v: Long): Option[org.apache.spark.sql.types.StructType] = {
    val f = schemaFile(dir, v)
    if (!f.exists()) None
    else Some(org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Read a set of manifest-listed data files. The payload carries the
    * partition column as ordinary data; any inferred directory column is
    * dropped defensively. */
  private def readFiles(spark: SparkSession, dir: String,
      files: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val reader = schema.fold(spark.read)(spark.read.schema)
    reader.parquet(files.map(Manifest.unglob): _*)
      .drop(PartDir)
  }

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
    val files = spark.read.parquet(s"${logRoot(dir)}/v=$v")
      .select(col("file")).distinct()
      .collect().map(_.getString(0))
    readFiles(spark, dir, files.toIndexedSeq, readSchema(dir, v))
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
      checkKeyMoves: Boolean = false, mergeSchema: Boolean = false): Long = {
    require(source.filter(col(partCol).isNull).isEmpty,
      s"Versioned.merge: source carries NULL $partCol values — fix the " +
        "partition derivation upstream")
    val v = latest(dir)
    val next = v + 1
    val manifest = spark.read.parquet(s"${logRoot(dir)}/v=$v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val affected = source.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val touched = manifest.filter { case (_, p, _) => affected(p) }
      .map(_._1).toSet
    if (checkKeyMoves) {
      val untouched = manifest.filter { case (f, _, _) => !touched(f) }
        .map(_._1).toIndexedSeq
      if (untouched.nonEmpty) {
        val moved = readFiles(spark, dir, untouched, readSchema(dir, v))
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
    // rewrite all rows of touched files (with partitionBy layout a file
    // serves exactly one partition value — the rewrite set IS the
    // affected partitions, nothing more)
    val slice =
      if (touched.isEmpty) read(spark, dir, v).filter(lit(false))
      else readFiles(spark, dir, touched.toIndexedSeq, readSchema(dir, v))
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
    writeData(out, dir, next, partCol)
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
      if (anyParquet(new java.io.File(dataDir(dir, next))))
        fileParts(spark, dataDir(dir, next), partCol)
          .select(col("file"), col("part"), col("rows").cast("long"))
      else spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        manifestSchema)
    val carried = manifest.filter { case (f, _, _) => !touched(f) }
    val carriedDf = spark.createDataFrame(
      java.util.Arrays.asList(carried.toIndexedSeq.map {
        case (f, p, n) => org.apache.spark.sql.Row(f, p, n) }: _*),
      manifestSchema)
    carriedDf.unionByName(fresh)
      .coalesce(1).write.mode("errorifexists")
      .parquet(s"${logRoot(dir)}/v=$next")
    writeSchema(dir, next, out.schema)
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
      keyCol: String): DataFrame = {
    require(fromV < toV, s"Versioned.changes: need fromV < toV, got $fromV >= $toV")
    val vs = versions(dir)
    require(vs.contains(fromV) && vs.contains(toV),
      s"Versioned.changes: versions ($fromV, $toV) must both be in $vs")
    def manifestFiles(v: Long): Set[String] =
      spark.read.parquet(s"${logRoot(dir)}/v=$v")
        .select(col("file")).distinct()
        .collect().map(_.getString(0)).toSet
    val (m1, m2) = (manifestFiles(fromV), manifestFiles(toV))
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
    val oldS = slice(m1 -- m2)
    val newS = slice(m2 -- m1)
    val cols = newS.columns.toSeq
    val payload = cols.filterNot(_ == keyCol)
    val o = oldS.select(col(keyCol),
      struct(payload.map(col): _*).as("__o"))
    val n = newS.select(col(keyCol),
      struct(payload.map(col): _*).as("__n"))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("__o").isNull, "I")
          .when(col("__n").isNull, "D")
          .when(!(col("__o") <=> col("__n")), "U"))
      .filter(col("op").isNotNull) // rewritten-but-unchanged drops out
      .select(Seq(col("op"), col(keyCol)) ++ payload.map(c =>
        // U/I carry the NEW row's values (even where the new value is
        // NULL — coalesce would wrongly resurrect the old one); D
        // carries the retired row's
        when(col("op") === "D", col(s"__o.$c"))
          .otherwise(col(s"__n.$c")).as(c)): _*)
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
      spark.read.parquet(s"${logRoot(dir)}/v=$v")
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
    drop.foreach { v =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(s"${logRoot(dir)}/v=$v"))
    }
    orphans.size
  }
}
