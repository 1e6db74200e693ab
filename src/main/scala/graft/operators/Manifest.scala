package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-driven file skipping — the table-format idea (Iceberg/Delta
  * data-file stats) as an engine operator: collect per-file min/max/rows
  * for a chosen column ONCE, persist the manifest as a (tiny) table, and
  * plan point/range scans from the manifest instead of listing + reading
  * every file. Complements the layout family: z-order (`LayoutFns`)
  * makes per-file envelopes TIGHT, partition dirs (`dpp_prune`) skip by
  * directory; the manifest skips at FILE granularity on any column with
  * no physical re-layout at all.
  *
  * At 100 TB the manifest is the difference between "planning reads the
  * footer of every file" (a metadata storm on S3) and "planning reads a
  * table whose row count is the file count". The manifest is itself just
  * a DataFrame — it re-aggregates, joins, and persists like any other.
  */
object Manifest {

  /** Per-file stats for `statCol` over every parquet file under `path`:
    * one scan projecting ONLY the stat column (column pruning keeps the
    * build narrow), grouped by file. */
  def build(spark: SparkSession, path: String, statCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).as("mn"), max(col(statCol)).as("mx"),
        count(lit(1)).as("rows"))

  /** Files whose [mn, mx] envelope intersects [lo, hi] — the scan plan
    * for a range predicate. The manifest is file-count-sized, so this is
    * a driver-scale lookup by design (like any index probe). */
  def filesForRange(manifest: DataFrame, lo: Long, hi: Long): Seq[String] =
    manifest.filter(col("mx") >= lo && col("mn") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toIndexedSeq

  /** [[build]] plus a per-file Bloom sketch of `statCol` — the skipping
    * tier min/max envelopes cannot provide: an EQUALITY probe on a
    * high-cardinality key under a layout uncorrelated with that key
    * (every file's [mn, mx] then contains almost any key, so envelope
    * pruning degenerates to a full scan, while the Bloom answers "this
    * file cannot contain k" per file with no false negatives). Same
    * single narrow scan as [[build]]; each sketch sizes to its file's
    * actual distinct count at fpp=1% ([[graft.functions.BloomAgg
    * adaptive]]), capped at ~1.2·expectedPerFile bytes. */
  def buildWithBloom(spark: SparkSession, path: String, statCol: String,
      expectedPerFile: Long = 1L << 13, fpp: Double = 0.01): DataFrame = {
    val bloom = udaf(graft.functions.BloomAgg.adaptive(expectedPerFile, fpp))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).as("mn"), max(col(statCol)).as("mx"),
        count(lit(1)).as("rows"),
        bloom(col(statCol).cast("long")).as("bloom"))
  }

  /** Scan plan for an equality probe `statCol = key`: envelope check
    * first (free, exact for ranges), then each surviving file's Bloom
    * sketch — a file is read only if it MIGHT contain the key. No false
    * negatives (every true match is read); fpp bounds the extra files.
    * Driver-scale by design, like [[filesForRange]]: the manifest has
    * one row per file and the probe deserializes only envelope
    * survivors' sketches. */
  def filesForPoint(manifest: DataFrame, key: Long): Seq[String] =
    manifest.filter(col("mn") <= key && col("mx") >= key)
      .select(col("file"), col("bloom")).collect()
      .filter(r => graft.functions.BloomAgg
        .readFrom(r.getAs[Array[Byte]]("bloom")).mightContainLong(key))
      .map(_.getString(0)).toIndexedSeq

  /** `input_file_name()` returns a URI (space → %20) and
    * `DataFrameReader.parquet` treats each path as a GLOB pattern —
    * decode the URI form and escape glob metacharacters so a legal
    * directory name like `run[2024]` or one containing a space
    * round-trips instead of mis-globbing. */
  private[operators] def unglob(uri: String): String = {
    val decoded =
      try new org.apache.hadoop.fs.Path(new java.net.URI(uri)).toString
      catch { case _: java.net.URISyntaxException => uri }
    decoded.flatMap {
      case c @ ('*' | '?' | '[' | ']' | '{' | '}') => s"\\$c"
      case c => c.toString
    }
  }

  /** Read only the manifest-selected files and re-apply the predicate
    * (file envelopes over-approximate; the residual filter is exact).
    * `storePath` anchors the schema when the plan selects NO files — a
    * range outside every envelope answers with an EMPTY frame of the
    * store's schema, not an exception. */
  def prunedRead(spark: SparkSession, storePath: String, files: Seq[String],
      statCol: String, lo: Long, hi: Long): DataFrame = {
    val base =
      if (files.isEmpty) spark.read.parquet(storePath).filter(lit(false))
      else spark.read.parquet(files.map(unglob): _*)
    base.filter(col(statCol) >= lo && col(statCol) <= hi)
  }
}
