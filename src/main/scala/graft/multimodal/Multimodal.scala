package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, processed by per-partition batch functions.
  *
  * The decode step is a STUB — real image/audio codecs are not in this
  * container. `decodeStub` derives a deterministic fake feature vector
  * (byte histogram) so the Spark-side plumbing — schema, partitioning,
  * batch iteration shape, output schema — is real and testable end-to-end.
  * Swapping in a real decoder means replacing only `decodeBytes`.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("codec", StringType))))))

  /** Wrap a text corpus as a media table: payload = utf-8 bytes. At 100 TB
    * the payload column stays untouched (binary pass-through, no codec on
    * the Spark side) until a decode stage explicitly reads it. */
  def attachBinary(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      lit("text").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        lit("utf-8").as("codec")).as("meta"))

  /** STUB decoder: a real implementation would hand `bytes` to an image/
    * audio library. The fake is a 16-bin byte histogram — deterministic,
    * cheap, and shape-compatible with a real feature extractor. */
  private[multimodal] def decodeBytes(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) % 16) += 1.0; i += 1 }
    }
    hist
  }

  /** Per-partition feature extraction over the binary column — the
    * mapPartitions shape a Pandas-UDF/mapInPandas stage has in PySpark:
    * one batch iterator per partition, no per-row interpreter crossing,
    * output schema declared up front. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("feature", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r => Row(r.getLong(0), decodeBytes(r.getAs[Array[Byte]](1)).toSeq) }
      }(enc)
  }

  /** Frame sampling for sequence media (video/audio): every `stride`-th
    * byte becomes a "frame" marker — the slicing/ordinality plumbing of a
    * real frame sampler, as a pure native expression. */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.select(
      col("doc_id"),
      transform(
        sequence(lit(0L),
          greatest(floor((col("meta.n_bytes") - 1) / stride).cast("long"), lit(0L))),
        i => i * stride).as("frame_offsets"))

  /** STUB resize/downsample: keep every `factor`-th byte of the payload.
    * A real image resize swaps the per-partition body for a codec call;
    * the Spark-side contract — binary in, smaller binary out, metadata
    * updated, per-partition batch shape — is what this exercises. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0)
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("n_bytes", LongType),
        StructField("codec", StringType))))))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("doc_id"), col("payload"), col("meta.codec"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val small =
            if (bytes == null) Array.emptyByteArray
            else Array.tabulate((bytes.length + factor - 1) / factor)(i => bytes(i * factor))
          Row(r.getLong(0), small, Row(small.length.toLong, r.getString(2)))
        }
      }(enc)
  }
}
