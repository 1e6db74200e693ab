package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, processed by per-partition batch functions.
  *
  * Two tiers:
  *  - Generic binary path: the feature-extract decode is a STUB (byte
  *    histogram) standing in for arbitrary image/audio codecs not in
  *    this container; the Spark-side plumbing — schema, partitioning,
  *    batch iteration shape, output schema — is real and testable
  *    end-to-end. Swapping in a real decoder means replacing only
  *    `decodeBytes`.
  *  - PNG path (`pngMedia`/`resizePng`/`validatePngResize`): a REAL
  *    codec in the loop via `javax.imageio` (pure-JVM public API) —
  *    decode → nearest-neighbor scale → encode per partition, with a
  *    pixel-exact validation gate. Proves the batch shape holds with
  *    actual media decoding, not just byte shuffling.
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

  // ── Real-codec path (PNG via javax.imageio — pure-JVM public API) ──
  // The byte-skip `resize` below keeps the codec-free contract for opaque
  // media; this path proves the same mapPartitions plumbing with an
  // actual decode→scale→encode in the loop.

  /** Deterministic fixture pixel: color derived from (doc_id, x, y) only,
    * so a validator can recompute any source pixel without carrying the
    * original image. */
  private[multimodal] def px(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
    val b = ((id * 29 + x * 11 + y * 2) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Fixture dimensions from the id alone — the oracle recomputes these
    * in SQL (`4 + id % 5` × `3 + id % 7`). */
  private[multimodal] def fixtureDims(id: Long): (Int, Int) =
    ((4 + (id % 5)).toInt, (3 + (id % 7)).toInt)

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val pngOutSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType),
      StructField("codec", StringType))))))

  /** Generate a real PNG per id (deterministic dims + pixels): the media
    * fixture for the codec-in-the-loop gates. Encoding runs per partition
    * on the executors — the driver never sees a pixel. */
  def pngMedia(ids: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(pngOutSchema)
    ids.select(col("doc_id")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no tmp-file spill per task
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = fixtureDims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, px(id, x, y)); x += 1 }
          y += 1
        }
        val bytes = encodePng(img)
        Row(id, bytes, Row(w, h, bytes.length.toLong, "png"))
      }
    }(enc)
  }

  /** Twin fixture for the perceptual-hash gate: for each id, the base
    * [[pngMedia]] image AND a near-duplicate (doc_id + twinOffset) whose
    * source pixel (0,0) has its blue LSB flipped — a sub-luma-quantum
    * perturbation, so the twin's aHash sits within a few bits of the
    * base's. Pixels stay a pure function of doc_id, so the oracle
    * recomputes BOTH hashes in SQL. */
  def pngMediaTwins(ids: DataFrame, twinOffset: Long): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(pngOutSchema)
    ids.select(col("doc_id")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val (w, h) = fixtureDims(id)
        def build(perturb: Boolean): (Array[Byte], Int, Int) = {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, px(id, x, y)); x += 1 }
            y += 1
          }
          if (perturb) img.setRGB(0, 0, px(id, 0, 0) ^ 0x1)
          val bytes = encodePng(img)
          (bytes, w, h)
        }
        val (base, _, _) = build(perturb = false)
        val (twin, _, _) = build(perturb = true)
        Iterator(
          Row(id, base, Row(w, h, base.length.toLong, "png")),
          Row(id + twinOffset, twin, Row(w, h, twin.length.toLong, "png")))
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash, the pHash family's baseline): decode
    * → nearest-neighbor sample to 8×8 → integer luma (r·299+g·587+b·114)/1000
    * → threshold at the integer mean → 64 bits packed row-major into a
    * long. Every step is integer arithmetic on decoded pixels, so the
    * hash is bit-deterministic across JVMs and — over the formula
    * fixtures — replayable in SQL. Runs per partition (codec loop, the
    * mapPartitions batch shape); the output is one long per image, the
    * input to [[graft.operators.Dedup.hammingPairs64]] for near-dup
    * image detection at corpus scale. */
  def aHash(media: DataFrame): DataFrame = {
    val side = 8
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("phash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val (w, h) = (img.getWidth, img.getHeight)
        val lum = new Array[Long](side * side)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            val rgb = img.getRGB(x * w / side, y * h / side)
            lum(y * side + x) =
              (((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L +
                (rgb & 0xFF) * 114L) / 1000L
            x += 1
          }
          y += 1
        }
        val mean = lum.sum / (side * side)
        var hash = 0L
        var i = 0
        while (i < side * side) {
          if (lum(i) > mean) hash |= (1L << i)
          i += 1
        }
        Row(id, hash)
      }
    }(enc)
  }

  /** REAL image resize: ImageIO decode → integer nearest-neighbor
    * downscale to (max(1, w/factor), max(1, h/factor)) → PNG encode, per
    * partition. The scale step is explicit integer math (dest (x,y) ←
    * src (x·w/ow, y·h/oh)) rather than a Graphics2D transform, so the
    * output pixels are bit-deterministic across JVMs — the property the
    * validation gate pins. Same batch shape as [[resize]]; only the body
    * changed from byte-skip to codec, which is exactly the swap the stub
    * documented. */
  def resizePng(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0)
    val enc = org.apache.spark.sql.Encoders.row(pngOutSchema)
    media.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val (w, h) = (src.getWidth, src.getHeight)
        val ow = math.max(1, w / factor)
        val oh = math.max(1, h / factor)
        val out = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            out.setRGB(x, y, src.getRGB(x * w / ow, y * h / oh))
            x += 1
          }
          y += 1
        }
        val bytes = encodePng(out)
        Row(id, bytes, Row(ow, oh, bytes.length.toLong, "png"))
      }
    }(enc)
  }

  /** Validation twin for [[resizePng]] over the [[pngMedia]] fixture:
    * re-decode every output PNG and compare EVERY pixel against the
    * formula-recomputed source pixel its nearest-neighbor position maps
    * to. Returns (doc_id, out_w, out_h, mismatches, has_payload) — the
    * oracle recomputes the dims from doc_id in SQL and pins
    * mismatches = 0, which is only reachable if decode→scale→encode
    * round-tripped losslessly. */
  def validatePngResize(resized: DataFrame, factor: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType),
      StructField("mismatches", LongType),
      StructField("has_payload", org.apache.spark.sql.types.BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    resized.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val (w, h) = fixtureDims(id)
        val (ow, oh) = (img.getWidth, img.getHeight)
        var bad = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            if ((img.getRGB(x, y) & 0xFFFFFF) != px(id, x * w / ow, y * h / oh))
              bad += 1
            x += 1
          }
          y += 1
        }
        Row(id, ow, oh, bad, bytes.nonEmpty)
      }
    }(enc)
  }

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
