package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Per-group Bloom filter as a typed Aggregator: each group (in the
  * manifest use, each FILE) collapses its key column into a fixed-size
  * bit array with no false negatives. Partial buffers merge bitwise-OR
  * (associative, partition-order-independent), so the agg runs as
  * ObjectHashAggregate with map-side partials — one scan, no shuffle of
  * the keys themselves.
  *
  * Keys are inserted as longs (`putLong`), matching how
  * `DataFrame.stat.bloomFilter` and [[graft.expressions.BloomMightContain]]
  * hash integral keys, so sketches built here are probe-compatible with
  * the rest of the Bloom machinery. Spark's `BloomFilterImpl` seeds its
  * hashes deterministically — identical inputs give byte-identical
  * sketches, rerun-stable like every other gate artifact.
  */
object BloomAgg {

  /** Aggregator instance; use via `functions.udaf(BloomAgg.agg(n, fpp))`.
    * `expectedItems` sizes the bit array PER GROUP — for a file manifest,
    * the expected rows per file (maxPartitionBytes / row width); fpp is
    * the per-probe false-positive budget at that fill. Oversizing only
    * costs sketch bytes, undersizing only raises fpp — never
    * correctness. */
  def agg(expectedItems: Long, fpp: Double): Aggregator[Long, BloomFilter, Array[Byte]] =
    new Aggregator[Long, BloomFilter, Array[Byte]] {
      override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
      override def reduce(b: BloomFilter, a: Long): BloomFilter = {
        b.putLong(a); b
      }
      override def merge(x: BloomFilter, y: BloomFilter): BloomFilter =
        x.mergeInPlace(y)
      override def finish(b: BloomFilter): Array[Byte] = {
        val bos = new ByteArrayOutputStream()
        b.writeTo(bos)
        bos.toByteArray
      }
      override def bufferEncoder: Encoder[BloomFilter] =
        Encoders.javaSerialization[BloomFilter]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Deserialize a sketch column value back to a probeable filter. */
  def readFrom(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
