package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass sketch expressions for near-dup detection.
  *
  * The composable pipeline (TextFns.shingles → HashFns.minHash →
  * HashFns.lshBands) is correct but every stage is an interpreted
  * higher-order function: a 200-shingle document costs 200×k boxed lambda
  * calls for a k-permutation signature. These expressions tokenize,
  * shingle, hash and fold in one tight JVM loop per row — one virtual call
  * per document instead of per token×permutation.
  *
  * Hashing matches the builtin xxhash64 (XxHash64Function, seed 42) folded
  * to the 31-bit universal-hash domain, and the permutation family is
  * HashFns.permutations — so sketches are interchangeable with the HOF
  * pipeline's.
  */
object Sketches {
  val P: Long = 2147483647L // 2^31-1, see HashFns.P

  def tokenize(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Shingle strings, HOF-shingles parity: docs shorter than n collapse to
    * one shingle (possibly ""). */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    def h(s: String): Long = {
      val x = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
      ((x % P) + P) % P
    }
    if (toks.length < n) Array(h(toks.mkString(" ")))
    else Array.tabulate(toks.length - n + 1) { i =>
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      h(sb.toString)
    }
  }
}

/** Word n-gram shingles in one pass: tokenize + slide, parity with
  * TextFns.shingles (short docs collapse to one joined shingle). SQL:
  * graft_shingles(text, n). */
case class ShingleArray(child: Expression, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = Sketches.tokenize(input.asInstanceOf[UTF8String].toString)
    val n = shingleLen
    val out: Array[Any] =
      if (toks.length < n) Array(UTF8String.fromString(toks.mkString(" ")))
      else Array.tabulate[Any](toks.length - n + 1) { i =>
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        UTF8String.fromString(sb.toString)
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** MinHash signature + LSH band keys in one pass:
  * array<struct<band:int, key:long>>, ready to explode into the
  * (band, key) bucket table. SQL: graft_minhash_bands(text, n, k, bands). */
case class MinHashBands(child: Expression, shingleLen: Int, numPerms: Int,
    bands: Int) extends UnaryExpression with CodegenFallback {
  require(numPerms % bands == 0, "numPerms must divide into bands")

  private val rows = numPerms / bands
  @transient private lazy val perms =
    graft.functions.HashFns.permutations(numPerms).toArray

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("key", LongType, nullable = false))))
  override def prettyName: String = "graft_minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val hashes = Sketches.shingleHashes(input.asInstanceOf[UTF8String].toString, shingleLen)
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var j = 0
      while (j < numPerms) {
        val v = (perms(j)._1 * h + perms(j)._2) % Sketches.P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    // band key: xxhash64 over the comma-joined signature slice — the same
    // string the HOF lshBands hashes, so keys are interchangeable
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder()
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(sig(b * rows + r))
        r += 1
      }
      val key = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      out(b) = InternalRow(b, key)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** 64-bit SimHash over word shingles in one pass. SQL:
  * graft_simhash(text, n). */
case class SimHash64(child: Expression, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = Sketches.tokenize(input.asInstanceOf[UTF8String].toString)
    val votes = new Array[Long](64)
    def vote(s: String): Unit = {
      val h = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    val n = shingleLen
    if (toks.length < n) vote(toks.mkString(" "))
    else {
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        vote(sb.toString)
        i += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
