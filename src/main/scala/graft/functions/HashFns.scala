package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch building blocks for near-duplicate detection: MinHash
  * signatures and SimHash fingerprints, as pure built-in expression
  * compositions (xxhash64 + higher-order array functions — all codegen'd,
  * no UDF boundary).
  *
  * Scale note: signatures are computed per-row at scan time (narrow), the
  * only shuffle in the dedup pipelines built on these is the band/bucket
  * groupBy — the minimum any LSH scheme needs.
  */
object HashFns {
  /** Mersenne prime 2^31-1: the universal-hash modulus. 31-bit domain keeps
    * a*h + b < 2^62, so the affine transforms never overflow a long even
    * under Spark 4's ANSI arithmetic. */
  val P: Long = 2147483647L

  /** Deterministic (a,b) pairs for h_i(x) = (a_i*x + b_i) mod P. */
  def permutations(k: Int, seed: Long = 7L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((rnd.nextInt((P - 2).toInt).toLong + 1, rnd.nextInt(P.toInt).toLong))
  }

  /** MinHash signature (array<long>, length k) of a string-array column.
    * Elements are first hashed once with xxhash64 (folded to 31 bits); each
    * permutation is a cheap affine transform over that single hash. The
    * element-hash array is bind-bound so the k permutations iterate over a
    * lambda variable instead of k re-inlined copies of the hash transform
    * (and, transitively, of the upstream shingle construction). */
  def minHash(elems: Column, perms: Seq[(Long, Long)]): Column = {
    val permArr = array(perms.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    ExprUtil.bind(transform(elems, e => pmod(xxhash64(e), lit(P)))) { hashes =>
      transform(permArr, p =>
        array_min(transform(hashes, h =>
          pmod(p.getField("a") * h + p.getField("b"), lit(P)))))
    }
  }

  /** LSH band keys: split a k-long signature into `bands` bands of
    * k/bands rows each and hash each band to one long. Result:
    * array<struct<band:int, key:long>> ready to explode. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    ExprUtil.bind(sig) { s =>
      array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          xxhash64(concat_ws(",",
            transform(slice(s, b * rowsPerBand + 1, rowsPerBand), _.cast("string"))))
            .as("key"))
      }: _*)
    }

  /** SimHash: 64-bit fingerprint. For each bit b, sum +1/-1 across token
    * hashes; bit set iff the sum is positive. Bit positions are unrolled at
    * plan-build time (Scala ints), keeping every op a codegen'd builtin. */
  def simHash(elems: Column): Column = {
    val bitVotes = aggregate(
      elems,
      array_repeat(lit(0L), 64),
      (acc, e) => ExprUtil.bind(xxhash64(e)) { h =>
        array((0 until 64).map { b =>
          element_at(acc, b + 1) +
            when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
        }: _*)
      })
    ExprUtil.bind(bitVotes) { votes =>
      (0 until 64).map { b =>
        when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** Little-endian low 64 bits of md5 as an unsigned decimal — the
    * engine-portable hash primitive (DuckDB: `md5_number_lower`, Python:
    * `struct.unpack('<Q', md5(x).digest()[8:])`). Used wherever a hash
    * value itself is part of the contract (fingerprints, deterministic
    * sampling); xxhash64 stays the fast path for engine-internal hashing. */
  def md5Lower64(c: Column): Column = {
    val hx = md5(c.cast("binary"))
    // digest bytes 8..15, byte-reversed, as hex → unsigned 64-bit decimal
    val le = concat(Seq(31, 29, 27, 25, 23, 21, 19, 17)
      .map(i => substring(hx, i, 2)): _*)
    conv(le, 16, 10).cast("decimal(20,0)")
  }

  /** md5Lower64 mod m, as a long (m must fit in a positive long).
    * Evaluated by the native codegen'd [[graft.expressions.Md5Mod]] —
    * bit-identical to `pmod(md5Lower64(c), m)` (and to DuckDB's
    * `md5_number_lower(x) % m`) but ~20× cheaper per call: digest bytes →
    * long → remainderUnsigned, no hex/conv/decimal round-trip. Requires a
    * StringType input (Md5Mod.checkInputDataTypes fails analysis loudly);
    * callers hashing numbers must cast explicitly so the hashed rendering
    * is a visible, deliberate choice — an implicit cast here would make
    * binary vs decimal-text hashing an invisible behavior change. */
  def md5Lower64Mod(c: Column, m: Long): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.Md5Mod(
      GraftColumnBridge.expression(c), m))
  }
}
