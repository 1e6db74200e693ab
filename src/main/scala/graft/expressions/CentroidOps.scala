package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Plan-baked centroid/codebook kernels for the ANN family — the
  * "decide with small rows, move big rows once" shape (a k-means
  * centroid table is k×d doubles of BOUNDED driver metadata, like a
  * tokenizer vocabulary): baking it into the plan as a literal turns
  * `assign` / `probes` / `pqEncode` from a crossJoin-against-broadcast
  * plus a groupBy SHUFFLE of the whole corpus into a PER-ROW PROJECTION
  * inside whole-stage codegen — zero exchanges on the corpus, which is
  * the difference that matters at 100 TB (the corpus never moves for an
  * assignment decision).
  *
  * Bit-exactness contract: element reads widen float→double and every
  * accumulation (`acc += d*d`) runs in ascending element order — the
  * identical IEEE sequence as [[L2Squared]] under the old
  * crossJoin/min_by formulation, so assignments, probe sets and codes
  * are BYTE-IDENTICAL to the shuffle shape they replace (SimilaritySpec
  * pins it, and every sim_* oracle hash stays green). Ties break to the
  * LOWEST cluster_id, matching `min_by(cluster_id, struct(d2,
  * cluster_id))`. */
private[expressions] class CentroidTable(
    val ids: Array[Long], flat: Array[Double], val d: Int)
    extends Serializable {
  require(ids.nonEmpty && flat.length == ids.length * d,
    s"centroid table: ${ids.length} ids × dim $d != ${flat.length} values")

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** l2sq(emb, centroid j) in [[L2Squared]]'s exact order. */
  @inline private def d2(emb: ArrayData, isFloat: Boolean, j: Int): Double = {
    val n = math.min(emb.numElements(), d)
    val base = j * d
    var acc = 0.0
    var i = 0
    while (i < n) {
      val diff = elem(emb, i, isFloat) - flat(base + i)
      acc += diff * diff
      i += 1
    }
    acc
  }

  /** argmin over centroids, ties to lowest id. */
  def nearest(emb: ArrayData, isFloat: Boolean): Long = {
    var bestId = ids(0)
    var best = d2(emb, isFloat, 0)
    var j = 1
    while (j < ids.length) {
      val v = d2(emb, isFloat, j)
      if (v < best || (v == best && ids(j) < bestId)) { best = v; bestId = ids(j) }
      j += 1
    }
    bestId
  }

  /** Top-n centroid ids by (d2 asc, id asc) — the probe set, in emit
    * order (nearest first), matching the bounded-TopK formulation. */
  def top(emb: ArrayData, isFloat: Boolean, n: Int): ArrayData = {
    val m = math.min(n, ids.length)
    val ds = new Array[Double](ids.length)
    var j = 0
    while (j < ids.length) { ds(j) = d2(emb, isFloat, j); j += 1 }
    val idx = Array.range(0, ids.length).sortBy(j => (ds(j), ids(j)))
    val out = new Array[Any](m)
    j = 0
    while (j < m) { out(j) = ids(idx(j)); j += 1 }
    new GenericArrayData(out)
  }
}

private[expressions] object CentroidOps {
  def isFloatArr(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def vecOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
}

/** `graft_nearest_centroid(emb, ids, flatCents, d)` → bigint. */
case class NearestCentroid(child: Expression, ids: Seq[Long],
    flat: Seq[Double], d: Int) extends UnaryExpression {
  override def prettyName: String = "graft_nearest_centroid"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidOps.vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType.sql}")

  private def mk = new CentroidTable(ids.toArray, flat.toArray, d)
  @transient private lazy val table = mk
  private def isFloat = CentroidOps.isFloatArr(child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    table.nearest(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTable", mk,
      classOf[CentroidTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.nearest($c, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_top_centroids(emb, ids, flatCents, d, n)` → array<bigint>,
  * nearest first. */
case class TopCentroids(child: Expression, ids: Seq[Long],
    flat: Seq[Double], d: Int, n: Int) extends UnaryExpression {
  override def prettyName: String = "graft_top_centroids"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidOps.vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType.sql}")

  private def mk = new CentroidTable(ids.toArray, flat.toArray, d)
  @transient private lazy val table = mk
  private def isFloat = CentroidOps.isFloatArr(child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    table.top(input.asInstanceOf[ArrayData], isFloat, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTable", mk,
      classOf[CentroidTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.top($c, $isFloat, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_pq_codes(emb, perSubIds, flatCodebooks, k, subDim)` →
  * array<int>: for each of m = |perSubIds|/k subspaces, the nearest
  * codebook entry of the embedding's i-th contiguous subDim slice —
  * the whole PQ encode as ONE per-row kernel (the posexplode +
  * crossJoin + two-groupBy formulation shuffled the corpus twice for
  * the same arithmetic). Codebook ids are per-subspace (subspace-major
  * flattening); ties to lowest id, identical to pqAssign's min_by. */
case class PqCodes(child: Expression, ids: Seq[Long], flat: Seq[Double],
    k: Int, subDim: Int) extends UnaryExpression {
  require(ids.length % k == 0,
    s"graft_pq_codes: ${ids.length} ids not a multiple of k=$k")
  override def prettyName: String = "graft_pq_codes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidOps.vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType.sql}")

  private def m = ids.length / k
  private def mk = new PqTable(ids.toArray, flat.toArray, m, k, subDim)
  @transient private lazy val table = mk
  private def isFloat = CentroidOps.isFloatArr(child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    table.codes(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", mk, classOf[PqTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.codes($c, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_nearest_code(sub, subspace, perSubIds, flatCodebooks, k,
  * subDim)` → bigint: nearest codebook entry of an ALREADY-SLICED
  * subvector in the given subspace — the Lloyd-loop assignment over the
  * materialized subvector table (where [[PqCodes]] serves the
  * whole-embedding encode path). */
case class NearestCode(left: Expression, right: Expression, ids: Seq[Long],
    flat: Seq[Double], k: Int, subDim: Int) extends BinaryExpression {
  require(ids.length % k == 0,
    s"graft_nearest_code: ${ids.length} ids not a multiple of k=$k")
  override def prettyName: String = "graft_nearest_code"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidOps.vecOk(left.dataType) &&
        (right.dataType == IntegerType || right.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, int subspace), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  private def m = ids.length / k
  private def mk = new PqTable(ids.toArray, flat.toArray, m, k, subDim)
  @transient private lazy val table = mk
  private def isFloat = CentroidOps.isFloatArr(left.dataType)
  private def isIntSub = right.dataType == IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sub = if (isIntSub) b.asInstanceOf[Int] else b.asInstanceOf[Long].toInt
    table.nearestIn(a.asInstanceOf[ArrayData], isFloat, sub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", mk, classOf[PqTable].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.nearestIn($a, $isFloat, (int) $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCode =
    copy(left = newLeft, right = newRight)
}

/** Subspace-major codebook table: ids/values for subspace s occupy
  * [s*k, (s+1)*k); centroid j of subspace s starts at (s*k + j)*subDim
  * in `flat`. */
private[expressions] class PqTable(val ids: Array[Long],
    flat: Array[Double], m: Int, k: Int, subDim: Int) extends Serializable {
  require(flat.length == m * k * subDim,
    s"pq table: m=$m k=$k subDim=$subDim != ${flat.length} values")

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** l2sq of emb[off, off+subDim) vs codebook entry (s, j), ascending
    * element order (the [[L2Squared]] contract). A SHORT slice (emb
    * narrower than off+subDim) compares only the available prefix —
    * matching `slice(...)`'s truncating semantics. */
  @inline private def d2(emb: ArrayData, isFloat: Boolean, off: Int,
      s: Int, j: Int): Double = {
    val n = math.min(math.max(emb.numElements() - off, 0), subDim)
    val base = (s * k + j) * subDim
    var acc = 0.0
    var i = 0
    while (i < n) {
      val diff = elem(emb, off + i, isFloat) - flat(base + i)
      acc += diff * diff
      i += 1
    }
    acc
  }

  private def argmin(emb: ArrayData, isFloat: Boolean, off: Int,
      s: Int): Long = {
    var bestId = ids(s * k)
    var best = d2(emb, isFloat, off, s, 0)
    var j = 1
    while (j < k) {
      val v = d2(emb, isFloat, off, s, j)
      val id = ids(s * k + j)
      if (v < best || (v == best && id < bestId)) { best = v; bestId = id }
      j += 1
    }
    bestId
  }

  /** PQ codes of a whole embedding: nearest entry per subspace, int. */
  def codes(emb: ArrayData, isFloat: Boolean): ArrayData = {
    val out = new Array[Any](m)
    var s = 0
    while (s < m) { out(s) = argmin(emb, isFloat, s * subDim, s).toInt; s += 1 }
    new GenericArrayData(out)
  }

  /** Nearest entry of an already-sliced subvector in subspace `s`. */
  def nearestIn(sub: ArrayData, isFloat: Boolean, s: Int): Long =
    argmin(sub, isFloat, 0, s)
}
