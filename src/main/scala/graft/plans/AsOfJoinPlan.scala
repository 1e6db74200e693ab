package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types._

/** Whole-operator as-of join, planned as a first-class physical node.
  *
  * The composed `Joins.asOfJoin` (union + running window) already gives the
  * O(|L|+|R|) single-shuffle shape, but it pays for generality: the union
  * widens both sides to the combined schema, the window buffers a partition
  * per key, and the left rows ride through the right-payload dedup. This is
  * the engine-native tier — the same operator as a custom Catalyst plan:
  *
  *   - logical: a plain `Join` whose condition carries one [[AsOfOn]]
  *     marker conjunct plus ordinary equi-key conjuncts. Nothing custom at
  *     the logical level, so every optimizer rule (column pruning, filter
  *     pushdown, constraint inference) applies untouched.
  *   - planning: [[AsOfJoinStrategy]] (injected via SparkSessionExtensions,
  *     so it runs BEFORE the built-in JoinSelection) pattern-matches that
  *     join shape into [[AsOfJoinExec]].
  *   - physical: [[AsOfJoinExec]] declares ClusteredDistribution on the key
  *     columns and (key, time) child ordering — EnsureRequirements inserts
  *     the co-partitioning shuffles and sorts exactly as it does for a
  *     sort-merge join — then does ONE merge pass per partition holding a
  *     single candidate right row: O(1) state per key, no group buffering,
  *     no widened union. At 100 TB this is the point-in-time feature-lookup
  *     join: two key-shuffles (or zero, if both sides are already bucketed
  *     by key), linear scan, nothing quadratic in ties or key size.
  *
  * Semantics (pinned by the `j19_asof_exec` gate against DuckDB's native
  * ASOF JOIN, and by `AsOfJoinPlanSpec` against the composed operator):
  * for each left row, the single right row with the greatest right-time
  * `rt <= lt` (strict: `rt < lt`) among equal keys, optionally within
  * `tolerance` of the left time (units = the time column's internal unit:
  * days for DATE, microseconds for TIMESTAMP, the raw value for integers).
  * NULL keys and NULL times never match (SQL join semantics). Ties on
  * (key, time) resolve to the last row in sort order — feed a unique
  * (key, time) right side (e.g. struct-max dedup) for a deterministic
  * result, same as any engine-native ASOF.
  *
  * Reference mapping: gmall-realtime's OrderWideApp pairs each fact with
  * the dim state valid at event time (intervalJoin + state lookup,
  * OrderWideApp.java:88-135); this operator is that lookup as one
  * declarative join.
  */
case class AsOfOn(
    leftTime: Expression,
    rightTime: Expression,
    strict: Expression,
    tolerance: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(leftTime, rightTime, strict, tolerance)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!RowOrdering.isOrderable(leftTime.dataType))
      return TypeCheckResult.TypeCheckFailure(
        s"as-of time type ${leftTime.dataType.sql} is not orderable")
    if (leftTime.dataType != rightTime.dataType)
      return TypeCheckResult.TypeCheckFailure(
        s"as-of time columns must share a type, got " +
          s"${leftTime.dataType.sql} vs ${rightTime.dataType.sql}")
    if (!strict.foldable || strict.dataType != BooleanType ||
        strict.eval(null) == null)
      return TypeCheckResult.TypeCheckFailure(
        "strict must be a literal boolean")
    val integral: DataType => Boolean = {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    tolerance.dataType match {
      case NullType => TypeCheckResult.TypeCheckSuccess
      case t if integral(t) && tolerance.foldable =>
        leftTime.dataType match {
          case t2 if integral(t2) => TypeCheckResult.TypeCheckSuccess
          case DateType | TimestampType | TimestampNTZType =>
            TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"tolerance needs an integer-backed time column, got ${other.sql}")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"tolerance must be a literal integer or null, got ${other.sql}")
    }
  }

  /** Never evaluated when [[AsOfJoinStrategy]] plans the join (the marker
    * is consumed at planning time). Reaching here means the built-in join
    * strategies planned it as a post-join filter — fail loudly rather than
    * silently degrade to an all-matches join. */
  override def eval(input: InternalRow): Any =
    throw new IllegalStateException(
      "graft_asof_on is a planning-time marker that reached execution: " +
        "either AsOfJoinStrategy is not registered on this session " +
        "(Sessions.tuned / GraftExtensions.ensureRegistered do that), or " +
        "the join shape is not plannable (needs >=1 equi-key conjunct and " +
        "exactly one graft_asof_on conjunct on an INNER or LEFT join)")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(leftTime = newChildren(0), rightTime = newChildren(1),
      strict = newChildren(2), tolerance = newChildren(3))
}

/** Plans `Join(..., cond = equiKeys ++ AsOfOn, Inner|LeftOuter)` into
  * [[AsOfJoinExec]]. Injected via `SparkSessionExtensions
  * .injectPlannerStrategy`, which places it ahead of the built-in
  * JoinSelection, so matching joins never reach the generic paths. */
object AsOfJoinStrategy extends SparkStrategy with PredicateHelper {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, joinType @ (Inner | LeftOuter), Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val markers = conjuncts.collect { case a: AsOfOn => a }
      val others = conjuncts.filterNot(_.isInstanceOf[AsOfOn])
      if (markers.length != 1) return Nil
      val marker = markers.head

      // Every non-marker conjunct must be a cross-side equality; anything
      // else and this strategy declines (the marker then fails loudly).
      val keyPairs = others.map {
        case EqualTo(l, r) if canEvaluate(l, left) && canEvaluate(r, right) =>
          Some((l, r))
        case EqualTo(l, r) if canEvaluate(l, right) && canEvaluate(r, left) =>
          Some((r, l))
        case _ => None
      }
      if (keyPairs.isEmpty || keyPairs.exists(_.isEmpty)) return Nil

      // Time sides may arrive flipped (SQL users write either order).
      val (lt, rt) =
        if (canEvaluate(marker.leftTime, left) &&
            canEvaluate(marker.rightTime, right))
          (marker.leftTime, marker.rightTime)
        else if (canEvaluate(marker.leftTime, right) &&
            canEvaluate(marker.rightTime, left))
          (marker.rightTime, marker.leftTime)
        else return Nil

      val strict = marker.strict.eval(null).asInstanceOf[Boolean]
      val tolerance = marker.tolerance.eval(null) match {
        case null => None
        case n: Long => Some(n)
        case n: Int => Some(n.toLong)
        case n: Short => Some(n.toLong)
        case n: Byte => Some(n.toLong)
        case other => throw new IllegalStateException(
          s"unreachable: tolerance literal $other passed type check")
      }

      val pairs = keyPairs.flatten
      AsOfJoinExec(planLater(left), planLater(right),
        pairs.map(_._1), pairs.map(_._2), lt, rt,
        strict, tolerance, joinType) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children co-partitioned on the keys and sorted by
  * (keys..., time); one forward pass per partition carrying exactly one
  * candidate right row. See the scaladoc on [[AsOfOn]] for semantics. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    tolerance: Option[Long],
    joinType: JoinType)
  extends BinaryExecNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi-key pair")
  require(joinType == Inner || joinType == LeftOuter,
    s"as-of join supports INNER and LEFT OUTER, got $joinType")

  override def output: Seq[Attribute] = joinType match {
    case Inner => left.output ++ right.output
    case _ => left.output ++ right.output.map(_.withNullability(true))
  }

  // Same contract as SortMergeJoinExec: EnsureRequirements turns the two
  // ClusteredDistributions into compatible hash shuffles (or none, when a
  // child is already partitioned on the keys) and inserts the sorts.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def keyTimeOrder(keys: Seq[Expression], t: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) :+ SortOrder(t, Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keyTimeOrder(leftKeys, leftTime), keyTimeOrder(rightKeys, rightTime))

  // The merge preserves the left child's row placement and order — report
  // both so a downstream keyed operation reuses the shuffle and the sort.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = keyTimeOrder(leftKeys, leftTime)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lOutput = left.output
    val rOutput = right.output
    val outAttrs = output
    val keyTypes = lKeys.map(_.dataType)
    val timeType = lTime.dataType
    val isStrict = strict
    val tol = tolerance
    val leftOuter = joinType == LeftOuter

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeEval = BindReferences.bindReference(lTime, lOutput)
      val rTimeEval = BindReferences.bindReference(rTime, rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOutput.length)
      val joined = new JoinedRow

      // tolerance only type-checks for integer-backed times (Long/Int).
      def asLong(v: Any): Long = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalStateException(
          s"unreachable: tolerance over non-integral time value $other")
      }
      // Integer-backed times (date/timestamp/integral) compare as primitive
      // longs instead of through the boxing interpreted ordering — the
      // merge's hot comparison.
      val intTime = timeType match {
        case ByteType | ShortType | IntegerType | LongType | DateType |
             TimestampType | TimestampNTZType => true
        case _ => false
      }
      def cmpTime(rt: Any, lt: Any): Int =
        if (intTime) java.lang.Long.compare(asLong(rt), asLong(lt))
        else timeOrd.compare(rt, lt)
      val hasTol = tol.isDefined
      val tolV = tol.getOrElse(Long.MaxValue)

      val buffered = rIter.buffered
      // The single candidate: the latest right row consumed so far that has
      // non-null key and time AND whose key can still meet a left row (left
      // keys only grow, so rows consumed with rk < lk are dead — skipped
      // without the copy). Emission re-checks the candidate key against the
      // current left key, so a stale candidate from an earlier key is inert.
      var candRow: InternalRow = null
      var candKey: UnsafeRow = null
      var candTime: Any = null

      lIter.flatMap { l =>
        val lk = lKeyProj(l)
        val lt = lTimeEval.eval(l)
        // Advance the right side while it is "behind" this left row:
        // smaller key, or same key with time within the as-of frame.
        // Null right times sort first and are consumed without ever
        // becoming the candidate.
        var continue = true
        while (continue && buffered.hasNext) {
          val r = buffered.head
          val rk = rKeyProj(r)
          val c = keyOrd.compare(rk, lk)
          if (c < 0) {
            buffered.next() // dead row: can never match this or a later left
          } else if (c > 0) {
            continue = false
          } else {
            val rt = rTimeEval.eval(r)
            val consume =
              if (rt == null) true
              else if (lt == null) false
              else {
                val tc = cmpTime(rt, lt)
                if (isStrict) tc < 0 else tc <= 0
              }
            if (consume) {
              buffered.next()
              if (rt != null && !rk.anyNull) {
                candRow = r.copy()
                candKey = rk.copy()
                candTime = rt
              }
            } else continue = false
          }
        }
        val matched = candRow != null && lt != null && !lk.anyNull &&
          keyOrd.compare(candKey, lk) == 0 &&
          (!hasTol || asLong(lt) - asLong(candTime) <= tolV)
        if (matched) {
          numOutputRows += 1
          numMatched += 1
          Some(resultProj(joined(l, candRow)))
        } else if (leftOuter) {
          numOutputRows += 1
          Some(resultProj(joined(l, nullRight)))
        } else None
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
