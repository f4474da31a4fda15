package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN — the whole-operator custom tier (SURVEY.md §2 preference
  * order (c)): a `LogicalPlan` + `SparkStrategy` + `SparkPlan` registered
  * through `SparkSessionExtensions` / `experimental.extraStrategies`.
  *
  * Semantics (left as-of): for every left row, attach the right row with
  * the greatest `rightTime <= leftTime` among rows sharing the join key;
  * no such row → right side null (LEFT ASOF semantics, matching DuckDB's
  * `ASOF LEFT JOIN` and the classic point-in-time lookup).
  *
  * Spark has no built-in for this; the compositional encoding (theta join
  * on `l.ts >= r.ts` + row_number) materializes every (left, right-before)
  * pair — O(n·m) per key — before discarding all but one. This operator
  * never materializes pairs:
  *
  *   - `requiredChildDistribution` = ClusteredDistribution on the keys for
  *     BOTH children → EnsureRequirements co-partitions the two sides with
  *     compatible hash exchanges (exactly how SortMergeJoin asks);
  *   - `requiredChildOrdering` = (keys…, time) ascending on each side →
  *     distributed sorts within partitions, never a global sort;
  *   - execution is a single forward merge per partition: two pointers,
  *     one remembered candidate row, O(n + m) time and O(1) state.
  *
  * At 100 TB that is two shuffles (or zero, if both sides are already
  * bucketed by the key), linear scan, no driver involvement.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean = false, tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def sortOrder(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) :+ SortOrder(time, Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(sortOrder(leftKeys, leftTime), sortOrder(rightKeys, rightTime))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortOrder(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val outAttrs = output
    val fwd = forward
    val tol = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lTimeBound = BindReferences.bindReference(lTime, lOut)
      val rTimeBound = BindReferences.bindReference(rTime, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadTime: Any = _
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        private var lastMatchTime: Long = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead).copy()
            rHeadTime = rTimeBound.eval(rHead)
          } else { rHead = null; rHeadKey = null; rHeadTime = null }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        private def withinTol(gap: Long): Boolean = tol.forall(gap <= _)

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = lTimeBound.eval(l)
          // SQL equality semantics (DuckDB ASOF LEFT JOIN ON l.k = r.k):
          // a null join key never matches anything, including a null right
          // key. Null-keyed left rows emit the null right side without
          // consuming; null-keyed right rows sort first under the natural
          // ordering, compare < any non-null left key, and are consumed
          // with lastMatch cleared — they can never become a candidate.
          val lKeyMatchable = !lKey.anyNull
          var rSide: InternalRow = nullRight
          if (lTs != null && lKeyMatchable) {
            val lTsL = lTs.asInstanceOf[Long]
            if (!fwd) {
              // BACKWARD: consume right rows at or before (key, ts); the
              // last equal-key row seen is the as-of candidate. Null right
              // times never match (skipped), mirroring SQL comparison
              // semantics.
              var continue = rHead != null
              while (continue) {
                val c = keyOrd.compare(rHeadKey, lKey)
                if (c < 0 ||
                    (c == 0 && rHeadTime != null &&
                      rHeadTime.asInstanceOf[Long] <= lTsL) ||
                    (c == 0 && rHeadTime == null)) {
                  if (c == 0 && rHeadTime != null) {
                    lastMatch = rHead.copy(); lastMatchKey = rHeadKey
                    lastMatchTime = rHeadTime.asInstanceOf[Long]
                  } else if (c < 0) {
                    lastMatch = null; lastMatchKey = null
                  }
                  advanceRight()
                  continue = rHead != null
                } else continue = false
              }
              // the greatest time <= lTs is the nearest candidate: if IT
              // is out of tolerance, every earlier row is farther — null
              if (lastMatch != null && lastMatchKey != null &&
                  keyOrd.compare(lastMatchKey, lKey) == 0 &&
                  withinTol(lTsL - lastMatchTime)) rSide = lastMatch
            } else {
              // FORWARD: consume right rows strictly before (key, ts) —
              // left times are nondecreasing per key, so they can never
              // match a later left row either. The head itself (first
              // equal-key row with time >= lTs) is the candidate and is
              // NOT consumed: it may also serve the next left row.
              var continue = rHead != null
              while (continue) {
                val c = keyOrd.compare(rHeadKey, lKey)
                if (c < 0 ||
                    (c == 0 && (rHeadTime == null ||
                      rHeadTime.asInstanceOf[Long] < lTsL))) {
                  advanceRight()
                  continue = rHead != null
                } else continue = false
              }
              if (rHead != null && rHeadTime != null &&
                  keyOrd.compare(rHeadKey, lKey) == 0 &&
                  withinTol(rHeadTime.asInstanceOf[Long] - lTsL)) rSide = rHead
            }
          }
          resultProj(joined(l, rSide))
        }
      }
    }
  }
}

/** Public API for the as-of join custom operator. */
object AsOf {

  /** Register the planner strategy on this session (idempotent). Cluster
    * deployments can instead set
    * spark.sql.extensions=graft.functions.GraftExtensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SqlBridge.addStrategy(spark, AsOfJoinStrategy)

  /** LEFT AS-OF join `left` with `right` on equal keys, attaching the
    * nearest-in-time right row per left row. Time columns must be
    * LongType (epoch micros or any monotonic long) — convert timestamps
    * with `unix_micros` first. Name the right side's columns distinctly
    * from the left's so the combined output stays unambiguous.
    *
    * `direction` (the pandas merge_asof vocabulary):
    *   - "backward" (default): greatest `rightTime <= leftTime` —
    *     point-in-time lookup (DuckDB `ASOF ... ON l.t >= r.t`);
    *   - "forward": smallest `rightTime >= leftTime` — next-event
    *     attribution (DuckDB `ASOF ... ON l.t <= r.t`).
    *
    * `tolerance` (same unit as the time columns): a candidate farther
    * than this from the left time yields a null match instead — the
    * attribution-window bound. Nearest-first search makes the check O(1):
    * if the nearest candidate is out of tolerance, every other is too.
    */
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    register(left.sparkSession)
    viaExtensions(left, right, leftKeys, rightKeys, leftTime, rightTime,
      direction, tolerance)
  }

  /** As [[join]] but without the runtime strategy registration — for
    * sessions where the planner strategy is already installed via
    * `spark.sql.extensions=graft.functions.GraftExtensions` (the cluster
    * deployment path). Planning fails if neither injection happened. */
  def viaExtensions(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"as-of direction must be 'backward' or 'forward', got '$direction'")
    require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lt = resolve(lPlan, leftTime)
    val rt = resolve(rPlan, rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of time columns must be LongType, got ${lt.dataType}/${rt.dataType}")
    val lk = leftKeys.map(resolve(lPlan, _))
    val rk = rightKeys.map(resolve(rPlan, _))
    require(lk.map(_.dataType) == rk.map(_.dataType),
      "as-of join key types must match pairwise")
    SqlBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt,
        forward = direction == "forward", tolerance = tolerance))
  }
}
