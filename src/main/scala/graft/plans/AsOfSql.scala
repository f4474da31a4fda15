package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** SQL surface for the as-of join — the `Rule[LogicalPlan]` tier of the
  * custom-operator ladder (SURVEY.md §7.3: LogicalPlan + Rule +
  * SparkStrategy + SparkPlan). Users write ORDINARY join SQL with a
  * marker predicate:
  *
  *   SELECT ... FROM clicks l
  *   LEFT JOIN signups r
  *     ON l.user_id = r.s_user_id AND graft_asof(l.tsu, r.s_tsu)
  *
  * and [[AsOfJoinRewrite]] turns the Join into [[AsOfJoinPlan]] during
  * analysis: equalities become the as-of keys; the marker's operands
  * become the time columns (oriented by which side each references, so
  * argument order is free); LEFT JOIN keeps the operator's LEFT ASOF
  * semantics. Installed by `GraftExtensions` (injectPostHocResolutionRule)
  * for extension-built sessions; [[AsOf.sql]] applies the same rewrite
  * explicitly for plain sessions.
  */
case class AsOfMarker(left: Expression, right: Expression,
    forward: Boolean = false, tolerance: Option[Long] = None)
    extends BinaryExpression with CodegenFallback {
  // NOT Unevaluable: it must survive CheckAnalysis as a plain boolean
  // predicate; reaching eval (or its CodegenFallback) means the rewrite
  // did not run
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_asof"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    throw new IllegalStateException(
      "graft_asof is a join-rewrite marker; install graft.functions.GraftExtensions " +
        "(or use graft.plans.AsOf.sql) so AsOfJoinRewrite replaces the join")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfMarker =
    copy(left = newLeft, right = newRight)
}

object AsOfMarker {

  /** graft_asof(t1, t2[, direction[, tolerance]]) — direction is the
    * literal 'backward' (default) or 'forward'; tolerance is a literal
    * non-negative long in the time columns' unit. */
  private[graft] def build(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    require(exprs.length >= 2 && exprs.length <= 4,
      s"graft_asof(t1, t2[, direction[, tolerance]]) takes 2-4 arguments, got ${exprs.length}")
    val forward = exprs.lift(2) match {
      case None => false
      case Some(Literal(s, StringType)) if s != null => s.toString match {
        case "backward" => false
        case "forward" => true
        case other => throw new IllegalArgumentException(
          s"graft_asof direction must be 'backward' or 'forward', got '$other'")
      }
      case Some(other) => throw new IllegalArgumentException(
        s"graft_asof direction must be a string literal, got $other")
    }
    val tol = exprs.lift(3).map {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"graft_asof tolerance must be an integer literal, got $other")
    }
    require(tol.forall(_ >= 0), "graft_asof tolerance must be >= 0")
    AsOfMarker(exprs.head, exprs(1), forward, tol)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_asof", build, "scala_udf")
}

/** Rewrites `LEFT JOIN ... ON <equalities> AND graft_asof(t1, t2)` into
  * [[AsOfJoinPlan]]. Runs post-resolution, so attributes are bound and
  * sidedness is decidable from the children's output sets. Non-matching
  * joins (wrong join type, extra non-equi predicates, unorientable
  * operands) are left untouched — the marker then fails loudly at eval. */
object AsOfJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, LeftOuter, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsOfMarker]) =>
      val preds = splitConjunctivePredicates(cond)
      val (markers, keys) = preds.partition(_.isInstanceOf[AsOfMarker])
      val oriented = keys.map {
        case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
            b.references.subsetOf(r.outputSet) => Some((a, b))
        case EqualTo(a, b) if b.references.subsetOf(l.outputSet) &&
            a.references.subsetOf(r.outputSet) => Some((b, a))
        case _ => None
      }
      markers match {
        case Seq(m @ AsOfMarker(t1, t2, _, _)) if oriented.forall(_.isDefined) =>
          val times =
            if (t1.references.subsetOf(l.outputSet) &&
              t2.references.subsetOf(r.outputSet)) Some((t1, t2))
            else if (t2.references.subsetOf(l.outputSet) &&
              t1.references.subsetOf(r.outputSet)) Some((t2, t1))
            else None
          times match {
            case Some((lt, rt)) =>
              val pairs = oriented.flatten
              AsOfJoinPlan(l, r, pairs.map(_._1), pairs.map(_._2), lt, rt,
                forward = m.forward, tolerance = m.tolerance)
            case None => j
          }
        case _ => j
      }
  }
}

/** Plain-session entry point: parse + analyze the SQL (with the marker
  * function registered), apply the rewrite once, and execute. Sessions
  * built with `spark.sql.extensions=graft.functions.GraftExtensions` can
  * call `spark.sql` directly instead — the injected rule does this. */
object AsOfSql {
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    AsOfMarker.register(spark)
    AsOf.register(spark) // the planner strategy for the rewritten plan
    val analyzed = spark.sql(sqlText).queryExecution.analyzed
    SqlBridge.ofRows(spark, AsOfJoinRewrite(analyzed))
  }
}
