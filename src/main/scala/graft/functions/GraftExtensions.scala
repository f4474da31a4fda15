package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — the supported injection seam for
  * custom Catalyst pieces (the graft_cosine function and the as-of join
  * planner strategy). Usable two ways:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * The driver harness builds its own plain session, so query functions also
  * self-register via CosineSimilarity.register / AsOf.register; this class
  * is the cluster-deployment path where per-query registration isn't
  * available.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity.build(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "graft_sqdist"),
      (exprs: Seq[Expression]) => SquaredDistance.build(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash.build(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHash64.build(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_asof"),
      new ExpressionInfo(classOf[graft.plans.AsOfMarker].getName, "graft_asof"),
      (exprs: Seq[Expression]) => graft.plans.AsOfMarker.build(exprs)))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // MV rollup rewrite + unique-key join elimination (inert unless an
    // MvRegistry / UniqueKeyRegistry entry matches the scanned path;
    // plain sessions use graft.plans.{MvRewrite,JoinElimination}.register)
    ext.injectOptimizerRule(graft.plans.MvRollupRewrite(_))
    ext.injectOptimizerRule(graft.plans.JoinEliminationRewrite(_))
    // SQL-surface as-of: rewrite marker joins into AsOfJoinPlan during
    // post-hoc resolution (plain sessions use graft.plans.AsOfSql.sql)
    ext.injectPostHocResolutionRule(_ => graft.plans.AsOfJoinRewrite)
  }
}
