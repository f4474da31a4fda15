package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, sum}

/** Materialized-view rollup rewrite — the warehouse-accelerator surface
  * the reference delegates to its serving engine (DuckDB has no MV
  * either; real deployments hand-route dashboards at summary tables,
  * exactly what `transformation.py`'s pre-aggregated dims are for).
  * Spark ships no MV machinery, so this is a genuine engine extension:
  * a `Rule[LogicalPlan]` that notices an Aggregate over a registered
  * fact relation whose grouping is a COARSENING of a registered summary
  * table and rewrites it to re-aggregate the summary instead —
  * SUM(x) → SUM(mv.sum_x), COUNT(1) → SUM(mv.cnt) (count/sum partials
  * are mergeable; that is what makes the rollup sound).
  *
  * Injection: `MvRewrite.register(spark)` appends the rule to
  * `spark.experimental.extraOptimizations` (idempotent; the supported
  * runtime seam for an already-built session), and [[graft.functions
  * .GraftExtensions]] injects it at session build for cluster deploys.
  * The rule is inert unless the scanned path is in [[MvRegistry]], so a
  * registered rule never perturbs unrelated queries.
  *
  * Scale: this is the difference between re-scanning a 100 TB fact for
  * every dashboard refresh and re-aggregating a few thousand summary
  * rows — the MV is maintained incrementally (ext81/ext99 show the
  * partial-merge mechanics), the rewrite makes readers hit it
  * transparently.
  */
object MvRegistry {
  /** One registered summary: fact path → MV parquet path, the MV's
    * grouping columns, fact-sum-column → MV-partial-sum-column, and the
    * MV's COUNT(*) partial column. */
  case class MvDef(factPath: String, mvPath: String, groupCols: Set[String],
      sumMap: Map[String, String], countCol: String)

  private val defs = new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  /** Strip the filesystem scheme so `file:/x` (relation rootPath) and
    * `/x` (user-supplied) key identically. */
  def normalize(p: String): String = p.stripPrefix("file:")

  def register(d: MvDef): Unit = defs.put(normalize(d.factPath), d)
  def lookup(path: String): Option[MvDef] = Option(defs.get(normalize(path)))
}

/** Shared plumbing for the optimizer-rule pair below: one scan-path
  * resolver (kept in ONE place so the look-through rules cannot diverge)
  * and one registration lock (both rules read-modify-write the same
  * `extraOptimizations` array — a shared lock or concurrent registration
  * drops a rule). */
private[plans] object RuleReg {
  private val lock = new Object

  /** Scan path under `plan`, looking through column-pruning Projects
    * only (a Filter would need predicate subsumption proofs — out of
    * scope for both rules, so no rewrite). A graft catalog table
    * resolves to `graft_cat.<ident>` — its own keyspace, disjoint from
    * filesystem paths, so a registration can never cross surfaces. */
  def pathOf(plan: LogicalPlan): Option[String] = plan match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      pathOf(child)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
    // by the time the user-provided batch runs, V2 pushdown has turned
    // DataSourceV2Relation into DataSourceV2ScanRelation — match both
    // (a scan with pushed-down filters does real work → no rewrite, so
    // only the plain SegScan shape below an Aggregate ever matches; the
    // filters live ABOVE the scan relation in the plan and block the
    // Project-only walk anyway)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[graft.sources.SegTable] =>
      Some(s"graft_cat.${r.table.name()}")
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        if r.relation.table.isInstanceOf[graft.sources.SegTable] =>
      Some(s"graft_cat.${r.relation.table.name()}")
    case _ => None
  }

  /** Idempotently append `mk` to the session's experimental optimizer
    * hooks under the one shared lock. */
  def register(spark: SparkSession, cls: Class[_],
      mk: => Rule[LogicalPlan]): Unit = lock.synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(cls.isInstance(_)))
      spark.experimental.extraOptimizations = cur :+ mk
  }
}

case class MvRollupRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(groups, aggs, child, _) =>
      (for {
        path <- RuleReg.pathOf(child)
        mv <- MvRegistry.lookup(path)
        rewritten <- tryRewrite(agg, groups, aggs, mv)
      } yield rewritten).getOrElse(agg)
  }

  private def tryRewrite(agg: Aggregate, groups: Seq[_],
      aggs: Seq[NamedExpression], mv: MvRegistry.MvDef): Option[LogicalPlan] = {
    // grouping must be a STRICT coarsening of the MV's grouping. Equality
    // is excluded deliberately: the MV's own rebuild aggregates the fact
    // at exactly the MV granularity while OVERWRITING the MV path — a
    // same-granularity rewrite would read the file being replaced (stale
    // data or a mid-overwrite listing failure), and gains nothing anyway.
    val groupNames = groups.map {
      case ar: AttributeReference => ar.name
      case _ => return None
    }
    if (!groupNames.toSet.subsetOf(mv.groupCols) ||
      groupNames.toSet == mv.groupCols) return None

    // each output is a group column or a mergeable aggregate we can
    // restate over the MV's partials
    val mvAggCols = aggs.flatMap {
      case ar: AttributeReference if groupNames.contains(ar.name) => None
      // DISTINCT partials are not mergeable; a FILTER clause predicates
      // per-fact-row and cannot be restated over pre-aggregated partials
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case s: Sum => s.child match {
            case ar: AttributeReference if mv.sumMap.contains(ar.name) =>
              Some(sum(col(mv.sumMap(ar.name))).as(name))
            case _ => return None
          }
          // only COUNT over non-null literals (count(*) / count(1)) is
          // row counting; COUNT(NULL) is constantly 0 and must not
          // rewrite. coalesce covers the empty-fact edge: SUM over no
          // rows is NULL where COUNT is 0.
          case c: Count if c.children.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
            Some(org.apache.spark.sql.functions.coalesce(
              sum(col(mv.countCol)),
              org.apache.spark.sql.functions.lit(0L)).as(name))
          case _ => return None
        }
      case _ => return None
    }
    if (mvAggCols.isEmpty) return None

    // build the replacement with the Dataset API and splice its ANALYZED
    // plan — resolution (including the MV schema) comes for free. An MV
    // in the graft catalog (`graft_cat.db.mv`) reads through the
    // catalog, giving the rewrite a transactionally consistent snapshot
    // (and the IncrementalMv maintenance story); anything else is a
    // parquet path.
    val mvRel =
      if (mv.mvPath.startsWith("graft_cat.")) spark.table(mv.mvPath)
      else spark.read.parquet(mv.mvPath)
    val grouped = mvRel
      .groupBy(groupNames.map(col): _*)
      .agg(mvAggCols.head, mvAggCols.tail: _*)
    // splice the OPTIMIZED subplan: this rule runs in the post-hoc
    // "User Provided Optimizers" batch, after V2 scan pushdown — an
    // analyzed DataSourceV2Relation spliced here would never be
    // converted to a scan relation and could not be planned. (The
    // parquet LogicalRelation tolerates either form; optimized is
    // uniformly correct and also column-prunes the MV scan.)
    val analyzed = grouped.queryExecution.optimizedPlan
    val byName = analyzed.output.map(a => a.name -> a).toMap

    // splice only if every original output resolves by name with the
    // same type; alias back to the ORIGINAL exprIds so parents are
    // untouched. Spark permits duplicate output names (e.g.
    // groupBy(c).agg(sum(x).as(c.name))) — a by-name map would silently
    // collapse them, so decline the rewrite in that case.
    val out: Seq[Attribute] = agg.output
    if (out.map(_.name).distinct.size != out.size ||
      analyzed.output.map(_.name).distinct.size != analyzed.output.size)
      return None
    if (!out.forall(o => byName.get(o.name).exists(_.dataType == o.dataType)))
      return None
    Some(Project(
      out.map(o => Alias(byName(o.name), o.name)(exprId = o.exprId)),
      analyzed))
  }
}

object MvRewrite {
  /** Idempotently append the rewrite rule to an existing session's
    * experimental optimizer hooks (the runtime path; cluster deploys get
    * it from GraftExtensions at build time). */
  def register(spark: SparkSession): Unit =
    RuleReg.register(spark, classOf[MvRollupRewrite], MvRollupRewrite(spark))
}

/** Declared unique keys for join elimination: relation path → the column
  * that is unique in that relation (the SQL UNIQUE/PK constraint
  * metadata Spark's file relations don't carry). Correctness of the
  * elimination rests on the declaration being true — exactly the
  * contract a database PK gives its optimizer. */
object UniqueKeyRegistry {
  private val keys = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def register(path: String, uniqueCol: String): Unit =
    keys.put(MvRegistry.normalize(path), uniqueCol)
  def lookup(path: String): Option[String] =
    Option(keys.get(MvRegistry.normalize(path)))
}

/** Left-outer-join elimination on declared unique keys — the classic
  * redundant-join removal every mature optimizer performs off PK/FK
  * metadata: `fact LEFT JOIN dim ON fact.fk = dim.pk` where the parent
  * references NO dim column adds no rows (pk unique ⇒ at most one
  * match) and drops none (outer ⇒ misses survive), so the join — and
  * the entire dim scan — can vanish. Inner joins are NOT eliminated
  * (they filter to matching rows; that needs declared referential
  * integrity, not just uniqueness). At 100 TB this is what saves a
  * dashboard that joins a wide dim "just in case" from scanning and
  * shuffling it for queries that never touch its columns.
  *
  * Sound by construction: the spliced child is the ORIGINAL left
  * subtree (same exprIds), so parents are untouched; elimination only
  * fires when every referenced attribute comes from the left side.
  */
case class JoinEliminationRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{AttributeSet, EqualTo}
  import org.apache.spark.sql.catalyst.plans.LeftOuter
  import org.apache.spark.sql.catalyst.plans.logical.Join

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p: Project => p.child match {
      case j: Join if eliminable(j, p.references) => p.withNewChildren(Seq(j.left))
      case _ => p
    }
    case a: Aggregate => a.child match {
      case j: Join if eliminable(j, a.references) => a.withNewChildren(Seq(j.left))
      case _ => a
    }
  }

  private def eliminable(j: Join, parentRefs: AttributeSet): Boolean = {
    if (j.joinType != LeftOuter) return false
    // every referenced attribute must come from the LEFT subtree.
    // Filters on the dim side are NOT looked through by RuleReg.pathOf —
    // a filtered dim means the scan does real work we cannot prove
    // redundant.
    if (!parentRefs.subsetOf(j.left.outputSet)) return false
    (for {
      path <- RuleReg.pathOf(j.right)
      unique <- UniqueKeyRegistry.lookup(path)
    } yield j.condition match {
      // single equi-condition on the right side's declared unique column
      case Some(EqualTo(l: AttributeReference, r: AttributeReference)) =>
        (j.right.outputSet.contains(r) && r.name == unique &&
          j.left.outputSet.contains(l)) ||
          (j.right.outputSet.contains(l) && l.name == unique &&
            j.left.outputSet.contains(r))
      case _ => false
    }).getOrElse(false)
  }
}

object JoinElimination {
  /** Runtime registration twin of [[MvRewrite.register]] (same lock). */
  def register(spark: SparkSession): Unit =
    RuleReg.register(spark, classOf[JoinEliminationRewrite],
      JoinEliminationRewrite(spark))
}
