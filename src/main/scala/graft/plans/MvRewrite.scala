package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** SURVEY §7.6: MATERIALIZED-VIEW rewrite — the third optimizer-rule tier
  * after the two banded-join rules: a whole-aggregate SUBSTITUTION rather
  * than a join re-bucketing. A registered summary table (the MV) declares
  * "I am `SELECT group, sum(value), count(*) FROM <source> GROUP BY
  * group`, pre-computed"; when a query's optimized plan contains exactly
  * that aggregate over exactly that source scan, the rule swaps the whole
  * subtree for a scan of the MV — the fact table is never read. This is
  * the summary-serving pattern every warehouse ships (Calcite MV rewrite,
  * BigQuery/Snowflake MVs): at 100 TB the difference between answering a
  * dashboard from a KB-sized rollup and re-scanning the corpus.
  *
  * Matching is deliberately STRICT — correctness first:
  *  - the aggregate's child must be the registered source scan (bare or
  *    behind a pure column-pruning Project). ANY Filter in between
  *    disqualifies: the MV holds no detail rows, so a filtered aggregate
  *    must not be served from it (the classic stale-MV wrong-result bug,
  *    excluded structurally);
  *  - one grouping column, by name, and only three aggregate shapes:
  *    the group key itself, `sum(<valueCol>)` (plain, no DISTINCT/FILTER)
  *    and `count(1)`/`count(*)`. Anything else ⇒ no rewrite;
  *  - output attributes keep the ORIGINAL ExprIds (aliases over the MV
  *    columns), so every parent operator re-binds untouched.
  *
  * Gated on `spark.graft.rewrite.mv` (off by default, conf-scoped by the
  * opt_mv_rewrite key); idempotent because the rewritten subtree contains
  * no Aggregate for the fixpoint batch to re-match. The MV scan is
  * re-instanced per rewrite (`newInstance()`), so two hits in one plan
  * cannot collide on ExprIds. Freshness is the registrant's contract, as
  * with every MV system: register only MVs derived from the same
  * immutable snapshot the source path serves (true for the per-(JVM,
  * sfDir) fixtures here).
  */
object MvRegistry {
  /** A registered rollup: `mvLr`'s parquet holds exactly
    * (groupCol, sumCol = sum(valueCol), cntCol = count(*)) grouped over
    * the source scan identified by `srcPathFragment`. */
  final case class MvDef(srcPathFragment: String, groupCol: String,
                         valueCol: String, sumCol: String, cntCol: String,
                         mvLr: LogicalRelation)

  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  /** Analyze the MV parquet once and register it for `srcPathFragment`. */
  def register(s: SparkSession, srcPathFragment: String, groupCol: String,
               valueCol: String, sumCol: String, cntCol: String,
               mvPath: String): Unit = {
    val lr = s.read.parquet(mvPath).queryExecution.analyzed.collectFirst {
      case l: LogicalRelation => l
    }.getOrElse(sys.error(s"MV at $mvPath did not analyze to a relation"))
    defs.put(srcPathFragment,
      MvDef(srcPathFragment, groupCol, valueCol, sumCol, cntCol, lr))
  }

  def all: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    defs.values.asScala.toSeq
  }
}

object MvRewrite extends Rule[LogicalPlan] {
  private def enabled: Boolean =
    SparkSession.getActiveSession.exists(
      _.conf.get("spark.graft.rewrite.mv", "false") == "true")

  /** The aggregate child as a source scan, tolerating only a pure
    * column-pruning Project — a Filter anywhere disqualifies. */
  private def baseScan(p: LogicalPlan): Option[LogicalRelation] = p match {
    case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
      Some(lr)
    case Project(projList, lr: LogicalRelation)
        if lr.relation.isInstanceOf[HadoopFsRelation] &&
           projList.forall(_.isInstanceOf[AttributeReference]) =>
      Some(lr)
    case _ => None
  }

  /** Canonical (scheme, authority, path) triple. Matching is EXACT path
    * equality — a substring match could serve the MV for any relation
    * whose root merely embeds the registered path (wrong results, not
    * just a missed rewrite). When the registered fragment carries a
    * scheme (`hdfs://nn/data/t`), scheme AND authority must match too,
    * so the same path on two filesystems cannot both serve one MV; a
    * BARE registered path (`/data/t`) matches any filesystem on path
    * alone — the registrant asserts a single-filesystem deployment. */
  private def canonical(p: String): (Option[String], Option[String], String) = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    (Option(u.getScheme), Option(u.getAuthority).filter(_.nonEmpty),
     u.getPath.stripSuffix("/"))
  }

  private def matches(reg: (Option[String], Option[String], String),
                      rel: (Option[String], Option[String], String)): Boolean =
    reg._3 == rel._3 &&
      (reg._1.isEmpty || (reg._1 == rel._1 && reg._2 == rel._2))

  private def defFor(lr: LogicalRelation): Option[MvRegistry.MvDef] = {
    val paths = lr.relation.asInstanceOf[HadoopFsRelation]
      .location.rootPaths.map(p => canonical(p.toString))
    MvRegistry.all.find { d =>
      val reg = canonical(d.srcPathFragment)
      paths.exists(rel => matches(reg, rel))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || MvRegistry.all.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
        (for {
          lr <- baseScan(child)
          d  <- defFor(lr) if g.name == d.groupCol
          rewritten <- substitute(agg, g, aggExprs, d)
        } yield rewritten).getOrElse(agg)
    }
  }

  /** Substitute every registered AggregateExpression (and every grouping
    * reference) inside the result expressions with the matching MV
    * column. Handles post-CollapseProject shapes — by the time this rule
    * runs, scalar work like `round(sum(x), 2)` has been merged INTO the
    * Aggregate's result expressions, so the matcher rewrites aggregate
    * functions in place rather than expecting bare `Alias(Sum(...))`. */
  private def substitute(agg: Aggregate, g: AttributeReference,
                         aggExprs: Seq[NamedExpression],
                         d: MvRegistry.MvDef): Option[LogicalPlan] = {
    val mv = d.mvLr.newInstance() // fresh ExprIds per substitution site
    def mvAttr(name: String): Option[Attribute] =
      mv.output.find(_.name == name)
    val (mvG, mvSum, mvCnt) =
      (mvAttr(d.groupCol), mvAttr(d.sumCol), mvAttr(d.cntCol)) match {
        case (Some(a), Some(b), Some(c)) => (a, b, c)
        case _ => return None // MV schema drifted — never rewrite
      }
    def aggToMv(ae: AggregateExpression): Option[Attribute] =
      if (ae.isDistinct || ae.filter.isDefined) None
      else ae.aggregateFunction match {
        case s: Sum => s.child match {
          case x: AttributeReference if x.name == d.valueCol => Some(mvSum)
          case _ => None
        }
        case c: Count => c.children match {
          case Seq(Literal(1, _)) => Some(mvCnt)
          case _ => None
        }
        case _ => None
      }
    val mapped: Seq[Option[NamedExpression]] = aggExprs.map {
      // the bare group-key output column
      case a: AttributeReference if a.exprId == g.exprId =>
        Some(Alias(mvG, a.name)(exprId = a.exprId))
      case al: Alias =>
        var ok = true
        val replaced = al.transformUp {
          case ae: AggregateExpression =>
            aggToMv(ae) match {
              case Some(m) => m
              case None    => ok = false; ae
            }
          case a: AttributeReference if a.exprId == g.exprId => mvG
        }.asInstanceOf[Alias] // withNewChildren preserves Alias + exprId
        // everything the rewritten expression still references must come
        // from the MV scan — anything else means an unmapped source ref
        if (ok && replaced.references.subsetOf(mv.outputSet)) Some(replaced)
        else None
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None // any unmappable output ⇒ keep the agg
    else Some(Project(mapped.map(_.get), mv))
  }
}
