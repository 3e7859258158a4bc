package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production registration path for this library's Catalyst extensions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects `graft_cosine` into every session built from that config — the
  * cluster-wide equivalent of the per-session
  * `CosineSimilarity.register(spark)` used inside the contract queries
  * (which stays, so queries are self-contained under the driver harness).
  * New native functions/rules/strategies register here as the library grows.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    // §2-J generator (UDTF) extension tier: a custom Catalyst Generator,
    // planned as a native Generate node (udtf_custom key; posexplode twin).
    ext.injectFunction((
      FunctionIdentifier("graft_pos_tokenize"),
      new ExpressionInfo(classOf[graft.functions.PosTokenize].getName, "graft_pos_tokenize"),
      (children: Seq[Expression]) => graft.functions.PosTokenize(children.head)))
    // §7.6 banded-join rewrites (BandedJoinRules.scala). Injected rules run
    // inside the operator-optimization fixpoint, so they see the
    // pushed-into-join predicate shape after the first iteration; both are
    // idempotent via the __graft_band marker. Sessions not built with
    // extensions get the same rules via GraftRules.install.
    ext.injectOptimizerRule(_ => graft.plans.HammingBandedJoin)
    ext.injectOptimizerRule(_ => graft.plans.CosineBandedJoin)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // §7.3c whole-operator tier: plans graft.plans.AsOfJoin nodes (built by
    // Graft.asofJoin) as the native AsOfJoinExec physical operator.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // SQL-text front end for the same operator: `... ASOF [LEFT] JOIN ...`
    // parses to the native node (AsOfSqlParser); every other statement
    // delegates untouched to Spark's parser.
    ext.injectParser((session, delegate) =>
      new graft.plans.AsOfSqlParser(session, delegate))
  }
}
