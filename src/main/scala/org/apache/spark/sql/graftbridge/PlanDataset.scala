package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway this library uses: turning a hand-built
  * [[LogicalPlan]] (graft.plans.AsOfJoin) back into a user-facing
  * [[DataFrame]] so it flows through the normal analyzer → optimizer →
  * planner pipeline where the injected graft strategy picks it up.
  * `Dataset.ofRows` is how Spark's own DataFrame API constructs every
  * frame; there is no public equivalent, hence this bridge package —
  * the standard extension-library pattern (same doorway Delta/Iceberg
  * use for their custom commands).
  */
object PlanDataset {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
