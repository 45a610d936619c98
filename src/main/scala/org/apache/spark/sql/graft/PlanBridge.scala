package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** `Dataset.ofRows` re-export for custom logical plans.
  *
  * The engine's columnar operator ([[graft.plans.EmbedInference]]) is a
  * custom `LogicalPlan`; turning one into a user-facing DataFrame goes
  * through `Dataset.ofRows`, which is `private[sql]` — this one-liner
  * lives under `org.apache.spark.sql` purely to re-export it (the
  * BusDrain precedent). No other Spark internals are touched. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
