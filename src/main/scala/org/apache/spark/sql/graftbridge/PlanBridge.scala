package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

import graft.plans.{TopKPerKeyPlan, TopKPerKeyStrategy}

/** DataFrame entry point for the custom [[graft.plans.TopKPerKeyPlan]]
  * operator. Lives in the `org.apache.spark.sql` package tree because
  * constructing a Dataset from a custom logical plan
  * (`Dataset.ofRows`) is `private[sql]` — the established extension
  * pattern, same as [[ColumnBridge]].
  */
object PlanBridge {

  /** Per-key descending top-k over the LongType column `orderCol`
    * (callers materialize the ordering value — with a unique tiebreak
    * folded in — as a column first, so every expression the node holds
    * is an already-resolved AttributeReference of the analyzed child).
    * Registers the planner strategy idempotently on first use; the
    * strategy is also injectable up front via
    * `graft.functions.GraftExtensions`.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
                 k: Int, registerStrategy: Boolean = true): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSparkSession]
    if (registerStrategy &&
        !spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(name: String) = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val node = TopKPerKeyPlan(keyCols.map(attr), attr(orderCol), k, child)
    ClassicDataset.ofRows(spark, node)
  }
}
