package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into package-private Spark factory methods, the standard pattern
  * for libraries that compose planner rewrites out of DataFrame operators
  * (a Dataset over an existing logical plan, a Column over a raw
  * expression). Used by the large-object KNN planner path.
  */
object DatasetBridge {
  /** Unload all registered state-store providers (private[sql]
    * StateStore.unloadAll): session hygiene between short-lived
    * streaming queries — dead providers otherwise linger until the 60 s
    * maintenance sweep. See StreamingOps.drainStateStores. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an RDD of UnsafeRows matching `schema` (the
    * private[sql] internalCreateDataFrame — used by ScalableRank to
    * re-enter DataFrame land after a per-partition index pass). */
  def internalDf(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
