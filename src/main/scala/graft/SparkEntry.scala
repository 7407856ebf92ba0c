package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a runnable
  * DataFrame; `oracleSql` carries the equivalent plain-ANSI DuckDB SQL (the
  * oracle DuckDB has no spatial extension, so spatial results are projected
  * to numerics the oracle recomputes with scalar math).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftExtensions.install(spark)
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame]() ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.SpatialQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.IoQueries.queries

  def oracleSql: Map[String, String] =
    Map[String, String]() ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.SpatialQueries.oracles ++
      graft.queries.JoinQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.IoQueries.oracles
}
