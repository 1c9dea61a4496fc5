package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Daily order-book rollup (reference A1 agg_trips_daily shape). */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(count(lit(1)).as("orders_total"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double").as("sum_price"))

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * beyond-reference LLM-pipeline operators). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      PipelineQueries.defs ++ MediaQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ VectorQueries.oracles ++
      PipelineQueries.oracles ++ MediaQueries.oracles
}
