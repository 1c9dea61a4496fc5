package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A hot grouping key concentrates its rows in one reducer; salting first
  * aggregates on (key, salt) — spreading the hot key over `salts`
  * reducers — then merges the partials on the key alone. Works for any
  * algebraic aggregate (sum/count/min/max: merge = sum/sum/min/max).
  *
  * The salt is a deterministic hash of the full row (no rand(): task
  * retries must land a row in the same bucket or partials double-count).
  * For joins, prefer AQE's skew-join handling (enabled in
  * [[graft.core.SparkSessionFactory]]); this helper is for aggregations,
  * where AQE cannot split a single hash-aggregate key.
  */
object Skew {

  /** Two-phase aggregate: phase 1 groups by (keys ++ salt) computing
    * `partials` (each aliased), phase 2 groups by keys computing `merges`
    * over the partial columns. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salt = pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts)).as("__salt")
    df.groupBy((keys.map(col) :+ salt): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted count + double-sum, the common skewed-rollup shape. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], sumCol: String,
                     salts: Int = 32): DataFrame =
    saltedAgg(df, keys, salts,
      partials = Seq(count(lit(1)).as("__c"),
        sum(col(sumCol).cast("decimal(38,6)")).as("__s")),
      merges = Seq(sum(col("__c")).as("n_rows"),
        sum(col("__s")).cast("double").as("sum_value")))
}
