package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the first thing a warehouse (or a
  * training-data intake) runs against a new table: per-column null/
  * distinct/min/max summary and equi-width value histograms.
  *
  * Scale shape: [[describe]] is ONE aggregation pass over the table (all
  * per-column aggregates in a single agg row, partial-combined map-side)
  * unpivoted with `stack` — no per-column scans. [[histogram]] is a
  * broadcast of the 2-value min/max row plus one keyed count — two
  * passes, both linear, no shuffle wider than the bin count.
  */
object Profile {

  /** One row per column: null count, exact distinct count, min/max (as
    * strings — profile columns should be string/integer typed; double
    * rendering differs across engines). */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nonnull"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val row = df.agg(count(lit(1)).as("__total"),
      aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __total - `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    row.selectExpr(s"stack(${cols.length}, $stackArgs) AS " +
      "(col_name, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Equi-width histogram of a numeric column: `bins` buckets between
    * the column's min and max (the max lands in the last bucket). NULL
    * values are excluded — without the filter a NULL offset would ride
    * `least()`'s null-skipping into the LAST bucket, silently inflating
    * it (min/max already ignore nulls, so they never widen the range
    * either). A constant column (mn == mx) degenerates to one bucket at
    * bin 0 — guarded explicitly, since 0/0 would otherwise NaN-floor
    * every row into bin 0 here but NULL→last-bin in an unguarded SQL
    * twin. */
  def histogram(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins > 0)
    val stats = df.agg(min(value).cast("double").as("mn"),
      max(value).cast("double").as("mx"))
    df.select(value.cast("double").as("v")).where(col("v").isNotNull)
      .crossJoin(broadcast(stats))
      .select(when(col("mx") === col("mn"), lit(0))
        .otherwise(least(floor((col("v") - col("mn")) /
          ((col("mx") - col("mn")) / bins)), lit(bins - 1))).cast("int").as("bin"),
        col("mn"), col("mx"))
      .groupBy("bin", "mn", "mx")
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        round(col("mn") + col("bin") * (col("mx") - col("mn")) / bins, 6).as("bin_lo"),
        col("n"))
  }
}
