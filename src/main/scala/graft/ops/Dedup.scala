package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-version-per-key dedup (reference W1:
  * row_number over (partitionBy key orderBy raw_loaded_at desc) == 1,
  * src/silver/trips_bronze_to_silver.py:209-219).
  *
  * The reference's ordering is tie-nondeterministic; we require callers to
  * pass a total order (documented divergence, SURVEY.md §7.3c). One shuffle
  * on the key — at scale prefer passing an already-partitioned input so AQE
  * can reuse the exchange.
  */
object Dedup {

  /** Keep the first row per key under `order` (pass a total order!). */
  def latestPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Rank-n row per key (n=2 feeds SCD3 prev columns, reference W2). */
  def nthPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === n).drop("__rn")
  }
}
