package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed running total over a global order — the scale-safe
  * replacement for `sum(x).over(Window.orderBy(...))`, which funnels the
  * whole dataset through ONE partition. Shape (q115's machinery, shared
  * with the shard splitter): range-repartition on the order key, cumsum
  * locally inside each partition (window keyed by the partition id), then
  * add per-partition offsets computed from an O(partitions) totals frame.
  * Range partitioning guarantees partition i's keys all precede partition
  * i+1's, so local cumsum + offset IS the global cumsum; with a long
  * value column the result is exact under any partitioning.
  */
object PrefixSum {

  /** Append `out` = running total of `value` in the total order given by
    * `order` (which MUST be a total order — ties would make the result
    * partitioning-dependent; append a unique id column as the last key).
    *
    * Returns (result, cached): `cached` is the persisted range-stamped
    * frame both internal branches read — the caller must unpersist it
    * AFTER materializing whatever it derives from `result` (the
    * `materializeAndRelease` idiom). The persist is load-bearing, not a
    * cache hint: the cumsum and offset branches must observe one
    * partition-id assignment, and the offset join is only correct for
    * the assignment both actually saw.
    */
  def runningTotal(df: DataFrame, order: Seq[Column], value: Column,
                   out: String): (DataFrame, DataFrame) = {
    // internal names are prefixed so `out` can never collide with (and
    // then be dropped alongside) the scaffolding columns
    val internal = Seq("__ps_pid", "__ps_cum", "__ps_t", "__ps_off")
    require(!internal.contains(out), s"$out is reserved")
    val ranged = df
      .repartitionByRange(df.sparkSession.sparkContext.defaultParallelism,
        order: _*)
      .withColumn("__ps_pid", spark_partition_id()).persist()
    ranged.count()
    val local = ranged.withColumn("__ps_cum", sum(value).over(
      Window.partitionBy("__ps_pid").orderBy(order: _*)))
    // one row per partition: the offset frame is O(partitions), so its
    // single-partition running total is bounded work by construction
    val offs = ranged.groupBy("__ps_pid").agg(sum(value).as("__ps_t"))
      .withColumn("__ps_off", coalesce(sum("__ps_t").over(
        Window.orderBy("__ps_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__ps_pid"), col("__ps_off"))
    val res = local.join(broadcast(offs), "__ps_pid")
      .withColumn(out, col("__ps_cum") + col("__ps_off"))
      .drop("__ps_pid", "__ps_cum", "__ps_off")
    (res, ranged)
  }
}
