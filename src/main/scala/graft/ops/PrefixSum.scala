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
                   out: String): (DataFrame, DataFrame) =
    runningTotals(df, order, Seq(value -> out))

  /** [[runningTotal]] for several value columns in ONE pass — one range
    * shuffle, one pid window chain, one offset frame — instead of one
    * full machinery per total (q121 needs both the coverage cumsum and
    * the rank, which is just the running total of 1). */
  def runningTotals(df: DataFrame, order: Seq[Column],
                    values: Seq[(Column, String)]): (DataFrame, DataFrame) = {
    // internal names are prefixed so no `out` can collide with (and then
    // be dropped alongside) the scaffolding columns
    require(values.nonEmpty && values.forall(!_._2.startsWith("__ps_")),
      "output names must not use the reserved __ps_ prefix")
    val ranged = df
      .repartitionByRange(df.sparkSession.sparkContext.defaultParallelism,
        order: _*)
      .withColumn("__ps_pid", spark_partition_id()).persist()
    ranged.count()
    val w = Window.partitionBy("__ps_pid").orderBy(order: _*)
    val local = values.zipWithIndex.foldLeft(ranged) {
      case (d, ((v, _), i)) => d.withColumn(s"__ps_cum$i", sum(v).over(w))
    }
    // one row per partition: the offset frame is O(partitions), so its
    // single-partition running totals are bounded work by construction
    val wOff = Window.orderBy("__ps_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offTotals = ranged.groupBy("__ps_pid").agg(
      sum(values.head._1).as("__ps_t0"),
      values.tail.zipWithIndex.map { case ((v, _), i) =>
        sum(v).as(s"__ps_t${i + 1}") }: _*)
    val offFrame = values.indices.foldLeft(offTotals) { (d, i) =>
      d.withColumn(s"__ps_off$i", coalesce(sum(s"__ps_t$i").over(wOff), lit(0L)))
    }.select(col("__ps_pid") +: values.indices.map(i => col(s"__ps_off$i")): _*)
    val joined = local.join(broadcast(offFrame), "__ps_pid")
    val res = values.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"__ps_cum$i") + col(s"__ps_off$i"))
    }.drop("__ps_pid")
      .drop(values.indices.flatMap(i =>
        Seq(s"__ps_cum$i", s"__ps_off$i")): _*)
    (res, ranged)
  }
}
