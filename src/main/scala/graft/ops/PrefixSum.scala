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
    val (res, cached, _) = runningTotalsSummed(df, order, values)
    (res, cached)
  }

  /** [[runningTotal]] + the value column's grand total (see
    * [[runningTotalsSummed]]). */
  def runningTotalSummed(df: DataFrame, order: Seq[Column], value: Column,
                         out: String): (DataFrame, DataFrame, Any) = {
    val (res, cached, totals) = runningTotalsSummed(df, order, Seq(value -> out))
    (res, cached, totals.head)
  }

  /** [[runningTotals]] ALSO returning each value column's GRAND TOTAL.
    * The pin's materializing action collects the per-partition partial
    * sums (one job — the same cache-filling scan the old `count()`
    * was), the driver folds them in ascending-pid order — the exact
    * order and operation the previous single-partition offset window
    * applied to the same engine-computed partials, so every offset (and
    * the total) is bit-identical — and the offsets come back as a
    * LITERAL frame: consumers lose the offset aggregate + window +
    * broadcast-build stages their plans re-executed per action, and
    * "total × share" scalars (budget cuts, shard targets) need no
    * separate aggregate action at all. Totals are null for all-null
    * input columns (sum semantics). */
  def runningTotalsSummed(df: DataFrame, order: Seq[Column],
                          values: Seq[(Column, String)])
      : (DataFrame, DataFrame, Seq[Any]) = {
    // internal names are prefixed so no `out` can collide with (and then
    // be dropped alongside) the scaffolding columns
    require(values.nonEmpty && values.forall(!_._2.startsWith("__ps_")),
      "output names must not use the reserved __ps_ prefix")
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(spark.sparkContext.defaultParallelism, order: _*)
      .withColumn("__ps_pid", spark_partition_id()).persist()
    // one row per NON-EMPTY partition: O(partitions) driver traffic
    val partials = ranged.groupBy("__ps_pid").agg(
      sum(values.head._1).as("__ps_t0"),
      values.tail.zipWithIndex.map { case ((v, _), i) =>
        sum(v).as(s"__ps_t${i + 1}") }: _*)
    val pRows = partials.collect().sortBy(_.getInt(0))
    // sequential fold in pid order — null partials (all-null partitions)
    // contribute nothing, exactly like the window sum they replace
    def add(a: Any, b: Any): Any = (a, b) match {
      case (null, y) => y
      case (x, null) => x
      case (x: java.lang.Long, y: java.lang.Long) =>
        java.lang.Long.valueOf(x + y)
      case (x: java.lang.Double, y: java.lang.Double) =>
        java.lang.Double.valueOf(x + y)
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
      case (x, y) => throw new IllegalStateException(
        s"unsupported running-total partial types: $x / $y")
    }
    val zeros: Array[Any] = Array.fill(values.size)(null)
    val offRows = pRows.map { r =>
      val off = org.apache.spark.sql.Row.fromSeq(
        r.getInt(0) +: values.indices.map(i =>
          // a leading null offset reads as 0 downstream (the old
          // coalesce(…, 0)): keep null here, coalesce in the plan
          zeros(i)).toSeq)
      values.indices.foreach(i => zeros(i) = add(zeros(i), r.get(i + 1)))
      off
    }.toSeq
    val totals = zeros.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      partials.schema.fields.zipWithIndex.map { case (f, i) =>
        if (i == 0) f.copy(name = "__ps_pid")
        else f.copy(name = s"__ps_off${i - 1}") })
    val offFrame = graft.tx.AtomicRewrite.literalFrame(spark, offRows, offSchema)
    val w = Window.partitionBy("__ps_pid").orderBy(order: _*)
    val local = values.zipWithIndex.foldLeft(ranged) {
      case (d, ((v, _), i)) => d.withColumn(s"__ps_cum$i", sum(v).over(w))
    }
    val joined = local.join(broadcast(offFrame), "__ps_pid")
    val res = values.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        d.withColumn(out,
          col(s"__ps_cum$i") + coalesce(col(s"__ps_off$i"), lit(0L)))
    }.drop("__ps_pid")
      .drop(values.indices.flatMap(i =>
        Seq(s"__ps_cum$i", s"__ps_off$i")): _*)
    (res, ranged, totals)
  }
}
