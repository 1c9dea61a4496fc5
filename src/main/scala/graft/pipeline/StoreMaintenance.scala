package graft.pipeline

import graft.tx.AtomicRewrite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operational maintenance shared by the batch-partitioned corpus stores
  * ([[DedupStore]], [[NearDupStore]]).
  *
  * Their append-only commits put each accepted batch's rows into a fresh
  * `batch_seq` hive partition — the property that keeps a commit O(batch)
  * — but the partition-DIR count then grows by one per batch forever:
  * after 10⁵ accepted batches every read lists 10⁵ dirs before scanning a
  * byte (the small-files problem one level up). [[AtomicRewrite.compact]]
  * collapses files and manifests but preserves the hive layout, so it
  * cannot shrink the dir count; the fix is a REBASE that folds all
  * history into partition 0. */
object StoreMaintenance {

  /** Fold the historic `batch_seq` partitions into at most `buckets`
    * dirs (batch_seq mod buckets), INCREMENTALLY: only partitions
    * OUTSIDE the bucket bound (batch_seq ≥ buckets — the per-batch dirs
    * appended since the last fold) are folded, plus the target buckets
    * they land in; every already-in-place bucket rides the new manifest
    * by reference, and a fold with nothing pending is a FULL no-op (no
    * version burned, zero bytes written — maintenance on cadence costs
    * nothing when nothing accumulated). Cost per run: O(batches since
    * the last fold + the ≤ min(pending, buckets) target buckets they
    * hash into), never O(store). Store semantics are unchanged —
    * `batch_seq` is commit bookkeeping, not data: later accepts keep
    * appending fresh partitions (their seq derives from the table
    * VERSION, which only moves forward, and the fold only ever
    * DECREASES a seq, so a folded dir can never collide with a future
    * batch's), and `forget` keeps rewriting only the partitions that
    * hold a match.
    *
    * `buckets` is the dir-count / erasure-granularity dial: after the
    * fold a forget that matches pre-fold data rewrites whole buckets —
    * O(store/buckets) each — where the unfolded layout rewrote only the
    * matched batch dirs. buckets=1 minimizes listing cost but makes the
    * next historic forget a full-store rewrite; the default keeps
    * listing O(16) while erasure stays ≤ 1/16 of the store per touched
    * bucket. Shrinking `buckets` between runs leaves the old runs'
    * higher-numbered FOLDED buckets in place (they are inside the OLD
    * bound, outside the new one — refolded incrementally like any other
    * pending partition), so the dial converges within one run. */
  def rebaseBatchPartitions(spark: SparkSession, storeRoot: String,
                            buckets: Int = 16): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    if (!AtomicRewrite.exists(spark, storeRoot)) return
    import spark.implicits._
    val store = AtomicRewrite.read(spark, storeRoot)
    // the pending set is a partition-VALUES listing (the partition
    // column never reads a data page), bounded by the batch count since
    // the last fold plus the bucket count
    val pending = store.select("batch_seq").distinct()
      .filter(col("batch_seq") >= buckets)
      .as[Int].collect().toSeq
    if (pending.isEmpty) return // already folded: zero bytes, no version
    val targets = pending.map(_ % buckets).distinct
    val folded = store.filter(col("batch_seq").isin(pending: _*))
      .withColumn("batch_seq",
        pmod(col("batch_seq"), lit(buckets)).cast("int"))
    val survivors = store.filter(col("batch_seq").isin(targets: _*))
    AtomicRewrite.writePartitions(spark, storeRoot,
      survivors.unionByName(folded), Seq("batch_seq"),
      replaced = Some((pending ++ targets).distinct.toDF("batch_seq")))
  }
}
